"""Pallas NN kernel tests (interpreter mode on CPU; the compiled path is
exercised on real TPU by bench.py and the verify drives)."""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.ops.nn_pallas import nearest_neighbors_pallas


def test_pallas_nn_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    src = rng.uniform(-1, 1, (600, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (2100, 3)).astype(np.float32)
    sv = np.ones(600, bool)
    sv[5] = False
    tv = np.ones(2100, bool)
    tv[50:150] = False
    d2, idx = nearest_neighbors_pallas(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv),
        interpret=True,
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    full[:, ~tv] = np.inf
    want_idx = full.argmin(1)
    ok = sv
    np.testing.assert_array_equal(idx[ok], want_idx[ok])
    np.testing.assert_allclose(d2[ok], full.min(1)[ok], rtol=1e-5, atol=1e-7)
    assert np.isinf(d2[~ok]).all()
