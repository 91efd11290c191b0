"""Adversarial NN-kernel checks (VERDICT r1 #6).

On CPU these run the shared adversarial suite (ops/nn_check.py) against
the XLA sweep and the Pallas kernel in interpret mode; on a TPU backend
(``RSPC_ONCHIP_TESTS=1 pytest tests/test_nn_onchip.py``) the same suite
runs against the REAL compiled Pallas lowering. bench.py also executes
the compiled-path suite on the real chip before timing and records the
outcome in its JSON line, so every recorded bench carries the on-chip
correctness proof."""

import jax
import jax.numpy as jnp
import pytest

from rspc_tpu.ops.nn import nearest_neighbors
from rspc_tpu.ops.nn_check import run_nn_checks
from rspc_tpu.ops.nn_pallas import nearest_neighbors_pallas


def _wrap(fn, **kw):
    return lambda s, sv, t, tv: fn(
        jnp.asarray(s), jnp.asarray(sv), jnp.asarray(t), jnp.asarray(tv), **kw
    )


def test_xla_sweep_adversarial():
    failures = run_nn_checks(_wrap(nearest_neighbors, chunk=1024))
    assert not failures, failures


def test_pallas_interpret_adversarial():
    failures = run_nn_checks(_wrap(nearest_neighbors_pallas, interpret=True))
    assert not failures, failures


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Pallas lowering needs a TPU backend",
)
def test_pallas_compiled_adversarial():
    failures = run_nn_checks(_wrap(nearest_neighbors_pallas))
    assert not failures, failures


def test_pallas_hbm_streaming_interpret(monkeypatch):
    """The HBM-streaming variant (targets beyond the VMEM-resident
    budget) — forced at test size by lowering the switch threshold —
    must match float64 brute force exactly. Uses a shape distinct from
    the other tests so the jit cache cannot serve the resident trace."""
    import rspc_tpu.ops.nn_pallas as nnp

    monkeypatch.setattr(nnp, "MAX_VMEM_TARGET", 2000)
    import numpy as np

    rng = np.random.default_rng(7)
    src = rng.uniform(-1, 1, (333, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (6100, 3)).astype(np.float32)
    sv = np.ones(333, bool)
    sv[5] = False
    tv = np.ones(6100, bool)
    tv[1000:1500] = False
    tv[-1] = False
    d2, idx = nnp.nearest_neighbors_pallas(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv),
        interpret=True,
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    full = (
        (src[:, None, :].astype(np.float64) - tgt[None, :, :].astype(np.float64))
        ** 2
    ).sum(-1)
    full[:, ~tv] = np.inf
    want = full.argmin(1)
    np.testing.assert_array_equal(idx[sv], want[sv])
    np.testing.assert_allclose(
        d2[sv], full.min(1)[sv], rtol=1e-5, atol=1e-7
    )
    assert np.isinf(d2[~sv]).all()
