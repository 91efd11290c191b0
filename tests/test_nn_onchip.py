"""Adversarial NN-kernel checks (VERDICT r1 #6).

On CPU these run the shared adversarial suite (ops/nn_check.py) against
the XLA sweep and the Pallas kernel in interpret mode; on a TPU backend
(``JAX_PLATFORMS=axon pytest tests/test_nn_onchip.py``) the same suite
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


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled Pallas lowering needs a TPU backend",
)
def test_pallas_compiled_adversarial():
    failures = run_nn_checks(_wrap(nearest_neighbors_pallas))
    assert not failures, failures
