"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md §4).

GOTCHA: this environment's sitecustomize (on PYTHONPATH) imports jax and
registers the 'axon' TPU plugin at interpreter startup, so JAX_PLATFORMS
set via os.environ here is read too late. jax.config.update still works
because no backend has been *initialized* yet; XLA_FLAGS is read at backend
init, so setting it here is still in time.
"""

import os

# Explicit on-chip run (RSPC_ONCHIP_TESTS=1 pytest ...) keeps the real
# backend so the compiled-lowering tests (tests/test_nn_onchip.py) can
# execute on-chip; everything else runs the virtual-CPU-mesh setup.
# NOTE: this must be an opt-in variable of our own, NOT a sniff of
# JAX_PLATFORMS — the environment exports JAX_PLATFORMS=axon ambiently,
# which silently routed the whole suite through the TPU tunnel (1 real
# device -> mesh tests fail, and every tiny op pays tunnel latency).
_TPU_RUN = os.environ.get("RSPC_ONCHIP_TESTS", "") == "1"

if not _TPU_RUN:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    devs = jax.devices()
    if _TPU_RUN:
        assert devs[0].platform == "tpu", f"expected TPU, got {devs}"
        return
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
