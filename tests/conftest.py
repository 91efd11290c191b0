"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md §4). Must run
before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
