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
import sys

# XLA:CPU's native compile + executable-serialization passes recurse
# deeply on the fused whole-pipeline programs and overflow the default
# 8 MB main-thread stack (observed as SIGSEGV inside
# backend_compile_and_load and compilation_cache.put_executable_and_time
# on the 2026-08-18 build host; identical programs pass under
# `ulimit -s unlimited`). Raising RLIMIT_STACK at runtime is NOT enough:
# the kernel fixed the stack->mmap gap at exec time using the old limit.
# And an unlimited GROWING main stack is still not enough for a LONG
# session: after ~150 tests enough mappings accumulate that one lands in
# the growth path and the next deep compile SIGSEGVs anyway (round-2's
# full-suite abort at ~84%, reproduced with RLIMIT_STACK == (-1, -1)).
# So RE-EXEC once into tests/_proc_main.py (VERDICT r3 #7): full-suite
# runs are split into fresh per-module-group pytest processes (short
# sessions — no accumulated-state crash, no cache-clear crutch, children
# get an unlimited-growth stack via inherited rlimit); small or filtered
# runs fall through to tests/_stack_main.py, which runs pytest on a
# worker thread whose 1 GB stack is RESERVED up front — no growth, no
# collision, deterministic for the whole session.
def _is_standalone_pytest() -> bool:
    # Only re-exec when this process IS a pytest run we can faithfully
    # reconstruct as `python -m pytest <args>`: the console script
    # (argv[0] = .../bin/pytest) or `python -m pytest` (argv[0] =
    # .../pytest/__main__.py). Embedded pytest.main() callers must NOT be
    # re-exec'd — `[sys.executable] + sys.argv` would silently become a
    # different program (observed: `python - <<EOF` re-exec'd to a bare
    # `python -` that read empty stdin and exited 0 with no output).
    a0 = os.path.basename(sys.argv[0] or "")
    return a0 in ("pytest", "py.test") or sys.argv[0].endswith(
        os.path.join("pytest", "__main__.py")
    )


if (
    os.environ.get("RSPC_STACK_REEXEC") != "1"
    and os.environ.get("RSPC_PROC_CHILD") != "1"
):
    try:
        if _is_standalone_pytest():
            os.environ["RSPC_STACK_REEXEC"] = "1"
            # pytest's global capture has already dup2'd temp files onto
            # fds 1/2 by the time initial conftests import (capture.py's
            # pytest_load_initial_conftests wrapper) — execv'ing now would
            # hand the new process the capture fds and its entire output
            # would vanish into a deleted temp file. Restore the real
            # stdout/stderr first via the CaptureManager's saved fds.
            import gc

            from _pytest.capture import CaptureManager

            for _obj in gc.get_objects():
                if isinstance(_obj, CaptureManager):
                    try:
                        _obj.stop_global_capturing()
                    except Exception:
                        pass
            os.execv(
                sys.executable,
                [
                    sys.executable,
                    os.path.join(os.path.dirname(__file__), "_proc_main.py"),
                ]
                + sys.argv[1:],
            )
    except Exception:
        pass

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
    # Never persist-cache XLA:CPU executables: serializing the big fused
    # pipeline programs aborts inside
    # compilation_cache.put_executable_and_time (reproduced 2/2 on full
    # suite runs), and that cache only pays for itself on the remote TPU
    # compile path anyway. rspc_tpu/__init__.py also gates on
    # JAX_PLATFORMS=cpu; this is belt-and-braces for direct jax use.
    os.environ.setdefault("RSPC_NO_CACHE", "1")

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


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules — SINGLE-PROCESS
    runs only.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; at ~84% the NEXT big fused-pipeline compile reproducibly
    segfaults inside backend_compile_and_load — with RLIMIT_STACK
    unlimited AND on a 1 GB pre-reserved thread stack, so it is
    accumulated jaxlib/XLA:CPU process state, not stack depth, that
    poisons it (the same test passes in a fresh process). The standard
    full-suite invocation is now process-isolated per module group
    (tests/_proc_main.py, VERDICT r3 #7) and needs no clearing — each
    short-lived child stays far below the threshold and KEEPS its jit
    caches across its modules. This fixture remains as the bounded
    defense for single-process paths that can still traverse many
    modules in one process (manual `-m`/`-k` filtered runs via
    _stack_main). Costs recompiles for cross-module shared shapes there;
    correctness is unaffected (caches are pure memoization)."""
    yield
    if os.environ.get("RSPC_PROC_CHILD") != "1":
        jax.clear_caches()
