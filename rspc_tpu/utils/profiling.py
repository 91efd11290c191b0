"""Tracing / profiling utilities.

The reference has no tracing at all — only ``[RS]``/``[PCL]`` stdout
progress lines (SURVEY.md §5). The TPU-native equivalents here:

  * ``stage_timer`` — wall-clock stage timing with device sync, the
    structured replacement for those progress prints;
  * ``trace`` — a ``jax.profiler`` trace context writing a TensorBoard-
    loadable profile (XLA op breakdown, HBM traffic) for any pipeline
    region.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

from rspc_tpu.utils.log import get_logger

_log = get_logger("profiling")


def device_sync(tree) -> None:
    """True device barrier for timing: ``jax.block_until_ready`` PLUS a
    forced 1-element device->host read per array leaf.

    Through the axon TPU tunnel ``block_until_ready`` can return before
    the device finishes (async dispatch): a 25-Gpair Pallas sweep
    "completed" in 0.0 ms under ``block_until_ready`` alone but took
    169 ms when a readback forced the sync. Only a device->host transfer
    is a reliable barrier, so every timed region in bench.py /
    benchmarks/ / tools/ must close with this.

    Only the FIRST leaf is read: all outputs of one executable complete
    together, and the tunnel round trip varies 0.1-28 ms per read — a
    per-leaf read inflated multi-output stage timings by hundreds of ms
    (measured: the 8-leaf phase-1 output "took" 300 ms of which ~220 ms
    was readbacks). Callers timing MULTIPLE programs must sync each
    program's output separately."""
    import numpy as np

    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "ravel")]
    jax.block_until_ready(leaves)
    if leaves:
        np.asarray(leaves[0].ravel()[:1])


class stage_timer:
    """Accumulates named stage wall times (blocking on device completion).

    Usage::

        timers = stage_timer()
        with timers("edges"):
            edge = extract_edge_features(cloud)
        print(timers.summary())
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        rows = [
            f"{name}: {total*1000:.1f} ms ({self.counts[name]}x)"
            for name, total in sorted(
                self.times.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(rows)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rspc_trace"):
    """jax.profiler trace context; open the result in TensorBoard or
    Perfetto to see per-kernel device timing."""
    _log.info("profiler trace -> %s", logdir)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
