"""Poor-man's TPU op profiler: trace a callable with jax.profiler and
aggregate device-side op durations from the captured xplane protobuf.

No tensorboard in this image; the xplane_pb2 module that ships with the
partial tensorflow/tsl install is enough to decode the trace. Usage:

    from tools.profile_tpu import profile_op_table
    table = profile_op_table(lambda: fn(args))   # runs fn under a trace
    print(format_table(table))
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def _load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def profile_op_table(fn, warmup: bool = True):
    """Run ``fn()`` under a profiler trace; return
    {op_name: total_duration_ms} from the TPU device plane."""
    import jax

    if warmup:
        jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as d:
        with jax.profiler.trace(d):
            jax.block_until_ready(fn())
        xs = _load_xspace(d)
        table = defaultdict(float)
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if line.name not in ("XLA Ops", "XLA Modules", "Steps"):
                    # op-level lines are named "XLA Ops" on TPU planes
                    pass
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    table[(plane.name, line.name, name)] += (
                        ev.duration_ps / 1e9
                    )
        return dict(table)


def format_table(table, top: int = 40, line_filter: str = "XLA Ops"):
    rows = [
        (v, plane, line, name)
        for (plane, line, name), v in table.items()
        if line_filter in line
    ]
    rows.sort(reverse=True)
    total = sum(v for v, *_ in rows)
    out = [f"total {total:.2f}ms over {len(rows)} ops (line={line_filter})"]
    for v, plane, line, name in rows[:top]:
        out.append(f"{v:9.3f}ms  {name[:110]}")
    return "\n".join(out)


def lines_available(table):
    return sorted({(p, l) for (p, l, _) in table})
