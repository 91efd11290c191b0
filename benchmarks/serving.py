"""Serving throughput: sequence-batched registration on one chip.

The reference processes one sequence per process run; rspc_tpu's serving
axis is the batch of independent sequences (`parallel/chain.py::
batched_registration` — one vmapped program, no collectives). This bench
measures sequences/second at the north-star workload shape (10 frames,
640x480, NDT+ICP edge pipeline) as the batch grows: the per-pair chain
ops are small and latency-bound at B=1, so batching fills the VPU and
throughput should grow sublinearly in wall time.

Usage: python benchmarks/serving.py [B ...]   (default 1 2 4)
Emits one JSON line per batch size; RESULTS.md carries the recorded
TPU numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspc_tpu.utils.profiling import device_sync  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.parallel.chain import batched_registration
    from rspc_tpu.presets import north_star_config

    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    n_frames = 10
    config = north_star_config()
    intr = Intrinsics.simple(640, 480)

    max_b = max(batches)
    yaws = [-0.08 - 0.01 * i for i in range(max_b)]
    log(f"rendering {max_b} x {n_frames} synthetic 640x480 sequences...")
    seqs = [
        SyntheticSequence(n_frames=n_frames, yaw_step=y, intr=intr)
        for y in yaws
    ]
    all_clouds = [s.clouds() for s in seqs]
    gts = [
        [s.gt_transform(i) for i in range(1, n_frames)] for s in seqs
    ]

    def stack(b):
        cs = all_clouds[:b]
        return OrganizedCloud(
            xyz=jnp.stack([jnp.stack([c.xyz for c in cc]) for cc in cs]),
            rgb=jnp.stack([jnp.stack([c.rgb for c in cc]) for cc in cs]),
            valid=jnp.stack(
                [jnp.stack([c.valid for c in cc]) for cc in cs]
            ),
        )

    def static_guesses(b):
        out = []
        for s in seqs[:b]:
            g, acc = [], 0.0
            for _ in range(n_frames - 1):
                acc += s.yaw_step
                c, sn = np.cos(acc), np.sin(acc)
                m = np.eye(4, dtype=np.float32)
                m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, sn, -sn, c
                g.append(m)
            out.append(np.stack(g))
        return jnp.asarray(np.stack(out))

    base_wall = None
    for b in batches:
        stacked = stack(b)
        guesses = static_guesses(b)
        device_sync(stacked.xyz)

        t0 = time.time()
        out = batched_registration(
            stacked, guesses, config, use_ndt=True, include_global=False
        )
        device_sync(out["totals"])
        compile_s = time.time() - t0

        walls = []
        for _ in range(3):
            t0 = time.time()
            out = batched_registration(
                stacked, guesses, config, use_ndt=True,
                include_global=False,
            )
            device_sync(out["totals"])
            walls.append(time.time() - t0)
        wall = min(walls)

        t = np.asarray(out["totals"])
        errs = [
            np.abs(t[i, j] - gts[i][j]).max()
            for i in range(b)
            for j in range(n_frames - 1)
        ]
        if base_wall is None:
            base_wall = wall
        row = {
            "batch": b,
            "wall_s": round(wall, 4),
            "seq_per_s": round(b / wall, 3),
            "wall_vs_b1": round(wall / base_wall, 3),
            "max_err": float(np.max(errs)),
            "converged": int(np.asarray(out["converged"]).sum()),
            "pairs": b * (n_frames - 1),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(row), flush=True)
        log(
            f"B={b}: {wall:.3f}s ({b / wall:.2f} seq/s, {row['wall_vs_b1']}x "
            f"B=1 wall), max_err={row['max_err']:.2e}, "
            f"conv={row['converged']}/{row['pairs']}"
        )


if __name__ == "__main__":
    main()
