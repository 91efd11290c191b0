#!/usr/bin/env python
"""Measure the five BASELINE.json workload configs (RESULTS.md table).

Run from the repo root on the target chip:

    python benchmarks/workloads.py            # all five
    python benchmarks/workloads.py 1 3        # just configs 1 and 3

Prints one JSON line per config. Config 4 is the north-star pipeline —
``bench.py`` is its canonical measurement; it is repeated here only so
the whole table reproduces from one command.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


# python puts the script's own dir (benchmarks/) on sys.path, not the repo
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspc_tpu.utils.profiling import device_sync  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, reps=3):
    import jax

    out = fn()
    device_sync(jax.tree.leaves(out))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        device_sync(jax.tree.leaves(out))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp

    import dataclasses

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.config import EdgeConfig, ICPConfig, PipelineConfig
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.ops.edges import extract_organized_edges
    from rspc_tpu.ops.voxel import voxel_downsample
    from rspc_tpu.ops.transform import static_y_guess
    from rspc_tpu.registration.icp import icp_align
    from rspc_tpu.registration.schemes import (
        ICPEdgeBasedRegistration,
        IncrementalICP,
        NDTEdgeBasedRegistration,
    )

    which = {int(a) for a in sys.argv[1:]} or {1, 2, 3, 4, 5}
    n_frames = 10
    yaw = -0.08
    seq = SyntheticSequence(
        n_frames=n_frames, yaw_step=yaw, intr=Intrinsics.simple(640, 480)
    )
    clouds = seq.clouds()
    device_sync(clouds[-1].xyz)

    def emit(cfg_id, desc, wall, extra=None):
        rec = {"config": cfg_id, "workload": desc, "wall_s": round(wall, 4)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    if 1 in which:
        # pairwise point-to-point ICP, reference params, fixed -y guess
        flat = [
            Cloud(
                c.xyz.reshape(-1, 3), c.rgb.reshape(-1, 3), c.valid.reshape(-1)
            )
            for c in clouds[:2]
        ]
        down = [voxel_downsample(c, 0.02, 10240) for c in flat]
        cfg = ICPConfig()  # reference defaults (maxIter 100, mcd 0.01, ...)
        guess = static_y_guess(yaw)

        def run1():
            return icp_align(down[1], down[0], cfg, guess)

        wall, res = timed(run1)
        emit(
            1,
            "pairwise point-to-point ICP, reference params, fixed -y guess"
            " (~10k pts)",
            wall,
            {
                "fitness": float(res.fitness),
                "converged": bool(res.converged),
            },
        )

    if 2 in which:
        # crop + full 5-class edge extraction, 10x 640x480 batched
        ecfg = EdgeConfig()  # all five classes

        def run2():
            return jax.vmap(
                lambda oc: extract_organized_edges(
                    oc.center_crop_3_5(), ecfg
                )
            )(
                jax.tree.map(lambda *x: jnp.stack(x), *clouds)
            )

        wall, labels = timed(run2)
        emit(
            2,
            "crop + 5-class edge extraction, 10x 640x480 batched",
            wall,
            {"edge_px_frame0": int((np.asarray(labels[0]) > 0).sum())},
        )

    if 3 in which or 4 in which:
        from rspc_tpu.presets import north_star_config

        ns_config = north_star_config()

        def err_of(scheme):
            totals = np.asarray(scheme.total_transforms)
            return float(
                max(
                    np.abs(totals[i - 1] - seq.gt_transform(i)).max()
                    for i in range(1, n_frames)
                )
            )

    if 3 in which:
        thetas = seq.thetas()

        def run3():
            s = ICPEdgeBasedRegistration(thetas=thetas, config=ns_config)
            r = s.registration(clouds)
            device_sync(r.xyz)
            return s

        wall, s = timed(run3)
        emit(
            3,
            "ICPEdgeBasedRegistration, IMU complementary-filter guesses,"
            " 10 frames",
            wall,
            {"max_err_vs_gt": err_of(s)},
        )

    if 4 in which:
        def run4():
            s = NDTEdgeBasedRegistration(rads=yaw, config=ns_config)
            r = s.registration(clouds)
            device_sync(r.xyz)
            return s

        wall, s = timed(run4)
        emit(
            4,
            "NDTEdgeBasedRegistration (north-star pipeline), 10 frames",
            wall,
            {"max_err_vs_gt": err_of(s)},
        )

    if 5 in which:
        flat6 = [
            Cloud(
                c.xyz.reshape(-1, 3), c.rgb.reshape(-1, 3), c.valid.reshape(-1)
            )
            for c in clouds[:6]
        ]

        def run5():
            # fitness off, like the reference: incremental_icp.hpp only
            # reads hasConverged/getFinalTransformation, never
            # getFitnessScore (PCL align() does not compute fitness).
            cfg5 = dataclasses.replace(
                PipelineConfig(),
                icp=dataclasses.replace(
                    PipelineConfig().icp, compute_fitness=False
                ),
            )
            s = IncrementalICP(cfg5)
            r = s.registration(flat6)
            device_sync(r.xyz)
            return s

        wall, s = timed(run5)
        emit(
            5,
            "IncrementalICP, 6 full 307k-point clouds, no guesses",
            wall,
            {"all_converged": all(bool(r.converged) for r in s.results)},
        )


if __name__ == "__main__":
    main()
