#!/usr/bin/env python
"""Stage-level wall timing of the north-star pipeline on the current chip.

    python tools/profile_pipeline.py            # stage table
    python tools/profile_pipeline.py --ops      # + XLA op-kind aggregation

Stages are timed as standalone jitted calls (min over reps after one
warmup); END-TO-END runs the fused program through the scheme. Per-op
aggregation uses tools/profile_tpu.py — note async op durations
(copy-start/slice-start) span their in-flight window and double-count
overlap, so trust the wall-time rows over the op sums.
"""

from __future__ import annotations

import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspc_tpu.utils.profiling import device_sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration import schemes as S

    n_frames, yaw = 10, -0.08
    seq = SyntheticSequence(
        n_frames=n_frames, yaw_step=yaw, intr=Intrinsics.simple(640, 480)
    )
    clouds = seq.clouds()
    cfg = north_star_config()
    r = cfg.refine
    stacked = OrganizedCloud(
        xyz=jnp.stack([c.xyz for c in clouds]),
        rgb=jnp.stack([c.rgb for c in clouds]),
        valid=jnp.stack([c.valid for c in clouds]),
    )
    device_sync(stacked.xyz)

    def timed(name, fn, reps=6):
        out = fn()
        device_sync(jax.tree.leaves(out))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            device_sync(jax.tree.leaves(out))
            ts.append(time.time() - t0)
        ts.sort()
        print(
            f"{name:28s} min {ts[0]*1e3:7.1f}  med {ts[len(ts)//2]*1e3:7.1f} ms",
            flush=True,
        )
        return out

    feats, full = timed(
        "phase1 (edges + full_down)",
        lambda: S._phase1_prepare(
            stacked, cfg.edge, r.leaf_size, r.max_points, r.enabled,
            r.decimate, r.normal_purity,
        ),
    )
    sch = S.NDTEdgeBasedRegistration(rads=yaw, config=cfg)
    guesses = sch._guesses(n_frames)

    out = timed(
        "chain scan (NDT+ICP)",
        lambda: S._chain_scan(
            feats, None, guesses, True, cfg.ndt, cfg.icp, r.stages,
            cfg.voxel.leaf_size, cfg.voxel.max_points,
            cfg.voxel.max_points * n_frames, r.max_points * n_frames,
            cfg.coarse_guard_cap, r.accept_margin,
        ),
    )
    if r.enabled and r.anchor_to_first:
        fd0 = jax.tree.map(lambda x: x[0], full)
        restf = jax.tree.map(lambda x: x[1:], full)
        timed(
            "anchor refine",
            lambda: S._anchor_refine(
                fd0, restf, out["totals"], r.anchor_stages, 1.0
            ),
        )

    def fused():
        return S._registration_fused(
            stacked, guesses, cfg.edge, True, cfg.ndt, cfg.icp, r,
            cfg.voxel.leaf_size, cfg.voxel.max_points, cfg.coarse_guard_cap,
        )

    timed("FUSED one-program", fused)

    def e2e():
        s = S.NDTEdgeBasedRegistration(rads=yaw, config=cfg)
        res = s.registration(clouds)
        device_sync(res.xyz)
        return res

    timed("END-TO-END (scheme)", e2e)

    if "--ops" in sys.argv:
        import collections
        import re

        from tools.profile_tpu import profile_op_table

        tbl = profile_op_table(fused)
        rows = sorted(
            ((k[2], v) for k, v in tbl.items() if "XLA Ops" in k[1]),
            key=lambda kv: -kv[1],
        )
        print(f"\ndevice op total {sum(v for _, v in rows):.1f} ms "
              "(async windows double-count overlap)")
        agg = collections.Counter()
        cnt = collections.Counter()
        for name, ms in rows:
            kind = re.match(r"%?([a-zA-Z_\-]+)", name).group(1)
            agg[kind] += ms
            cnt[kind] += 1
        for k, v in agg.most_common(12):
            print(f"{k:30s} {v:8.1f} ms x{cnt[k]}")


if __name__ == "__main__":
    main()
