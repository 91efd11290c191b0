"""Quantify the two documented NDT parity divergences (VERDICT r3 #2).

The shipped NDT line search freezes the voxel neighborhood per Newton
iteration and uses safeguarded bisection; PCL refreshes the neighborhood
at every line-search trial (computeStepLengthMT -> computeDerivatives ->
radiusSearch) and runs the full More-Thuente trial selection
(/root/reference/src/ndt_edge_based_registration.hpp:38-43 pulls in
pcl::NormalDistributionsTransform verbatim; PARITY.md X2). The opt-in
``NDTConfig.pcl_exact_line_search`` mode reproduces PCL's behavior;
this benchmark measures the transform delta between the two modes on
pipeline-shaped pair problems across the robustness scenarios.

Usage:  python benchmarks/ndt_exact_delta.py [--pairs N] [--scenarios a,b]
One JSON line per (scenario, pair) on stdout; a markdown summary table
on stderr. RESULTS.md records the verdict: if deltas sit well under the
pipeline's accuracy floor (1e-3), the frozen-mode divergence is
immaterial and stays the default.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.robustness import scenarios  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pipeline_delta(args):
    """Full-registration totals delta: the north-star NDT scheme with the
    frozen line search vs PCL-exact mode, per robustness scenario. This
    is the level at which parity is claimed — the fine + anchor stages
    absorb coarse-stage basin differences, so pair-level deltas (the
    default mode of this benchmark) overstate the divergence."""
    import dataclasses as dc

    import jax.numpy as jnp

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.presets import north_star_config, robust_config
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    base = (
        robust_config(anchor_mode="map") if args.robust else north_star_config()
    )
    scen = scenarios()
    rows = []
    for name in args.scenarios.split(","):
        kw, _desc = scen[name]
        kw = dict(kw)
        yaw = kw.pop("yaw_step", -0.08)
        frames = (
            len(kw["yaw_schedule"]) if "yaw_schedule" in kw else 10
        )
        kw.setdefault("seed", args.seed)
        seq = SyntheticSequence(
            n_frames=frames,
            yaw_step=yaw,
            intr=Intrinsics.simple(640, 480),
            **kw,
        )
        clouds = seq.clouds()
        gts = [np.asarray(seq.gt_transform(i)) for i in range(1, frames)]
        guess_kw = (
            {"thetas": seq.thetas()} if "yaw_schedule" in kw else {"rads": yaw}
        )
        totals = {}
        for mode, exact in (("frozen", False), ("exact", True)):
            cfg = dc.replace(
                base, ndt=dc.replace(base.ndt, pcl_exact_line_search=exact)
            )
            s = NDTEdgeBasedRegistration(config=cfg, **guess_kw)
            s.registration(clouds)
            totals[mode] = np.asarray(s.total_transforms)
        d = float(np.abs(totals["frozen"] - totals["exact"]).max())
        err = {
            m: float(
                max(np.abs(totals[m][i] - gts[i]).max() for i in range(len(gts)))
            )
            for m in totals
        }
        row = {
            "scenario": name,
            "delta_pipeline": d,
            "err_frozen": err["frozen"],
            "err_exact": err["exact"],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    log("\n| scenario | pipeline delta(modes) | max err frozen | max err exact |")
    log("|---|---|---|---|")
    for r in rows:
        log(
            f"| {r['scenario']} | {r['delta_pipeline']:.2e} "
            f"| {r['err_frozen']:.2e} | {r['err_exact']:.2e} |"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument(
        "--scenarios",
        default="clean,noise_mild,noise_heavy,partial_overlap,low_texture,combined",
    )
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--pipeline",
        action="store_true",
        help="full-registration delta (frozen vs exact NDT coarse stage "
        "inside the fused chain) instead of standalone pair solves",
    )
    ap.add_argument(
        "--robust",
        action="store_true",
        help="with --pipeline: use robust_config(anchor_mode='map') — "
        "the recommended operating mode on the hard scenarios",
    )
    args = ap.parse_args()
    if args.pipeline:
        return pipeline_delta(args)

    import jax.numpy as jnp

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.config import NDTConfig
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.ops.edges import extract_edge_features
    from rspc_tpu.ops.transform import static_y_guess
    from rspc_tpu.ops.voxel import voxel_downsample
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration.bufferops import _rigid_inverse
    from rspc_tpu.registration.ndt import build_ndt_grid, ndt_align

    ns = north_star_config()
    # Two configs: PCL defaults (the parity contract's subject) and the
    # north-star preset's tuned coarse stage (what the pipeline runs).
    cfgs = {
        "pcl_default": NDTConfig(),
        "north_star": ns.ndt,
    }
    scen = scenarios()
    rows = []
    for name in args.scenarios.split(","):
        kw, _desc = scen[name]
        kw = dict(kw)
        kw.setdefault("yaw_step", -0.08)
        # scheduled (loop) trajectories fix their own frame count
        frames = (
            len(kw["yaw_schedule"]) if "yaw_schedule" in kw else args.frames
        )
        if "seed" in SyntheticSequence.__dataclass_fields__:
            kw.setdefault("seed", args.seed)
        seq = SyntheticSequence(
            n_frames=frames, intr=Intrinsics.simple(640, 480), **kw
        )
        clouds = seq.clouds()
        # pipeline-shaped NDT inputs: RGB-canny edge clouds, voxel-downsampled
        downs = [
            voxel_downsample(
                extract_edge_features(c, ns.edge),
                ns.voxel.leaf_size,
                ns.voxel.max_points,
            )
            for c in clouds
        ]
        yaw = kw.get("yaw_schedule")
        for i in range(1, min(args.pairs + 1, frames)):
            rads = (
                (yaw[i] - yaw[i - 1]) if yaw is not None else kw["yaw_step"]
            )
            # per-pair y-rotation guess, the scheme's own convention
            # (schemes accumulate acc_rads += rads per frame; a single
            # pair's increment is just rads)
            guess = static_y_guess(jnp.float32(rads))
            gt_pair = np.asarray(
                _rigid_inverse(jnp.asarray(seq.gt_transform(i - 1)))
                @ jnp.asarray(seq.gt_transform(i))
            )
            src, tgt = downs[i], downs[i - 1]
            for cfg_name, base in cfgs.items():
                grid = build_ndt_grid(tgt, base)
                out = {}
                for mode, exact in (("frozen", False), ("exact", True)):
                    cfg = dataclasses.replace(
                        base, pcl_exact_line_search=exact
                    )
                    r = ndt_align(src, grid, cfg, init_guess=guess)
                    out[mode] = (
                        np.asarray(r.transform),
                        int(r.iterations),
                        float(r.score),
                    )
                t_f, it_f, s_f = out["frozen"]
                t_e, it_e, s_e = out["exact"]
                row = {
                    "scenario": name,
                    "pair": i,
                    "config": cfg_name,
                    "delta_modes": float(np.abs(t_f - t_e).max()),
                    "err_frozen": float(np.abs(t_f - gt_pair).max()),
                    "err_exact": float(np.abs(t_e - gt_pair).max()),
                    "iters_frozen": it_f,
                    "iters_exact": it_e,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    log("\n| scenario | config | max delta(modes) | max err frozen | max err exact |")
    log("|---|---|---|---|---|")
    keys = sorted({(r["scenario"], r["config"]) for r in rows})
    for s, c in keys:
        sub = [r for r in rows if r["scenario"] == s and r["config"] == c]
        log(
            f"| {s} | {c} | {max(r['delta_modes'] for r in sub):.2e} "
            f"| {max(r['err_frozen'] for r in sub):.2e} "
            f"| {max(r['err_exact'] for r in sub):.2e} |"
        )


if __name__ == "__main__":
    main()
