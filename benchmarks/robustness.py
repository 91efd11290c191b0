"""Robustness matrix: registration accuracy across adversarial scenes.

Round 1's accuracy evidence came from one friendly scene (high texture,
noise-free, full overlap). This sweep (VERDICT r1 #5) measures the three
registration schemes across depth noise, partial overlap, and low
texture, using the synthetic generator's robustness knobs
(capture/synthetic.py: DepthNoise, texture_contrast, translation_step).

Usage:  python benchmarks/robustness.py [scenario ...]
Emits one JSON line per (scenario, scheme) cell on stdout and a summary
markdown table on stderr; RESULTS.md carries the recorded TPU matrix.
The reference's robustness evidence is 12 qualitative screenshots
(/root/reference/README.md:4-11, doc/img/) — this replaces it with
curves."""

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


def scenarios():
    from rspc_tpu.capture.synthetic import DepthNoise

    mild = DepthNoise(lateral_px=0.5, dropout=0.02)
    heavy = DepthNoise(axial_a=0.002, axial_b=0.004, lateral_px=1.0, dropout=0.10)
    return {
        # name: (kwargs for SyntheticSequence, human description)
        "clean": ({}, "round-1 scene: no noise, full texture, pure yaw"),
        "noise_mild": (
            {"noise": mild},
            "axial 1mm+1.9mm/m^2, lateral 0.5px, 2% dropout",
        ),
        "noise_heavy": (
            {"noise": heavy},
            "axial 2mm+4mm/m^2, lateral 1px, 10% dropout",
        ),
        "partial_overlap": (
            {"yaw_step": -0.25, "translation_step": (0.12, 0.0, 0.08)},
            "14.3 deg/frame yaw + 14 cm/frame translation",
        ),
        "low_texture": (
            {"texture_contrast": 0.15},
            "texture contrast scaled to 15%",
        ),
        "combined": (
            {
                "noise": mild,
                "yaw_step": -0.25,
                "translation_step": (0.10, 0.0, 0.06),
                "texture_contrast": 0.3,
            },
            "mild noise + partial overlap + 30% texture",
        ),
        # Out-and-back sweep: frames 6-9 RE-OBSERVE the views of frames
        # 4-1 — genuine loop-closure structure. Guesses come from the
        # (synthetic) IMU exactly as the reference's IMU path would; the
        # graph column adds the equal-yaw closure pairs as skip
        # constraints. This is the trajectory shape the r2 analysis said
        # the pose graph needs to pay off (RESULTS.md: 'would pay off
        # given loop closures ... a trajectory shape the capture
        # contract never produces').
        "loop_return": (
            {
                "noise": heavy,
                "yaw_schedule": tuple(
                    -0.15 * y for y in (0, 1, 2, 3, 4, 5, 4, 3, 2, 1)
                ),
            },
            "heavy noise, out-and-back yaw sweep (loop closures)",
        ),
        # Drifting loop: out-and-back yaw AND translation under the
        # combined scenario's drift conditions (mild noise, 30% texture)
        # — per-pair drift accumulates on the way out, the return leg
        # re-observes the start. The trajectory where redundant closure
        # constraints genuinely carry information the chain lacks.
        "loop_drift": (
            {
                "noise": mild,
                "texture_contrast": 0.3,
                "yaw_schedule": tuple(
                    -0.2 * y for y in (0, 1, 2, 3, 4, 5, 4, 3, 2, 1)
                ),
                "translation_schedule": tuple(
                    (0.09 * y, 0.0, 0.05 * y)
                    for y in (0, 1, 2, 3, 4, 5, 4, 3, 2, 1)
                ),
            },
            "mild noise + 30% texture, out-and-back yaw+translation",
        ),
    }


def main():
    import jax

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.presets import north_star_config, robust_config
    from rspc_tpu.registration.schemes import (
        ICPEdgeBasedRegistration,
        IncrementalICP,
        NDTEdgeBasedRegistration,
    )

    args = sys.argv[1:]
    only_schemes = None
    seed = 0
    for a in list(args):
        if a.startswith("--schemes="):
            only_schemes = set(a.split("=", 1)[1].split(","))
            args.remove(a)
        elif a.startswith("--seed="):
            # per-frame noise draws derive from seed*1000+frame
            # (capture/synthetic.py) — a different seed redraws every
            # noise/dropout realization on the same trajectory
            seed = int(a.split("=", 1)[1])
            args.remove(a)
    which = set(args) or set(scenarios())
    n_frames = 10
    config = north_star_config()
    rows = []

    for name, (kw, desc) in scenarios().items():
        if name not in which:
            continue
        yaw = kw.get("yaw_step", -0.08)
        kw = {k: v for k, v in kw.items() if k != "yaw_step"}
        seq = SyntheticSequence(
            n_frames=n_frames,
            yaw_step=yaw,
            seed=seed,
            intr=Intrinsics.simple(640, 480),
            **kw,
        )
        clouds = seq.clouds()
        device_sync(clouds[-1].xyz)
        gts = [seq.gt_transform(i) for i in range(1, n_frames)]

        # Scheduled (non-linear) trajectories feed the schemes their
        # IMU-derived thetas — the reference's own guess path for real
        # motion; the static accumulated-rads guess models a constant
        # turntable and is simply wrong on e.g. an out-and-back sweep.
        if "yaw_schedule" in kw:
            guess_kw = {"thetas": seq.thetas()}
            # closure skip offsets: frame pairs that re-observe the same
            # yaw (plus the default short skips)
            yaws = kw["yaw_schedule"]
            closure = {
                j - i
                for i in range(n_frames)
                for j in range(i + 1, n_frames)
                if abs(yaws[i] - yaws[j]) < 1e-9
            }
            graph_skips = tuple(sorted({1, 2, 3} | closure))
        else:
            guess_kw = {"rads": yaw}
            graph_skips = None

        def err_of(totals, gts_n):
            t = np.asarray(totals)
            errs = [np.abs(t[i] - gts_n[i]).max() for i in range(len(gts_n))]
            return float(np.max(errs)), float(np.mean(errs))

        all_schemes = (
            "ndt_edge",
            "ndt_edge_warm",
            "ndt_edge_rescue",
            "ndt_edge_map",
            "ndt_edge_color",
            "ndt_edge_graph",
            "ndt_edge_auto",
            "icp_edge",
            "incremental",
        )
        for scheme_name in all_schemes:
            if only_schemes is not None and scheme_name not in only_schemes:
                continue
            t0 = time.time()
            try:
                if scheme_name == "ndt_edge":
                    s = NDTEdgeBasedRegistration(config=config, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "ndt_edge_map":
                    # progressive map anchoring (anchor_mode="map"):
                    # sequential local-map refinement with correction
                    # carry-over — the structural fix for trajectories
                    # that rotate away from frame 0
                    cfg_m = robust_config(anchor_mode="map")
                    s = NDTEdgeBasedRegistration(config=cfg_m, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "ndt_edge_color":
                    # map anchoring + the colored-ICP residual in the
                    # FINE chain stage (icp.color_weight +
                    # edge.carry_cgrad; anchor-stage color is a separate,
                    # not-enabled variant — see RESULTS.md): in-plane
                    # observability from texture
                    # where the geometric plane residual is blind (the
                    # 'combined' drift wall — fine-cap edge inliers
                    # collapse and p2l refuses to move along the wall)
                    cfg_c = robust_config(anchor_mode="map", color=True)
                    s = NDTEdgeBasedRegistration(config=cfg_c, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "ndt_edge_rescue":
                    # warm start + gated wide-cap rescue: the warm start
                    # fixes the systematic guess drift, the rescue pulls
                    # pairs out of coarse-stage local optima (inlier
                    # fraction collapse at the fine cap fires a 10 cm
                    # p2p re-solve, never-worsen guarded)
                    cfg_r = robust_config()
                    s = NDTEdgeBasedRegistration(config=cfg_r, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "ndt_edge_graph":
                    # the full stack + pose-graph relaxation: redundant
                    # skip-pair constraints average per-pair noise
                    # instead of integrating it (the measured 'combined'
                    # failure shape)
                    cfg_g = robust_config(anchor_mode="map", pose_graph=True)
                    if graph_skips is not None:
                        import dataclasses

                        cfg_g = dataclasses.replace(
                            cfg_g,
                            refine=dataclasses.replace(
                                cfg_g.refine, pose_graph_skips=graph_skips
                            ),
                        )
                    s = NDTEdgeBasedRegistration(config=cfg_g, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "ndt_edge_auto":
                    # trajectory-adaptive selection (registration/auto.py):
                    # measures a simplest-first candidate ladder on THIS
                    # trajectory with a ground-truth-free consistency
                    # score and keeps the simplest candidate that wins —
                    # the single default a user with an unknown
                    # trajectory should call
                    from rspc_tpu.registration.auto import auto_register

                    ar = auto_register(clouds, **guess_kw)
                    s = ar.scheme
                    r = ar.global_cloud
                    auto_selected = ar.selected
                    auto_escalated = bool(ar.escalated)
                    auto_scores = {
                        k: [round(x, 8) for x in v]
                        for k, v in ar.scores.items()
                    }
                elif scheme_name == "ndt_edge_warm":
                    # coarse_warm_start carries the previous pair's
                    # correction onto the next static guess — built for
                    # exactly the partial-overlap failure mode (the
                    # turntable guess ignores accumulated translation);
                    # warm-only keeps the dense NDT source too so the
                    # column isolates the rescue/map deltas
                    import dataclasses

                    cfg_w = dataclasses.replace(
                        robust_config(), rescue_inlier_frac=0.0
                    )
                    s = NDTEdgeBasedRegistration(config=cfg_w, **guess_kw)
                    r = s.registration(clouds)
                elif scheme_name == "icp_edge":
                    s = ICPEdgeBasedRegistration(config=config, **guess_kw)
                    r = s.registration(clouds)
                else:
                    import dataclasses

                    cfg5 = dataclasses.replace(
                        config,
                        icp=dataclasses.replace(
                            config.icp, compute_fitness=False
                        ),
                    )
                    # 6 frames like BASELINE workload 5 (the 10-frame
                    # target capacity exceeds the Pallas kernel's VMEM
                    # budget and would take the slower XLA fallback)
                    flat = [
                        Cloud(
                            c.xyz.reshape(-1, 3),
                            c.rgb.reshape(-1, 3),
                            c.valid.reshape(-1),
                        )
                        for c in clouds[:6]
                    ]
                    s = IncrementalICP(cfg5)
                    r = s.registration(flat)
                device_sync(r.xyz)
            except Exception as e:  # record the cell, keep sweeping
                log(f"{name:16s} {scheme_name:12s} FAILED: {e}")
                rows.append(
                    {
                        "scenario": name,
                        "scheme": scheme_name,
                        "error": str(e)[:200],
                    }
                )
                continue
            wall = time.time() - t0

            if scheme_name == "incremental":
                # per-step transforms are already absolute (aligned
                # against the accumulated frame-0 target)
                totals = [np.asarray(res.transform) for res in s.results]
                max_err, mean_err = err_of(np.stack(totals), gts[:5])
                conv = [bool(res.converged) for res in s.results]
            else:
                max_err, mean_err = err_of(s.total_transforms, gts)
                conv = [bool(f.converged) for _, f in s.results]

            row = {
                "scenario": name,
                "scheme": scheme_name,
                "seed": seed,
                "max_err": max_err,
                "mean_err": mean_err,
                "converged": int(sum(conv)),
                "pairs": len(conv),
                "global_points": int(np.asarray(r.valid).sum()),
                "wall_s": round(wall, 3),
            }
            if scheme_name == "ndt_edge_auto":
                row["selected"] = auto_selected
                row["escalated"] = auto_escalated
                row["scores"] = auto_scores
            rows.append(row)
            print(json.dumps(row), flush=True)
            log(
                f"{name:16s} {scheme_name:12s} max_err={max_err:.2e} "
                f"mean={mean_err:.2e} conv={sum(conv)}/{len(conv)} "
                f"wall={wall:.2f}s"
                + (
                    f" selected={auto_selected}"
                    if scheme_name == "ndt_edge_auto"
                    else ""
                )
            )

    log("\n| scenario | scheme | max err | mean err | converged |")
    log("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            log(f"| {r['scenario']} | {r['scheme']} | FAILED | | |")
            continue
        log(
            f"| {r['scenario']} | {r['scheme']} | {r['max_err']:.2e} "
            f"| {r['mean_err']:.2e} | {r['converged']}/{r['pairs']} |"
        )


if __name__ == "__main__":
    main()
