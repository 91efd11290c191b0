#!/usr/bin/env python
"""Per-program XLA compile budget for the north-star pipeline.

VERDICT r3 #1: warmup-incl-compile grew 7 s (r1) -> 38 s (r2) -> 364 s
(r3) while the steady-state metric improved; this tool attributes the
cold-compile cost to individual jitted programs so regressions are
diagnosable. It times jit trace (.lower()) and XLA compile (.compile())
separately for the full fused program and for each sub-program it
contains, using abstract ShapeDtypeStruct inputs (no device data needed
beyond the backend's compiler).

Usage:
    python tools/compile_budget.py [--backend tpu|cpu] [--no-cache]
    python tools/compile_budget.py --only chain,anchor

With --no-cache (default: cache DISABLED here) the numbers are true
cold-compile costs; the persistent cache would otherwise hide them.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, help="jax platform override")
    ap.add_argument("--cache", action="store_true", help="leave the persistent cache on")
    ap.add_argument("--only", default="", help="comma-separated subset of program names")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--hw", default="480x640")
    args = ap.parse_args()

    if not args.cache:
        os.environ["RSPC_NO_CACHE"] = "1"
    if args.backend:
        os.environ["JAX_PLATFORMS"] = args.backend

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration import chainscan as CS
    from rspc_tpu.registration.anchor import _anchor_refine
    from rspc_tpu.registration.schemes import _assemble_global

    n = args.frames
    h, w = (int(x) for x in args.hw.split("x"))
    cfg = north_star_config()
    r = cfg.refine

    f32 = jnp.float32
    S = jax.ShapeDtypeStruct
    stacked = OrganizedCloud(
        xyz=S((n, h, w, 3), f32),
        rgb=S((n, h, w, 3), f32),
        valid=S((n, h, w), jnp.bool_),
    )
    guesses = S((n - 1, 4, 4), f32)

    # Shapes of phase-1 outputs (cheap: abstract eval only)
    feats, full = jax.eval_shape(
        lambda st, g: CS._phase1_prepare(
            st, cfg.edge, r.leaf_size, r.max_points, r.enabled, r.decimate,
            r.normal_purity, r.color,
        ),
        stacked, guesses,
    )
    totals_shape = S((n - 1, 4, 4), f32)

    def time_one(name, jitted, *a, **kw):
        t0 = time.time()
        lowered = jitted.lower(*a, **kw)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        hlo_kb = len(lowered.as_text()) / 1024.0
        rows.append((name, t_lower, t_compile, hlo_kb))
        log(
            f"{name:28s} trace {t_lower:7.2f}s  compile {t_compile:8.2f}s"
            f"  stablehlo {hlo_kb:9.0f} kB"
        )

    rows = []
    only = set(x for x in args.only.split(",") if x)

    def want(name):
        return not only or name in only

    log(f"backend: {jax.default_backend()}, {n} frames {h}x{w}")

    if want("fused"):
        time_one(
            "registration_fused (ALL)", CS._registration_fused,
            stacked, guesses, cfg.edge, True, cfg.ndt, cfg.icp, r,
            cfg.voxel.leaf_size, cfg.voxel.max_points, cfg.coarse_guard_cap,
            cfg.coarse_warm_start, cfg.rescue_inlier_frac, cfg.rescue_cap,
            cfg.rescue_iterations,
        )
    if want("phase1"):
        time_one(
            "phase1_prepare", CS._phase1_prepare,
            stacked, cfg.edge, r.leaf_size, r.max_points, r.enabled,
            r.decimate, r.normal_purity, r.color,
        )
    if want("chain"):
        time_one(
            "chain_scan", CS._chain_scan,
            feats, None, guesses, True, cfg.ndt, cfg.icp, r.stages,
            cfg.voxel.leaf_size, cfg.voxel.max_points,
            cfg.voxel.max_points * n, r.max_points * n,
            cfg.coarse_guard_cap, r.accept_margin, cfg.coarse_warm_start,
            cfg.rescue_inlier_frac, cfg.rescue_cap, cfg.rescue_iterations,
        )
    if want("anchor"):
        first = jax.tree.map(lambda x: S(x.shape[1:], x.dtype), full)
        restf = jax.tree.map(lambda x: S((n - 1,) + x.shape[1:], x.dtype), full)
        time_one(
            "anchor_refine", _anchor_refine,
            first, restf, totals_shape, r.anchor_stages, 1.0,
            r.gate_radius, r.gate_inlier_keep, r.gate_rmse_blowup,
            max_points=r.anchor_max_points,
        )
    if want("assemble"):
        originals = [
            jax.eval_shape(
                lambda: __import__("rspc_tpu.cloud", fromlist=["Cloud"]).Cloud(
                    xyz=jnp.zeros((h * w, 3), f32),
                    rgb=jnp.zeros((h * w, 3), f32),
                    valid=jnp.zeros((h * w,), jnp.bool_),
                )
            )
            for _ in range(n)
        ]
        time_one(
            "assemble_global", _assemble_global,
            originals, totals_shape, S((n - 1,), jnp.bool_),
        )

    log("-" * 64)
    tot = sum(x[2] for x in rows)
    log(f"sum of component compiles: {tot:.1f}s")
    import json

    print(json.dumps([
        {"program": a, "trace_s": round(b, 2), "compile_s": round(c, 2),
         "stablehlo_kb": round(d)} for a, b, c, d in rows
    ]))


if __name__ == "__main__":
    main()
