#!/usr/bin/env python
"""Attribute optimized-HLO bytes of the fused north-star program to
source locations.

VERDICT r3 #1 follow-up: the persistent compile cache hits, but loading
the ~28 MB `_registration_fused` executable through the axon tunnel
costs ~37 s (~1.3 s/MB) — executable SIZE is now the cold/warm-start
lever. XLA keeps `metadata={op_name=... source_file=... source_line=}`
on every optimized-HLO op, so the compiled module text attributes its
own bytes: this tool histograms them by source file (and by enclosing
computation) to show which Python constructs own the bytes.

Usage:
    python tools/hlo_attribution.py [--backend cpu] [--by-computation]
    python tools/hlo_attribution.py --top 40
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--by-computation", action="store_true")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--hw", default="480x640")
    args = ap.parse_args()

    os.environ["RSPC_NO_CACHE"] = "1"  # attribution wants a fresh compile

    import jax

    if args.backend:
        # env JAX_PLATFORMS does NOT stick here — the axon sitecustomize
        # imports jax at interpreter startup; only the config update
        # before first backend use works (see tests/conftest.py)
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp

    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration import chainscan as CS

    n = args.frames
    h, w = (int(x) for x in args.hw.split("x"))
    cfg = north_star_config()
    r = cfg.refine
    S = jax.ShapeDtypeStruct
    stacked = OrganizedCloud(
        xyz=S((n, h, w, 3), jnp.float32),
        rgb=S((n, h, w, 3), jnp.float32),
        valid=S((n, h, w), jnp.bool_),
    )
    guesses = S((n - 1, 4, 4), jnp.float32)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    lowered = CS._registration_fused.lower(
        stacked, guesses, cfg.edge, True, cfg.ndt, cfg.icp, r,
        cfg.voxel.leaf_size, cfg.voxel.max_points, cfg.coarse_guard_cap,
        cfg.coarse_warm_start, cfg.rescue_inlier_frac, cfg.rescue_cap,
        cfg.rescue_iterations,
    )
    if args.stablehlo:
        # pre-optimization StableHLO with mlir loc() attribution — the
        # optimized-HLO text drops op metadata on some backends, but the
        # lowered module always carries source locs and its byte
        # distribution tracks what Python constructs emit how much IR
        txt = lowered.as_text(debug_info=True)
    else:
        compiled = lowered.compile()
        txt = compiled.as_text()
    print(f"module text: {len(txt)/1e6:.1f} MB", file=sys.stderr)

    src_re = re.compile(r'source_file="([^"]+)"(?:.*?source_line=(\d+))?')
    comp_re = re.compile(r"^(?:ENTRY )?%?([\w.\-]+) \([\w]")

    by_src = defaultdict(int)
    by_srcline = defaultdict(int)
    by_comp = defaultdict(int)
    comp = "?"
    for line in txt.splitlines():
        nb = len(line) + 1
        stripped = line.strip()
        if not stripped.startswith("%") and (
            stripped.startswith("ENTRY") or comp_re.match(stripped)
        ) and stripped.endswith("{"):
            m = comp_re.match(stripped)
            if m:
                comp = m.group(1)
        by_comp[comp] += nb
        m = src_re.search(line)
        if m:
            f = m.group(1)
            f = f.split("rspc_tpu/")[-1] if "rspc_tpu/" in f else os.path.basename(f)
            by_src[f] += nb
            if m.group(2):
                by_srcline[f"{f}:{m.group(2)}"] += nb
        else:
            by_src["(no source metadata)"] += nb

    def dump(title, d, top):
        print(f"\n== {title} ==")
        tot = sum(d.values())
        for k, v in sorted(d.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{v/1e6:8.2f} MB  {100*v/tot:5.1f}%  {k}")
        print(f"{tot/1e6:8.2f} MB  total")

    dump("bytes by source file", by_src, args.top)
    dump("bytes by source line (top)", by_srcline, args.top)
    if args.by_computation:
        dump("bytes by HLO computation", by_comp, args.top)


if __name__ == "__main__":
    main()
