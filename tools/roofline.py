"""Roofline / utilization accounting for the two hot kernels (VERDICT r1 #4).

Measures, on the real chip, at north-star shapes:

  * the Pallas NN sweep (ops/nn_pallas.py): achieved pair throughput,
    effective HBM bandwidth (the kernel re-reads the target once per
    512-row source tile), and VPU FLOP/s — vs v5e peaks;
  * the NDT Newton evaluation (fixed_value_grad_hess): achieved
    point-neighborhood throughput and the gather traffic that bounds it;
  * the dispatch-vs-device split for a single pairwise align (BASELINE
    workload config 1): wall time of one call vs the amortized per-call
    time of K chained aligns inside ONE jitted program — the difference
    is tunnel/dispatch latency, not device compute.

Peaks used (public TPU v5e numbers): HBM 819 GB/s; MXU 197 TFLOP/s bf16
/ 49 TFLOP/s f32; VPU f32 taken as ~4 TFLOP/s (8 ALUs x 1024 lanes x
~0.94 GHz x 0.5 FMA mix) — the VPU number is an estimate, stated as such.

Kernel timing uses K back-to-back calls inside one jit with data
dependencies (the output of sweep i perturbs the input of sweep i+1), so
per-call time excludes dispatch; `python tools/roofline.py` prints the
table RESULTS.md records.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspc_tpu.utils.profiling import device_sync  # noqa: E402

HBM_PEAK = 819e9          # B/s, TPU v5e
VPU_PEAK_EST = 4e12       # FLOP/s f32, estimate (stated in module docstring)


def log(*a):
    print(*a, flush=True)


_CALL_FLOOR = None


def _call_floor():
    """Measured per-CALL dispatch+readback overhead of this process's
    tunnel session (a trivial one-op chain). The axon tunnel's round
    trip VARIES between sessions — measured 0.1 ms and ~28 ms on the
    same day — so it must be measured, not assumed, and subtracted from
    every chained timing (at k=32 an unsubtracted 28 ms floor inflates
    per-call numbers by ~0.9 ms)."""
    global _CALL_FLOOR
    if _CALL_FLOOR is None:
        import jax
        import jax.numpy as jnp

        x0 = jnp.zeros((8,), jnp.float32)

        @jax.jit
        def trivial(x):
            return x + 1.0

        out = trivial(x0)
        device_sync(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = trivial(x0)
            device_sync(out)
            ts.append(time.perf_counter() - t0)
        _CALL_FLOOR = min(ts)
        log(f"per-call tunnel floor: {_CALL_FLOOR*1e3:.2f} ms (subtracted)")
    return _CALL_FLOOR


def _timed_chain(fn, x0, k=128, reps=3):
    """Per-call device time of fn by chaining k dependent calls in one
    jit; the measured per-call tunnel floor is subtracted."""
    import jax

    @jax.jit
    def chain(x):
        def body(i, x):
            return fn(x)
        return jax.lax.fori_loop(0, k, body, x)

    out = chain(x0)
    device_sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(x0)
        device_sync(out)
        ts.append(time.perf_counter() - t0)
    # floor: never let a degraded-tunnel floor subtract a fast kernel to
    # literal zero (division guards downstream; 1 us/call is below any
    # real dispatch quantum)
    return max(min(ts) - _call_floor(), k * 1e-6) / k


def nn_roofline():
    import jax
    import jax.numpy as jnp

    from rspc_tpu.ops.nn_pallas import SRC_TILE, nearest_neighbors_pallas

    rng = np.random.default_rng(0)
    # north-star regime: ~4k-edge sources against the growing target
    cases = [(4096, 8192), (4096, 40960), (8192, 122880)]
    rows = []
    for n, m in cases:
        src = jnp.asarray(rng.uniform(0, 6, (n, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(0, 6, (m, 3)).astype(np.float32))
        sv = jnp.ones(n, bool)
        tv = jnp.ones(m, bool)

        def step(x):
            d2, idx = nearest_neighbors_pallas(x, sv, tgt, tv)
            # dependency: fold the result back into the source
            return x + 1e-9 * d2[:, None]

        per_call = _timed_chain(step, src)
        pairs = n * m
        # per source tile the kernel streams the full target (16 B/point:
        # 12 B xyz + 4 B penalty) through VMEM from HBM
        n_tiles = (n + SRC_TILE - 1) // SRC_TILE
        bytes_moved = n_tiles * m * 16.0
        # VPU work per pair: 3 FMA (cross) + 1 add (norm+pen fold) +
        # compare + 2 selects ~= 10 ops
        flops = pairs * 10.0
        rows.append(
            {
                "kernel": f"pallas NN {n}x{m}",
                "per_call_ms": per_call * 1e3,
                "Gpairs/s": pairs / per_call / 1e9,
                "eff_GB/s": bytes_moved / per_call / 1e9,
                "hbm_util": bytes_moved / per_call / HBM_PEAK,
                "est_VPU_util": flops / per_call / VPU_PEAK_EST,
            }
        )
    return rows


def ndt_roofline():
    import jax
    import jax.numpy as jnp

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration.ndt import _make_objective, build_ndt_grid

    cfg = north_star_config().ndt
    rng = np.random.default_rng(1)
    m = 40960
    tgt = Cloud.from_numpy(rng.uniform(0, 6, (m, 3)).astype(np.float32))
    grid = build_ndt_grid(tgt, cfg)
    n = 4096
    src = Cloud.from_numpy(rng.uniform(0, 6, (n, 3)).astype(np.float32))
    _, lookup, _, _, fvgh = _make_objective(src, grid, cfg)
    k = {27: 27, 7: 7, 1: 1}[cfg.neighborhood]
    p0 = jnp.zeros(6, jnp.float32)
    mu, ic, mask = jax.jit(lookup)(p0)
    device_sync(mask)

    def step(p):
        f, g, h = fvgh(p, mu, ic, mask)
        return p + 1e-12 * g

    per_call = _timed_chain(step, p0)
    nk = n * k
    # per (point, neighbor): quadratic form + exp + grad/hess einsum
    # chains ~= 120 f32 ops; operands mu/ic/mask ~= 52 B (streamed from
    # HBM once per evaluation)
    flops = nk * 120.0
    bytes_moved = nk * 52.0
    lookup_call = _timed_chain(
        lambda p: p + 1e-12 * jax.tree.leaves(lookup(p))[0][0, 0, 0],
        p0,
    )

    # whole Newton evaluation (lookup + fvgh), gather path vs the
    # gather-free dense compact-cell sweep (NDTConfig.sweep_cells) —
    # the VERDICT r2 #4 item: the dense path removes the
    # latency-bound per-iteration row gather entirely
    import dataclasses

    def newton_rows():
        out = []
        for name, c in (
            ("gather", cfg),
            ("dense sweep", dataclasses.replace(cfg, sweep_cells=512)),
        ):
            _, lk, _, _, fv = _make_objective(src, grid, c)

            def step(p):
                mu_, ic_, mask_ = lk(p)
                f, g, h = fv(p, mu_, ic_, mask_)
                return p + 1e-12 * g

            t = _timed_chain(step, p0)
            out.append(
                {
                    "kernel": f"NDT newton eval ({name}) n={n} k={k}",
                    "per_call_ms": t * 1e3,
                    "Gpairs/s": nk / t / 1e9,
                    "eff_GB/s": bytes_moved / t / 1e9,
                    "hbm_util": bytes_moved / t / HBM_PEAK,
                    "est_VPU_util": flops / t / VPU_PEAK_EST,
                }
            )
        return out

    return [
        {
            "kernel": f"NDT fvgh n={n} k={k}",
            "per_call_ms": per_call * 1e3,
            "Gpairs/s": nk / per_call / 1e9,
            "eff_GB/s": bytes_moved / per_call / 1e9,
            "hbm_util": bytes_moved / per_call / HBM_PEAK,
            "est_VPU_util": flops / per_call / VPU_PEAK_EST,
        },
        {
            "kernel": f"NDT lookup (gathers) n={n} k={k}",
            "per_call_ms": lookup_call * 1e3,
            "Gpairs/s": nk / lookup_call / 1e9,
            "eff_GB/s": nk * 52.0 / lookup_call / 1e9,
            "hbm_util": nk * 52.0 / lookup_call / HBM_PEAK,
            "est_VPU_util": float("nan"),
        },
    ] + newton_rows()


def dispatch_split():
    """Workload config 1: single-call wall vs amortized device time."""
    import jax
    import jax.numpy as jnp

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.config import ICPConfig
    from rspc_tpu.ops.transform import static_y_guess
    from rspc_tpu.registration.icp import icp_align

    rng = np.random.default_rng(2)
    n = 10240
    pts = rng.uniform(0, 6, (n, 3)).astype(np.float32)
    ry = -0.08
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    src = Cloud.from_numpy(pts @ rot.T + np.float32([0.01, 0, -0.01]))
    tgt = Cloud.from_numpy(pts)
    cfg = ICPConfig()
    guess = static_y_guess(jnp.float32(ry))

    # single-call wall (includes one tunnel dispatch round trip)
    r = icp_align(src, tgt, cfg, guess)
    device_sync(r.transform)
    singles = []
    for _ in range(6):
        t0 = time.perf_counter()
        r = icp_align(src, tgt, cfg, guess)
        device_sync(r.transform)
        singles.append(time.perf_counter() - t0)
    single = min(singles)

    # amortized per-align: K dependent aligns inside one jit
    k = 16

    @jax.jit
    def chain(g):
        def body(i, g):
            res = icp_align(src, tgt, cfg, g)
            return res.transform
        return jax.lax.fori_loop(0, k, body, g)

    out = chain(guess)
    device_sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(guess)
        device_sync(out)
        ts.append(time.perf_counter() - t0)
    per = min(ts) / k
    return {
        "single_call_ms": single * 1e3,
        "amortized_device_ms": per * 1e3,
        "dispatch_overhead_ms": (single - per) * 1e3,
    }


def _print_rows(rows):
    for r in rows:
        log(
            f"{r['kernel']:<28} {r['per_call_ms']:<9.3f} "
            f"{r['Gpairs/s']:<9.2f} {r['eff_GB/s']:<8.1f} "
            f"{100*r['hbm_util']:<7.1f} "
            + (
                f"{100*r['est_VPU_util']:.1f}"
                if np.isfinite(r["est_VPU_util"])
                else "-"
            )
        )


def main():
    import jax

    log(f"platform: {jax.devices()[0]}")
    log(
        f"{'kernel':<28} {'ms/call':<9} {'Gpair/s':<9} {'GB/s':<8} "
        f"{'HBM%':<7} {'~VPU%'}"
    )
    _print_rows(nn_roofline())
    _print_rows(ndt_roofline())
    d = dispatch_split()
    log(
        f"\nconfig-1 pairwise align: single call {d['single_call_ms']:.1f} ms"
        f" = device {d['amortized_device_ms']:.1f} ms"
        f" + dispatch {d['dispatch_overhead_ms']:.1f} ms (tunnel round trip)"
    )


if __name__ == "__main__":
    main()
