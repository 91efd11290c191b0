"""Pallas TPU kernel for the nearest-neighbor sweep.

The XLA path (ops/nn.py) materializes an [N, chunk] score tile in HBM per
scan step — at production sizes the sweep is HBM-bandwidth-bound. This
kernel keeps everything in VMEM: each grid step holds one source tile
resident, streams the whole target through VMEM in lane-aligned chunks,
computes the argmin score via one MXU matmul per chunk
(``||t||^2 - 2 s.t``; the ``||s||^2`` term cannot change the argmin), and
carries the running (best score, best index) in registers. HBM traffic
drops from O(N*M) score elements to reading the target once per source
tile.

Same contract and the same recentring/exact-rescore strategy as
ops/nn.py (see its docstring for the f32 cancellation analysis); the
winner re-score stays in XLA where it is a trivial fused gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: source tile resident per grid step; target streamed in
# lane-aligned chunks. [SRC_TILE, TGT_CHUNK] f32 score tile = 2 MB VMEM.
SRC_TILE = 512
TGT_CHUNK = 1024
# HBM-streaming variant: compute chunks per emit_pipeline block
# (super-block = 256 KB) and its (halved) source tile — the streaming
# kernel's scoped-vmem stack must fit the 16 MB limit even inside a
# fused while_loop; see _nn_kernel_hbm and the wrapper.
HBM_SUPER = 16
HBM_SRC_TILE = 256

# Above this target size the VMEM-resident target layout exceeds the
# compiler's scoped-vmem budget (measured cliff: 1.84M points compiles,
# 3.07M OOMs with "scoped allocation 16.29M > 16.00M limit");
# nearest_neighbors_pallas switches to the HBM-streaming kernel
# (_nn_kernel_hbm) past it. Below it the resident layout wins: the
# target is read from HBM once TOTAL instead of once per source tile
# (1.84M resident measured healthy — workload 5's target).
MAX_VMEM_TARGET = 2_500_000


def _nn_kernel(nchunks_ref, src_ref, tgt_ref, pen_ref, score_ref, idx_ref):
    """Grid dim 0 walks source tiles.

    nchunks_ref: scalar-prefetch i32[1] — number of target chunks that
                 contain live points; padded tail chunks are skipped
                 (their penalty is +big, so skipping cannot change the
                 argmin). Registration targets are prefix-dense
                 fixed-capacity buffers, so early frames sweep a fraction
                 of the capacity.
    src_ref:   [SRC_TILE, 3]  source tile (VMEM)
    tgt_ref:   [3, M]         full target, transposed for lane-major access
    pen_ref:   [1, M]         0 for valid target, +big for invalid/padded
    score_ref: [SRC_TILE, 1]  best score out
    idx_ref:   [SRC_TILE, 1]  best index out
    """
    src = src_ref[:]  # [TS, 3]
    num_chunks = nchunks_ref[0]

    s0 = src[:, 0:1]  # [TS,1] per-dim source lanes, broadcast against
    s1 = src[:, 1:2]  # target rows below
    s2 = src[:, 2:3]

    def body(c, carry):
        best_v, best_c = carry  # [TS, TT] per-LANE running best
        base = c * TGT_CHUNK
        t = tgt_ref[:, pl.ds(base, TGT_CHUNK)]        # [3, TT]
        pen = pen_ref[0, pl.ds(base, TGT_CHUNK)]      # [TT]
        norm2 = jnp.sum(t * t, axis=0)                # [TT]
        # VPU broadcast FMAs instead of a [TS,3]x[3,TT] matmul: a K=3
        # contraction uses 3/128 of the MXU's depth, and the f32 HIGHEST
        # pass decomposition makes it slower still. (bf16 MXU is not an
        # option: truncation flips argmin winners at mm separations, same
        # analysis as ops/nn.py.)
        cross = s0 * t[0][None, :] + s1 * t[1][None, :] + s2 * t[2][None, :]
        score = (norm2 + pen)[None, :] - 2.0 * cross  # [TS, TT]
        # Elementwise-only chunk update: the per-chunk min/argmin lane
        # reductions were the kernel's real bottleneck (a cross-lane
        # reduction per chunk per tile); tracking the best score *per
        # lane* plus the chunk it came from defers the only cross-lane
        # reduction to once per source tile.
        upd = score < best_v
        return (
            jnp.where(upd, score, best_v),
            jnp.where(upd, c, best_c),
        )

    init = (
        jnp.full((SRC_TILE, TGT_CHUNK), jnp.inf, jnp.float32),
        jnp.zeros((SRC_TILE, TGT_CHUNK), jnp.int32),
    )
    best_v, best_c = jax.lax.fori_loop(0, num_chunks, body, init)

    cs = jnp.min(best_v, axis=1)                      # [TS]
    lane = jnp.argmin(best_v, axis=1).astype(jnp.int32)
    # winner's chunk id via one-hot sum (lane-dynamic gather is not a
    # native VPU op; a masked sum is)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SRC_TILE, TGT_CHUNK), 1)
    chunk = jnp.sum(
        jnp.where(lanes == lane[:, None], best_c, 0), axis=1
    )
    score_ref[:] = cs[:, None]
    idx_ref[:] = (chunk * TGT_CHUNK + lane)[:, None]


def _nn_kernel_hbm(
    nchunks_ref, src_ref, tgt4_hbm, score_ref, idx_ref, *, interpret=False
):
    """HBM-streaming variant: the target stays in HBM (memory_space=ANY)
    and is double-buffered through a small VMEM scratch — for targets
    too large for the VMEM-resident layout (MAX_VMEM_TARGET, e.g. the
    incremental chain's multi-million-point accumulated cloud).

    The caller packs xyz + the validity penalty as tgt4 = f32[4, M]
    (row 3 = penalty): the sublane dimension is 4-aligned — Mosaic
    rejects a [3, chunk] DMA slice ("slice shape along dimension 0 must
    be aligned to tiling (4)").

    The target streams through an inner ``emit_pipeline`` in SUPER-blocks
    of HBM_SUPER compute chunks (256 KB at 16 x 1024 lanes): the
    pipeline owns the revolving VMEM buffers and overlaps each block's
    DMA with the previous block's chunk loop; the running per-lane best
    lives in VMEM scratch across pipeline steps. Compute per chunk
    matches _nn_kernel exactly. Measured (forced-readback timing,
    tools/roofline.py discipline): 169 ms for 8192 x 3.07M — ~149
    Gpair/s, the same pair throughput as the VMEM-resident kernel at its
    largest workable shape, and 2.4x the XLA sweep's 409 ms at this
    size.

    ``interpret=True`` (CPU tests) swaps emit_pipeline — which requires
    real TPU device info — for a direct read of the HBM ref in a plain
    fori_loop; same math, no pipelining."""
    src = src_ref[:]
    ts = src.shape[0]  # HBM_SRC_TILE (static from the block spec)
    num_chunks = nchunks_ref[0]
    num_super = (num_chunks + HBM_SUPER - 1) // HBM_SUPER
    s0 = src[:, 0:1]
    s1 = src[:, 1:2]
    s2 = src[:, 2:3]

    def _sweep_super(sblk, get_chunk, bv, bc):
        # inner fori (NOT a static unroll: 16 unrolled [SRC_TILE,
        # TGT_CHUNK] score temporaries blew the 16M scoped-vmem stack —
        # measured 25.08M); the tail super-block sweeps its padding too
        # (penalty row is +big there, so the argmin is unaffected)
        def chunk_body(k, carry):
            bv, bc = carry
            t = get_chunk(k)  # [4, TT]
            norm2 = t[0] * t[0] + t[1] * t[1] + t[2] * t[2]
            cross = (
                s0 * t[0][None, :]
                + s1 * t[1][None, :]
                + s2 * t[2][None, :]
            )
            score = (norm2 + t[3])[None, :] - 2.0 * cross
            upd = score < bv
            return (
                jnp.where(upd, score, bv),
                jnp.where(upd, sblk * HBM_SUPER + k, bc),
            )

        return jax.lax.fori_loop(0, HBM_SUPER, chunk_body, (bv, bc))

    def scoped(best_v, best_c):
        best_v[:] = jnp.full((ts, TGT_CHUNK), jnp.inf, jnp.float32)
        best_c[:] = jnp.zeros((ts, TGT_CHUNK), jnp.int32)

        if interpret:
            sw = HBM_SUPER * TGT_CHUNK

            def body(sblk, carry):
                get = lambda k: tgt4_hbm[
                    :, pl.ds(sblk * sw + k * TGT_CHUNK, TGT_CHUNK)
                ]
                return _sweep_super(sblk, get, *carry)

            bv0 = jnp.full((ts, TGT_CHUNK), jnp.inf, jnp.float32)
            bc0 = jnp.zeros((ts, TGT_CHUNK), jnp.int32)
            bv, bc = jax.lax.fori_loop(0, num_super, body, (bv0, bc0))
            best_v[:] = bv
            best_c[:] = bc
        else:
            def super_kernel(t_ref):
                sblk = pl.program_id(0)
                get = lambda k: t_ref[:, pl.ds(k * TGT_CHUNK, TGT_CHUNK)]
                bv, bc = _sweep_super(sblk, get, best_v[:], best_c[:])
                best_v[:] = bv
                best_c[:] = bc

            pltpu.emit_pipeline(
                super_kernel,
                grid=(num_super,),
                in_specs=[
                    pl.BlockSpec(
                        (4, HBM_SUPER * TGT_CHUNK), lambda s: (0, s)
                    )
                ],
            )(tgt4_hbm)

        bv = best_v[:]
        bc = best_c[:]
        cs = jnp.min(bv, axis=1)
        lane = jnp.argmin(bv, axis=1).astype(jnp.int32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (ts, TGT_CHUNK), 1)
        chunk = jnp.sum(jnp.where(lanes == lane[:, None], bc, 0), axis=1)
        score_ref[:] = cs[:, None]
        idx_ref[:] = (chunk * TGT_CHUNK + lane)[:, None]

    pl.run_scoped(
        scoped,
        best_v=pltpu.VMEM((ts, TGT_CHUNK), jnp.float32),
        best_c=pltpu.VMEM((ts, TGT_CHUNK), jnp.int32),
    )


@partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    interpret: bool = False,
):
    """Drop-in replacement for ops.nn.nearest_neighbors (no chunk arg —
    tiling is fixed by the kernel). ``interpret=True`` runs the kernel in
    the Pallas interpreter for CPU testing."""
    n = src_xyz.shape[0]
    m = tgt_xyz.shape[0]
    dtype = src_xyz.dtype

    # Recentre on the TARGET centroid: any nearby fixed point tames the
    # f32 cancellation in ||t||^2 - 2 s.t (see ops/nn.py), and a
    # target-only choice keeps the recentred/transposed target and its
    # norms loop-invariant inside ICP's while_loop — XLA hoists them,
    # instead of re-subtracting and re-laying-out the whole target
    # buffer on every sweep (the source centroid changes per iteration).
    # Invalid rows zeroed BEFORE the centroid sum and the sweep: padding
    # slots may hold arbitrary bytes, and NaN/Inf garbage times a 0.0
    # weight is still NaN (and would poison the kernel's norm lanes).
    txyz = jnp.where(tgt_valid[:, None], tgt_xyz, 0.0)
    wtgt = tgt_valid.astype(dtype)
    centroid = jnp.sum(txyz, axis=0) / jnp.maximum(jnp.sum(wtgt), 1.0)
    s = src_xyz - centroid
    t = txyz - centroid

    m_pad = (-m) % TGT_CHUNK
    # Above MAX_VMEM_TARGET the target cannot be VMEM-resident; the HBM
    # variant streams emit_pipeline super-blocks instead (xyz rows +
    # penalty row packed together — same math). Its source tile is
    # halved: the streaming kernel's scoped-vmem stack (best_v + best_c
    # + score temporaries) measured 16.06M at SRC_TILE=512 inside
    # icp_align's while_loop — 0.06M over the 16M limit.
    stream_hbm = (m + m_pad) > MAX_VMEM_TARGET
    tile = HBM_SRC_TILE if stream_hbm else SRC_TILE
    n_pad = (-n) % tile
    s_p = jnp.pad(s, ((0, n_pad), (0, 0)))
    t_p = jnp.pad(t, ((0, m_pad), (0, 0)))
    # big-but-finite penalty: +inf would poison the matmul accumulation
    pen = jnp.where(tgt_valid, 0.0, 1e30).astype(dtype)
    pen_p = jnp.pad(pen, (0, m_pad), constant_values=1e30)[None, :]

    # Dynamic sweep bound: highest live target index + 1, in chunks
    # (targets need not be prefix-dense; this is exact either way).
    m_total = t_p.shape[0]
    live_hi = jnp.max(
        jnp.where(tgt_valid, jnp.arange(1, m + 1, dtype=jnp.int32), 0)
    )
    n_chunks = jnp.minimum(
        (live_hi + TGT_CHUNK - 1) // TGT_CHUNK, m_total // TGT_CHUNK
    )
    n_chunks = jnp.maximum(n_chunks, 1).reshape(1)

    grid = (s_p.shape[0] // tile,)
    src_spec = pl.BlockSpec(
        (tile, 3), lambda i, n: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((tile, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s_p.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((s_p.shape[0], 1), jnp.int32),
    ]
    if stream_hbm:
        # super-chunk DMAs slice [4, HBM_SUPER*TGT_CHUNK] at a time;
        # pad out to a whole number of super-chunks (xyz 0, penalty
        # +big: the pad is swept but can never win the argmin)
        sw_pad = (-t_p.shape[0]) % (HBM_SUPER * TGT_CHUNK)
        tgt4 = jnp.concatenate(
            [
                jnp.pad(t_p, ((0, sw_pad), (0, 0))).T,
                jnp.pad(pen_p, ((0, 0), (0, sw_pad)), constant_values=1e30),
            ],
            axis=0,
        )  # [4, M_super]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[src_spec, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
        )
        score, idx = pl.pallas_call(
            partial(_nn_kernel_hbm, interpret=interpret),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(n_chunks, s_p, tgt4)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                src_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        )
        score, idx = pl.pallas_call(
            _nn_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(n_chunks, s_p, t_p.T, pen_p)

    best_idx = jnp.clip(idx[:n, 0], 0, m - 1)
    best_score = score[:n, 0]

    t_win = jnp.take(tgt_xyz, best_idx, axis=0)
    diff = src_xyz - t_win
    dist2 = jnp.sum(diff * diff, axis=-1)
    ok = (
        src_valid
        & jnp.isfinite(best_score)
        & (best_score < 1e29)
        & jnp.any(tgt_valid)
    )
    dist2 = jnp.where(ok, dist2, jnp.inf)
    return dist2, best_idx
