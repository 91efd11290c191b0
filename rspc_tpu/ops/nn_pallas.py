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

    def body(c, carry):
        best_s, best_i = carry
        base = c * TGT_CHUNK
        t = tgt_ref[:, pl.ds(base, TGT_CHUNK)]        # [3, TT]
        pen = pen_ref[0, pl.ds(base, TGT_CHUNK)]      # [TT]
        norm2 = jnp.sum(t * t, axis=0)                # [TT]
        # precision=HIGHEST: f32 MXU passes — bf16 truncation flips argmin
        # winners at mm separations (same analysis as ops/nn.py).
        cross = jax.lax.dot_general(
            src,
            t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # MXU [TS, TT]
        score = (norm2 + pen)[None, :] - 2.0 * cross  # [TS, TT]
        cs = jnp.min(score, axis=1)                   # [TS]
        ci = jnp.argmin(score, axis=1).astype(jnp.int32) + base
        upd = cs < best_s
        return jnp.where(upd, cs, best_s), jnp.where(upd, ci, best_i)

    init = (
        jnp.full((SRC_TILE,), jnp.inf, jnp.float32),
        jnp.zeros((SRC_TILE,), jnp.int32),
    )
    best_s, best_i = jax.lax.fori_loop(0, num_chunks, body, init)
    score_ref[:] = best_s[:, None]
    idx_ref[:] = best_i[:, None]


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

    wsrc = src_valid.astype(dtype)
    centroid = jnp.sum(src_xyz * wsrc[:, None], axis=0) / jnp.maximum(
        jnp.sum(wsrc), 1.0
    )
    s = src_xyz - centroid
    t = tgt_xyz - centroid

    n_pad = (-n) % SRC_TILE
    m_pad = (-m) % TGT_CHUNK
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

    grid = (s_p.shape[0] // SRC_TILE,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (SRC_TILE, 3), lambda i, n: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SRC_TILE, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SRC_TILE, 1), lambda i, n: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    score, idx = pl.pallas_call(
        _nn_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s_p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((s_p.shape[0], 1), jnp.int32),
        ],
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
