"""Nearest-neighbor correspondence search on TPU.

Replaces PCL's kd-tree NN inside ICP (SURVEY.md X1, "hard parts": no
kd-tree on TPU; at the reference's post-voxel edge-cloud sizes a tiled
brute-force sweep on the MXU beats tree traversal, and it is exactly
batchable/shardable).

Design:
  * The argmin score uses the matmul identity
    ``||s-t||^2 = ||t||^2 - 2 s·t + const(s)`` so the [N,M] score matrix is
    one MXU matmul + broadcast add; the ``||s||^2`` term is dropped (it
    cannot change the argmin over t).
  * Both sets are **recentred on the source centroid** first: distances are
    shift-invariant, and centring shrinks the magnitudes entering the
    cancellation-prone ``||t||^2 - 2 s·t`` sum, keeping f32 argmin ties
    correct at mm scales.
  * The target is swept in static chunks under ``lax.scan`` holding a
    running (best_score, best_index); peak memory is one [N, chunk] tile.
  * Final distances are re-computed exactly as ``||s - t_win||^2`` on the
    gathered winners (no cancellation), which is what fitness/RMSE and the
    ``max_correspondence_distance`` gate consume.

Invalid target points get +inf score; invalid sources return idx 0 /
dist inf (masked downstream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pad_chunks(x: jnp.ndarray, chunk: int, fill):
    m = x.shape[0]
    pad = (-m) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
    return x


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbors(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    chunk: int = 2048,
):
    """For each source point, the index of and squared distance to its
    nearest valid target point.

    Returns ``(dist2 f32[N], idx i32[N])``; invalid sources and empty
    targets yield ``dist2 = +inf``.
    """
    n = src_xyz.shape[0]
    dtype = src_xyz.dtype

    # Recentre on the valid-TARGET centroid (see module docstring; the
    # target-only choice keeps the recentred target loop-invariant when
    # this runs inside ICP's while_loop, so XLA hoists it). Invalid rows
    # are zeroed BEFORE the sum: padding slots may hold arbitrary bytes,
    # and NaN/Inf garbage times a 0.0 weight is still NaN.
    txyz = jnp.where(tgt_valid[:, None], tgt_xyz, 0.0)
    wtgt = tgt_valid.astype(dtype)
    centroid = jnp.sum(txyz, axis=0) / jnp.maximum(jnp.sum(wtgt), 1.0)
    s = src_xyz - centroid
    t = txyz - centroid

    t = _pad_chunks(t, chunk, 0.0)
    tv = _pad_chunks(tgt_valid, chunk, False)
    m_pad = t.shape[0]
    num_chunks = m_pad // chunk

    t_chunks = t.reshape(num_chunks, chunk, 3)
    tv_chunks = tv.reshape(num_chunks, chunk)

    inf = jnp.array(jnp.inf, dtype)

    def body(carry, inputs):
        best_score, best_idx = carry
        tc, tvc, base = inputs
        # score = ||t||^2 - 2 s·t  (argmin-equivalent to ||s-t||^2)
        # precision=HIGHEST: TPU MXU would otherwise truncate f32 operands
        # to bf16, which loses the mm-scale separations the argmin must
        # resolve (max_correspondence_distance is 0.01 m).
        cross = jax.lax.dot_general(
            s,
            tc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST,
        )  # [N, chunk]
        score = jnp.sum(tc * tc, axis=-1)[None, :] - 2.0 * cross
        score = jnp.where(tvc[None, :], score, inf)
        c_idx = jnp.argmin(score, axis=1)
        c_score = jnp.take_along_axis(score, c_idx[:, None], axis=1)[:, 0]
        upd = c_score < best_score
        best_score = jnp.where(upd, c_score, best_score)
        best_idx = jnp.where(upd, base + c_idx.astype(jnp.int32), best_idx)
        return (best_score, best_idx), None

    init = (jnp.full((n,), jnp.inf, dtype), jnp.zeros((n,), jnp.int32))
    bases = (jnp.arange(num_chunks, dtype=jnp.int32) * chunk)
    # Seed the carry by processing chunk 0 inline: the carry then derives
    # from the (possibly mesh-sharded) target data, which keeps shard_map's
    # varying-manual-axes bookkeeping consistent when this runs inside a
    # sharded sweep (parallel/nn.py).
    carry0, _ = body(init, (t_chunks[0], tv_chunks[0], bases[0]))
    if num_chunks > 1:
        (best_score, best_idx), _ = jax.lax.scan(
            body, carry0, (t_chunks[1:], tv_chunks[1:], bases[1:])
        )
    else:
        best_score, best_idx = carry0

    # Exact re-score of the winners (cancellation-free).
    t_win = jnp.take(tgt_xyz, best_idx, axis=0)
    diff = src_xyz - t_win
    dist2 = jnp.sum(diff * diff, axis=-1)
    any_tgt = jnp.any(tgt_valid)
    ok = src_valid & jnp.isfinite(best_score) & any_tgt
    dist2 = jnp.where(ok, dist2, jnp.inf)
    return dist2, best_idx
