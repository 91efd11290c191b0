"""Sorted-segment reductions without scatter.

``jax.ops.segment_sum`` lowers to scatter-add, which is slow on TPU (the
voxel filter spent ~100 ms scattering 16k points). For segments that are
CONTIGUOUS in a sorted array — always the case after the sort-by-voxel-key
step — a segment sum is a difference of prefix sums at the segment
boundaries, and the boundaries come from a vectorized binary search:

    sum_j = cumsum[end_j] - cumsum[start_j]

which is one cumsum (log-depth scan), one searchsorted (log-depth
gathers), and two gathers — all VPU-friendly, no scatter anywhere.

f32 caution: a prefix-sum difference loses the low bits of the running
total, so callers should reduce RESIDUALS against a per-segment anchor
(e.g. the voxel corner) rather than absolute coordinates; see
voxel_downsample for the pattern.
"""

from __future__ import annotations

import jax.numpy as jnp


def sorted_segment_bounds(seg_id: jnp.ndarray, num_segments: int):
    """[start, end) positions of each segment id in a sorted id array.

    ``seg_id`` must be non-decreasing; ids >= num_segments (e.g. an
    invalid-tail marker) are ignored. Returns (starts i32[V], ends i32[V]);
    empty segments have start == end.
    """
    qs = jnp.arange(num_segments, dtype=seg_id.dtype)
    starts = jnp.searchsorted(seg_id, qs, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(seg_id, qs, side="right").astype(jnp.int32)
    return starts, ends


def sorted_segment_sum(
    values: jnp.ndarray, starts: jnp.ndarray, ends: jnp.ndarray
) -> jnp.ndarray:
    """Per-segment sum of ``values`` ([N, ...]) over [start, end) ranges."""
    cz = jnp.concatenate(
        [jnp.zeros_like(values[:1]), jnp.cumsum(values, axis=0)], axis=0
    )
    return jnp.take(cz, ends, axis=0) - jnp.take(cz, starts, axis=0)
