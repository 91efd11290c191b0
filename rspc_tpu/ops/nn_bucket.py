"""Cell-bucketed capped nearest-neighbor search.

TPU-native replacement for the kd-tree radius search inside
``pcl::IterativeClosestPoint`` (SURVEY.md X1) for LARGE targets: the
brute-force sweep (ops/nn.py, ops/nn_pallas.py) touches every
(source, target) pair — 10k x 1.8M = 18 Gpair for the incremental
full-cloud chain (src/incremental_icp.hpp:57-59) — while ICP only ever
uses correspondences within ``max_correspondence_distance``. Bucketing
the target into cells of exactly that size bounds the search to the 27
neighboring cells: any point within ``cap`` of a query lies in one of
them, so the result is EXACT for every correspondence inside the cap
(matches d2 <= cap^2 from the brute sweep bit-for-bit up to reduction
order), and reports +inf beyond it — the contract ICP's weight mask,
MSE, and convergence tests need. ``getFitnessScore`` (uncapped mean NN
distance) still requires a full sweep and stays on the brute path.

Design for XLA/TPU (no pointer-chasing tree):

  * build: quantize target points to cell coords, hash to an i32 key
    (invalid rows get the max key), ONE argsort by key -> a sorted
    point array where every cell is a contiguous run. Hash collisions
    are benign: a colliding far cell only injects extra candidates that
    the exact distance test rejects — it can never hide a true
    neighbor, because a true neighbor's own key is always probed.
  * query: each source point probes its 27 neighbor-cell keys with a
    vectorized binary search (searchsorted) and scans up to ``budget``
    candidates per run with gathers; the capped argmin reduces over
    27 x budget candidates.

``budget`` bounds per-cell candidates. For voxel-downsampled targets at
leaf == cap (the edge chains) a cell geometrically holds O(1) points
per contributing frame, so the default budget is effectively exact; for
raw full-resolution targets (incremental chain) a cell can hold more
points than the budget and the result becomes best-of-budget-per-cell —
``bucket_stats`` reports the clipped fraction so callers can check.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# Large primes for the 3D cell hash (classic spatial-hash constants).
# The key space is int32-positive; collisions are handled by the exact
# distance test (see module docstring).
_P1 = jnp.int32(73856093)
_P2 = jnp.int32(19349663)
_P3 = jnp.int32(83492791)
_INVALID_KEY = jnp.int32(2147483647)


def _cell_coords(xyz: jax.Array, cell: float) -> jax.Array:
    """Integer cell coordinates [..., 3] (floor quantization)."""
    return jnp.floor(xyz / cell).astype(jnp.int32)


def _hash_cells(c: jax.Array) -> jax.Array:
    """i32 hash of integer cell coords [..., 3] -> [...]; non-negative
    and strictly below _INVALID_KEY."""
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    # fold into [0, 2^31 - 2] so invalid rows sort strictly last
    return jnp.abs(h) % (_INVALID_KEY - 1)


@partial(jax.jit, static_argnames=("cell",))
def build_buckets(tgt_xyz: jax.Array, tgt_valid: jax.Array, cell: float):
    """Sort the target by cell-hash key.

    Returns (sorted_keys i32[M], sorted_xyz f32[M,3], order i32[M]):
    every cell is a contiguous key run; ``order`` maps sorted positions
    back to original target row indices."""
    keys = jnp.where(
        tgt_valid, _hash_cells(_cell_coords(tgt_xyz, cell)), _INVALID_KEY
    )
    order = jnp.argsort(keys).astype(jnp.int32)
    sorted_keys = jnp.take(keys, order)
    sorted_xyz = jnp.take(tgt_xyz, order, axis=0)
    # scrub invalid rows so NaN/Inf garbage can't poison distances
    sorted_valid = jnp.take(tgt_valid, order)
    sorted_xyz = jnp.where(sorted_valid[:, None], sorted_xyz, 1e30)
    return sorted_keys, sorted_xyz, order


_OFFSETS = jnp.stack(
    jnp.meshgrid(
        jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2),
        indexing="ij",
    ),
    axis=-1,
).reshape(27, 3).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cap", "budget"))
def nearest_neighbors_bucketed(
    src_xyz: jax.Array,
    src_valid: jax.Array,
    tgt_xyz: jax.Array,
    tgt_valid: jax.Array,
    cap: float,
    budget: int = 16,
):
    """Capped exact NN: (d2 f32[N], idx i32[N]) with d2 = +inf (and idx
    = 0) where no valid target lies within ``cap`` — or where the
    source row is invalid. Within the cap, d2/idx equal the brute
    sweep's (subject to the per-cell ``budget``; see module docstring
    and :func:`bucket_stats`)."""
    sorted_keys, sorted_xyz, order = build_buckets(tgt_xyz, tgt_valid, cap)
    m = sorted_keys.shape[0]
    n = src_xyz.shape[0]
    dtype = src_xyz.dtype

    cells = _cell_coords(src_xyz, cap)                       # [N, 3]
    nk = _hash_cells(cells[:, None, :] + _OFFSETS[None])     # [N, 27]
    # run [start, end) per (point, neighbor cell) via two binary
    # searches — the per-candidate liveness test is then pure index
    # arithmetic, no key gathers inside the budget loop
    starts = jnp.searchsorted(sorted_keys, nk).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_keys, nk, side="right").astype(jnp.int32)

    cap2 = jnp.asarray(cap * cap, dtype)
    best_d2 = jnp.full((n,), jnp.inf, dtype)
    best_pos = jnp.zeros((n,), jnp.int32)

    # Scan candidate j of every (point, neighbor-cell) run in lockstep:
    # 27 gathers per step, ``budget`` steps — a fixed-shape pipeline XLA
    # vectorizes, instead of per-point dynamic loops a tree would need.
    for j in range(budget):
        pos = starts + j                                     # [N, 27]
        live = pos < ends
        posc = jnp.minimum(pos, m - 1)
        cand = jnp.take(sorted_xyz, posc.reshape(-1), axis=0).reshape(
            n, 27, 3
        )
        d2 = jnp.sum((src_xyz[:, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(live, d2, jnp.inf)
        k = jnp.argmin(d2, axis=1)
        row_d2 = jnp.take_along_axis(d2, k[:, None], axis=1)[:, 0]
        row_pos = jnp.take_along_axis(posc, k[:, None], axis=1)[:, 0]
        upd = row_d2 < best_d2
        best_d2 = jnp.where(upd, row_d2, best_d2)
        best_pos = jnp.where(upd, row_pos, best_pos)

    beyond = (best_d2 > cap2) | ~src_valid
    best_d2 = jnp.where(beyond, jnp.inf, best_d2)
    idx = jnp.where(beyond, 0, jnp.take(order, best_pos))
    return best_d2, idx.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cell", "budget"))
def bucket_stats(tgt_xyz: jax.Array, tgt_valid: jax.Array, cell: float,
                 budget: int = 16):
    """(max cell occupancy, fraction of valid points in cells whose
    occupancy exceeds ``budget``) — the exactness diagnostic for a
    given target/budget choice."""
    keys = jnp.where(
        tgt_valid, _hash_cells(_cell_coords(tgt_xyz, cell)), _INVALID_KEY
    )
    sk = jnp.sort(keys)
    valid_n = jnp.sum(tgt_valid)
    # run lengths via positions of key changes
    change = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    run_id = jnp.cumsum(change) - 1
    counts = jnp.zeros(sk.shape[0], jnp.int32).at[run_id].add(
        (sk != _INVALID_KEY).astype(jnp.int32)
    )
    occ = counts
    over = jnp.sum(jnp.where(occ > budget, occ - budget, 0))
    return jnp.max(occ), over / jnp.maximum(valid_n, 1)
