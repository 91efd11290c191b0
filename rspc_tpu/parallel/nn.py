"""Target-sharded nearest-neighbor search over a device mesh.

Scale-out of the ICP correspondence sweep (SURVEY.md §5: "optional sharding
of target tiles across chips with a ring reduce for argmin"): the target
cloud is sharded along the ``points`` mesh axis; every device runs the
local tiled sweep (ops/nn.py) over its shard, then the per-device
(best_dist, best_idx) pairs are combined with an ``all_gather`` + argmin —
one small ICI collective of [D, N] scalars, independent of target size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rspc_tpu.ops.nn import nearest_neighbors


def sharded_nearest_neighbors(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    mesh: Mesh,
    axis: str = "points",
    chunk: int = 2048,
):
    """Same contract as ops.nn.nearest_neighbors; target sharded on
    ``axis``, source/result replicated."""
    shard_size = tgt_xyz.shape[0] // mesh.shape[axis]

    def local(sx, sv, tx, tv):
        d2, idx = nearest_neighbors(sx, sv, tx, tv, chunk=min(chunk, shard_size))
        base = jax.lax.axis_index(axis) * shard_size
        idx = idx + base
        # gather per-device bests and pick the global winner
        all_d2 = jax.lax.all_gather(d2, axis)     # [D, N]
        all_idx = jax.lax.all_gather(idx, axis)   # [D, N]
        win = jnp.argmin(all_d2, axis=0)          # [N]
        d2_g = jnp.take_along_axis(all_d2, win[None, :], axis=0)[0]
        idx_g = jnp.take_along_axis(all_idx, win[None, :], axis=0)[0]
        return d2_g, idx_g

    spec_rep = P()
    # check_vma=False: the all_gather+argmin combine yields identical
    # values on every device, but the varying-manual-axes analysis cannot
    # infer that replication statically.
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep, P(axis), P(axis)),
        out_specs=(spec_rep, spec_rep),
        check_vma=False,
    )
    return fn(src_xyz, src_valid, tgt_xyz, tgt_valid)
