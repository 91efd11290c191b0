"""Voxel-grid downsampling as a shape-static sort + segment-mean.

TPU-native replacement for ``pcl::ApproximateVoxelGrid`` (SURVEY.md X5):
leaf-sized binning with one averaged point (xyz *and* rgb — PCL centroids
average all fields) per occupied voxel. Reference call sites use leaf
0.01^3 m (src/icp_edge_based_registration.hpp:47).

Deliberate divergence from PCL (documented per SURVEY.md §7 "reproducing
reference quirks"): PCL's *Approximate* voxel grid hashes voxels into a
small table and flushes on collision, so its output depends on point order
and can emit several points per voxel. We implement the *intended*
semantics — exact voxel binning via sort + segment reduction — which is
both deterministic and the better fit for a sort-friendly accelerator.

Everything is static-shape: output capacity ``max_points`` with a validity
mask; voxels beyond capacity are dropped deterministically as a spatially
UNIFORM pseudo-random subset (hash-shuffled voxel order) — saturation
degrades resolution evenly instead of amputating a region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud


def voxel_downsample(
    cloud: Cloud,
    leaf_size: float,
    max_points: int,
    min_normal_purity: float = 0.0,
) -> Cloud:
    """One averaged point per occupied ``leaf_size`` voxel.

    Voxel coordinate = floor(x / leaf) per axis (PCL convention). Points are
    sorted by voxel key (valid first), segment boundaries found where the
    key changes, and xyz/rgb segment-mean reduced into ``max_points`` slots.

    ``min_normal_purity`` (only meaningful when the cloud carries normals):
    drop voxels whose mean-normal length ``|sum n| / count`` falls below
    the threshold. A cell sampling a single smooth surface has purity ~1;
    a cell straddling a crease or depth discontinuity averages opposing
    normals to a short vector — and its mean point lies on NEITHER
    surface, which injects exactly the kind of consistent point-to-plane
    bias that drags a refinement stage off a sub-mm start.
    """
    xyz, rgb, valid = cloud.xyz, cloud.rgb, cloud.valid
    n = cloud.capacity
    inv_leaf = 1.0 / leaf_size

    coords = jnp.floor(xyz * inv_leaf).astype(jnp.int32)  # [N,3]

    # Pack the 3 voxel coords (relative to the cloud's min cell) into one
    # int32 key — a single-key sort is markedly faster on TPU than a
    # 3-key lexicographic sort. 10 bits per axis = 1024 cells, i.e. a
    # 1024*leaf span (10.2 m at the reference's 1 cm leaf); farther
    # outliers clamp into the boundary cells.
    big_c = jnp.int32(2**20)
    cmin = jnp.min(jnp.where(valid[:, None], coords, big_c), axis=0)
    cmin = jnp.where(cmin == big_c, 0, cmin)
    rel = jnp.clip(coords - cmin, 0, 1023)
    key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
    key = jnp.where(valid, key, jnp.int32(2**30))  # invalids sort last

    # Sort voxels in HASH-SHUFFLED order (primary key = mixed bits,
    # secondary = raw key for collision ties). Voxels beyond max_points
    # are dropped; under raw-key order that amputates one spatially
    # contiguous region (the lowest cells) — silently catastrophic for
    # registration overlap when a cloud saturates its capacity. Hashed
    # order makes overflow a spatially UNIFORM thinning instead.
    h = key.astype(jnp.uint32)
    h = (h ^ (h >> 16)) * jnp.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * jnp.uint32(0x846CA68B)
    h = (h ^ (h >> 16)) & jnp.uint32(0x7FFFFFFF)
    hkey = jnp.where(valid, h.astype(jnp.int32), jnp.int32(2**31 - 1))

    perm0 = jnp.arange(n, dtype=jnp.int32)
    _, skey, perm = jax.lax.sort((hkey, key, perm0), num_keys=2)

    # Slot ids: dense rank of each voxel in the (hash-shuffled) sorted key
    # order. Only the [N] int columns ride through the sort; the f32
    # payloads are then reduced by ONE scatter-add in ORIGINAL order —
    # permuting xyz/rgb/normals through `perm` cost 3 full-cloud gathers
    # (~80 ms on a 3M-point batch), an order of magnitude more than the
    # scatter.
    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), skey[1:] != skey[:-1]]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N] sorted order
    slot_of_point = jnp.zeros((n,), jnp.int32).at[perm].set(seg_id)
    slot_of_point = jnp.where(valid, slot_of_point, max_points)  # dropped

    # f32 accuracy note: each voxel's sum spans only its own few points
    # (tens at most), so direct summation of absolute coordinates is
    # exact to ~1e-6 of the mean — no prefix-sum cancellation to guard
    # against (unlike the earlier cumsum-based reduction).
    cols = [jnp.ones((n, 1), xyz.dtype), xyz, rgb]
    if cloud.normal is not None:
        cols.append(cloud.normal)
    if cloud.cgrad is not None:
        cols.append(cloud.cgrad)
    upd = jnp.concatenate(cols, axis=-1)
    upd = jnp.where(valid[:, None], upd, 0.0)
    acc = jnp.zeros((max_points, upd.shape[1]), xyz.dtype).at[
        slot_of_point
    ].add(upd, mode="drop")

    counts = acc[:, 0]
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_valid = counts > 0
    out_xyz = jnp.where(out_valid[:, None], acc[:, 1:4] / denom, 0.0)
    out_rgb = acc[:, 4:7] / denom
    out_nrm = None
    col = 7
    if cloud.normal is not None:
        # mean normal per voxel, renormalized (degenerate sums fall back
        # to +z so downstream math stays finite; such voxels are rare --
        # they need opposing normals in one 1 cm leaf)
        sum_n = acc[:, col:col + 3]
        col += 3
        nlen = jnp.linalg.norm(sum_n, axis=-1, keepdims=True)
        out_nrm = jnp.where(
            nlen > 1e-12, sum_n / jnp.maximum(nlen, 1e-12),
            jnp.array([0.0, 0.0, 1.0], xyz.dtype),
        )
        if min_normal_purity > 0.0:
            purity = nlen[:, 0] / jnp.maximum(counts, 1.0)
            out_valid = out_valid & (purity >= min_normal_purity)
    out_cg = None
    if cloud.cgrad is not None:
        # mean gradient per voxel, NOT renormalized — unlike normals the
        # magnitude is the signal (intensity change per meter); opposing
        # gradients in one cell cancel, correctly muting the colored
        # residual where the voxel mean has no coherent texture.
        out_cg = acc[:, col:col + 3] / denom
    return Cloud(
        xyz=out_xyz, rgb=out_rgb, valid=out_valid, normal=out_nrm,
        cgrad=out_cg,
    )
