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
mask; voxels beyond capacity are dropped deterministically (lowest keys
kept — callers size capacity generously).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud


def voxel_downsample(cloud: Cloud, leaf_size: float, max_points: int) -> Cloud:
    """One averaged point per occupied ``leaf_size`` voxel.

    Voxel coordinate = floor(x / leaf) per axis (PCL convention). Points are
    sorted by voxel key (valid first), segment boundaries found where the
    key changes, and xyz/rgb segment-mean reduced into ``max_points`` slots.
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

    perm0 = jnp.arange(n, dtype=jnp.int32)
    skey, perm = jax.lax.sort((key, perm0), num_keys=1)

    xyz_s = jnp.take(xyz, perm, axis=0)
    rgb_s = jnp.take(rgb, perm, axis=0)
    valid_s = jnp.take(valid, perm, axis=0)
    nrm_s = (
        None
        if cloud.normal is None
        else jnp.take(cloud.normal, perm, axis=0)
    )

    new_seg = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), skey[1:] != skey[:-1]]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N]

    in_range = valid_s & (seg_id < max_points)
    w = in_range.astype(xyz.dtype)
    seg_safe = jnp.where(in_range, seg_id, 0)

    sum_xyz = jax.ops.segment_sum(xyz_s * w[:, None], seg_safe, num_segments=max_points)
    sum_rgb = jax.ops.segment_sum(rgb_s * w[:, None], seg_safe, num_segments=max_points)
    counts = jax.ops.segment_sum(w, seg_safe, num_segments=max_points)

    denom = jnp.maximum(counts, 1.0)[:, None]
    out_xyz = sum_xyz / denom
    out_rgb = sum_rgb / denom
    out_valid = counts > 0
    out_nrm = None
    if nrm_s is not None:
        # mean normal per voxel, renormalized (degenerate sums fall back
        # to +z so downstream math stays finite; such voxels are rare --
        # they need opposing normals in one 1 cm leaf)
        sum_n = jax.ops.segment_sum(
            nrm_s * w[:, None], seg_safe, num_segments=max_points
        )
        nlen = jnp.linalg.norm(sum_n, axis=-1, keepdims=True)
        out_nrm = jnp.where(
            nlen > 1e-12, sum_n / jnp.maximum(nlen, 1e-12),
            jnp.array([0.0, 0.0, 1.0], xyz.dtype),
        )
    return Cloud(xyz=out_xyz, rgb=out_rgb, valid=out_valid, normal=out_nrm)
