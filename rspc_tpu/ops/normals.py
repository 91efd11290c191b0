"""Integral-image surface-normal estimation (AVERAGE_3D_GRADIENT).

TPU-native replacement for ``pcl::IntegralImageNormalEstimation`` with
``AVERAGE_3D_GRADIENT`` as configured by the reference
(src/edge_extractor.hpp:10-15; SURVEY.md X4): central-difference 3-D
gradient vector fields along the image rows/columns, box-smoothed over a
``normal_smoothing_size`` window via integral images (two cumsum passes —
exactly PCL's integral-image trick, which XLA compiles to fast parallel
scans), normal = cross(smoothed d/dx, smoothed d/dy), normalized, flipped
toward the viewpoint at the origin.

Depth-discontinuity handling: pixels whose forward depth difference
exceeds ``max_depth_change_factor`` (scaled by depth, matching PCL's
relative threshold) break the smoothing support: gradients that straddle a
discontinuity are excluded from the box sums (weight 0), so normals don't
bleed across object boundaries. This reproduces the *intent* of PCL's
depth-change map; PCL's optional distance-map-based window shrinking
(``use_depth_dependent_smoothing``, off by default) is not replicated.
"""

from __future__ import annotations

import jax.numpy as jnp

from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.config import EdgeConfig
from rspc_tpu.ops.image import box_sum, shift2d


def estimate_normals(
    cloud: OrganizedCloud, config: EdgeConfig = EdgeConfig()
):
    """Returns ``(normals f32[H,W,3], normals_valid bool[H,W])``."""
    xyz = cloud.xyz
    valid = cloud.valid
    z = xyz[..., 2]

    # Central differences: d/dcol and d/drow of the 3-D point image.
    right = shift2d(xyz, 0, 1)
    left = shift2d(xyz, 0, -1)
    down = shift2d(xyz, 1, 0)
    up = shift2d(xyz, -1, 0)
    vr = shift2d(valid, 0, 1, fill=False)
    vl = shift2d(valid, 0, -1, fill=False)
    vd = shift2d(valid, 1, 0, fill=False)
    vu = shift2d(valid, -1, 0, fill=False)

    thresh = config.max_depth_change_factor * jnp.maximum(jnp.abs(z), 1.0)
    smooth_h = (
        vr & vl
        & (jnp.abs(right[..., 2] - z) < thresh)
        & (jnp.abs(left[..., 2] - z) < thresh)
    )
    smooth_v = (
        vd & vu
        & (jnp.abs(down[..., 2] - z) < thresh)
        & (jnp.abs(up[..., 2] - z) < thresh)
    )

    grad_x = jnp.where(smooth_h[..., None], right - left, 0.0)
    grad_y = jnp.where(smooth_v[..., None], down - up, 0.0)

    radius = max(int(config.normal_smoothing_size) // 2, 1)
    sum_gx = box_sum(grad_x, radius)
    sum_gy = box_sum(grad_y, radius)
    cnt_x = box_sum(smooth_h.astype(xyz.dtype), radius)
    cnt_y = box_sum(smooth_v.astype(xyz.dtype), radius)

    avg_gx = sum_gx / jnp.maximum(cnt_x, 1.0)[..., None]
    avg_gy = sum_gy / jnp.maximum(cnt_y, 1.0)[..., None]

    n = jnp.cross(avg_gx, avg_gy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = valid & (cnt_x[...] > 0) & (cnt_y[...] > 0) & (norm[..., 0] > 1e-12)
    n = n / jnp.maximum(norm, 1e-12)

    # Flip toward the viewpoint (origin): PCL flipNormalTowardsViewpoint.
    flip = jnp.sum(n * xyz, axis=-1) > 0
    n = jnp.where(flip[..., None], -n, n)
    n = jnp.where(ok[..., None], n, 0.0)
    return n, ok
