"""Canny edge detection, jittable end to end (including hysteresis).

TPU-native replacement for the Canny stage of
``pcl::OrganizedEdgeFromRGBNormals`` (SURVEY.md X3): PCL runs
``pcl::Edge::detectEdgeCanny`` on the mean-RGB intensity image with
hysteresis thresholds (40, 100), and a gradient-fed variant on the normal
(nx, ny) component images with thresholds (0.4, 1.1) for high-curvature
edges. Both entry points are provided.

Pipeline: Gaussian 3x3 (sigma 1) smoothing -> Sobel gradients ->
L2 magnitude -> 4-sector non-maximum suppression -> double threshold ->
hysteresis as an iterative masked dilation under ``lax.while_loop``
(fixpoint instead of PCL's DFS edge tracing — same connected-component
semantics, data-parallel instead of pointer-chasing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rspc_tpu.ops.image import (
    SOBEL_X,
    SOBEL_Y,
    conv2d_same,
    gaussian_kernel_3x3,
    shift2d,
)


def _dilate8(mask: jnp.ndarray) -> jnp.ndarray:
    out = mask
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr or dc:
                out = out | shift2d(mask, dr, dc, fill=False)
    return out


def _nms(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Keep pixels that are local maxima along the gradient direction
    (quantized to 4 sectors)."""
    angle = jnp.arctan2(gy, gx)  # [-pi, pi]
    # fold to [0, pi) and quantize: 0 = E/W, 1 = NE/SW, 2 = N/S, 3 = NW/SE
    a = jnp.mod(angle, jnp.pi)
    sector = jnp.mod(jnp.floor((a + jnp.pi / 8) / (jnp.pi / 4)), 4).astype(jnp.int32)

    neighbors = [
        (shift2d(mag, 0, 1), shift2d(mag, 0, -1)),    # horizontal gradient
        (shift2d(mag, -1, 1), shift2d(mag, 1, -1)),   # 45 deg
        (shift2d(mag, -1, 0), shift2d(mag, 1, 0)),    # vertical
        (shift2d(mag, -1, -1), shift2d(mag, 1, 1)),   # 135 deg
    ]
    keep = jnp.zeros(mag.shape, jnp.bool_)
    for s, (n1, n2) in enumerate(neighbors):
        k = (mag >= n1) & (mag >= n2)
        keep = jnp.where(sector == s, k, keep)
    return keep


def _hysteresis(strong: jnp.ndarray, weak: jnp.ndarray) -> jnp.ndarray:
    """Grow strong edges through weak pixels to a fixpoint."""

    def cond(st):
        cur, changed = st
        return changed

    def body(st):
        cur, _ = st
        grown = cur | (weak & _dilate8(cur))
        return grown, jnp.any(grown != cur)

    out, _ = jax.lax.while_loop(cond, body, (strong, jnp.bool_(True)))
    return out


def canny_from_gradients(
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    low: float,
    high: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Canny NMS + hysteresis on externally supplied gradient images.

    This is how PCL derives HIGH_CURVATURE edges: the normal-image
    components (nx, ny) are fed directly as the 'gradients'
    (OrganizedEdgeFromNormals::extractEdges)."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    if valid is not None:
        mag = jnp.where(valid, mag, 0.0)
    keep = _nms(mag, gx, gy)
    mag_nms = jnp.where(keep, mag, 0.0)
    strong = mag_nms > high
    weak = mag_nms > low
    return _hysteresis(strong, weak)


def canny(
    intensity: jnp.ndarray,
    low: float = 40.0,
    high: float = 100.0,
) -> jnp.ndarray:
    """Canny on an intensity image (0..255 scale), PCL parameterization."""
    smoothed = conv2d_same(intensity, gaussian_kernel_3x3(1.0))
    gx = conv2d_same(smoothed, SOBEL_X)
    gy = conv2d_same(smoothed, SOBEL_Y)
    return canny_from_gradients(gx, gy, low, high)
