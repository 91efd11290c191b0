"""Depth-frame deprojection and RGB texture mapping.

TPU-native replacement for ``rs2::pointcloud::calculate`` / ``map_to``
(SURVEY.md X7) plus the reference's first-party uv->pixel lookup
(src/capture.hpp:11-32, ``rgb_texture``). One fused jittable op turns a
Z16 depth image + color image into an organized colored cloud — the
per-pixel loop of the reference's ``convert_to_pcl`` (capture.hpp:72-107)
becomes a handful of vectorized image ops XLA fuses into one kernel.

Camera model: pinhole with optional (inverse) Brown-Conrady distortion,
matching librealsense's ``rs2_deproject_pixel_to_point``:
  x = (u - ppx) / fx, y = (v - ppy) / fy,
  undistort iteratively when coeffs are nonzero, point = depth * (x, y, 1).
Texture mapping projects each point through the color extrinsics +
intrinsics to normalized (u, v), then samples the color image with the
reference's clamp-to-edge pixel convention
(x = clamp(int(u*W + .5), 0, W-1), capture.hpp:17-18) and optional BGR->RGB
swizzle (capture.hpp:99-101 — the camera delivers BGR).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import OrganizedCloud


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Pinhole + Brown-Conrady intrinsics (rs2_intrinsics equivalent).
    Static metadata: shapes derive from it, so it is a hashable aux field."""

    width: int
    height: int
    fx: float
    fy: float
    ppx: float
    ppy: float
    coeffs: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)

    @staticmethod
    def simple(width: int, height: int, fov_deg: float = 60.0) -> "Intrinsics":
        f = width / (2.0 * np.tan(np.radians(fov_deg) / 2.0))
        return Intrinsics(width, height, f, f, width / 2.0, height / 2.0)


def _undistort_brown_conrady(x, y, coeffs, iters: int = 10):
    """Invert the Brown-Conrady forward model by fixed-point iteration
    (librealsense does the same for the inverse-distortion path)."""
    k1, k2, p1, p2, k3 = coeffs
    xd, yd = x, y

    def body(_, st):
        xu, yu = st
        r2 = xu * xu + yu * yu
        icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
        dx = 2 * p1 * xu * yu + p2 * (r2 + 2 * xu * xu)
        dy = 2 * p2 * xu * yu + p1 * (r2 + 2 * yu * yu)
        return (xd - dx) * icdist, (yd - dy) * icdist

    return jax.lax.fori_loop(0, iters, body, (x, y))


@partial(jax.jit, static_argnames=("intr",))
def deproject_depth(
    depth: jnp.ndarray, intr: Intrinsics, depth_scale: float = 0.001
) -> jnp.ndarray:
    """Z16 (or float meters) depth image -> organized ``f32[H,W,3]`` xyz.
    Invalid (zero) depth yields the origin, like librealsense."""
    h, w = depth.shape
    z = depth.astype(jnp.float32) * (
        depth_scale if depth.dtype != jnp.float32 else 1.0
    )
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (u - intr.ppx) / intr.fx
    y = (v - intr.ppy) / intr.fy
    if any(c != 0.0 for c in intr.coeffs):
        x, y = _undistort_brown_conrady(x, y, intr.coeffs)
    return jnp.stack([x * z, y * z, z], axis=-1)


def project_points(xyz: jnp.ndarray, intr: Intrinsics):
    """Project 3-D points to normalized texture coordinates (u, v) in
    [0, 1] (rs2 texture coordinate convention)."""
    z = jnp.where(xyz[..., 2] != 0.0, xyz[..., 2], 1.0)
    px = xyz[..., 0] / z * intr.fx + intr.ppx
    py = xyz[..., 1] / z * intr.fy + intr.ppy
    return px / intr.width, py / intr.height


def sample_texture(color: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, bgr: bool):
    """Reference pixel-lookup convention (src/capture.hpp:17-22):
    x = clamp(int(u*W + .5), 0, W-1), y likewise, then BGR->RGB swizzle."""
    h, w = color.shape[:2]
    xi = jnp.clip((u * w + 0.5).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip((v * h + 0.5).astype(jnp.int32), 0, h - 1)
    rgb = color[yi, xi].astype(jnp.float32)
    if bgr:
        rgb = rgb[..., ::-1]
    return rgb


@partial(jax.jit, static_argnames=("intr", "color_intr", "bgr"))
def rgbd_to_organized_cloud(
    depth: jnp.ndarray,
    color: jnp.ndarray,
    intr: Intrinsics,
    depth_scale: float = 0.001,
    color_intr: Intrinsics | None = None,
    extrinsics: jnp.ndarray | None = None,
    bgr: bool = True,
) -> OrganizedCloud:
    """Full rs2 pipeline equivalent: pc.map_to(color); pc.calculate(depth);
    convert_to_pcl — depth deprojection fused with texture lookup
    (capture.hpp:189-193). With no color intrinsics/extrinsics the streams
    are assumed registered (same grid)."""
    xyz = deproject_depth(depth, intr, depth_scale)
    pts = xyz
    if extrinsics is not None:
        r = extrinsics[:3, :3]
        t = extrinsics[:3, 3]
        pts = xyz @ r.T + t
    ci = color_intr if color_intr is not None else intr
    u, v = project_points(pts, ci)
    rgb = sample_texture(color, u, v, bgr)
    valid = xyz[..., 2] > 0.0
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    return OrganizedCloud(xyz=xyz, rgb=rgb, valid=valid)
