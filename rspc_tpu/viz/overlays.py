"""Auxiliary renderers: IMU axes, pose readout, frame mosaics.

Headless counterparts of the reference's GL helper library
(src/utils.hpp; SURVEY.md C13):
  * ``render_imu_axes``   — the imu_renderer's 3-D axes + motion vector
    drawing (utils.hpp:108-326), as a PNG-able image;
  * ``pose_text``         — the pose_renderer's textual pose readout
    (utils.hpp:328-367);
  * ``frames_mosaic``     — the window's frameset grid layout
    (``calc_grid``, utils.hpp:673-720): arrange equal-size frames into a
    near-square grid.

Host-side visualization utilities (numpy, not on the TPU compute path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def _draw_line(img: np.ndarray, p0, p1, color) -> None:
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    xs = np.linspace(p0[0], p1[0], n).astype(int)
    ys = np.linspace(p0[1], p1[1], n).astype(int)
    h, w = img.shape[:2]
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color


def render_imu_axes(theta, accel=None, size: int = 256) -> np.ndarray:
    """Draw rotated XYZ axes (red/green/blue) for the filter state
    ``theta`` plus an optional acceleration vector (yellow) — the
    information content of the reference's imu_renderer."""
    from rspc_tpu.ops.transform import rotation_matrix
    import jax.numpy as jnp

    img = np.full((size, size, 3), 40, np.uint8)
    r = np.asarray(
        rotation_matrix(jnp.float32(theta[0]), 2)
        @ rotation_matrix(jnp.float32(-theta[1]), 1)
        @ rotation_matrix(jnp.float32(theta[2]), 0)
    )
    center = np.array([size / 2, size / 2])
    scale = size * 0.35

    def project(v):
        # simple orthographic: x right, y down, z shrinks
        return center + np.array([v[0], -v[1]]) * scale * (1.0 - 0.3 * v[2])

    colors = ([255, 80, 80], [80, 255, 80], [80, 80, 255])
    for axis in range(3):
        v = r[:, axis]
        _draw_line(img, center, project(v), colors[axis])
    if accel is not None:
        a = np.asarray(accel, float)
        a = a / max(np.linalg.norm(a), 1e-9)
        _draw_line(img, center, project(a), [255, 255, 80])
    return img


def pose_text(translation, rotation_theta, velocity=None) -> str:
    """Textual pose readout (pose_renderer equivalent)."""
    tx, ty, tz = [float(x) for x in translation]
    rx, ry, rz = [float(x) for x in rotation_theta]
    lines = [
        f"translation: {tx:+.3f} {ty:+.3f} {tz:+.3f} [m]",
        f"rotation:    {rx:+.3f} {ry:+.3f} {rz:+.3f} [rad]",
    ]
    if velocity is not None:
        vx, vy, vz = [float(x) for x in velocity]
        lines.append(f"velocity:    {vx:+.3f} {vy:+.3f} {vz:+.3f} [m/s]")
    return "\n".join(lines)


def calc_grid(count: int) -> tuple[int, int]:
    """Near-square grid for ``count`` tiles (utils.hpp calc_grid)."""
    cols = int(np.ceil(np.sqrt(count)))
    rows = int(np.ceil(count / cols))
    return rows, cols


def frames_mosaic(frames: Sequence[np.ndarray]) -> np.ndarray:
    """Arrange equal-size RGB frames into a near-square grid image (the
    window's frameset mosaic)."""
    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    rows, cols = calc_grid(len(frames))
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, f in enumerate(frames):
        r, c = divmod(i, cols)
        canvas[r * h : (r + 1) * h, c * w : (c + 1) * w] = f
    return canvas
