"""Headless point-cloud renderer reproducing the reference viewer's camera.

The reference renders with immediate-mode OpenGL in a GLFW window
(src/visualizer.hpp:55-103): ``gluPerspective(60, w/h, 0.01, 10)``,
``gluLookAt(0,0,0 -> 0,0,1, up -y)``, then the interactive state applied as
``T(0,0,0.5 + offset_y*0.05) Rx(pitch) Ry(yaw) T(0,0,-0.5)``, point size
``width/640``, per-point ``glColor3f(b,g,r)`` skipping z==0 points, clear
color (153,153,153).

This module replays the exact same transform chain as a jitted scatter
rasterizer with a z-buffer (scatter-min depth + match pass — the
data-parallel equivalent of GL depth test), so CI and TPU hosts get
pixel-comparable output without a GL stack. The interactive mouse state
(yaw in [-120, 120], pitch in [-80, 80], scroll offsets, space to reset —
src/visualizer.hpp:24-53) lives in ``ViewState``.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud, OrganizedCloud

BG = 153  # reference clear color, 153/255 grey


@dataclasses.dataclass
class ViewState:
    """Mirror of the reference's ``state`` struct + callback clamping."""

    yaw: float = 0.0
    pitch: float = 0.0
    offset_x: float = 0.0
    offset_y: float = 0.0

    def drag(self, dx: float, dy: float) -> None:
        self.yaw = min(max(self.yaw - dx, -120.0), 120.0)
        self.pitch = min(max(self.pitch + dy, -80.0), 80.0)

    def scroll(self, xoff: float, yoff: float) -> None:
        self.offset_x += xoff
        self.offset_y += yoff

    def reset(self) -> None:
        self.yaw = self.pitch = 0.0
        self.offset_x = self.offset_y = 0.0


@partial(jax.jit, static_argnames=("width", "height", "bgr_stored"))
def render_cloud(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    valid: jnp.ndarray,
    yaw: jnp.ndarray,
    pitch: jnp.ndarray,
    offset_y: jnp.ndarray,
    width: int = 1280,
    height: int = 720,
    bgr_stored: bool = False,
) -> jnp.ndarray:
    """Rasterize to ``u8[height, width, 3]``.

    ``bgr_stored=True`` replays the reference's glColor3f(b, g, r) channel
    swap (its clouds carry camera-BGR bytes; ours are RGB, so the default
    renders channels as-is)."""
    deg = jnp.pi / 180.0

    # lookAt(0,0,0 -> 0,0,1, up -y): basis s=(1,0,0), u=(0,-1,0), f=(0,0,1)
    # view = [[1,0,0],[0,-1,0],[0,0,-1]] (negates y and z)
    look = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], xyz.dtype)

    cy, sy = jnp.cos(yaw * deg), jnp.sin(yaw * deg)
    cp, sp = jnp.cos(pitch * deg), jnp.sin(pitch * deg)
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], xyz.dtype).reshape(3, 3)
    rx = jnp.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], xyz.dtype).reshape(3, 3)

    p = xyz + jnp.array([0.0, 0.0, -0.5], xyz.dtype)   # T(0,0,-0.5)
    p = p @ ry.T                                        # Ry(yaw)
    p = p @ rx.T                                        # Rx(pitch)
    p = p + jnp.stack([jnp.zeros_like(offset_y), jnp.zeros_like(offset_y),
                       0.5 + offset_y * 0.05])          # T(0,0,.5+off)
    p = p @ look.T                                      # gluLookAt

    # gluPerspective(60, aspect, .01, 10): f = cot(30 deg)
    f = 1.0 / math.tan(math.radians(60.0) / 2.0)
    aspect = width / height
    z_eye = p[..., 2]
    behind = z_eye >= -0.01  # GL camera looks down -z; clip near
    far_clip = z_eye < -10.0
    zsafe = jnp.where(behind, -1.0, z_eye)
    x_ndc = (f / aspect) * p[..., 0] / (-zsafe)
    y_ndc = f * p[..., 1] / (-zsafe)

    px = ((x_ndc + 1.0) * 0.5 * width).astype(jnp.int32)
    py = ((1.0 - (y_ndc + 1.0) * 0.5) * height).astype(jnp.int32)

    # reference skips z==0 points (visualizer.hpp:86)
    ok = (
        valid
        & (xyz[..., 2] != 0.0)
        & ~behind
        & ~far_clip
        & (px >= 0)
        & (px < width)
        & (py >= 0)
        & (py < height)
    )

    depth = -z_eye
    flat = py * width + px
    flat = jnp.where(ok, flat, width * height)  # OOB slot dropped

    point_size = max(int(width) // 640, 1)

    big = jnp.asarray(jnp.finfo(xyz.dtype).max, xyz.dtype)
    col = rgb[..., ::-1] if bgr_stored else rgb

    zbuf0 = jnp.full((width * height,), big, xyz.dtype)
    img0 = jnp.full((width * height, 3), jnp.asarray(float(BG)), xyz.dtype)

    for dy in range(point_size):
        for dx in range(point_size):
            off = dy * width + dx
            idx = jnp.clip(flat + off, 0, width * height)
            # pass 1: min depth per pixel
            zbuf = zbuf0.at[idx].min(jnp.where(ok, depth, big), mode="drop")
            # pass 2: write color where this point owns the min depth
            winner = ok & (depth <= jnp.take(zbuf, jnp.clip(idx, 0, width * height - 1)))
            widx = jnp.where(winner, idx, width * height)
            img0 = img0.at[widx].set(col, mode="drop")
            zbuf0 = zbuf

    img = img0.reshape(height, width, 3)
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def render_to_png(
    path: str,
    clouds: Union[Cloud, OrganizedCloud, Sequence],
    state: ViewState | None = None,
    width: int = 1280,
    height: int = 720,
) -> np.ndarray:
    """Render one or more clouds with the reference's default view and save
    a PNG (the CI/headless stand-in for the GLFW window loop,
    src/main.cpp:96-114). Returns the image array."""
    from rspc_tpu.viz.png import write_png

    if isinstance(clouds, (Cloud, OrganizedCloud)):
        clouds = [clouds]
    flat = [c.flatten() if isinstance(c, OrganizedCloud) else c for c in clouds]
    xyz = jnp.concatenate([c.xyz for c in flat], axis=0)
    rgb = jnp.concatenate([c.rgb for c in flat], axis=0)
    valid = jnp.concatenate([c.valid for c in flat], axis=0)
    st = state or ViewState()
    img = render_cloud(
        xyz,
        rgb,
        valid,
        jnp.asarray(st.yaw, jnp.float32),
        jnp.asarray(st.pitch, jnp.float32),
        jnp.asarray(st.offset_y, jnp.float32),
        width=width,
        height=height,
    )
    img_np = np.asarray(img)
    write_png(path, img_np)
    return img_np
