"""Small shared image-op helpers (2-D convolution, box sums, shifts).

These are the building blocks for the organized-cloud kernels (normals,
Canny, edge labeling). Everything is f32, NHWC-free: plain ``[H, W]`` or
``[H, W, C]`` arrays, jittable, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv2d_same(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """'Same' 2-D correlation of ``[H, W]`` with a small kernel.

    Borders are edge-replicated (not zero-padded): zero padding would
    manufacture phantom gradients at the frame border, which Canny would
    then report as edges."""
    k = jnp.asarray(kernel, img.dtype)
    kh, kw = k.shape
    img_p = jnp.pad(img, ((kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    x = img_p[None, None, :, :]
    w = k[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def box_sum(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window via two separable cumulative passes
    (the integral-image trick XLA compiles to fast scans). Works on
    ``[H, W]`` and ``[H, W, C]``."""
    r = radius

    def sum_axis(x, axis):
        c = jnp.cumsum(x, axis=axis)
        pad_lo = [(0, 0)] * x.ndim
        pad_lo[axis] = (r + 1, 0)
        lo = jnp.pad(c, pad_lo)[
            tuple(slice(0, x.shape[a]) if a == axis else slice(None) for a in range(x.ndim))
        ]
        pad_hi = [(0, 0)] * x.ndim
        pad_hi[axis] = (0, r)
        hi = jnp.pad(c, pad_hi, mode="edge")[
            tuple(
                slice(r, r + x.shape[a]) if a == axis else slice(None)
                for a in range(x.ndim)
            )
        ]
        return hi - lo

    return sum_axis(sum_axis(img, 0), 1)


def shift2d(img: jnp.ndarray, dr: int, dc: int, fill=0.0) -> jnp.ndarray:
    """Shift an ``[H, W]`` or ``[H, W, C]`` image so that
    ``out[r, c] = img[r + dr, c + dc]`` (out-of-range -> fill)."""
    h, w = img.shape[:2]
    out = img
    if dr:
        pad = [(0, 0)] * img.ndim
        if dr > 0:
            pad[0] = (0, dr)
            out = jnp.pad(out, pad, constant_values=fill)[dr:]
        else:
            pad[0] = (-dr, 0)
            out = jnp.pad(out, pad, constant_values=fill)[:h]
    if dc:
        pad = [(0, 0)] * img.ndim
        if dc > 0:
            pad[1] = (0, dc)
            out = jnp.pad(out, pad, constant_values=fill)[:, dc:]
        else:
            pad[1] = (-dc, 0)
            out = jnp.pad(out, pad, constant_values=fill)[:, :w]
    return out


def gaussian_kernel_3x3(sigma: float = 1.0) -> np.ndarray:
    ax = np.arange(-1, 2, dtype=np.float64)
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32)
