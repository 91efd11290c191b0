"""Scale-space keypoint detection + descriptors (SIFT-class), jittable.

TPU-native counterpart of the reference's OpenCV SIFT usage (SURVEY.md X8;
src/capture_opencv.hpp:30-48: ``cv::xfeatures2d::SiftFeatureDetector`` on
grayscale frames, followed by FLANN 2-NN matching with Lowe ratio 0.3).
The reference computes these features for visual odometry whose output the
caller then discards (main.cpp:44-53), so this is a capability-parity
component, engineered TPU-first rather than cycle-accurate to OpenCV:

  * difference-of-Gaussian pyramid with 3x3x3 local-extremum detection,
    contrast threshold and Harris-style edge rejection — the SIFT detector
    recipe, with fixed-capacity top-k keypoint selection instead of
    dynamic lists;
  * 128-d descriptors (4x4 spatial bins x 8 orientation bins, dominant-
    orientation normalized, trilinear-free binning) — SIFT layout;
  * matching is one [K,128]x[128,K] MXU matmul + 2-NN ratio test
    (ops/match below), not a kd-tree/FLANN approximation.

Documented divergences from OpenCV SIFT: no sub-pixel/scale interpolation
of extrema and hard spatial binning in the descriptor; matching behavior
downstream (ratio 0.3) is preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.ops.image import conv2d_same


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    radius = max(1, int(3 * sigma + 0.5))
    k = _gauss_kernel1d(sigma, radius)
    out = conv2d_same(img, k[None, :])
    return conv2d_same(out, k[:, None])


@partial(jax.jit, static_argnames=("max_keypoints", "num_scales"))
def detect_keypoints(
    gray: jnp.ndarray,
    max_keypoints: int = 512,
    num_scales: int = 3,
    contrast_threshold: float = 0.02,
    edge_ratio: float = 10.0,
):
    """DoG extrema on the base octave.

    Returns (xy f32[K,2] pixel coords, score f32[K], valid bool[K]).
    Fixed capacity K = max_keypoints via top-k |DoG| response.
    """
    img = gray.astype(jnp.float32) / 255.0
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [1.6 * (k**i) for i in range(num_scales + 3)]
    gauss = [_blur(img, s) for s in sigmas]
    dogs = [gauss[i + 1] - gauss[i] for i in range(len(gauss) - 1)]
    dog = jnp.stack(dogs, axis=0)  # [S+2, H, W]

    h, w = img.shape
    mid = dog[1:-1]  # candidate scales [S, H, W]

    # 3x3x3 neighborhood max/min via shifts
    def nbr_max_min(vol):
        vmax = jnp.full_like(vol[1:-1], -jnp.inf)
        vmin = jnp.full_like(vol[1:-1], jnp.inf)
        for ds in (-1, 0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if ds == 0 and dr == 0 and dc == 0:
                        continue
                    shifted = jnp.roll(dog, (-ds, -dr, -dc), axis=(0, 1, 2))
                    vmax = jnp.maximum(vmax, shifted[1:-1])
                    vmin = jnp.minimum(vmin, shifted[1:-1])
        return vmax, vmin

    nmax, nmin = nbr_max_min(dog)
    is_ext = (mid > nmax) | (mid < nmin)
    strong = jnp.abs(mid) > contrast_threshold

    # Edge rejection: 2x2 Hessian of the DoG at each pixel/scale
    dxx = jnp.roll(mid, -1, 2) + jnp.roll(mid, 1, 2) - 2 * mid
    dyy = jnp.roll(mid, -1, 1) + jnp.roll(mid, 1, 1) - 2 * mid
    dxy = 0.25 * (
        jnp.roll(mid, (-1, -1), (1, 2))
        + jnp.roll(mid, (1, 1), (1, 2))
        - jnp.roll(mid, (-1, 1), (1, 2))
        - jnp.roll(mid, (1, -1), (1, 2))
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    not_edge = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det * r)

    # keep away from borders
    row = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 2)
    margin = 8
    interior = (
        (row >= margin) & (row < h - margin) & (col >= margin) & (col < w - margin)
    )

    score = jnp.where(is_ext & strong & not_edge & interior, jnp.abs(mid), 0.0)
    flat = score.max(axis=0).reshape(-1)  # collapse scales
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    valid = top_scores > 0
    return jnp.stack([xs, ys], axis=-1), top_scores, valid


@partial(jax.jit, static_argnames=())
def compute_descriptors(gray: jnp.ndarray, xy: jnp.ndarray, valid: jnp.ndarray):
    """128-d descriptors (4x4 spatial x 8 orientation bins) in a 16x16
    patch around each keypoint, rotated to the dominant gradient
    orientation, L2-normalized with SIFT's 0.2 clamp."""
    img = gray.astype(jnp.float32) / 255.0
    img_s = _blur(img, 1.6)
    gx = 0.5 * (jnp.roll(img_s, -1, 1) - jnp.roll(img_s, 1, 1))
    gy = 0.5 * (jnp.roll(img_s, -1, 0) - jnp.roll(img_s, 1, 0))
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    h, w = img.shape

    offs = jnp.arange(-8, 8, dtype=jnp.float32) + 0.5  # 16 samples

    def per_kp(p):
        cx, cy = p[0], p[1]
        xs = jnp.clip((cx + offs).astype(jnp.int32), 0, w - 1)
        ys = jnp.clip((cy + offs).astype(jnp.int32), 0, h - 1)
        m = mag[ys][:, xs]      # [16,16]
        a = ang[ys][:, xs]

        # dominant orientation: 36-bin histogram
        bins36 = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
        hist36 = jax.ops.segment_sum(m.reshape(-1), bins36.reshape(-1), 36)
        main = (jnp.argmax(hist36).astype(jnp.float32) + 0.5) / 36 * 2 * jnp.pi - jnp.pi

        a_rel = jnp.mod(a - main + jnp.pi, 2 * jnp.pi)  # [0, 2pi)
        obin = jnp.floor(a_rel / (2 * jnp.pi) * 8).astype(jnp.int32) % 8
        r_id = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0) // 4
        c_id = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1) // 4
        cell = (r_id * 4 + c_id) * 8 + obin  # [16,16] in [0,128)
        desc = jax.ops.segment_sum(m.reshape(-1), cell.reshape(-1), 128)
        desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)
        desc = jnp.minimum(desc, 0.2)
        return desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)

    descs = jax.vmap(per_kp)(xy)
    return jnp.where(valid[:, None], descs, 0.0)


@partial(jax.jit, static_argnames=())
def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float = 0.3,
):
    """2-NN matching with Lowe's ratio test (reference ratio 0.3,
    capture_opencv.hpp:66): for each A descriptor the two nearest B
    descriptors by L2; keep if d1 < ratio * d2. One MXU matmul.

    Returns (idx_b i32[K], good bool[K])."""
    # L2^2 = ||a||^2 + ||b||^2 - 2ab ; descriptors are unit norm -> 2 - 2ab
    sim = jnp.matmul(
        desc_a, desc_b.T, precision=jax.lax.Precision.HIGHEST
    )
    d2 = 2.0 - 2.0 * sim
    d2 = jnp.where(valid_b[None, :], d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, 2)
    d1, d2nd = -neg_top[:, 0], -neg_top[:, 1]
    good = (
        valid_a
        & jnp.isfinite(d1)
        & jnp.isfinite(d2nd)
        & (jnp.sqrt(jnp.maximum(d1, 0.0)) < ratio * jnp.sqrt(jnp.maximum(d2nd, 1e-20)))
    )
    return idx[:, 0], good
