"""Batched RANSAC homography estimation.

TPU-native counterpart of the reference's ``cv::findHomography(RANSAC)``
(SURVEY.md X8; src/capture_opencv.hpp:96-99 — computed, dumped to jpg, and
explicitly documented as not contributing to the result). Instead of
OpenCV's sequential hypothesize-and-verify loop, ALL hypotheses are drawn
up front and solved as one batched 8x9 SVD + one [H, K] inlier count —
the RANSAC loop becomes two MXU/VPU passes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dlt_homography(src4: jnp.ndarray, dst4: jnp.ndarray) -> jnp.ndarray:
    """4-point DLT: builds the 8x9 system and returns H (3x3, h22-normalized)."""
    x, y = src4[:, 0], src4[:, 1]
    u, v = dst4[:, 0], dst4[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    rows_v = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)  # [8, 9]
    # h = null vector of A = right-singular vector of least singular value
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    h = vt[-1]
    h = h / jnp.where(jnp.abs(h[8]) > 1e-12, h[8], 1.0)
    return h.reshape(3, 3)


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_homography(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    threshold: float = 3.0,
    num_hypotheses: int = 512,
    seed: int = 0,
):
    """Estimate a homography mapping src -> dst (pixel coords).

    src, dst: f32[K,2]; valid: bool[K]. Returns (H f32[3,3],
    inlier_mask bool[K], n_inliers i32). All hypotheses evaluated at once.
    """
    k = src.shape[0]
    key = jax.random.PRNGKey(seed)
    # Sample from valid matches: weight invalids to ~zero probability.
    logits = jnp.where(valid, 0.0, -1e9)
    picks = jax.random.categorical(
        key, logits[None, :], shape=(num_hypotheses, 4)
    )  # [H,4]

    src_sets = jnp.take(src, picks.reshape(-1), axis=0).reshape(
        num_hypotheses, 4, 2
    )
    dst_sets = jnp.take(dst, picks.reshape(-1), axis=0).reshape(
        num_hypotheses, 4, 2
    )
    hs = jax.vmap(_dlt_homography)(src_sets, dst_sets)  # [H,3,3]

    ones = jnp.ones((k, 1), src.dtype)
    src_h = jnp.concatenate([src, ones], axis=-1)  # [K,3]
    proj = jnp.einsum("hij,kj->hki", hs, src_h)    # [H,K,3]
    zden = jnp.where(jnp.abs(proj[..., 2]) > 1e-12, proj[..., 2], 1e-12)
    uv = proj[..., :2] / zden[..., None]
    err = jnp.sum((uv - dst[None, :, :]) ** 2, axis=-1)  # [H,K]
    inl = (err < threshold**2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    finite = jnp.all(jnp.isfinite(hs.reshape(num_hypotheses, -1)), axis=-1)
    counts = jnp.where(finite, counts, -1)
    best = jnp.argmax(counts)
    return hs[best], inl[best], counts[best].astype(jnp.int32)
