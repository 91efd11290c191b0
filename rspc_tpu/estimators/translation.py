"""Grid-search translation estimation from keypoint correspondences.

TPU-native replacement for the reference's ``TranslationEstimator``
(src/translation_estimator.hpp): per-axis exhaustive search over candidate
translations scored by the axis-wise sum of squared differences between
rotated+translated comparison keypoints and reference keypoints.

The reference's triple loop (3 axes x 500 candidates x K correspondences,
:36-69) collapses into one vectorized broadcast: because a translation along
axis ``a`` only shifts coordinate ``a``, the score is
``sum_k (rot_cmp[k,a] + m - ref[k,a])^2`` — a [C,3] tensor over all
candidates and axes at once, followed by a per-axis argmin. First-minimum
tie-breaking matches the reference's strict ``<`` scan (:60-67).

Semantics reproduced exactly:
  * candidate magnitudes: ``m_i = -(max_iterations/200) + 0.01*i`` for
    ``i < max_iterations`` (default 500 -> [-2.5, 2.49]) (:37-42);
  * rotation applied to cmp keypoints:
    ``Rz(rot.x) @ Ry(-rot.y) @ Rx(rot.z)`` — the same axis mapping as the
    ICP scheme's initial guess (:17-19, SURVEY.md C8);
  * the result combines the per-axis argmins diagonally (:28-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rspc_tpu.ops.transform import rotation_matrix


def estimate_translation(
    ref_kpts: jnp.ndarray,
    cmp_kpts: jnp.ndarray,
    rotation_theta: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    max_iterations: int = 500,
    step: float = 0.01,
) -> jnp.ndarray:
    """Estimate a translation ``f32[3]`` from paired 3-D keypoints.

    ref_kpts/cmp_kpts: ``f32[K,3]``; rotation_theta: the IMU theta consumed
    with the reference's axis mapping; weights: optional ``f32[K]`` validity
    mask (the reference has no padding — pass None for exact parity).
    """
    dtype = ref_kpts.dtype
    r = (
        rotation_matrix(rotation_theta[0], 2)
        @ rotation_matrix(-rotation_theta[1], 1)
        @ rotation_matrix(rotation_theta[2], 0)
    ).astype(dtype)
    rot_cmp = cmp_kpts @ r.T  # [K,3]

    base = -1.0 * (max_iterations / 200.0)
    mags = base + step * jnp.arange(max_iterations, dtype=dtype)  # [C]

    diff = rot_cmp - ref_kpts  # [K,3]
    if weights is None:
        w = jnp.ones(ref_kpts.shape[0], dtype)
    else:
        w = weights.astype(dtype)
    # score[c, a] = sum_k w_k (diff[k,a] + m_c)^2
    scores = jnp.sum(
        w[None, :, None] * (diff[None, :, :] + mags[:, None, None]) ** 2, axis=1
    )  # [C,3]
    best = jnp.argmin(scores, axis=0)  # first min on ties, like the reference
    return jnp.take(mags, best)
