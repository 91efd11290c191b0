"""Capture v2: full-resolution clouds + keypoint visual odometry.

Reproduces the reference's ``get_clouds_new`` pipeline
(src/capture_opencv.hpp:239-358; SURVEY.md C9), used by ``--capture``:

  1. the same throttled IMU capture loop as v1 (replay.get_clouds);
  2. FULL-resolution organized clouds (no 3/5 crop, :128-160);
  3. per consecutive frame pair: keypoints + descriptors on both color
     frames, 2-NN ratio matching (Lowe 0.3), RANSAC homography (computed
     for parity; the reference marks it "does not contribute to the end
     result", :95);
  4. matched pixels lifted to 3-D through the organized cloud
     (``cloud->at(x, y)``, :332-343);
  5. grid-search TranslationEstimator + per-frame theta -> a 4x4 pose per
     frame (identity for frame 0, :312-314).

Reference quirks handled per SURVEY.md §7: ``make_thetas_relative`` is a
no-op in the reference (pass-by-value + wrong rebase index, :228-237) — we
implement the *intended* rebasing against theta_0 and document the
divergence; the caller-discards-transforms behavior lives in the CLI
(cli.capture saves only clouds, like main.cpp:44-53), while this function
returns the transforms for users who actually want the odometry.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.config import CaptureConfig, TranslationEstimatorConfig
from rspc_tpu.capture.replay import ReplaySource, get_clouds
from rspc_tpu.estimators.translation import estimate_translation
from rspc_tpu.ops.keypoints import (
    compute_descriptors,
    detect_keypoints,
    match_descriptors,
)
from rspc_tpu.ops.ransac import ransac_homography
from rspc_tpu.ops.transform import make_rigid, rotation_matrix


def _gray(rgb: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(rgb, axis=-1)


def _dump_matches(debug_dir, pair_idx, prev, cur, xy_ref, xy_cmp, good):
    """Side-by-side match visualization PNG (reference: drawMatches ->
    matches.jpg, capture_opencv.hpp:74-79)."""
    import os

    from rspc_tpu.viz.png import write_png

    a = np.asarray(prev.rgb).astype(np.uint8)
    b = np.asarray(cur.rgb).astype(np.uint8)
    canvas = np.concatenate([a, b], axis=1)
    w = a.shape[1]
    for (x0, y0), (x1, y1) in zip(xy_ref[good], xy_cmp[good]):
        for (x, y) in ((int(x0), int(y0)), (int(x1) + w, int(y1))):
            ys = slice(max(y - 1, 0), min(y + 2, canvas.shape[0]))
            xs = slice(max(x - 1, 0), min(x + 2, canvas.shape[1]))
            canvas[ys, xs] = [255, 0, 0]
    os.makedirs(debug_dir, exist_ok=True)
    write_png(os.path.join(debug_dir, f"matches-{pair_idx}.png"), canvas)


def _pose_from_theta_translation(theta, translation) -> np.ndarray:
    """T * Rz(theta.x) * Ry(-theta.y) * Rx(theta.z) — the same axis mapping
    as the ICP scheme guess (capture_opencv.hpp:346-349)."""
    r = (
        rotation_matrix(jnp.float32(theta[0]), 2)
        @ rotation_matrix(jnp.float32(-theta[1]), 1)
        @ rotation_matrix(jnp.float32(theta[2]), 0)
    )
    return np.asarray(make_rigid(r, jnp.asarray(translation, jnp.float32)))


def get_clouds_new(
    source: ReplaySource,
    nr_frames: int,
    config: CaptureConfig = CaptureConfig(center_crop=False),
    translation_config: TranslationEstimatorConfig = TranslationEstimatorConfig(),
    max_keypoints: int = 512,
    debug_dir: str | None = None,
) -> List[Tuple[OrganizedCloud, np.ndarray]]:
    """Returns [(cloud, pose 4x4)] per frame — the v2 capture contract.

    ``debug_dir``: when set, writes per-pair match visualizations
    (``matches-{i}.png``: the two frames side by side with matched
    keypoints marked), the PNG equivalent of the reference's
    drawMatches -> matches.jpg / per-frame imshow windows
    (capture_opencv.hpp:40-45,74-79)."""
    cfg = CaptureConfig(
        throttle_ns=config.throttle_ns,
        center_crop=False,  # v2 is always full resolution
        depth_scale=config.depth_scale,
        bgr_color=config.bgr_color,
    )
    clouds, thetas = get_clouds(source, nr_frames, cfg)
    if not clouds:
        return []

    # intended behavior of make_thetas_relative (no-op in the reference)
    rel_thetas = thetas.copy()
    rel_thetas[1:] = thetas[1:] - thetas[0]

    results: List[Tuple[OrganizedCloud, np.ndarray]] = [
        (clouds[0], np.eye(4, dtype=np.float32))
    ]
    for i in range(1, len(clouds)):
        prev, cur = clouds[i - 1], clouds[i]
        g0, g1 = _gray(prev.rgb), _gray(cur.rgb)

        xy0, _, v0, s0 = detect_keypoints(g0, max_keypoints=max_keypoints)
        xy1, _, v1, s1 = detect_keypoints(g1, max_keypoints=max_keypoints)
        # multiple-orientation descriptors (Lowe's 0.8x rule): [3K, 128]
        # rows 3i..3i+2 belong to keypoint i; keypoints expand by repeat
        # like OpenCV's duplicated-keypoint list. Matching adds the
        # mutual cross-check (measured r5: kills the same-scale
        # wrong-position duplicates self-similar texture produces; every
        # warp >= 0.95 inliers on the quality suite).
        n_ori = 3
        d0, v0e = compute_descriptors(g0, xy0, v0, s0, num_orientations=n_ori)
        d1, v1e = compute_descriptors(g1, xy1, v1, s1, num_orientations=n_ori)
        idx_b, good = match_descriptors(
            d0, v0e, d1, v1e, ratio=0.3, mutual_group=n_ori
        )
        xy0e = jnp.repeat(xy0, n_ori, axis=0)
        xy1e = jnp.repeat(xy1, n_ori, axis=0)

        xy_ref = np.asarray(xy0e)
        xy_cmp = np.asarray(jnp.take(xy1e, idx_b, axis=0))
        good_np = np.asarray(good)

        if debug_dir is not None:
            _dump_matches(debug_dir, i, prev, cur, xy_ref, xy_cmp, good_np)

        # homography for parity (unused downstream, like the reference)
        ransac_homography(
            jnp.asarray(xy_cmp), jnp.asarray(xy_ref), jnp.asarray(good)
        )

        # lift matched pixels to 3-D via the organized clouds (cloud->at(x,y))
        def lift(oc, xy):
            xs = np.clip(xy[:, 0].astype(int), 0, oc.width - 1)
            ys = np.clip(xy[:, 1].astype(int), 0, oc.height - 1)
            pts = np.asarray(oc.xyz)[ys, xs]
            ok = np.asarray(oc.valid)[ys, xs]
            return pts, ok

        p_ref, ok_r = lift(prev, xy_ref)
        p_cmp, ok_c = lift(cur, xy_cmp)
        w = (good_np & ok_r & ok_c).astype(np.float32)

        if w.sum() >= 3:
            translation = np.asarray(
                estimate_translation(
                    jnp.asarray(p_ref),
                    jnp.asarray(p_cmp),
                    jnp.asarray(rel_thetas[i], jnp.float32),
                    weights=jnp.asarray(w),
                    max_iterations=translation_config.max_iterations,
                    step=translation_config.step,
                )
            )
        else:
            translation = np.zeros(3, np.float32)

        pose = _pose_from_theta_translation(rel_thetas[i], translation)
        results.append((cur, pose))
    return results
