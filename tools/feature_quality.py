"""X8 feature quality measurement (VERDICT r1 #9).

Round 1 shipped the SIFT-class detector/descriptor (ops/keypoints.py)
with documented divergences from OpenCV but no measurement of whether the
odometry features are usable. This tool quantifies, on synthetic frames
warped by KNOWN homographies:

  * detector repeatability: fraction of keypoints in A whose H-mapped
    location has a keypoint in B within ``tol`` px;
  * match inlier rate: fraction of ratio-test survivors consistent with
    the ground-truth homography within ``tol`` px;
  * matches per frame at the reference's ratio 0.3
    (/root/reference/src/capture_opencv.hpp:66) and at 0.7.

OpenCV's real SIFT (cv2.SIFT_create, third-party) runs on the same pairs
as the yardstick. tests/test_feature_quality.py pins minimum thresholds;
RESULTS.md records the table.

Usage: python tools/feature_quality.py
(Note: under this image's axon sitecustomize the run executes on the
TPU chip — JAX_PLATFORMS=cpu in the env does not stick; see
tests/conftest.py. Defaults r5: 3 octaves, 3 orientations, mutual
cross-check, scale gate off.)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_images(size=(320, 240)):
    """Grayscale frames from the synthetic room renderer (the workload's
    actual image statistics: checker/stripe texture + box edges)."""
    import jax.numpy as jnp

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.ops.deproject import Intrinsics

    w, h = size
    seq = SyntheticSequence(
        n_frames=2, yaw_step=-0.3, intr=Intrinsics.simple(w, h)
    )
    grays = []
    for _, color in seq.frames():
        c = np.asarray(color).astype(np.float32)
        grays.append(
            (0.299 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2])
            .astype(np.uint8)
        )
    return grays


def homographies(w, h):
    """Named ground-truth warps (moderate, odometry-scale)."""
    import cv2

    cx, cy = w / 2.0, h / 2.0
    out = {}
    out["shift"] = np.array(
        [[1, 0, 9.0], [0, 1, -6.0], [0, 0, 1]], np.float64
    )
    r = cv2.getRotationMatrix2D((cx, cy), 8.0, 1.0)  # 8 degrees
    out["rotate8"] = np.vstack([r, [0, 0, 1]])
    s = cv2.getRotationMatrix2D((cx, cy), 0.0, 1.12)
    out["scale1.12"] = np.vstack([s, [0, 0, 1]])
    p = np.eye(3)
    p[2, 0] = 2.5e-4
    p[0, 2] = 4.0
    out["perspective"] = p
    return out


def _apply_h(hmat, xy):
    xy1 = np.concatenate([xy, np.ones((len(xy), 1))], axis=1)
    m = xy1 @ hmat.T
    return m[:, :2] / m[:, 2:3]


def measure_ours(
    gray_a, gray_b, hmat, tol=3.0, ratio=0.3, max_kp=512,
    num_orientations=3, scale_gate=0.0, num_octaves=3, mutual=True,
):
    import jax.numpy as jnp

    from rspc_tpu.ops.keypoints import (
        compute_descriptors,
        detect_keypoints,
        match_descriptors,
    )

    ga, gb = jnp.asarray(gray_a), jnp.asarray(gray_b)
    xy_a, _, va, sa = detect_keypoints(
        ga, max_keypoints=max_kp, num_octaves=num_octaves
    )
    xy_b, _, vb, sb = detect_keypoints(
        gb, max_keypoints=max_kp, num_octaves=num_octaves
    )
    # multiple-orientation emission (Lowe's 0.8x rule): descriptors come
    # back [N*K, 128] with their own validity; keypoints/sigmas expand by
    # repeat, exactly OpenCV's duplicated-keypoint list. The sigma pair
    # feeds the matcher's scale-consistency gate (VERDICT r4 #4).
    n = num_orientations
    da, va2 = compute_descriptors(
        ga, xy_a, va, sa, num_orientations=n, num_octaves=num_octaves
    )
    db, vb2 = compute_descriptors(
        gb, xy_b, vb, sb, num_orientations=n, num_octaves=num_octaves
    )
    idx, good = match_descriptors(
        da, va2, db, vb2, ratio=ratio,
        sigma_a=jnp.repeat(sa, n, axis=0),
        sigma_b=jnp.repeat(sb, n, axis=0),
        scale_gate=scale_gate,
        mutual_group=n if mutual else 0,
    )

    xy_a2 = np.repeat(np.asarray(xy_a), n, axis=0)
    xy_b2 = np.repeat(np.asarray(xy_b), n, axis=0)
    va2, vb2 = np.asarray(va2), np.asarray(vb2)
    idx, good = np.asarray(idx), np.asarray(good)
    return _stats(
        xy_a2, va2, xy_b2, vb2, idx, good, hmat, tol, gray_a.shape
    )


def measure_opencv(gray_a, gray_b, hmat, tol=3.0, ratio=0.3, max_kp=512):
    import cv2

    sift = cv2.SIFT_create(nfeatures=max_kp)
    kp_a, da = sift.detectAndCompute(gray_a, None)
    kp_b, db = sift.detectAndCompute(gray_b, None)
    if da is None or db is None or len(kp_a) < 2 or len(kp_b) < 2:
        return None
    xy_a = np.float64([k.pt for k in kp_a])
    xy_b = np.float64([k.pt for k in kp_b])
    bf = cv2.BFMatcher()
    knn = bf.knnMatch(da, db, k=2)
    idx = np.zeros(len(kp_a), np.int64)
    good = np.zeros(len(kp_a), bool)
    for pair in knn:
        if len(pair) == 2:
            m, n = pair
            if m.distance < ratio * n.distance:
                idx[m.queryIdx] = m.trainIdx
                good[m.queryIdx] = True
    va = np.ones(len(kp_a), bool)
    vb = np.ones(len(kp_b), bool)
    return _stats(xy_a, va, xy_b, vb, idx, good, hmat, tol, gray_a.shape)


def _stats(xy_a, va, xy_b, vb, idx, good, hmat, tol, shape):
    h, w = shape
    mapped = _apply_h(hmat, xy_a)
    in_view = (
        (mapped[:, 0] >= 8)
        & (mapped[:, 0] < w - 8)
        & (mapped[:, 1] >= 8)
        & (mapped[:, 1] < h - 8)
        & va
    )
    # repeatability: mapped A keypoint has a B keypoint within tol
    bxy = xy_b[vb]
    rep_hits = 0
    for p in mapped[in_view]:
        if len(bxy) and np.min(((bxy - p) ** 2).sum(1)) <= tol * tol:
            rep_hits += 1
    repeatability = rep_hits / max(in_view.sum(), 1)

    good = good & in_view
    n_matches = int(good.sum())
    if n_matches:
        err = np.sqrt(
            ((xy_b[idx[good]] - mapped[good]) ** 2).sum(1)
        )
        inlier_rate = float((err <= tol).mean())
    else:
        inlier_rate = float("nan")
    return {
        "kp_a": int(va.sum()),
        "kp_b": int(vb.sum()),
        "repeatability": float(repeatability),
        "n_matches": n_matches,
        "inlier_rate": inlier_rate,
    }


def run(tol=3.0):
    grays = test_images()
    ga = grays[0]
    import cv2

    rows = []
    for name, hmat in homographies(ga.shape[1], ga.shape[0]).items():
        gb = cv2.warpPerspective(ga, hmat, (ga.shape[1], ga.shape[0]))
        for ratio in (0.3, 0.7):
            ours = measure_ours(ga, gb, hmat, tol, ratio)
            ref = measure_opencv(ga, gb, hmat, tol, ratio)
            rows.append((name, ratio, ours, ref))
    return rows


def main():
    rows = run()
    print(
        f"{'warp':<12} {'ratio':<6} {'impl':<7} {'kp':<5} {'repeat':<8} "
        f"{'matches':<8} {'inliers'}"
    )
    for name, ratio, ours, ref in rows:
        for label, r in (("ours", ours), ("opencv", ref)):
            if r is None:
                continue
            print(
                f"{name:<12} {ratio:<6} {label:<7} {r['kp_a']:<5} "
                f"{r['repeatability']:<8.3f} {r['n_matches']:<8} "
                f"{r['inlier_rate']:.3f}"
            )


if __name__ == "__main__":
    main()
