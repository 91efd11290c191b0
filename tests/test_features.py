"""Keypoint / descriptor / matching / RANSAC / odometry tests."""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.capture.synthetic import SyntheticSequence
from rspc_tpu.ops.deproject import Intrinsics
from rspc_tpu.ops.keypoints import (
    compute_descriptors,
    detect_keypoints,
    match_descriptors,
)
from rspc_tpu.ops.ransac import ransac_homography


def _corner_image(h=96, w=128, seed=0):
    """Blobs at known positions on a flat background."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 64.0, np.float32)
    pts = []
    for _ in range(12):
        y, x = rng.integers(16, h - 16), rng.integers(16, w - 16)
        img[y - 2 : y + 3, x - 2 : x + 3] = 220.0
        pts.append((x, y))
    return img, np.array(pts)


def test_detect_keypoints_on_blobs():
    img, pts = _corner_image()
    xy, score, valid, sigma = detect_keypoints(jnp.asarray(img), max_keypoints=64)
    xy, valid = np.asarray(xy), np.asarray(valid)
    assert valid.sum() >= 8
    # every strong detection is near a blob
    found = xy[valid]
    d = np.sqrt(((found[:, None, :] - pts[None, :, :]) ** 2).sum(-1)).min(1)
    # most detections localize on a blob (DoG ring responses allowed ~6px)
    assert (d <= 4.0).mean() > 0.7
    assert d.max() <= 8.0


def test_detect_keypoints_tiny_image_no_crash():
    """Images below the 48 px octave floor must still return a result
    (octave 0 runs unconditionally; ADVICE r3): a 32x40 input previously
    crashed on an empty concatenate."""
    img = np.zeros((32, 40), np.float32)
    img[12:15, 18:21] = 200.0
    xy, score, valid, sigma = detect_keypoints(
        jnp.asarray(img), max_keypoints=16
    )
    assert xy.shape == (16, 2)
    assert np.asarray(valid).dtype == bool  # well-formed, possibly empty


def test_descriptor_match_translated_image():
    img, _ = _corner_image(seed=1)
    shift = 5
    img2 = np.roll(img, shift, axis=1)
    xy1, _, v1, s1 = detect_keypoints(jnp.asarray(img), max_keypoints=64)
    xy2, _, v2, s2 = detect_keypoints(jnp.asarray(img2), max_keypoints=64)
    d1 = compute_descriptors(jnp.asarray(img), xy1, v1, s1)
    d2 = compute_descriptors(jnp.asarray(img2), xy2, v2, s2)
    idx, good = match_descriptors(d1, v1, d2, v2, ratio=0.8)
    good = np.asarray(good)
    assert good.sum() >= 5
    # matched pairs should differ by the known shift
    a = np.asarray(xy1)[good]
    b = np.asarray(jnp.take(xy2, idx, axis=0))[good]
    dx = b[:, 0] - a[:, 0]
    dy = b[:, 1] - a[:, 1]
    assert np.median(np.abs(dx - shift)) <= 1.0
    assert np.median(np.abs(dy)) <= 1.0


def test_ransac_homography_recovers_affine():
    rng = np.random.default_rng(2)
    src = rng.uniform(0, 100, (64, 2)).astype(np.float32)
    h_true = np.array([[1.02, 0.01, 3.0], [-0.01, 0.98, -2.0], [0, 0, 1.0]], np.float32)
    ones = np.ones((64, 1), np.float32)
    proj = np.concatenate([src, ones], axis=1) @ h_true.T
    dst = (proj[:, :2] / proj[:, 2:3]).astype(np.float32)
    # corrupt 20% with gross outliers
    dst[50:] += rng.uniform(20, 40, (14, 2)).astype(np.float32)
    valid = np.ones(64, bool)
    h, inl, n = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), threshold=2.0
    )
    h = np.asarray(h)
    assert int(n) >= 45
    np.testing.assert_allclose(h, h_true, atol=0.05)
    assert not np.asarray(inl)[50:].any()


def test_get_clouds_new_odometry():
    from rspc_tpu.capture.odometry import get_clouds_new
    from rspc_tpu.cli import _source

    seq = SyntheticSequence(n_frames=2, yaw_step=-0.05, intr=Intrinsics.simple(160, 120))
    # reuse the CLI's synthetic replay packaging
    import numpy as np

    depths, colors = [], []
    for d, c in seq.frames():
        depths.append(np.asarray(d))
        colors.append(np.asarray(c))
    stream, snap = seq.imu_stream()
    from rspc_tpu.capture.replay import ReplaySource

    src = ReplaySource(
        {
            "depth": np.stack(depths),
            "color": np.stack(colors),
            "ts": np.asarray(stream.ts)[snap],
            "gyro": np.asarray(stream.data)[snap - 1],
            "accel": np.asarray(stream.data)[snap],
            "intr": np.asarray(
                [seq.intr.width, seq.intr.height, seq.intr.fx, seq.intr.fy,
                 seq.intr.ppx, seq.intr.ppy],
                np.float32,
            ),
        }
    )
    from rspc_tpu.config import CaptureConfig

    pairs = get_clouds_new(
        src, 2, CaptureConfig(center_crop=False, bgr_color=False)
    )
    assert len(pairs) == 2
    c0, t0 = pairs[0]
    c1, t1 = pairs[1]
    np.testing.assert_array_equal(t0, np.eye(4))
    assert c1.height == 120 and c1.width == 160  # full res, no crop
    # pose rotation should reflect the IMU yaw (Ry(+0.05) mapping)
    want_r = np.asarray(
        jnp.asarray(seq.gt_transform(1), jnp.float32)
    )[:3, :3]
    np.testing.assert_allclose(t1[:3, :3], want_r, atol=5e-3)
    assert np.isfinite(t1).all()


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_match_mutual_cross_check():
    """mutual_group: an A row whose chosen B row round-trips to a
    DIFFERENT A keypoint is rejected; round-trips to any orientation row
    of the SAME keypoint pass (r5, ops/keypoints.py)."""
    rng = np.random.default_rng(0)
    # 2 keypoints x group 2 = 4 A rows; B has 2 rows
    b0 = _unit(rng.normal(size=128))
    b1 = _unit(rng.normal(size=128))
    # A kp0 row0 ~ b0 (good, round-trips); A kp1 row0 ~ b1 but b1's
    # nearest A row is kp0's row1 (planted closer) -> mutual kills it
    a = np.stack([
        _unit(b0 + 0.01 * rng.normal(size=128)),       # kp0 row0
        _unit(b1 + 0.005 * rng.normal(size=128)),      # kp0 row1 (b1's best)
        _unit(b1 + 0.02 * rng.normal(size=128)),       # kp1 row0
        _unit(rng.normal(size=128)),                   # kp1 row1 (noise)
    ])
    b = np.stack([b0, b1])
    va = jnp.ones(4, bool)
    vb = jnp.ones(2, bool)
    idx, good = match_descriptors(
        jnp.asarray(a), va, jnp.asarray(b), vb, ratio=0.8, mutual_group=2
    )
    idx, good = np.asarray(idx), np.asarray(good)
    assert good[0] and idx[0] == 0          # kp0 row0 <-> b0 round-trips
    assert good[1] and idx[1] == 1          # kp0 row1 <-> b1 (same kp0)
    assert not good[2]                      # kp1 -> b1 -> kp0: rejected
    # without the cross-check the kp1->b1 match survives the ratio test
    _, good_raw = match_descriptors(
        jnp.asarray(a), va, jnp.asarray(b), vb, ratio=0.8
    )
    assert np.asarray(good_raw)[2]


def test_match_scale_gate():
    """scale_gate: matches whose sigma ratio contradicts the global
    (median) hypothesis are rejected; with no sigmas or gate off the
    match set is unchanged (r5, ops/keypoints.py)."""
    rng = np.random.default_rng(1)
    k = 9
    b = np.stack([_unit(rng.normal(size=128)) for _ in range(k)])
    a = np.stack([_unit(b[i] + 0.01 * rng.normal(size=128)) for i in range(k)])
    va = jnp.ones(k, bool)
    vb = jnp.ones(k, bool)
    # global scale ~2x; one keypoint's sigma contradicts it by 4x
    sa = jnp.asarray(np.full(k, 1.6, np.float32))
    sb_np = np.full(k, 3.2, np.float32)
    sb_np[4] = 12.8
    sb = jnp.asarray(sb_np)
    idx, good = match_descriptors(
        jnp.asarray(a), va, jnp.asarray(b), vb, ratio=0.8,
        sigma_a=sa, sigma_b=sb, scale_gate=1.5,
    )
    idx, good = np.asarray(idx), np.asarray(good)
    assert (idx[good] == np.where(good)[0]).all()
    assert not good[4] and good.sum() == k - 1
    # gate off: all k survive
    _, good_off = match_descriptors(
        jnp.asarray(a), va, jnp.asarray(b), vb, ratio=0.8
    )
    assert np.asarray(good_off).sum() == k
