"""C13 closure tests: world-frame trajectory render, quat2mat, video
frame formats, key listener, interactive fallback (VERDICT r1 #7)."""

import io
import os

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from rspc_tpu.cloud import Cloud
from rspc_tpu.viz.overlays import (
    KeyListener,
    adjust_ratio,
    show_in_rect,
    video_frame_to_rgb,
)
from rspc_tpu.viz.trajectory import (
    DEPTH_TO_WORLD,
    frustum_lines,
    quat2mat,
    render_trajectory,
    trajectory_from_transforms,
)


def test_quat2mat_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        m = quat2mat(q)  # (x, y, z, w)
        want = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(m[:3, :3], want, atol=1e-6)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=0)


def test_render_trajectory_draws_cloud_and_path():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.3, 0.3, (2000, 3)).astype(np.float32)
    pts[:, 2] += 1.0  # depth-camera convention: +z forward
    cloud = Cloud.from_numpy(
        pts, np.full((2000, 3), [200, 40, 40], np.float32)
    )
    # trajectory is given in WORLD coords (z backward)
    traj = np.array(
        [[0, 0, -0.8], [0.2, -0.05, -1.0], [0.4, -0.1, -1.2]], np.float32
    )
    img = render_trajectory(
        cloud, traj, pose=DEPTH_TO_WORLD, yaw=0.0, pitch=0.0, offset_y=2.0,
        width=320, height=240,
    )
    assert img.shape == (240, 320, 3)
    # trajectory green must appear
    green = (
        (img[..., 1] > 200) & (img[..., 0] < 100) & (img[..., 2] < 100)
    )
    assert green.sum() > 10, "trajectory line not rendered"
    # cloud red must appear
    red = (img[..., 0] > 150) & (img[..., 1] < 100)
    assert red.sum() > 100, "cloud not rendered"


def test_render_trajectory_pose_moves_cloud():
    pts = np.tile(np.float32([[0, 0, -1.0]]), (50, 1))  # world coords
    cloud = Cloud.from_numpy(pts, np.full((50, 3), 255, np.float32))
    kw = dict(yaw=0.0, pitch=0.0, offset_y=2.0, width=160, height=120)
    a = render_trajectory(cloud, np.zeros((0, 3)), **kw)
    q = Rotation.from_euler("y", 25, degrees=True).as_quat()
    b = render_trajectory(cloud, np.zeros((0, 3)), pose=(q, (0.3, 0, 0)), **kw)
    assert (a != b).any(), "pose had no effect"
    # the quat+translation pose path goes through quat2mat (rs2_pose)
    c = render_trajectory(
        cloud, np.zeros((0, 3)), pose=DEPTH_TO_WORLD,
        extrinsics=np.eye(4, dtype=np.float32), **kw
    )
    assert c.shape == (120, 160, 3)


def test_frustum_and_path_from_transforms():
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [1, 2, 3]
    lines = frustum_lines(t)
    assert lines.shape[1] == 3
    np.testing.assert_allclose(lines[0], [1, 2, 3], atol=1e-6)  # apex at cam
    path = trajectory_from_transforms(np.stack([t, t]))
    assert path.shape == (3, 3)
    np.testing.assert_allclose(path[0], [0, 0, 0])
    np.testing.assert_allclose(path[1], [1, 2, 3])


def test_video_frame_formats():
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    np.testing.assert_array_equal(video_frame_to_rgb(rgb, "rgb8"), rgb)
    rgba = np.concatenate([rgb, np.full((2, 4, 1), 7, np.uint8)], axis=-1)
    np.testing.assert_array_equal(video_frame_to_rgb(rgba, "rgba8"), rgb)
    np.testing.assert_array_equal(
        video_frame_to_rgb(rgb, "bgr8"), rgb[..., ::-1]
    )
    y = np.array([[0, 128], [255, 64]], np.uint8)
    g = video_frame_to_rgb(y, "y8")
    assert g.shape == (2, 2, 3) and (g[..., 0] == y).all()
    y10 = np.array([[0, 1023]], np.uint16)
    g10 = video_frame_to_rgb(y10, "y10bpack")
    assert g10[0, 0, 0] == 0 and g10[0, 1, 0] == 255
    with pytest.raises(ValueError, match="not supported"):
        video_frame_to_rgb(rgb, "z16")


def test_adjust_ratio_and_show_in_rect():
    # wide rect, tall frame -> letterboxed left/right
    x, y, w, h = adjust_ratio((200, 100), (50, 100))
    assert h == 100 and w == 50 and x == 75 and y == 0
    canvas = np.zeros((100, 200, 3), np.uint8)
    frame = np.full((100, 50, 3), 255, np.uint8)
    show_in_rect(canvas, frame, (0, 0, 200, 100))
    assert canvas[50, 100, 0] == 255  # centered content
    assert canvas[50, 10, 0] == 0     # letterbox untouched


def test_key_listener_semantics():
    kl = KeyListener()
    assert kl.get_key() == KeyListener.UNKNOWN
    kl.on_key_release(32)
    assert kl.get_key() == 32
    assert kl.get_key() == KeyListener.UNKNOWN  # cleared after read


def test_interactive_non_tty_falls_back_to_png(tmp_path, monkeypatch):
    import sys

    from rspc_tpu.viz.interactive import interactive_view

    monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
    cloud = Cloud.from_numpy(
        np.float32([[0, 0, 1.0]] * 10), np.full((10, 3), 255, np.float32)
    )
    out = tmp_path / "view.png"
    interactive_view(cloud, png_path=str(out), width=64, height=48)
    assert out.exists() and out.stat().st_size > 0


def test_ansi_preview_shape():
    from rspc_tpu.viz.interactive import _ansi_preview

    img = np.zeros((40, 80, 3), np.uint8)
    img[:, :, 0] = 200
    s = _ansi_preview(img, cols=20)
    assert "\x1b[38;2;200;0;0m" in s
    assert s.count("\n") >= 3
