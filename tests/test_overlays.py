"""Viz overlay helper tests (IMU axes, pose text, mosaic)."""

import numpy as np

from rspc_tpu.viz.overlays import (
    calc_grid,
    frames_mosaic,
    pose_text,
    render_imu_axes,
)


def test_render_imu_axes_draws():
    img = render_imu_axes([0.1, 3.14, -0.2], accel=[0, -9.8, 0.5])
    assert img.shape == (256, 256, 3)
    # some non-background pixels in each axis color channel
    assert (img[..., 0] == 255).any()
    assert (img != 40).any(axis=-1).sum() > 100


def test_pose_text():
    s = pose_text([1, 2, 3], [0.1, 0.2, 0.3], velocity=[0, 0, 0.5])
    assert "translation" in s and "+1.000" in s
    assert "velocity" in s


def test_calc_grid():
    assert calc_grid(1) == (1, 1)
    assert calc_grid(2) == (1, 2)
    assert calc_grid(4) == (2, 2)
    assert calc_grid(5) == (2, 3)


def test_frames_mosaic():
    frames = [np.full((8, 10, 3), i * 40, np.uint8) for i in range(5)]
    m = frames_mosaic(frames)
    assert m.shape == (16, 30, 3)
    assert (m[:8, :10] == 0).all()
    assert (m[8:16, 10:20] == 160).all()
