"""NDT registration tests."""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import NDTConfig
from rspc_tpu.ops.transform import make_rigid, rotation_matrix
from rspc_tpu.registration.ndt import (
    _matrix_to_pose,
    _pose_to_matrix,
    build_ndt_grid,
    ndt_align,
)


def _scene(n=2000, seed=0, extent=4.0):
    """Structured scene spanning several 1m voxels: two walls + floor."""
    rng = np.random.default_rng(seed)
    n3 = n // 3
    wall1 = np.stack(
        [
            rng.uniform(0, extent, n3),
            rng.uniform(0, 2.5, n3),
            np.full(n3, extent) + rng.normal(0, 0.01, n3),
        ],
        axis=1,
    )
    wall2 = np.stack(
        [
            np.full(n3, extent) + rng.normal(0, 0.01, n3),
            rng.uniform(0, 2.5, n3),
            rng.uniform(0, extent, n3),
        ],
        axis=1,
    )
    floor = np.stack(
        [
            rng.uniform(0, extent, n - 2 * n3),
            rng.normal(0, 0.01, n - 2 * n3),
            rng.uniform(0, extent, n - 2 * n3),
        ],
        axis=1,
    )
    return np.concatenate([wall1, wall2, floor]).astype(np.float32)


def test_pose_matrix_roundtrip():
    p = jnp.array([0.1, -0.2, 0.3, 0.2, -0.4, 0.6], jnp.float32)
    t = _pose_to_matrix(p)
    p2 = _matrix_to_pose(t)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-5)
    # rotation order: Rx @ Ry @ Rz
    r_want = np.asarray(
        rotation_matrix(jnp.float32(0.2), 0)
        @ rotation_matrix(jnp.float32(-0.4), 1)
        @ rotation_matrix(jnp.float32(0.6), 2)
    )
    np.testing.assert_allclose(np.asarray(t)[:3, :3], r_want, atol=1e-6)


def test_grid_statistics():
    rng = np.random.default_rng(1)
    # 20 points in one voxel, 3 in another (below min_points_per_voxel)
    a = rng.normal(0, 0.1, (20, 3)).astype(np.float32) + [0.5, 0.5, 0.5]
    b = rng.normal(0, 0.1, (3, 3)).astype(np.float32) + [5.5, 0.5, 0.5]
    cloud = Cloud.from_numpy(np.concatenate([a, b]))
    cfg = NDTConfig(dense_grid_dim=16)
    grid = build_ndt_grid(cloud, cfg)
    valid = np.asarray(grid.valid)
    assert valid.sum() == 1  # only the 20-point voxel qualifies
    mean = np.asarray(grid.means)[valid][0]
    np.testing.assert_allclose(mean, a.mean(axis=0), atol=1e-5)
    # inverse covariance ~ inverse of the sample covariance
    cov = np.cov(a.T)  # n-1 normalization
    icov = np.asarray(grid.inv_covs)[valid][0]
    np.testing.assert_allclose(icov @ cov, np.eye(3), atol=0.05)


def test_ndt_recovers_small_transform():
    pts = _scene()
    r = np.asarray(rotation_matrix(jnp.float32(0.05), 1))
    t = np.array([0.08, -0.04, 0.06], np.float32)
    moved = (pts @ r.T + t).astype(np.float32)
    cfg = NDTConfig(dense_grid_dim=16)
    grid = build_ndt_grid(Cloud.from_numpy(moved), cfg)
    res = ndt_align(Cloud.from_numpy(pts), grid, cfg)
    assert bool(res.converged)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:3, :3], r, atol=5e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=5e-2)
    assert float(res.score) > 0


def test_ndt_with_guess_handles_large_rotation():
    pts = _scene(seed=2)
    rads = -0.5
    r = np.asarray(rotation_matrix(jnp.float32(rads), 1))
    moved = (pts @ r.T).astype(np.float32)
    cfg = NDTConfig(dense_grid_dim=16)
    grid = build_ndt_grid(Cloud.from_numpy(moved), cfg)
    guess = make_rigid(rotation_matrix(jnp.float32(rads), 1))
    res = ndt_align(Cloud.from_numpy(pts), grid, cfg, init_guess=guess)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:3, :3], r, atol=2e-2)
    np.testing.assert_allclose(T[:3, 3], np.zeros(3), atol=0.1)


def test_ndt_identity_stays_identity():
    pts = _scene(seed=3)
    cfg = NDTConfig(dense_grid_dim=16)
    grid = build_ndt_grid(Cloud.from_numpy(pts), cfg)
    res = ndt_align(Cloud.from_numpy(pts), grid, cfg)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T, np.eye(4), atol=2e-2)
    assert float(res.trans_probability) > 0.5


def test_dense_sweep_matches_gather_path():
    """NDTConfig.sweep_cells: the gather-free dense compact-cell sweep
    must reproduce the widened-table gather path to fp reduction noise
    (same masked sum, same frozen-neighborhood semantics; equivalence
    argument in registration/ndt.py::_compact_cells) on all three
    neighborhoods."""
    import dataclasses

    pts = _scene(seed=5)
    moved = (pts + np.float32([0.05, -0.03, 0.02])).astype(np.float32)
    for nb in (27, 7, 1):
        cfg = NDTConfig(dense_grid_dim=16, neighborhood=nb, max_iterations=12)
        cfg_d = dataclasses.replace(cfg, sweep_cells=256)
        grid = build_ndt_grid(Cloud.from_numpy(moved), cfg)
        rg = ndt_align(Cloud.from_numpy(pts), grid, cfg)
        rd = ndt_align(Cloud.from_numpy(pts), grid, cfg_d)
        assert int(rg.iterations) == int(rd.iterations), nb
        np.testing.assert_allclose(
            np.asarray(rg.transform), np.asarray(rd.transform), atol=5e-6
        )
        np.testing.assert_allclose(
            float(rg.score), float(rd.score), rtol=1e-4
        )


def test_dense_sweep_cell_overflow_drops_extras():
    """Valid cells beyond the sweep_cells cap are dropped (documented);
    with a cap comfortably above the occupied count the result is
    exact."""
    import dataclasses

    pts = _scene(seed=6)
    cfg = NDTConfig(dense_grid_dim=16, max_iterations=6)
    grid = build_ndt_grid(Cloud.from_numpy(pts), cfg)
    n_valid = int(np.asarray(grid.valid).sum())
    assert n_valid > 4
    # generous cap: exact
    cfg_big = dataclasses.replace(cfg, sweep_cells=max(64, 2 * n_valid))
    res = ndt_align(Cloud.from_numpy(pts), grid, cfg_big)
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=2e-2)
