"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.ops.nn import nearest_neighbors
from rspc_tpu.parallel import (
    make_mesh,
    sharded_icp_align,
    sharded_nearest_neighbors,
)
from rspc_tpu.registration.icp import icp_align


def _box(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    axis = rng.integers(0, 3, n)
    side = rng.integers(0, 2, n)
    pts[np.arange(n), axis] = side - 0.5
    pts[:, 2] += 2.0
    return pts


def test_make_mesh_shapes():
    m1 = make_mesh(8, axes=("points",))
    assert m1.shape == {"points": 8}
    m2 = make_mesh(8)
    assert m2.shape == {"data": 2, "points": 4}
    m3 = make_mesh(4)
    assert m3.shape == {"data": 2, "points": 2}


def test_sharded_nn_matches_single_device():
    mesh = make_mesh(8, axes=("points",))
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    sv = jnp.ones(64, bool)
    tv = jnp.ones(256, bool)
    d2s, idxs = sharded_nearest_neighbors(src, sv, tgt, tv, mesh, chunk=32)
    d2r, idxr = nearest_neighbors(src, sv, tgt, tv, chunk=64)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(idxr))
    np.testing.assert_allclose(np.asarray(d2s), np.asarray(d2r), atol=1e-7)


def test_sharded_icp_matches_single_device():
    mesh = make_mesh(8, axes=("points",))
    pts = _box(512, 1)
    r_y = 0.04
    c, s = np.cos(r_y), np.sin(r_y)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.array([0.004, -0.002, 0.003], np.float32)
    moved = (pts @ rot.T + t).astype(np.float32)

    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(moved)
    cfg = ICPConfig(
        transformation_epsilon=1e-8,
        euclidean_fitness_epsilon=1e-12,
        max_iterations=40,
        max_correspondence_distance=0.1,
        target_chunk=128,
    )
    res_sharded = sharded_icp_align(src, tgt, mesh, cfg)
    res_ref = icp_align(src, tgt, cfg)
    np.testing.assert_allclose(
        np.asarray(res_sharded.transform),
        np.asarray(res_ref.transform),
        atol=1e-4,
    )
    assert bool(res_sharded.converged)
    np.testing.assert_allclose(np.asarray(res_sharded.transform)[:3, :3], rot, atol=2e-3)
    assert int(res_sharded.iterations) == int(res_ref.iterations)


def test_sharded_icp_2d_mesh_axis():
    # use the points axis of a 2-D mesh (data axis free for pair batching)
    mesh = make_mesh(8)
    pts = _box(256, 2)
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(pts)
    res = sharded_icp_align(src, tgt, mesh, ICPConfig(target_chunk=64))
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.transform), np.eye(4), atol=1e-5
    )


def test_sharded_point_to_plane_matches_single_chip():
    """The sharded p2l solve (centroid psum + 6x6 moment psum) must match
    the single-chip icp_align point_to_plane path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.config import ICPConfig
    from rspc_tpu.parallel.icp import sharded_icp_align
    from rspc_tpu.registration.icp import icp_align

    rng = np.random.default_rng(11)
    n = 512
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    axis = rng.integers(0, 3, n)
    side = rng.integers(0, 2, n)
    pts[np.arange(n), axis] = side - 0.5
    nrm = np.zeros((n, 3), np.float32)
    nrm[np.arange(n), axis] = np.where(side == 1, 1.0, -1.0)
    c, s = np.cos(0.03), np.sin(0.03)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    src_pts = pts @ rot.T + np.float32([0.01, -0.02, 0.005])

    src = Cloud.from_numpy(src_pts)
    tgt = Cloud(
        jnp.asarray(pts), jnp.zeros((n, 3)), jnp.ones(n, bool),
        normal=jnp.asarray(nrm),
    )
    cfg = ICPConfig(
        max_iterations=10,
        max_correspondence_distance=0.2,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        variant="point_to_plane",
        huber_delta=0.01,
        target_chunk=128,
        use_pallas=False,
    )
    single = icp_align(src, tgt, cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("points",))
    sharded = sharded_icp_align(src, tgt, mesh, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded.transform), np.asarray(single.transform),
        atol=2e-5,
    )
    assert bool(sharded.converged)


def test_sharded_ndt_matches_single_chip():
    """Sharded NDT (43-scalar psum per Newton step) must land on the
    same optimum as single-chip ndt_align.

    Not bitwise: the per-shard gram matmuls psum'd over the mesh sum in
    a different order than one global gram, and the Wolfe line search /
    transformation-epsilon stop are threshold branches — f32
    summation-order noise can flip an iteration (observed 8 vs 9), so
    the honest contract is same-optimum (score to ~1e-4 relative,
    transform to well under the 1 m-resolution coarse-stage accuracy),
    not identical trajectories."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.config import NDTConfig
    from rspc_tpu.parallel.ndt import sharded_ndt_align
    from rspc_tpu.registration.ndt import build_ndt_grid, ndt_align

    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 4, (1024, 3)).astype(np.float32)
    c, s = np.cos(0.05), np.sin(0.05)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    src_pts = pts @ rot.T + np.float32([0.02, 0.0, -0.01])

    tgt = Cloud.from_numpy(pts)
    src = Cloud.from_numpy(src_pts)
    cfg = NDTConfig(dense_grid_dim=16, transformation_epsilon=1e-4)
    grid = build_ndt_grid(tgt, cfg)

    single = ndt_align(src, grid, cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("points",))
    sharded = sharded_ndt_align(src, grid, mesh, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded.transform), np.asarray(single.transform),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        float(sharded.score), float(single.score), rtol=1e-3
    )
    assert bool(sharded.converged) == bool(single.converged)


def test_sharded_colored_p2l_matches_single_chip():
    """Colored-ICP rows in the points-sharded solve: the photometric
    moments are additive like the geometric ones, so the psum'd result
    must match registration/icp.py's to reduction noise."""
    import dataclasses

    mesh = make_mesh(8, axes=("points",))
    rng = np.random.default_rng(7)
    n, m = 128, 256
    # textured plane: geometry constrains z, texture constrains x/y
    q = rng.uniform(-0.5, 0.5, (m, 3)).astype(np.float32)
    q[:, 2] = 1.0
    i_tgt = 0.5 + 0.3 * np.sin(7.0 * q[:, 0]) * np.cos(7.0 * q[:, 1])
    g = np.stack(
        [
            0.3 * 7.0 * np.cos(7.0 * q[:, 0]) * np.cos(7.0 * q[:, 1]),
            -0.3 * 7.0 * np.sin(7.0 * q[:, 0]) * np.sin(7.0 * q[:, 1]),
            np.zeros(m),
        ],
        axis=-1,
    ).astype(np.float32)
    gray = lambda i: np.stack([i, i, i], -1).astype(np.float32) * 255.0
    tgt = Cloud(
        xyz=jnp.asarray(q),
        rgb=jnp.asarray(gray(i_tgt)),
        valid=jnp.ones(m, bool),
        normal=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (m, 3)).astype(
            jnp.float32
        ),
        cgrad=jnp.asarray(g),
    )
    t_true = np.float32([0.004, -0.003, 0.0])
    p = rng.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    p[:, 2] = 1.0
    w = p + t_true
    i_src = 0.5 + 0.3 * np.sin(7.0 * w[:, 0]) * np.cos(7.0 * w[:, 1])
    src = Cloud(
        xyz=jnp.asarray(p), rgb=jnp.asarray(gray(i_src)),
        valid=jnp.ones(n, bool),
    )
    cfg = ICPConfig(
        variant="point_to_plane",
        max_iterations=12,
        max_correspondence_distance=0.05,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        target_chunk=64,
        use_pallas=False,
        huber_delta=None,
        color_weight=1.0,
    )
    rs = sharded_icp_align(src, tgt, mesh, cfg)
    r1 = icp_align(src, tgt, cfg)
    np.testing.assert_allclose(
        np.asarray(rs.transform), np.asarray(r1.transform), atol=1e-5
    )
    # and the colored solve actually recovers the in-plane shift
    err = np.abs(np.asarray(rs.transform)[:3, 3] - t_true).max()
    assert err < 1e-3, err
    # zero weight -> bit-identical to the plain geometric sharded solve
    cfg0 = dataclasses.replace(cfg, color_weight=0.0)
    tgt0 = dataclasses.replace(tgt, cgrad=None)
    a = sharded_icp_align(src, tgt0, mesh, cfg0)
    b = sharded_icp_align(src, tgt, mesh, cfg0)
    np.testing.assert_array_equal(
        np.asarray(a.transform), np.asarray(b.transform)
    )
