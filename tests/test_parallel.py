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
