"""ICP tests: synthetic rigid recovery + PCL convergence-semantics parity."""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.ops.transform import make_rigid, rotation_matrix
from rspc_tpu.registration.icp import (
    ITERATIONS,
    NO_CORRESPONDENCES,
    TRANSFORM,
    ICPResult,
    icp_align,
)


def _scene(n=800, seed=0):
    rng = np.random.default_rng(seed)
    # structured, non-degenerate point set (box surfaces)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    axis = rng.integers(0, 3, n)
    side = rng.integers(0, 2, n)
    pts[np.arange(n), axis] = side - 0.5
    pts[:, 2] += 2.0
    return pts


def _transform(pts, rads_y, t):
    r = np.asarray(rotation_matrix(jnp.float32(rads_y), 1))
    return (pts @ r.T + np.asarray(t, np.float32)).astype(np.float32), r


def test_icp_identity_converges_first_iteration_reference_config():
    """With the reference's transEps=1/fitnessEps=1000, PCL converges via
    the TRANSFORM criterion after exactly one iteration."""
    pts = _scene()
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(pts)
    res = icp_align(src, tgt, ICPConfig(target_chunk=256))
    assert bool(res.converged)
    assert int(res.state) == TRANSFORM
    assert int(res.iterations) == 1
    assert float(res.fitness) < 1e-10
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-5)


def test_icp_recovers_small_transform_iterative_config():
    pts = _scene(1000, 1)
    t_true = np.array([0.004, -0.003, 0.002], np.float32)
    moved, r = _transform(pts, 0.01, t_true)
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(moved)
    cfg = ICPConfig(
        transformation_epsilon=1e-8,
        euclidean_fitness_epsilon=1e-12,
        max_iterations=50,
        max_correspondence_distance=0.05,
        target_chunk=256,
    )
    res = icp_align(src, tgt, cfg)
    assert bool(res.converged)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:3, :3], r, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t_true, atol=1e-3)
    assert float(res.inlier_rmse) < 1e-3


def test_icp_with_init_guess_composes():
    """A coarse guess brings a large rotation into ICP's capture range;
    getFinalTransformation must include the guess (PCL align(out, guess))."""
    pts = _scene(1200, 2)
    rads = -0.5
    moved, r = _transform(pts, rads, [0, 0, 0])
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(moved)
    guess = make_rigid(rotation_matrix(jnp.float32(rads), 1))
    cfg = ICPConfig(
        transformation_epsilon=1e-8,
        euclidean_fitness_epsilon=1e-12,
        max_iterations=30,
        max_correspondence_distance=0.05,
        target_chunk=256,
    )
    res = icp_align(src, tgt, cfg, init_guess=guess)
    assert bool(res.converged)
    T = np.asarray(res.transform)
    np.testing.assert_allclose(T[:3, :3], r, atol=2e-3)
    np.testing.assert_allclose(T[:3, 3], np.zeros(3), atol=2e-3)


def test_icp_no_correspondences_not_converged():
    pts = _scene(300, 3)
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(pts + np.float32([10, 10, 10]))
    res = icp_align(src, tgt, ICPConfig(target_chunk=256))
    assert not bool(res.converged)
    assert int(res.state) == NO_CORRESPONDENCES
    # transform unchanged from the (identity) guess — PCL breaks pre-update
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-6)


def test_icp_hits_max_iterations_still_converged():
    """PCL reports converged=true on the ITERATIONS criterion."""
    pts = _scene(500, 4)
    # Oscillating config: tiny thresholds so TRANSFORM/MSE never fire,
    # 2 iterations max.
    moved, _ = _transform(pts, 0.05, [0.01, 0, 0])
    cfg = ICPConfig(
        transformation_epsilon=1e-20,
        euclidean_fitness_epsilon=1e-20,
        mse_threshold_absolute=1e-30,
        max_iterations=2,
        max_correspondence_distance=0.5,
        target_chunk=256,
    )
    res = icp_align(Cloud.from_numpy(pts), Cloud.from_numpy(moved), cfg)
    assert int(res.iterations) == 2
    assert int(res.state) == ITERATIONS
    assert bool(res.converged)


def test_icp_result_is_pytree():
    import jax

    leaves = jax.tree_util.tree_leaves(
        ICPResult(
            transform=jnp.eye(4),
            converged=jnp.bool_(True),
            state=jnp.int32(2),
            iterations=jnp.int32(1),
            fitness=jnp.float32(0),
            inlier_rmse=jnp.float32(0),
            n_correspondences=jnp.int32(10),
        )
    )
    assert len(leaves) == 7


def _box_with_normals(n=1200, seed=3):
    """Box-surface points with exact face normals."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    axis = rng.integers(0, 3, n)
    side = rng.integers(0, 2, n)
    pts[np.arange(n), axis] = side - 0.5
    nrm = np.zeros((n, 3), np.float32)
    nrm[np.arange(n), axis] = np.where(side == 1, 1.0, -1.0)
    pts[:, 2] += 2.0
    return pts, nrm


def test_icp_point_to_plane_recovers_transform():
    """The point-to-plane variant recovers a small rigid motion to tighter
    tolerance (and in fewer iterations) than point-to-point on surface
    samples with independent in-plane jitter — the regime it exists for."""
    pts, nrm = _box_with_normals()
    rng = np.random.default_rng(7)
    # target: the surface, re-sampled (in-plane jitter only)
    jitter = rng.normal(0, 0.01, pts.shape).astype(np.float32)
    jitter -= nrm * np.sum(jitter * nrm, axis=1, keepdims=True)
    tgt_pts = pts + jitter
    src_pts, _ = _transform(pts, 0.03, [0.01, -0.02, 0.015])

    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    tgt = Cloud(tgt.xyz, tgt.rgb, tgt.valid, normal=jnp.asarray(nrm))

    cfg = ICPConfig(
        max_iterations=15,
        max_correspondence_distance=0.2,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        variant="point_to_plane",
        target_chunk=256,
    )
    res = icp_align(src, tgt, cfg)
    expect = np.linalg.inv(
        np.asarray(
            make_rigid(
                rotation_matrix(jnp.float32(0.03), 1),
                jnp.asarray([0.01, -0.02, 0.015], jnp.float32),
            )
        )
    )
    assert bool(res.converged)
    assert np.abs(np.asarray(res.transform) - expect).max() < 2e-3


def test_icp_point_to_plane_requires_target_normals():
    pts = _scene()
    src = Cloud.from_numpy(pts)
    tgt = Cloud.from_numpy(pts)
    cfg = ICPConfig(variant="point_to_plane", target_chunk=256)
    try:
        icp_align(src, tgt, cfg)
    except ValueError as e:
        assert "normals" in str(e)
    else:
        raise AssertionError("expected ValueError without target normals")


def test_icp_tight_epsilons_actually_iterate():
    """Regression: the REL_MSE criterion must not fire on iteration 1.

    With prev_mse seeded at float32 max, the TPU lowering of x/prev as
    x * (1/prev) flushed the subnormal reciprocal to zero, so the relative
    MSE read 0 < eps and every config stopped after one iteration."""
    pts = _scene(n=600, seed=5)
    src_pts, _ = _transform(pts, 0.05, [0.02, 0.0, -0.01])
    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(pts)
    cfg = ICPConfig(
        max_iterations=30,
        max_correspondence_distance=0.3,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        target_chunk=256,
    )
    res = icp_align(src, tgt, cfg)
    assert int(res.iterations) > 1
