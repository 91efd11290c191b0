"""End-to-end pipeline tests: synthetic RGBD sequence -> registration
schemes -> global cloud, checked against ground-truth poses."""

import numpy as np
import pytest

from rspc_tpu.capture.synthetic import SyntheticSequence
from rspc_tpu.cloud import Cloud
from rspc_tpu.config import (
    EdgeConfig,
    ICPConfig,
    NDTConfig,
    PipelineConfig,
    VoxelConfig,
)
from rspc_tpu.ops.deproject import Intrinsics
from rspc_tpu.registration.schemes import (
    ICPEdgeBasedRegistration,
    IncrementalICP,
    NDTEdgeBasedRegistration,
    merge_append,
)

INTR = Intrinsics.simple(80, 60)


def _small_config(**kw):
    return PipelineConfig(
        icp=ICPConfig(
            max_iterations=30,
            transformation_epsilon=1e-8,
            euclidean_fitness_epsilon=1e-12,
            max_correspondence_distance=0.25,
            target_chunk=512,
        ),
        ndt=NDTConfig(dense_grid_dim=16),
        edge=EdgeConfig(max_edge_points=2048),
        voxel=VoxelConfig(leaf_size=0.05, max_points=2048),
        **kw,
    )


@pytest.fixture(scope="module")
def seq():
    # yaw small enough that no-guess incremental ICP can lock on at
    # this 80x60 resolution (the tripod-height scene has close-range
    # floor structure that tightens the no-guess convergence basin)
    return SyntheticSequence(n_frames=3, yaw_step=-0.07, intr=INTR)


def test_merge_append():
    a = Cloud.from_numpy(np.array([[1, 1, 1]], np.float32), capacity=5)
    b = Cloud.from_numpy(np.array([[2, 2, 2], [3, 3, 3]], np.float32))
    out = merge_append(a, b)
    assert int(out.count()) == 3
    got, _ = out.to_numpy()
    np.testing.assert_array_equal(np.sort(got[:, 0]), [1, 2, 3])


def test_synthetic_renderer_produces_valid_frames(seq):
    depth, color = next(seq.frames())
    depth, color = np.asarray(depth), np.asarray(color)
    assert (depth > 0).mean() > 0.95  # camera inside a closed room
    assert depth.max() < 1000 * 11  # within room diagonal
    assert color.max() > 100  # textured


def test_synthetic_imu_thetas_match_trajectory(seq):
    thetas = seq.thetas()
    # filter convention: theta_i.y - theta_0.y == -i * yaw_step
    dy = thetas[:, 1] - thetas[0, 1]
    want = -np.arange(3) * seq.yaw_step
    np.testing.assert_allclose(dy, want, atol=1e-4)


def test_incremental_icp_registers_sequence(seq):
    clouds = seq.clouds()
    # small yaw: no-guess ICP should lock on with a generous corr distance
    scheme = IncrementalICP(_small_config())
    result = scheme.registration(clouds)
    assert all(bool(r.converged) for r in scheme.results)
    got = np.asarray(scheme.results[0].transform)
    want = seq.gt_transform(1)
    # lock-on check, not a precision check: at 80x60 with a 5 cm voxel
    # leaf the no-guess point-to-point optimum sits a few cm/degrees off
    np.testing.assert_allclose(got, want, atol=0.08)
    assert int(result.count()) > int(clouds[0].count())


def test_icp_edge_scheme_with_imu(seq, tmp_path):
    clouds = seq.clouds()
    thetas = seq.thetas()
    scheme = ICPEdgeBasedRegistration(
        thetas=thetas, config=_small_config(), dataset_dir=str(tmp_path)
    )
    result = scheme.registration(clouds)
    assert len(scheme.results) == 2
    for i, (coarse, fine) in enumerate(scheme.results, start=1):
        assert bool(fine.converged)
        total = np.asarray(fine.transform) @ np.asarray(coarse.transform)
        want = seq.gt_transform(i)
        np.testing.assert_allclose(total[:3, :3], want[:3, :3], atol=0.03)
        np.testing.assert_allclose(total[:3, 3], want[:3, 3], atol=0.05)
    # side outputs
    assert (tmp_path / "edge-0.pcd").exists()
    assert (tmp_path / "edge-2.pcd").exists()
    assert (tmp_path / "edge_cloud.pcd").exists()
    assert int(result.count()) > 0


def test_ndt_edge_scheme_static_guess(seq):
    clouds = seq.clouds()
    scheme = NDTEdgeBasedRegistration(
        rads=seq.yaw_step, config=_small_config()
    )
    scheme.registration(clouds)
    assert len(scheme.results) == 2
    for i, (coarse, fine) in enumerate(scheme.results, start=1):
        assert bool(fine.converged)
        total = np.asarray(fine.transform) @ np.asarray(coarse.transform)
        want = seq.gt_transform(i)
        np.testing.assert_allclose(total[:3, :3], want[:3, :3], atol=0.05)


def test_edge_scheme_rejects_unorganized():
    c = Cloud.from_numpy(np.ones((5, 3), np.float32))
    scheme = ICPEdgeBasedRegistration(config=_small_config())
    with pytest.raises(ValueError, match="organized"):
        scheme.extract_features(c)


def test_fused_and_loop_paths_agree(seq):
    # The one-program fused path (default) and the per-frame Python loop
    # (use_scan=False) must produce the same registration: same converged
    # flags, numerically identical per-pair transforms.
    from rspc_tpu.config import RefineConfig

    clouds = seq.clouds()
    refine = RefineConfig(
        enabled=True, leaf_size=0.1, max_points=1024, chain=False,
        anchor_to_first=True,
        anchor_stages=(
            ICPConfig(
                max_iterations=2, max_correspondence_distance=0.2,
                transformation_epsilon=1e-12,
                euclidean_fitness_epsilon=1e-12,
                mse_threshold_absolute=1e-16,
                variant="point_to_plane", huber_delta=0.01,
                compute_fitness=False, use_pallas=False, target_chunk=512,
            ),
        ),
    )
    results = {}
    for scan in (True, False):
        # coarse_warm_start exercises the correction carry in BOTH paths
        cfg = _small_config(
            refine=refine, use_scan=scan, coarse_warm_start=True
        )
        sch = NDTEdgeBasedRegistration(rads=seq.yaw_step, config=cfg)
        out = sch.registration(clouds)
        results[scan] = (
            np.asarray(sch.total_transforms),
            [bool(f.converged) for _, f in sch.results],
            int(out.count()),
        )
    t_scan, conv_scan, n_scan = results[True]
    t_loop, conv_loop, n_loop = results[False]
    assert conv_scan == conv_loop
    np.testing.assert_allclose(t_scan, t_loop, rtol=0, atol=2e-4)
    assert n_scan == n_loop
