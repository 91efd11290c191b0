"""Golden parity vs third-party oracles (VERDICT r1 #1).

tests/goldens/goldens.json is produced by ``python tools/make_goldens.py``
from scipy-backed oracles (cKDTree correspondences, Rotation.align_vectors
Kabsch, Nelder-Mead NDT optimum — float64, no repo kernels) on checked-in
.pcd clouds, covering the reference's exact parameter sets
(/root/reference/src/icp_edge_based_registration.hpp:41-52,
ndt_edge_based_registration.hpp:38-43, incremental_icp.hpp:46-49).

These tests assert the JAX/TPU registration paths reproduce the recorded
transforms, iteration counts, convergence states, and fitness — the
"transform error < 1e-3 vs PCL; fitness/RMSE parity" half of the
north-star metric, now against an implementation nobody in this repo
wrote."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig, NDTConfig
from rspc_tpu.io.pcd import load_pcd
from rspc_tpu.registration.icp import icp_align
from rspc_tpu.registration.ndt import build_ndt_grid, ndt_align

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _goldens():
    with open(os.path.join(GOLDEN_DIR, "goldens.json")) as f:
        return json.load(f)


def _cloud(name):
    return load_pcd(os.path.join(GOLDEN_DIR, name))


_CASES = _goldens()["cases"]
_ICP = [c for c in _CASES if c["kind"] == "icp"]
_NDT = [c for c in _CASES if c["kind"] == "ndt"]


@pytest.mark.parametrize("case", _ICP, ids=[c["name"] for c in _ICP])
def test_icp_matches_scipy_golden(case):
    src, tgt = _cloud(case["src"]), _cloud(case["tgt"])
    cfg = ICPConfig(
        max_iterations=case["config"]["max_iterations"],
        max_correspondence_distance=case["config"][
            "max_correspondence_distance"
        ],
        transformation_epsilon=case["config"]["transformation_epsilon"],
        euclidean_fitness_epsilon=case["config"]["euclidean_fitness_epsilon"],
        target_chunk=512,
    )
    guess = (
        None
        if case["guess"] is None
        else jnp.asarray(np.asarray(case["guess"], np.float32))
    )
    got = icp_align(src, tgt, cfg, guess)
    want = case["oracle"]

    assert bool(got.converged) == want["converged"]
    assert int(got.state) == want["state"]
    assert abs(int(got.iterations) - want["iterations"]) <= 1
    # north-star bound: transform error < 1e-3 vs the third-party oracle
    err = np.max(
        np.abs(np.asarray(got.transform) - np.asarray(want["transform"]))
    )
    assert err < 1e-3, f"transform error {err:.2e} vs oracle"
    # fitness parity (mean squared NN distance at the final pose)
    fit_want = want["fitness"]
    fit_got = float(got.fitness)
    assert abs(fit_got - fit_want) <= 1e-6 + 0.05 * abs(fit_want), (
        fit_got,
        fit_want,
    )
    # inlier RMSE parity where the oracle found inliers
    if np.isfinite(want["inlier_rmse"]) and want["inlier_rmse"] > 1e-12:
        assert (
            abs(float(got.inlier_rmse) - want["inlier_rmse"])
            <= 1e-5 + 0.1 * want["inlier_rmse"]
        )


@pytest.mark.parametrize("case", _NDT, ids=[c["name"] for c in _NDT])
def test_ndt_matches_scipy_golden(case):
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.oracles import (
        matrix_to_pose_numpy,
        ndt_grid_numpy,
        ndt_score_vectorized,
    )

    src, tgt = _cloud(case["src"]), _cloud(case["tgt"])
    cfg = NDTConfig(dense_grid_dim=16)
    grid = build_ndt_grid(tgt, cfg)
    want = case["oracle"]
    # the independent grid build must agree on qualifying cells
    assert int(np.asarray(grid.valid).sum()) == want["n_valid_cells"]

    got = ndt_align(src, grid, cfg)

    # score parity: evaluate OUR final pose under the ORACLE's scorer —
    # must reach >= 99.5% of the decrease scipy's optimizer found
    src_np = np.asarray(src.xyz, np.float64)[np.asarray(src.valid)]
    tgt_np = np.asarray(tgt.xyz, np.float64)[np.asarray(tgt.valid)]
    stats = ndt_grid_numpy(tgt_np, cfg.resolution, cfg.min_points_per_voxel)
    score = ndt_score_vectorized(stats, cfg.resolution, cfg.outlier_ratio)
    ours = score(matrix_to_pose_numpy(np.asarray(got.transform)), src_np)
    assert ours <= 0.995 * want["neg_score"], (ours, want["neg_score"])

    # and the pose itself lands at the oracle optimum / synthetic truth
    t_want = np.asarray(want["true_transform"])
    np.testing.assert_allclose(
        np.asarray(got.transform), t_want, atol=2e-2
    )
