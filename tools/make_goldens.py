"""Generate tests/goldens/: third-party-oracle golden parity data.

Produces small deterministic .pcd cloud pairs plus goldens.json holding
the transforms/fitness/iteration counts that the scipy-backed oracles
(tools/oracles.py: cKDTree correspondences + Rotation.align_vectors
Kabsch + Nelder-Mead NDT optimum) compute for the reference's exact
parameter sets (/root/reference/src/icp_edge_based_registration.hpp:41-52,
ndt_edge_based_registration.hpp:38-43, incremental_icp.hpp:46-49).

tests/test_goldens.py asserts the TPU paths match these files; regenerate
with  python tools/make_goldens.py  (stable: fixed seeds, float64 oracle).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import scipy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracles import (  # noqa: E402
    icp_scipy,
    matrix_to_pose_numpy,
    ndt_grid_numpy,
    ndt_optimize_scipy,
    ndt_score_vectorized,
)

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)


def box_room(n: int, seed: int, extent: float = 3.0) -> np.ndarray:
    """Deterministic box-room scene: 5 walls + floor + two boxes, mm-scale
    surface noise — structured enough for full 6-DoF observability."""
    rng = np.random.default_rng(seed)
    pts = []

    def plane(nf, origin, u, v, su, sv):
        a = rng.uniform(0, su, nf)
        b = rng.uniform(0, sv, nf)
        p = (
            np.asarray(origin)[None, :]
            + a[:, None] * np.asarray(u)[None, :]
            + b[:, None] * np.asarray(v)[None, :]
        )
        return p + rng.normal(0, 0.002, p.shape)

    k = n // 8
    e = extent
    pts.append(plane(k, (0, 0, e), (1, 0, 0), (0, 1, 0), e, 2.0))  # back
    pts.append(plane(k, (0, 0, 0), (0, 0, 1), (0, 1, 0), e, 2.0))  # left
    pts.append(plane(k, (e, 0, 0), (0, 0, 1), (0, 1, 0), e, 2.0))  # right
    pts.append(plane(k, (0, 0, 0), (1, 0, 0), (0, 0, 1), e, e))    # floor
    pts.append(plane(k, (0, 2.0, 0), (1, 0, 0), (0, 0, 1), e, e))  # ceiling
    # two boxes (3 visible faces each)
    for cx, cz in ((0.8, 1.0), (2.0, 2.0)):
        m = k // 2
        pts.append(plane(m, (cx, 0, cz), (1, 0, 0), (0, 1, 0), 0.4, 0.5))
        pts.append(plane(m, (cx, 0, cz), (0, 0, 1), (0, 1, 0), 0.4, 0.5))
        pts.append(plane(m, (cx, 0.5, cz), (1, 0, 0), (0, 0, 1), 0.4, 0.4))
    out = np.concatenate(pts).astype(np.float32)
    return out[rng.permutation(len(out))[:n]]


def rigid(rx, ry, rz, t):
    from scipy.spatial.transform import Rotation

    m = np.eye(4)
    m[:3, :3] = Rotation.from_euler("XYZ", [rx, ry, rz]).as_matrix()
    m[:3, 3] = t
    return m


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.io.pcd import save_pcd

    cases = []

    def save_cloud(name, pts):
        path = os.path.join(GOLDEN_DIR, name)
        save_pcd(path, Cloud.from_numpy(pts), mode="binary")
        return name

    # ---- ICP cases -----------------------------------------------------
    ref_icp = {
        "max_iterations": 100,
        "max_correspondence_distance": 0.01,
        "transformation_epsilon": 1.0,
        "euclidean_fitness_epsilon": 1000.0,
    }
    tight_icp = {
        "max_iterations": 30,
        "max_correspondence_distance": 0.08,
        "transformation_epsilon": 1e-8,
        "euclidean_fitness_epsilon": 1e-12,
    }

    scene = box_room(4000, seed=11)

    # 1. reference-loose config, small offset, no guess (the incremental
    #    / fine-stage configuration: stops on TRANSFORM after 1 iter)
    t_true = rigid(0.0, 0.0, 0.0, (0.003, -0.002, 0.004))
    src = (
        scene @ np.linalg.inv(t_true)[:3, :3].T
        + np.linalg.inv(t_true)[:3, 3]
    ).astype(np.float32)
    a = save_cloud("icp_loose_src.pcd", src)
    b = save_cloud("icp_loose_tgt.pcd", scene)
    res = icp_scipy(src.astype(np.float64), scene.astype(np.float64), **ref_icp)
    cases.append(
        {
            "name": "icp_reference_loose",
            "kind": "icp",
            "src": a,
            "tgt": b,
            "guess": None,
            "config": ref_icp,
            "oracle": _ser(res),
        }
    )

    # 2. reference-loose config WITH an initial guess (the coarse-stage
    #    call pattern: align(output, init_guess))
    t_true = rigid(0.0, -0.06, 0.0, (0.02, 0.0, -0.015))
    inv = np.linalg.inv(t_true)
    src = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    guess = rigid(0.0, -0.05, 0.0, (0.015, 0.0, -0.01))
    a = save_cloud("icp_guess_src.pcd", src)
    res = icp_scipy(
        src.astype(np.float64), scene.astype(np.float64), guess=guess, **ref_icp
    )
    cases.append(
        {
            "name": "icp_reference_guess",
            "kind": "icp",
            "src": a,
            "tgt": b,
            "guess": guess.tolist(),
            "config": ref_icp,
            "oracle": _ser(res),
        }
    )

    # 3. tight config, multi-iteration convergence (exercises the whole
    #    Newton-free ICP loop, not just the first-step criteria)
    t_true = rigid(0.01, 0.025, -0.01, (0.02, -0.01, 0.015))
    inv = np.linalg.inv(t_true)
    src = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    a = save_cloud("icp_tight_src.pcd", src)
    res = icp_scipy(src.astype(np.float64), scene.astype(np.float64), **tight_icp)
    cases.append(
        {
            "name": "icp_tight_multi_iter",
            "kind": "icp",
            "src": a,
            "tgt": b,
            "guess": None,
            "config": tight_icp,
            "oracle": _ser(res),
        }
    )

    # ---- NDT case ------------------------------------------------------
    # reference params: resolution 1.0, step 0.1, transEps 0.01, max 50
    ndt_cfg = {"resolution": 1.0, "outlier_ratio": 0.55, "min_points": 6}
    tgt_pts = box_room(3000, seed=21, extent=4.0)
    t_true = rigid(0.04, -0.05, 0.03, (0.06, -0.04, 0.08))
    inv = np.linalg.inv(t_true)
    src_pts = (
        box_room(1200, seed=22, extent=4.0) @ inv[:3, :3].T + inv[:3, 3]
    ).astype(np.float32)
    sa = save_cloud("ndt_src.pcd", src_pts)
    sb = save_cloud("ndt_tgt.pcd", tgt_pts)
    stats = ndt_grid_numpy(tgt_pts, 1.0, 6)
    p_opt, f_opt = ndt_optimize_scipy(src_pts, stats, 1.0)
    score = ndt_score_vectorized(stats, 1.0)
    cases.append(
        {
            "name": "ndt_reference",
            "kind": "ndt",
            "src": sa,
            "tgt": sb,
            "guess": None,
            "config": ndt_cfg,
            "oracle": {
                "pose": p_opt.tolist(),
                "neg_score": f_opt,
                "true_transform": t_true.tolist(),
                "n_valid_cells": len(stats),
                "score_at_truth": score(
                    matrix_to_pose_numpy(t_true), src_pts
                ),
            },
        }
    )

    out = {
        "provenance": {
            "generator": "tools/make_goldens.py",
            "oracle": (
                "scipy.spatial.cKDTree NN + scipy Rotation.align_vectors "
                "Kabsch (ICP); independent numpy voxel-Gaussian grid + "
                "scipy Nelder-Mead (NDT); float64 throughout"
            ),
            "scipy_version": scipy.__version__,
            "numpy_version": np.__version__,
            "reference_params": (
                "/root/reference/src/icp_edge_based_registration.hpp:41-52, "
                "ndt_edge_based_registration.hpp:38-43, "
                "incremental_icp.hpp:46-49"
            ),
        },
        "cases": cases,
    }
    path = os.path.join(GOLDEN_DIR, "goldens.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} with {len(cases)} cases")
    for c in cases:
        o = c["oracle"]
        extra = (
            f"iters={o['iterations']} state={o['state']} fit={o['fitness']:.3e}"
            if c["kind"] == "icp"
            else f"score={o['neg_score']:.4f} cells={o['n_valid_cells']}"
        )
        print(f"  {c['name']}: {extra}")


def _ser(res):
    return {
        "transform": res["transform"].tolist(),
        "iterations": res["iterations"],
        "state": res["state"],
        "converged": res["converged"],
        "fitness": res["fitness"],
        "inlier_rmse": res["inlier_rmse"],
        "n_correspondences": res["n_correspondences"],
    }


if __name__ == "__main__":
    main()
