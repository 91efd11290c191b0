"""Third-party-backed CPU oracles for golden parity (VERDICT r1 #1).

The round-1 parity evidence was a same-author NumPy oracle; a shared
misreading of PCL's semantics would have passed every test. These oracles
move the two numerically substantive steps of ICP to third-party code:

  * nearest-neighbor correspondences: ``scipy.spatial.cKDTree``
  * the rigid (Kabsch/Umeyama) fit:
    ``scipy.spatial.transform.Rotation.align_vectors`` (scipy's weighted
    Kabsch solver, rotation-only by construction)

so only the loop ordering itself is transcribed from the PCL
DefaultConvergenceCriteria specification (pcl/registration/
default_convergence_criteria.h semantics; reference parameter sets at
/root/reference/src/icp_edge_based_registration.hpp:41-52,
ndt_edge_based_registration.hpp:38-50, incremental_icp.hpp:46-49).

The NDT side (independent numpy voxel-Gaussian grid + scipy optimizer)
lives in tests/test_ndt_derivatives.py; tools/make_goldens.py combines
both to produce tests/goldens/goldens.json with provenance.

Everything here is float64 NumPy/SciPy — no JAX, no repo kernels.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

# ConvergenceState values shared with rspc_tpu.registration.icp
NOT_CONVERGED = 0
ITERATIONS = 1
TRANSFORM = 2
ABS_MSE = 3
REL_MSE = 4
NO_CORRESPONDENCES = 5


def kabsch_scipy(src: np.ndarray, dst: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted rigid fit src->dst via scipy's Kabsch (align_vectors).

    ``Rotation.align_vectors(a, b, w)`` finds R minimizing
    sum_i w_i ||a_i - R b_i||^2 — so a = centered dst, b = centered src.
    """
    ws = w.sum()
    cs = (src * w[:, None]).sum(0) / ws
    cd = (dst * w[:, None]).sum(0) / ws
    # align_vectors rejects all-zero weight rows; drop them
    nz = w > 0
    rot, _ = Rotation.align_vectors(dst[nz] - cd, src[nz] - cs, weights=w[nz])
    r = rot.as_matrix()
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = cd - r @ cs
    return out


def icp_scipy(
    src: np.ndarray,
    tgt: np.ndarray,
    *,
    max_iterations: int = 100,
    max_correspondence_distance: float = 0.01,
    transformation_epsilon: float = 1.0,
    euclidean_fitness_epsilon: float = 1000.0,
    mse_threshold_absolute: float = 1e-12,
    min_number_correspondences: int = 3,
    guess: np.ndarray | None = None,
):
    """PCL-semantics ICP with scipy kd-tree + scipy Kabsch.

    Returns dict(transform, iterations, state, converged, fitness,
    inlier_rmse, n_correspondences). Fitness = mean squared NN distance
    over ALL source points at the final pose (PCL getFitnessScore with
    max_range = inf); inlier_rmse over capped correspondences.
    """
    src = np.asarray(src, np.float64)
    tgt = np.asarray(tgt, np.float64)
    tree = cKDTree(tgt)
    final = np.eye(4) if guess is None else np.asarray(guess, np.float64)
    prev_mse = np.finfo(np.float64).max
    cap2 = max_correspondence_distance**2
    it = 0
    state = NOT_CONVERGED
    converged = False
    while True:
        src_t = src @ final[:3, :3].T + final[:3, 3]
        d, idx = tree.query(src_t)
        d2 = d * d
        w = (d2 <= cap2).astype(np.float64)
        n_corr = int(w.sum())
        cur_mse = (d2 * w).sum() / max(n_corr, 1)
        if n_corr < min_number_correspondences:
            state, converged = NO_CORRESPONDENCES, False
            break
        t_inc = kabsch_scipy(src_t, tgt[idx], w)
        final = t_inc @ final
        it += 1
        if it >= max_iterations:
            state, converged = ITERATIONS, True
            break
        cos_angle = 0.5 * (np.trace(t_inc[:3, :3]) - 1.0)
        t_sqr = float((t_inc[:3, 3] ** 2).sum())
        if cos_angle >= 1.0 - transformation_epsilon and (
            t_sqr <= transformation_epsilon
        ):
            state, converged = TRANSFORM, True
            break
        if abs(cur_mse - prev_mse) < mse_threshold_absolute:
            state, converged = ABS_MSE, True
            break
        if abs(cur_mse - prev_mse) / prev_mse < euclidean_fitness_epsilon:
            state, converged = REL_MSE, True
            break
        prev_mse = cur_mse

    src_t = src @ final[:3, :3].T + final[:3, 3]
    d, idx = tree.query(src_t)
    d2 = d * d
    w = d2 <= cap2
    fitness = float(d2.mean())
    n_inl = int(w.sum())
    inlier_rmse = float(np.sqrt(d2[w].mean())) if n_inl else float("nan")
    return {
        "transform": final,
        "iterations": it,
        "state": state,
        "converged": converged,
        "fitness": fitness,
        "inlier_rmse": inlier_rmse,
        "n_correspondences": n_inl,
    }


def fitness_scipy(src, tgt, transform):
    """PCL getFitnessScore (max_range inf) via scipy cKDTree."""
    src = np.asarray(src, np.float64)
    t = np.asarray(transform, np.float64)
    d, _ = cKDTree(np.asarray(tgt, np.float64)).query(
        src @ t[:3, :3].T + t[:3, 3]
    )
    return float((d * d).mean())


# --------------------------------------------------------------------------
# NDT oracle: independent numpy grid + score, scipy optimizer
# --------------------------------------------------------------------------


def ndt_gauss_coeffs(outlier_ratio: float, resolution: float):
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / resolution**3
    d3 = -np.log(c2)
    d1 = -np.log(c1 + c2) - d3
    d2 = -2.0 * np.log((-np.log(c1 * np.exp(-0.5) + c2) - d3) / d1)
    return d1, d2


def ndt_grid_numpy(points, resolution: float, min_points: int = 6):
    """Voxel-Gaussian stats per occupied cell (pcl::VoxelGridCovariance
    semantics: sample covariance ddof=1, >= min_points, eigenvalues floored
    at 0.01 * lambda_max). Dict {(i,j,k): (mean, inv_cov)}."""
    pts = np.asarray(points, np.float64)
    coords = np.floor(pts / resolution).astype(np.int64)
    cells: dict = {}
    for p, c in zip(pts, coords):
        cells.setdefault(tuple(c), []).append(p)
    stats = {}
    for c, members in cells.items():
        if len(members) < min_points:
            continue
        arr = np.asarray(members)
        mu = arr.mean(0)
        cov = np.cov(arr.T, ddof=1)
        evals, evecs = np.linalg.eigh(cov)
        evals = np.maximum(np.maximum(evals, 0.01 * evals.max()), 1e-12)
        stats[c] = (mu, evecs @ np.diag(1.0 / evals) @ evecs.T)
    return stats


def ndt_score_numpy(p, src_pts, stats, resolution, outlier_ratio=0.55):
    """-score(p) for pose p=(t, rx, ry, rz) with R = Rx@Ry@Rz (scipy
    intrinsic 'XYZ'), 27-cell neighborhood capped at radius=resolution."""
    d1, d2 = ndt_gauss_coeffs(outlier_ratio, resolution)
    rot = Rotation.from_euler("XYZ", p[3:6]).as_matrix()
    pts = np.asarray(src_pts, np.float64) @ rot.T + p[:3]
    r2 = resolution * resolution
    total = 0.0
    offs = [
        (i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
    ]
    for pt in pts:
        cell = np.floor(pt / resolution).astype(np.int64)
        for off in offs:
            key = (cell[0] + off[0], cell[1] + off[1], cell[2] + off[2])
            s = stats.get(key)
            if s is None:
                continue
            x = pt - s[0]
            q = x @ x
            if q > r2:
                continue
            total += d1 * np.exp(-0.5 * d2 * (x @ s[1] @ x))
    return total


def ndt_score_vectorized(stats, resolution, outlier_ratio=0.55):
    """Build a vectorized numpy scorer over the dict stats (same math as
    ndt_score_numpy, restructured for optimizer loops): returns
    score_fn(p, src_pts) -> -score."""
    d1, d2 = ndt_gauss_coeffs(outlier_ratio, resolution)
    keys = np.asarray(sorted(stats.keys()), np.int64).reshape(-1, 3)
    means = np.stack([stats[tuple(k)][0] for k in keys])
    icovs = np.stack([stats[tuple(k)][1] for k in keys])
    kmin = keys.min(0) - 1
    dims = keys.max(0) - kmin + 3  # +1 span, +2 halo for the 27-offsets
    flat_of = lambda c: (
        (c[..., 0] - kmin[0]) * dims[1] + (c[..., 1] - kmin[1])
    ) * dims[2] + (c[..., 2] - kmin[2])
    lut = np.full(int(dims.prod()), -1, np.int64)
    lut[flat_of(keys)] = np.arange(len(keys))
    offs = np.asarray(
        [
            (i, j, k)
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
            for k in (-1, 0, 1)
        ],
        np.int64,
    )
    r2 = resolution * resolution

    def score(p, src_pts):
        rot = Rotation.from_euler("XYZ", np.asarray(p)[3:6]).as_matrix()
        pts = np.asarray(src_pts, np.float64) @ rot.T + np.asarray(p)[:3]
        cells = np.floor(pts / resolution).astype(np.int64)
        nb = cells[:, None, :] + offs[None, :, :]  # [N,27,3]
        inb = ((nb - kmin) >= 0).all(-1) & ((nb - kmin) < dims).all(-1)
        slot = np.where(inb, lut[np.where(inb, flat_of(nb), 0)], -1)
        hit = slot >= 0
        idx = np.where(hit, slot, 0)
        x = pts[:, None, :] - means[idx]  # [N,27,3]
        q2 = np.einsum("nki,nkij,nkj->nk", x, icovs[idx], x)
        mask = hit & (np.einsum("nki,nki->nk", x, x) <= r2)
        return float(d1 * np.sum(np.exp(-0.5 * d2 * q2) * mask))

    return score


def ndt_optimize_scipy(
    src_pts, stats, resolution, guess_pose=None, outlier_ratio=0.55
):
    """Minimize the oracle NDT objective with scipy Nelder-Mead, started
    from the same initial guess the TPU path gets."""
    import scipy.optimize

    score = ndt_score_vectorized(stats, resolution, outlier_ratio)
    p0 = np.zeros(6) if guess_pose is None else np.asarray(guess_pose)
    res = scipy.optimize.minimize(
        lambda p: score(p, src_pts),
        p0,
        method="Nelder-Mead",
        options={"xatol": 1e-5, "fatol": 1e-8, "maxiter": 4000},
    )
    return res.x, float(res.fun)


def pose_to_matrix_numpy(p):
    t = np.eye(4)
    t[:3, :3] = Rotation.from_euler("XYZ", np.asarray(p)[3:6]).as_matrix()
    t[:3, 3] = np.asarray(p)[:3]
    return t


def matrix_to_pose_numpy(t):
    t = np.asarray(t, np.float64)
    ang = Rotation.from_matrix(t[:3, :3]).as_euler("XYZ")
    return np.concatenate([t[:3, 3], ang])
