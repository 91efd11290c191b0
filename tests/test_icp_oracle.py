"""End-to-end ICP parity against an independent NumPy oracle.

The oracle reimplements the PCL ICP loop in plain NumPy (kd-tree NN via
the native C++ oracle when available, else brute force; Umeyama via
numpy SVD; DefaultConvergenceCriteria ordering) — a second, independent
implementation of the same spec. The JAX ICP must match its transforms,
iteration counts, and convergence states on random scenes (SURVEY.md §4's
"golden parity" strategy, with the oracle standing in for PCL)."""

import numpy as np
import pytest

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.registration.icp import icp_align

try:
    from rspc_tpu.io.native import KDTree, available

    HAVE_NATIVE = available()
except Exception:
    HAVE_NATIVE = False


def _nn_oracle(src, tgt):
    if HAVE_NATIVE:
        return KDTree(tgt).query(src)
    d = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.argmin(1)


def _umeyama(src, dst, w):
    ws = w.sum()
    cs = (src * w[:, None]).sum(0) / ws
    cd = (dst * w[:, None]).sum(0) / ws
    h = ((src - cs) * w[:, None]).T @ (dst - cd)
    u, _, vt = np.linalg.svd(h)
    v = vt.T
    d = np.sign(np.linalg.det(v @ u.T))
    dd = np.diag([1.0, 1.0, d])
    r = v @ dd @ u.T
    t = cd - r @ cs
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def _icp_oracle(src, tgt, cfg: ICPConfig, guess=None):
    """Plain NumPy port of the PCL ICP loop semantics."""
    final = np.eye(4) if guess is None else np.array(guess, np.float64)
    prev_mse = np.finfo(np.float64).max
    it = 0
    state = 0
    while True:
        src_t = src @ final[:3, :3].T + final[:3, 3]
        d2, idx = _nn_oracle(src_t.astype(np.float32), tgt)
        w = (d2 <= cfg.max_correspondence_distance**2).astype(np.float64)
        n_corr = w.sum()
        cur_mse = (d2 * w).sum() / max(n_corr, 1.0)
        if n_corr < cfg.min_number_correspondences:
            return final, it, 5, False
        t_inc = _umeyama(src_t.astype(np.float64), tgt[idx].astype(np.float64), w)
        final = t_inc @ final
        it += 1
        if it >= cfg.max_iterations:
            return final, it, 1, True
        cos_angle = 0.5 * (np.trace(t_inc[:3, :3]) - 1)
        t_sqr = (t_inc[:3, 3] ** 2).sum()
        if cos_angle >= 1 - cfg.transformation_epsilon and t_sqr <= cfg.transformation_epsilon:
            return final, it, 2, True
        if abs(cur_mse - prev_mse) < cfg.mse_threshold_absolute:
            return final, it, 3, True
        if abs(cur_mse - prev_mse) / prev_mse < cfg.euclidean_fitness_epsilon:
            return final, it, 4, True
        prev_mse = cur_mse


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    ax = rng.integers(0, 3, n)
    side = rng.integers(0, 2, n)
    pts[np.arange(n), ax] = side - 0.5
    pts[:, 2] += 2.0
    return pts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_icp_matches_numpy_oracle_iterative(seed):
    rng = np.random.default_rng(100 + seed)
    pts = _scene(600, seed)
    ry = rng.uniform(-0.05, 0.05)
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = rng.uniform(-0.01, 0.01, 3).astype(np.float32)
    moved = (pts @ rot.T + t).astype(np.float32)
    cfg = ICPConfig(
        max_iterations=25,
        transformation_epsilon=1e-8,
        euclidean_fitness_epsilon=1e-12,
        max_correspondence_distance=0.08,
        target_chunk=256,
    )
    want_t, want_it, want_state, want_conv = _icp_oracle(pts, moved, cfg)
    got = icp_align(Cloud.from_numpy(pts), Cloud.from_numpy(moved), cfg)
    assert bool(got.converged) == want_conv
    assert int(got.state) == want_state
    assert abs(int(got.iterations) - want_it) <= 1  # f32 vs f64 tie steps
    np.testing.assert_allclose(
        np.asarray(got.transform), want_t, atol=5e-4
    )


def test_icp_matches_oracle_reference_config():
    """The reference's loose criteria: both implementations stop after one
    iteration with identical transforms."""
    pts = _scene(500, 7)
    moved = (pts + np.float32([0.002, 0, -0.001])).astype(np.float32)
    cfg = ICPConfig(target_chunk=256)
    want_t, want_it, want_state, want_conv = _icp_oracle(pts, moved, cfg)
    got = icp_align(Cloud.from_numpy(pts), Cloud.from_numpy(moved), cfg)
    assert want_it == 1 and int(got.iterations) == 1
    assert int(got.state) == want_state == 2
    np.testing.assert_allclose(np.asarray(got.transform), want_t, atol=1e-5)
