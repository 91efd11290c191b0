"""Cell-bucketed capped NN (ops/nn_bucket.py) vs the brute sweep.

Exactness contract: wherever the brute sweep finds a neighbor within
``cap``, the bucketed search must report the SAME distance (index may
differ only on exact distance ties); outside the cap (or for invalid
sources) it reports +inf.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rspc_tpu.ops.nn import nearest_neighbors
from rspc_tpu.ops.nn_bucket import (
    bucket_stats,
    nearest_neighbors_bucketed,
)

CAP = 0.05


def random_clouds(seed, n=512, m=2048, spread=2.0, invalid_frac=0.1):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-spread, spread, (m, 3)).astype(np.float32)
    sv = rng.uniform(size=n) > invalid_frac
    tv = rng.uniform(size=m) > invalid_frac
    return (
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_brute_within_cap(seed):
    src, sv, tgt, tv = random_clouds(seed)
    d2_b, idx_b = nearest_neighbors(src, sv, tgt, tv)
    d2_k, idx_k = nearest_neighbors_bucketed(src, sv, tgt, tv, CAP, budget=32)
    d2_b, idx_b = np.asarray(d2_b), np.asarray(idx_b)
    d2_k, idx_k = np.asarray(d2_k), np.asarray(idx_k)
    sv_np = np.asarray(sv)

    inside = sv_np & np.isfinite(d2_b) & (d2_b <= CAP * CAP)
    # same distances for every in-cap correspondence
    np.testing.assert_allclose(d2_k[inside], d2_b[inside], rtol=1e-5, atol=1e-10)
    # and the reported index realizes that distance
    tgt_np = np.asarray(tgt)
    src_np = np.asarray(src)
    realized = np.sum(
        (src_np[inside] - tgt_np[idx_k[inside]]) ** 2, axis=-1
    )
    np.testing.assert_allclose(realized, d2_k[inside], rtol=1e-5, atol=1e-10)
    # outside the cap: +inf
    assert np.all(np.isinf(d2_k[~inside]))


def test_invalid_rows_and_nan_garbage():
    src, sv, tgt, tv = random_clouds(3)
    tgt = np.array(tgt)
    tgt[~np.asarray(tv)] = np.nan  # garbage bytes in invalid rows
    d2_k, idx_k = nearest_neighbors_bucketed(
        src, sv, jnp.asarray(tgt), tv, CAP, budget=32
    )
    d2_k = np.asarray(d2_k)
    assert np.all(np.isinf(d2_k[~np.asarray(sv)]))
    assert not np.any(np.isnan(d2_k))
    # valid sources near valid targets still match the brute sweep
    d2_b, _ = nearest_neighbors(
        src, sv, jnp.asarray(np.nan_to_num(tgt, nan=1e30)), tv
    )
    inside = np.asarray(sv) & np.isfinite(np.asarray(d2_b)) & (
        np.asarray(d2_b) <= CAP * CAP
    )
    np.testing.assert_allclose(
        d2_k[inside], np.asarray(d2_b)[inside], rtol=1e-5, atol=1e-10
    )


def test_identical_points_and_ties():
    """Duplicate target points and sources exactly on cell borders."""
    src = jnp.asarray(
        np.array(
            [[0.0, 0.0, 0.0], [CAP, 0.0, 0.0], [0.5, 0.5, 0.5]], np.float32
        )
    )
    tgt = jnp.asarray(
        np.array(
            [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [CAP, 0.0, 0.0],
             [10.0, 10.0, 10.0]],
            np.float32,
        )
    )
    ones = jnp.ones((src.shape[0],), bool)
    tv = jnp.ones((tgt.shape[0],), bool)
    d2, idx = nearest_neighbors_bucketed(src, ones, tgt, tv, CAP, budget=8)
    d2 = np.asarray(d2)
    assert d2[0] == 0.0 and d2[1] == 0.0
    assert np.isinf(d2[2])  # nothing within cap of (.5,.5,.5)


def test_bucket_stats_detects_overflow():
    rng = np.random.default_rng(0)
    # 500 points crammed into one cell
    clump = rng.uniform(0, 0.009, (500, 3)).astype(np.float32)
    spread = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    tgt = jnp.asarray(np.concatenate([clump, spread]))
    tv = jnp.ones((1000,), bool)
    occ, frac = bucket_stats(tgt, tv, 0.01, budget=16)
    assert int(occ) >= 500
    assert float(frac) > 0.3


def test_icp_align_bucketed_matches_brute():
    """icp_align(use_bucket_nn=True) reproduces the brute path's
    transform, convergence state, and fitness on a registration case
    (the fitness pass always runs the full sweep)."""
    import dataclasses

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.config import ICPConfig
    from rspc_tpu.registration.icp import icp_align

    rng = np.random.default_rng(7)
    # surface-ish target: two orthogonal planes, 5 mm jitter
    ax = np.linspace(0.0, 1.0, 50, dtype=np.float32)
    u, v = np.meshgrid(ax, ax, indexing="ij")
    pts = np.concatenate(
        [
            np.stack([u.ravel(), v.ravel(), np.zeros(u.size, np.float32)], -1),
            np.stack([u.ravel(), np.zeros(u.size, np.float32), v.ravel()], -1),
        ]
    ) + rng.normal(0, 5e-4, (2 * u.size, 3)).astype(np.float32)
    tgt = Cloud(
        jnp.asarray(pts), jnp.full_like(jnp.asarray(pts), 0.5),
        jnp.ones((len(pts),), bool),
    )
    shift = np.eye(4, dtype=np.float32)
    shift[:3, 3] = (0.004, -0.003, 0.002)
    src_xyz = jnp.asarray(pts @ shift[:3, :3].T + shift[:3, 3])
    src = Cloud(src_xyz, tgt.rgb, tgt.valid)

    base = ICPConfig(target_chunk=1024)
    r_brute = icp_align(src, tgt, base)
    r_bucket = icp_align(
        src, tgt, dataclasses.replace(base, use_bucket_nn=True)
    )
    np.testing.assert_allclose(
        np.asarray(r_bucket.transform), np.asarray(r_brute.transform),
        rtol=0, atol=1e-6,
    )
    assert int(r_bucket.state) == int(r_brute.state)
    np.testing.assert_allclose(
        float(r_bucket.fitness), float(r_brute.fitness), rtol=1e-6
    )
    assert int(r_bucket.n_correspondences) == int(r_brute.n_correspondences)


def test_budget_truncation_is_best_of_budget():
    """Overfull cells degrade gracefully: the reported neighbor is a
    real in-cap point (not garbage), just possibly not the closest."""
    rng = np.random.default_rng(1)
    clump = rng.uniform(0, 0.009, (200, 3)).astype(np.float32)
    tgt = jnp.asarray(clump)
    tv = jnp.ones((200,), bool)
    src = jnp.asarray(np.array([[0.005, 0.005, 0.005]], np.float32))
    d2, idx = nearest_neighbors_bucketed(
        src, jnp.ones((1,), bool), tgt, tv, 0.01, budget=4
    )
    d2 = np.asarray(d2)
    assert np.isfinite(d2[0]) and d2[0] <= 0.01 ** 2
    realized = float(
        np.sum((np.asarray(src)[0] - np.asarray(tgt)[int(idx[0])]) ** 2)
    )
    assert abs(realized - d2[0]) < 1e-10
