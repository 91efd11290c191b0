"""Geometry op tests against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rspc_tpu.cloud import Cloud
from rspc_tpu.ops import (
    apply_transform,
    imu_guess_full,
    imu_guess_y,
    make_rigid,
    nearest_neighbors,
    rigid_fit,
    rotation_matrix,
    static_y_guess,
    voxel_downsample,
)
from rspc_tpu.ops.transform import relative_thetas


def _np_rot(angle, axis):
    c, s = np.cos(angle), np.sin(angle)
    m = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    m[i, i] = c
    m[j, j] = c
    if axis == 1:
        m[i, j] = s
        m[j, i] = -s
    else:
        m[i, j] = -s
        m[j, i] = s
    return m


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_rotation_matrix_matches_eigen(axis):
    a = 0.7
    np.testing.assert_allclose(
        np.asarray(rotation_matrix(jnp.float32(a), axis)),
        _np_rot(a, axis),
        atol=1e-6,
    )


def test_apply_transform():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    r = _np_rot(0.3, 2) @ _np_rot(-0.2, 1)
    t = np.array([0.1, -0.2, 0.5], np.float32)
    T = make_rigid(jnp.asarray(r, jnp.float32), jnp.asarray(t))
    out = np.asarray(apply_transform(T, jnp.asarray(pts)))
    np.testing.assert_allclose(out, pts @ r.T + t, atol=1e-5)


def test_guess_builders_axis_mappings():
    theta = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    # ICP scheme: Rz(x) @ Ry(-y) @ Rx(z)  (icp_edge_based_registration.hpp:86-92)
    expect = _np_rot(0.1, 2) @ _np_rot(-0.2, 1) @ _np_rot(0.3, 0)
    np.testing.assert_allclose(
        np.asarray(imu_guess_full(theta))[:3, :3], expect, atol=1e-6
    )
    # NDT scheme: Ry(-y) only (ndt_edge_based_registration.hpp:79-80)
    np.testing.assert_allclose(
        np.asarray(imu_guess_y(theta))[:3, :3], _np_rot(-0.2, 1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(static_y_guess(-0.523599))[:3, :3], _np_rot(-0.523599, 1), atol=1e-6
    )


def test_relative_thetas():
    thetas = jnp.array([[1.0, 2.0, 3.0], [1.5, 2.5, 3.5], [2.0, 1.0, 0.0]])
    rel = np.asarray(relative_thetas(thetas))
    np.testing.assert_allclose(rel[0], [1, 2, 3])
    np.testing.assert_allclose(rel[1], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(rel[2], [1.0, -1.0, -3.0])


def test_rigid_fit_recovers_known_transform():
    rng = np.random.default_rng(1)
    src = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    r = _np_rot(0.4, 0) @ _np_rot(-0.25, 1) @ _np_rot(0.1, 2)
    t = np.array([0.3, -0.1, 0.7])
    dst = (src @ r.T + t).astype(np.float32)
    w = np.ones(100, np.float32)
    T = np.asarray(rigid_fit(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(T[:3, :3], r, atol=1e-5)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-5)


def test_rigid_fit_respects_weights():
    rng = np.random.default_rng(2)
    src = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    r = _np_rot(0.2, 1)
    dst = (src @ r.T).astype(np.float32)
    # corrupt half the pairs, weight them to zero
    dst_bad = dst.copy()
    dst_bad[25:] += rng.normal(size=(25, 3)).astype(np.float32)
    w = np.concatenate([np.ones(25), np.zeros(25)]).astype(np.float32)
    T = np.asarray(rigid_fit(jnp.asarray(src), jnp.asarray(dst_bad), jnp.asarray(w)))
    np.testing.assert_allclose(T[:3, :3], r, atol=1e-5)


def test_rigid_fit_reflection_guard():
    # A degenerate (planar) correspondence set must still return a proper
    # rotation (det +1), not a reflection.
    src = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    dst = src[:, [1, 0, 2]].astype(np.float32)  # mirror swap x<->y
    T = np.asarray(rigid_fit(jnp.asarray(src), jnp.asarray(dst), jnp.ones(4)))
    assert np.linalg.det(T[:3, :3]) > 0.99


def test_voxel_downsample_oracle():
    rng = np.random.default_rng(3)
    n = 500
    xyz = rng.uniform(0.0, 0.1, (n, 3)).astype(np.float32) + 0.05
    rgb = rng.integers(0, 256, (n, 3)).astype(np.float32)
    cloud = Cloud.from_numpy(xyz, rgb)
    leaf = 0.01
    out = jax.jit(lambda c: voxel_downsample(c, leaf, 512))(cloud)
    got_xyz, got_rgb = out.to_numpy()

    # numpy oracle: group by floor(x/leaf)
    keys = np.floor(xyz / leaf).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    want_xyz = np.zeros((len(uniq), 3))
    want_rgb = np.zeros((len(uniq), 3))
    for k in range(len(uniq)):
        sel = inv == k
        want_xyz[k] = xyz[sel].mean(axis=0)
        want_rgb[k] = rgb[sel].mean(axis=0)

    assert got_xyz.shape[0] == len(uniq)
    # sort both by xyz for comparison
    o1 = np.lexsort(got_xyz.T)
    o2 = np.lexsort(want_xyz.T)
    np.testing.assert_allclose(got_xyz[o1], want_xyz[o2], atol=1e-5)
    np.testing.assert_allclose(got_rgb[o1], want_rgb[o2], atol=1e-3)


def test_voxel_downsample_ignores_invalid():
    xyz = np.array([[0.005, 0.005, 0.005], [0.004, 0.004, 0.004]], np.float32)
    c = Cloud.from_numpy(xyz, valid=np.array([True, False]))
    out = voxel_downsample(c, 0.01, 8)
    got, _ = out.to_numpy()
    assert got.shape[0] == 1
    np.testing.assert_allclose(got[0], xyz[0], atol=1e-6)


@pytest.mark.parametrize("chunk", [16, 64])
def test_nearest_neighbors_oracle(chunk):
    rng = np.random.default_rng(4)
    src = rng.uniform(-1, 1, (37, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (101, 3)).astype(np.float32)
    sv = np.ones(37, bool)
    tv = np.ones(101, bool)
    tv[10:20] = False
    d2, idx = nearest_neighbors(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv),
        chunk=chunk,
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    # oracle
    full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    full[:, ~tv] = np.inf
    want_idx = full.argmin(1)
    want_d2 = full.min(1)
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_allclose(d2, want_d2, rtol=1e-4, atol=1e-7)


def test_nearest_neighbors_invalid_source_and_empty_target():
    src = jnp.ones((4, 3))
    sv = jnp.array([True, False, True, True])
    tgt = jnp.zeros((8, 3))
    tv = jnp.zeros(8, bool)
    d2, _ = nearest_neighbors(src, sv, tgt, tv, chunk=8)
    assert np.isinf(np.asarray(d2)).all()


def test_nearest_neighbors_mm_scale_precision():
    # Points at meter offsets with mm-scale separations: the recentred
    # matmul argmin must still pick the true neighbor.
    rng = np.random.default_rng(5)
    base = np.array([3.0, -2.0, 5.0], np.float32)
    tgt = (base + rng.uniform(-0.05, 0.05, (256, 3))).astype(np.float32)
    src = tgt[:64] + rng.uniform(-2e-4, 2e-4, (64, 3)).astype(np.float32)
    d2, idx = nearest_neighbors(
        jnp.asarray(src), jnp.ones(64, bool), jnp.asarray(tgt), jnp.ones(256, bool),
        chunk=64,
    )
    full = ((src[:, None, :] - tgt[None, :, :]) ** 2).sum(-1)
    want_d2 = full.min(1)
    # distance to picked neighbor must match true NN distance to f32 noise
    np.testing.assert_allclose(np.asarray(d2), want_d2, atol=1e-9)


def test_voxel_downsample_normal_purity_drops_crease_cells():
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.ops.voxel import voxel_downsample

    # two voxels: one pure (+z normals), one crease (+z and +x mixed)
    xyz = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.1, 0.2],
         [1.1, 0.1, 0.1], [1.2, 0.2, 0.2], [1.3, 0.1, 0.2]],
        np.float32,
    )
    nrm = np.array(
        [[0, 0, 1], [0, 0, 1], [0, 0, 1],
         [0, 0, 1], [1, 0, 0], [0, 1, 0]],
        np.float32,
    )
    c = Cloud.from_numpy(xyz, valid=np.ones(6, bool))
    c = Cloud(c.xyz, c.rgb, c.valid, normal=jnp.asarray(nrm))
    out_all = voxel_downsample(c, 1.0, 8)
    assert int(out_all.count()) == 2
    out_pure = voxel_downsample(c, 1.0, 8, min_normal_purity=0.9)
    assert int(out_pure.count()) == 1
    kept = np.asarray(out_pure.xyz)[np.asarray(out_pure.valid)]
    assert (kept[:, 0] < 1.0).all()  # the pure cell is the x<1 one
