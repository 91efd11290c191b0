"""Cloud pytree container tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud, OrganizedCloud, compact, concatenate


def test_cloud_pytree_jittable():
    c = Cloud.empty(16)

    @jax.jit
    def f(c):
        return c.count()

    assert int(f(c)) == 0


def test_from_numpy_pads_and_masks():
    xyz = np.array([[1, 2, 3], [0, 0, 0], [np.nan, 1, 1]], np.float32)
    c = Cloud.from_numpy(xyz, capacity=5)
    assert c.capacity == 5
    assert int(c.count()) == 1  # z==0 and nan rows invalid
    assert not bool(np.asarray(c.valid)[3])


def test_compact_moves_valid_first():
    xyz = np.arange(15, dtype=np.float32).reshape(5, 3) + 1
    valid = np.array([False, True, False, True, True])
    c = Cloud.from_numpy(xyz, valid=valid)
    cc = jax.jit(compact)(c)
    v = np.asarray(cc.valid)
    assert v[:3].all() and not v[3:].any()
    np.testing.assert_array_equal(np.asarray(cc.xyz)[0], xyz[1])
    np.testing.assert_array_equal(np.asarray(cc.xyz)[2], xyz[4])


def test_concatenate():
    a = Cloud.from_numpy(np.array([[1, 1, 1]], np.float32))
    b = Cloud.from_numpy(np.array([[2, 2, 2], [3, 3, 3]], np.float32))
    c = concatenate(a, b)
    assert c.capacity == 3
    assert int(c.count()) == 3


def test_center_crop_matches_reference_math():
    # reference: rows [H/5, 4H/5) x cols [W/5, 4W/5) (src/capture.hpp:79-88)
    h, w = 20, 25
    xyz = np.zeros((h, w, 3), np.float32)
    xyz[..., 2] = 1.0
    xyz[..., 0] = np.arange(w)[None, :]
    xyz[..., 1] = np.arange(h)[:, None]
    oc = OrganizedCloud.from_numpy(xyz)
    cc = oc.center_crop_3_5()
    assert cc.height == h * 3 // 5 and cc.width == w * 3 // 5
    assert float(cc.xyz[0, 0, 0]) == w // 5
    assert float(cc.xyz[0, 0, 1]) == h // 5


def test_organized_flatten():
    xyz = np.random.default_rng(0).uniform(1, 2, (4, 6, 3)).astype(np.float32)
    oc = OrganizedCloud.from_numpy(xyz)
    flat = oc.flatten()
    assert flat.capacity == 24
    np.testing.assert_array_equal(
        np.asarray(flat.xyz), np.asarray(oc.xyz).reshape(24, 3)
    )


def test_cloud_normal_plumbing():
    """Normals ride through compact/concatenate/pad_to/transforms."""
    import jax.numpy as jnp

    from rspc_tpu.cloud import Cloud, concatenate, compact
    from rspc_tpu.ops.transform import (
        apply_transform_cloud,
        make_rigid,
        rotation_matrix,
    )

    xyz = np.arange(12, dtype=np.float32).reshape(4, 3)
    nrm = np.tile(np.float32([0, 0, 1]), (4, 1))
    c = Cloud(
        jnp.asarray(xyz),
        jnp.zeros((4, 3)),
        jnp.asarray([True, False, True, True]),
        normal=jnp.asarray(nrm),
    )
    cc = compact(c)
    assert cc.normal is not None and cc.normal.shape == (4, 3)

    both = concatenate(c, c)
    assert both.normal is not None and both.normal.shape == (8, 3)

    t = make_rigid(
        rotation_matrix(jnp.float32(np.pi / 2), 0),
        jnp.asarray([1.0, 2.0, 3.0], jnp.float32),
    )
    ct = apply_transform_cloud(t, c)
    # +z normal rotated by Rx(90deg) -> +(-1)y? Rx(90): z -> -?; check
    # numerically against the rotation matrix itself
    expect = nrm @ np.asarray(t)[:3, :3].T
    np.testing.assert_allclose(np.asarray(ct.normal), expect, atol=1e-6)

    # mixed (one side without normals) drops them rather than inventing
    plain = Cloud(c.xyz, c.rgb, c.valid)
    assert concatenate(c, plain).normal is None


def test_voxel_downsample_averages_normals():
    import jax.numpy as jnp

    from rspc_tpu.cloud import Cloud
    from rspc_tpu.ops.voxel import voxel_downsample

    xyz = np.float32([[0.001, 0, 0], [0.002, 0, 0], [1.0, 0, 0]])
    nrm = np.float32([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    c = Cloud(
        jnp.asarray(xyz),
        jnp.zeros((3, 3)),
        jnp.ones(3, bool),
        normal=jnp.asarray(nrm),
    )
    out = voxel_downsample(c, 0.01, 4)
    assert out.normal is not None
    got = np.asarray(out.normal)[np.asarray(out.valid)]
    lens = np.linalg.norm(got, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
