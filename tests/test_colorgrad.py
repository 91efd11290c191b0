"""Colored-ICP stack: tangent-plane intensity gradients (ops/colorgrad),
cgrad field propagation, the colored residual in the p2l solve, and the
end-to-end in-plane observability payoff (the capability the geometric
point-to-plane residual lacks — RESULTS.md `combined` wall).

Beyond-reference capability (the reference registers geometry only);
residual per Park, Zhou, Koltun, "Colored Point Cloud Registration
Revisited", ICCV 2017.
"""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud, OrganizedCloud, compact, concatenate
from rspc_tpu.config import ICPConfig
from rspc_tpu.ops.colorgrad import _solve3, color_gradients, intensity
from rspc_tpu.ops.transform import (
    apply_transform_cloud,
    make_rigid,
    rotation_matrix,
)
from rspc_tpu.ops.voxel import voxel_downsample
from rspc_tpu.registration.icp import icp_align


def test_solve3_matches_numpy_on_general_matrices():
    """The adjugate solve must be correct for NON-symmetric systems too
    (its docstring advertises a generic batched 3x3 solve)."""
    rng = np.random.default_rng(0)
    m = rng.normal(size=(64, 3, 3)).astype(np.float32)
    # keep determinants healthy so the eps gate stays out of the way
    m += 3.0 * np.eye(3, dtype=np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(_solve3(jnp.asarray(m), jnp.asarray(b), eps=1e-9))
    want = np.linalg.solve(m, b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def _plane_grid(h=48, w=64, extent=0.6, z=1.0):
    """Organized flat plane at depth ``z`` spanning ``extent`` meters."""
    xs = np.linspace(-extent / 2, extent / 2, w, dtype=np.float32)
    ys = np.linspace(-extent / 2, extent / 2, h, dtype=np.float32)
    x, y = np.meshgrid(xs, ys)
    xyz = np.stack([x, y, np.full_like(x, z)], axis=-1)
    return xyz


def _gray(i):
    """[H,W] intensity in [0,1] -> 0..255 gray RGB (luma == i exactly)."""
    v = np.clip(i, 0.0, 1.0) * 255.0
    return np.stack([v, v, v], axis=-1).astype(np.float32)


def test_gradient_recovers_linear_ramp():
    """Flat z-plane with intensity I = 0.5 + a*x: the tangent-plane
    gradient must be (a, 0, 0) intensity/meter in the interior."""
    xyz = _plane_grid()
    a = 0.4
    i_img = 0.5 + a * xyz[..., 0]
    oc = OrganizedCloud.from_numpy(xyz, _gray(i_img))
    h, w, _ = xyz.shape
    normals = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], jnp.float32), (h, w, 3)
    )
    g = np.asarray(
        color_gradients(oc, normals, jnp.ones((h, w), bool))
    )
    interior = g[4:-4, 4:-4]
    np.testing.assert_allclose(
        interior, np.broadcast_to([a, 0.0, 0.0], interior.shape), atol=5e-3
    )


def test_gradient_tangent_to_tilted_plane():
    """On a tilted textured plane the gradient must stay in the tangent
    plane (g . n == 0) and be finite everywhere."""
    xyz = _plane_grid()
    # tilt: z = 1 + 0.3 x + 0.2 y; unnormalized normal (-0.3, -0.2, 1)
    xyz[..., 2] = 1.0 + 0.3 * xyz[..., 0] + 0.2 * xyz[..., 1]
    i_img = 0.5 + 0.2 * np.sin(9.0 * xyz[..., 0]) * np.cos(7.0 * xyz[..., 1])
    oc = OrganizedCloud.from_numpy(xyz, _gray(i_img))
    n = np.array([-0.3, -0.2, 1.0], np.float32)
    n /= np.linalg.norm(n)
    h, w, _ = xyz.shape
    normals = jnp.broadcast_to(jnp.asarray(n), (h, w, 3))
    g = np.asarray(color_gradients(oc, normals, jnp.ones((h, w), bool)))
    assert np.isfinite(g).all()
    dots = np.abs(g @ n)
    assert dots.max() < 1e-4
    # and it has real magnitude where the texture varies
    assert np.linalg.norm(g[10:-10, 10:-10], axis=-1).mean() > 0.3


def test_depth_discontinuity_rows_rejected():
    """An occlusion edge (depth step) coinciding with an intensity step
    must NOT produce a huge fake gradient: the asymmetric-step gate
    rejects those difference rows."""
    xyz = _plane_grid()
    # right half jumps 0.5 m farther (occlusion edge at column w/2)
    half = xyz.shape[1] // 2
    xyz[:, half:, 2] += 0.5
    i_img = np.full(xyz.shape[:2], 0.3, np.float32)
    i_img[:, half:] = 0.9  # intensity step exactly at the depth step
    oc = OrganizedCloud.from_numpy(xyz, _gray(i_img))
    h, w, _ = xyz.shape
    normals = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], jnp.float32), (h, w, 3)
    )
    g = np.asarray(color_gradients(oc, normals, jnp.ones((h, w), bool)))
    # the texture is constant on each side; any gradient is an artifact
    assert np.abs(g).max() < 1e-3


def _textured_cloud(n=512, seed=0, with_cgrad=True):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    xyz[:, 2] += 1.5
    rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
    cg = rng.normal(size=(n, 3)).astype(np.float32) if with_cgrad else None
    return Cloud(
        xyz=jnp.asarray(xyz),
        rgb=jnp.asarray(rgb),
        valid=jnp.ones((n,), bool),
        normal=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        cgrad=None if cg is None else jnp.asarray(cg),
    )


def test_cgrad_propagates_through_cloud_ops():
    """compact / concatenate / apply_transform_cloud must carry cgrad
    (rotating it like a direction field), and voxel_downsample must
    average it per cell WITHOUT renormalizing."""
    c = _textured_cloud()
    # transform: cgrad rotates, does not translate
    t = make_rigid(
        rotation_matrix(jnp.float32(0.3), 1),
        jnp.array([0.1, -0.2, 0.3], jnp.float32),
    )
    moved = apply_transform_cloud(t, c)
    r = np.asarray(t)[:3, :3]
    np.testing.assert_allclose(
        np.asarray(moved.cgrad), np.asarray(c.cgrad) @ r.T, atol=1e-5
    )
    # concatenate + compact keep per-point cgrad attached to its point
    both = concatenate(c, moved)
    assert both.cgrad is not None
    xyz_all = np.asarray(both.xyz)[np.asarray(both.valid)]
    cg_all = np.asarray(both.cgrad)[np.asarray(both.valid)]
    lut = {tuple(p): g for p, g in zip(
        np.concatenate([np.asarray(c.xyz), np.asarray(moved.xyz)]),
        np.concatenate([np.asarray(c.cgrad), np.asarray(moved.cgrad)]),
    )}
    for p, g in zip(xyz_all[:32], cg_all[:32]):
        np.testing.assert_allclose(g, lut[tuple(p)], atol=1e-6)
    sub = compact(c, capacity=c.capacity)
    np.testing.assert_allclose(np.asarray(sub.cgrad), np.asarray(c.cgrad))


def test_voxel_downsample_means_cgrad():
    """Two points in one voxel with opposing gradients must average to
    ~zero (magnitude is signal — opposing texture mutes the residual)."""
    xyz = jnp.asarray(
        [[0.001, 0.001, 0.001], [0.003, 0.003, 0.003],
         [0.101, 0.001, 0.001]], jnp.float32
    )
    cg = jnp.asarray(
        [[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 2.0, 0.0]], jnp.float32
    )
    c = Cloud(
        xyz=xyz, rgb=jnp.zeros((3, 3)), valid=jnp.ones((3,), bool),
        cgrad=cg,
    )
    down = voxel_downsample(c, leaf_size=0.01, max_points=4)
    got_xyz, _ = down.to_numpy()
    got_cg = np.asarray(down.cgrad)[np.asarray(down.valid)]
    order = np.argsort(got_xyz[:, 0])
    np.testing.assert_allclose(
        got_cg[order], [[0.0, 0.0, 0.0], [0.0, 2.0, 0.0]], atol=1e-6
    )


def _plane_scene(seed=0, n=2000, tex_freq=9.0, amp=0.25):
    """Two samplings of one static textured z=1 plane related by an
    IN-PLANE translation (geometrically unobservable for p2l)."""
    rng = np.random.default_rng(seed)
    t_true = np.array([0.006, -0.004, 0.0], np.float32)
    t44 = np.eye(4, dtype=np.float32)
    t44[:3, 3] = t_true

    def tex(w):  # intensity field on the plane
        return 0.5 + amp * np.sin(tex_freq * w[:, 0]) * np.cos(
            tex_freq * w[:, 1]
        )

    def tex_grad(w):  # analytic d(tex)/d(world), tangent to the plane
        gx = amp * tex_freq * np.cos(tex_freq * w[:, 0]) * np.cos(
            tex_freq * w[:, 1]
        )
        gy = -amp * tex_freq * np.sin(tex_freq * w[:, 0]) * np.sin(
            tex_freq * w[:, 1]
        )
        return np.stack([gx, gy, np.zeros_like(gx)], axis=-1)

    # target: points q on the plane, observed intensities I(q)
    q = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    q[:, 2] = 1.0
    tgt = Cloud(
        xyz=jnp.asarray(q),
        rgb=jnp.asarray(_gray(tex(q)).reshape(n, 3)),
        valid=jnp.ones((n,), bool),
        normal=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3)
        ),
        cgrad=jnp.asarray(tex_grad(q).astype(np.float32)),
    )
    # source: points p in the source frame; world position is T p, so
    # the observed intensity is I(T p)
    p = rng.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    p[:, 2] = 1.0
    wpos = p + t_true
    src = Cloud(
        xyz=jnp.asarray(p),
        rgb=jnp.asarray(_gray(tex(wpos)).reshape(n, 3)),
        valid=jnp.ones((n,), bool),
    )
    return src, tgt, t44


def test_colored_icp_recovers_inplane_motion():
    """On a flat textured plane, geometric p2l is blind to in-plane
    translation (the floored solve refuses to move); the colored
    residual recovers it."""
    src, tgt, t_true = _plane_scene()
    base = ICPConfig(
        variant="point_to_plane",
        max_iterations=30,
        max_correspondence_distance=0.05,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        target_chunk=512,
        use_pallas=False,
        huber_delta=None,
    )
    import dataclasses

    plain = icp_align(src, tgt, base)
    colored = icp_align(
        src, tgt, dataclasses.replace(base, color_weight=1.0)
    )
    err_plain = np.abs(np.asarray(plain.transform) - t_true).max()
    err_colored = np.abs(np.asarray(colored.transform) - t_true).max()
    # plain p2l cannot see the 6 mm in-plane shift: it stays ~identity,
    # i.e. its error IS the shift magnitude
    assert err_plain > 3e-3
    assert err_colored < 5e-4
    assert err_colored < err_plain / 5


def test_colored_icp_noop_without_cgrad_or_weight():
    """color_weight with a gradient-free target (and vice versa) leaves
    the geometric program bit-identical."""
    src, tgt, _ = _plane_scene(seed=1)
    import dataclasses

    base = ICPConfig(
        variant="point_to_plane",
        max_iterations=5,
        max_correspondence_distance=0.05,
        target_chunk=512,
        use_pallas=False,
    )
    tgt_plain = dataclasses.replace(tgt, cgrad=None)
    a = icp_align(src, tgt_plain, base)
    b = icp_align(
        src, tgt_plain, dataclasses.replace(base, color_weight=1.0)
    )
    c = icp_align(src, tgt, base)  # cgrad present, weight 0
    np.testing.assert_array_equal(
        np.asarray(a.transform), np.asarray(b.transform)
    )
    np.testing.assert_array_equal(
        np.asarray(a.transform), np.asarray(c.transform)
    )


def test_phase1_color_pipeline():
    """RefineConfig.color=True: phase 1 computes the gradient field in
    image space and the voxel downsample carries it on Cloud.cgrad."""
    from rspc_tpu.config import EdgeConfig
    from rspc_tpu.registration.schemes import _prepare_full_down

    xyz = _plane_grid(h=40, w=60)
    i_img = 0.5 + 0.3 * np.sin(8.0 * xyz[..., 0])
    oc = OrganizedCloud.from_numpy(xyz, _gray(i_img))
    full = _prepare_full_down(
        oc, EdgeConfig(), leaf=0.04, cap=1024, color=True
    )
    assert full.cgrad is not None
    cg = np.asarray(full.cgrad)[np.asarray(full.valid)]
    assert np.isfinite(cg).all()
    # texture varies along x at ~2.4 intensity/m peak; voxel means in
    # the interior must keep real magnitude
    assert np.linalg.norm(cg, axis=-1).max() > 0.5
    # without color: no cgrad (static choice)
    plain = _prepare_full_down(oc, EdgeConfig(), leaf=0.04, cap=1024)
    assert plain.cgrad is None


def test_intensity_luma():
    rgb = jnp.asarray([[255.0, 0.0, 0.0], [0.0, 255.0, 0.0],
                       [255.0, 255.0, 255.0]])
    i = np.asarray(intensity(rgb))
    np.testing.assert_allclose(i, [0.299, 0.587, 1.0], atol=1e-6)
