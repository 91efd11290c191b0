"""Tests for the organized-image ops: deprojection, normals, Canny, edges,
filters."""

import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud, OrganizedCloud
from rspc_tpu.config import EdgeConfig
from rspc_tpu.ops import (
    Intrinsics,
    canny,
    deproject_depth,
    estimate_normals,
    extract_edge_features,
    extract_organized_edges,
    passthrough,
    rgbd_to_organized_cloud,
    statistical_outlier_removal,
)
from rspc_tpu.ops.edges import (
    LABEL_NAN_BOUNDARY,
    LABEL_OCCLUDED,
    LABEL_OCCLUDING,
    LABEL_RGB_CANNY,
)
from rspc_tpu.ops.image import box_sum, shift2d


def test_box_sum_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(12, 17)).astype(np.float32)
    r = 2
    got = np.asarray(box_sum(jnp.asarray(img), r))
    want = np.zeros_like(img)
    h, w = img.shape
    for i in range(h):
        for j in range(w):
            want[i, j] = img[
                max(0, i - r) : min(h, i + r + 1), max(0, j - r) : min(w, j + r + 1)
            ].sum()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_shift2d():
    img = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    out = np.asarray(shift2d(img, 1, -1, fill=-1.0))
    # out[r,c] = img[r+1, c-1]
    assert out[0, 1] == float(img[1, 0])
    assert (out[2] == -1).all()
    assert (out[:, 0] == -1).all()


def test_deproject_pinhole():
    intr = Intrinsics(width=8, height=6, fx=4.0, fy=4.0, ppx=4.0, ppy=3.0)
    depth = np.zeros((6, 8), np.uint16)
    depth[3, 4] = 1000  # principal point, 1m
    depth[3, 6] = 2000  # 2px right of pp, 2m
    xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    np.testing.assert_allclose(xyz[3, 4], [0, 0, 1.0], atol=1e-6)
    np.testing.assert_allclose(xyz[3, 6], [1.0, 0, 2.0], atol=1e-6)  # (6-4)/4*2
    assert xyz[0, 0, 2] == 0.0  # invalid depth -> origin


def test_deproject_brown_conrady_roundtrip():
    # forward-distort a known grid, then deproject must undo it
    intr = Intrinsics(
        width=64, height=48, fx=40.0, fy=40.0, ppx=32.0, ppy=24.0,
        coeffs=(0.1, -0.05, 0.001, 0.001, 0.01),
    )
    k1, k2, p1, p2, k3 = intr.coeffs
    xu = (np.arange(64) - intr.ppx) / intr.fx
    yu = (np.arange(48) - intr.ppy) / intr.fy
    XU, YU = np.meshgrid(xu, yu)
    # We verify the inverse property: undistort(distort(x)) == x.
    r2 = XU**2 + YU**2
    f = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    xd = XU * f + 2 * p1 * XU * YU + p2 * (r2 + 2 * XU**2)
    yd = YU * f + 2 * p2 * XU * YU + p1 * (r2 + 2 * YU**2)
    from rspc_tpu.ops.deproject import _undistort_brown_conrady

    gx, gy = _undistort_brown_conrady(
        jnp.asarray(xd, jnp.float32), jnp.asarray(yd, jnp.float32), intr.coeffs
    )
    np.testing.assert_allclose(np.asarray(gx), XU, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gy), YU, atol=2e-4)


def test_rgbd_to_cloud_bgr_swizzle():
    intr = Intrinsics.simple(8, 6)
    depth = np.full((6, 8), 1000, np.uint16)
    color = np.zeros((6, 8, 3), np.uint8)
    color[..., 0] = 10  # B channel (camera is BGR)
    color[..., 2] = 200  # R channel
    oc = rgbd_to_organized_cloud(
        jnp.asarray(depth), jnp.asarray(color), intr, bgr=True
    )
    rgb = np.asarray(oc.rgb)
    assert rgb[3, 4, 0] == 200 and rgb[3, 4, 2] == 10  # swizzled to RGB
    assert bool(np.asarray(oc.valid).all())


def test_normals_flat_plane():
    # plane z = 2 -> normals along -z (toward viewpoint)
    intr = Intrinsics.simple(32, 24)
    depth = np.full((24, 32), 2000, np.uint16)
    xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    oc = OrganizedCloud.from_numpy(xyz)
    normals, ok = estimate_normals(oc)
    normals, ok = np.asarray(normals), np.asarray(ok)
    interior = ok[8:16, 8:24]
    assert interior.all()
    nz = normals[8:16, 8:24, 2]
    np.testing.assert_allclose(nz, -1.0, atol=1e-3)


def test_normals_do_not_bleed_across_depth_jump():
    # two fronto-parallel planes with a big z jump: normals near the jump
    # must stay axis-aligned, not tilt across the discontinuity
    intr = Intrinsics.simple(40, 24)
    depth = np.full((24, 40), 1000, np.uint16)
    depth[:, 20:] = 3000
    xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    oc = OrganizedCloud.from_numpy(xyz)
    normals, ok = estimate_normals(oc)
    normals = np.asarray(normals)
    # a pixel adjacent to the jump on the near plane
    n = normals[12, 19]
    assert abs(n[2]) > 0.95


def test_canny_detects_step_edge():
    img = np.zeros((24, 32), np.float32)
    img[:, 16:] = 255.0
    edges = np.asarray(canny(jnp.asarray(img)))
    # the edge column(s) fire, far field does not
    assert edges[5:20, 15:17].any()
    assert not edges[:, :10].any()
    assert not edges[:, 22:].any()


def test_organized_edges_depth_classes():
    # near plane occludes far plane: near side of the jump = OCCLUDING,
    # far side = OCCLUDED (relative threshold 0.2*z)
    intr = Intrinsics.simple(40, 24)
    depth = np.full((24, 40), 1000, np.uint16)
    depth[:, 20:] = 3000
    xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    oc = OrganizedCloud.from_numpy(xyz)
    labels = np.asarray(extract_organized_edges(oc))
    assert (labels[5:20, 19] == LABEL_OCCLUDING).any()
    assert (labels[5:20, 20] == LABEL_OCCLUDED).any()


def test_organized_edges_nan_boundary():
    intr = Intrinsics.simple(40, 24)
    depth = np.full((24, 40), 1000, np.uint16)
    depth[:, 15:25] = 0  # a wide invalid hole (wider than neighbors search?)
    cfg = EdgeConfig(max_search_neighbors=4)
    xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    oc = OrganizedCloud.from_numpy(xyz)
    labels = np.asarray(extract_organized_edges(oc, cfg))
    # hole is 10 wide, search is 4: boundary pixels can't see across ->
    # NAN_BOUNDARY on both rims
    assert (labels[5:20, 14] == LABEL_NAN_BOUNDARY).any()
    assert (labels[5:20, 25] == LABEL_NAN_BOUNDARY).any()


def test_extract_edge_features_returns_rgb_canny_points():
    # colored vertical stripe on a flat plane -> rgb canny edges at the
    # stripe borders; extract_edge_features returns exactly those points
    intr = Intrinsics.simple(48, 32)
    depth = np.full((32, 48), 1500, np.uint16)
    color = np.zeros((32, 48, 3), np.uint8)
    color[:, 24:34] = 255
    oc_xyz = np.asarray(deproject_depth(jnp.asarray(depth), intr, 0.001))
    oc = OrganizedCloud.from_numpy(oc_xyz, color.astype(np.float32))
    cfg = EdgeConfig(max_edge_points=512)
    ec = extract_edge_features(oc, cfg)
    pts, _ = ec.to_numpy()
    assert pts.shape[0] > 0
    labels = np.asarray(extract_organized_edges(oc, cfg))
    assert pts.shape[0] == (labels == LABEL_RGB_CANNY).sum()


def test_passthrough():
    xyz = np.array([[0, 0, 0.1], [0, 0, 1.0], [0, 0, 3.0]], np.float32)
    c = Cloud.from_numpy(xyz)
    out = passthrough(c, "z", 0.2, 2.5)
    assert np.asarray(out.valid).tolist() == [False, True, False]


def test_statistical_outlier_removal():
    rng = np.random.default_rng(7)
    cluster = rng.normal(0, 0.01, (200, 3)).astype(np.float32) + [0, 0, 1]
    outlier = np.array([[5, 5, 5]], np.float32)
    c = Cloud.from_numpy(np.concatenate([cluster, outlier]))
    out = statistical_outlier_removal(c, mean_k=10, stddev_mult=1.5, chunk=64)
    v = np.asarray(out.valid)
    assert not v[200]          # the far outlier dropped
    assert v[:200].sum() > 150  # bulk of the cluster kept


def test_hysteresis_pallas_matches_xla_fixpoint():
    # The VMEM hysteresis kernel (interpret mode off-TPU) must reach the
    # same unique connected closure as the XLA dilation fixpoint.
    from rspc_tpu.ops.canny import _dilate8, _hysteresis_pallas

    rng = np.random.default_rng(7)
    weak = jnp.asarray(rng.random((64, 256)) < 0.25)
    strong = weak & jnp.asarray(rng.random((64, 256)) < 0.05)
    got = np.asarray(_hysteresis_pallas(strong, weak, interpret=True))
    ref = strong
    for _ in range(200):
        ref = ref | (weak & _dilate8(ref))
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_hysteresis_line_flood_matches_dilation():
    # XLA path: log-doubling line floods + dilation rounds == plain
    # one-pixel dilation fixpoint.
    from rspc_tpu.ops.canny import _dilate8, _hysteresis

    rng = np.random.default_rng(11)
    weak = jnp.asarray(rng.random((48, 80)) < 0.35)
    strong = weak & jnp.asarray(rng.random((48, 80)) < 0.03)
    got = np.asarray(_hysteresis(strong, weak))
    ref = strong
    for _ in range(200):
        ref = ref | (weak & _dilate8(ref))
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_estimate_normals_radius_plane_oracle():
    # radius-search normals on an unorganized tilted plane: every point's
    # neighborhood covariance must yield the plane normal (PCL
    # NormalEstimation + radiusSearch semantics)
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.ops.normals import estimate_normals_radius

    rng = np.random.default_rng(3)
    uv = rng.uniform(-0.5, 0.5, (400, 2)).astype(np.float32)
    n_true = np.array([1.0, 2.0, -2.0], np.float32)
    n_true /= np.linalg.norm(n_true)
    e1 = np.cross(n_true, [0.0, 0.0, 1.0]); e1 /= np.linalg.norm(e1)
    e2 = np.cross(n_true, e1)
    pts = (uv[:, :1] * e1 + uv[:, 1:] * e2 + [0.0, 0.0, 2.0]).astype(np.float32)
    c = Cloud.from_numpy(pts, valid=np.ones(len(pts), bool))
    nrm, ok = estimate_normals_radius(c, radius=0.15, chunk=128)
    nrm, ok = np.asarray(nrm), np.asarray(ok)
    assert ok.all()
    # flipped toward origin viewpoint: n . p < 0
    assert (np.einsum("ij,ij->i", nrm, pts) <= 1e-6).all()
    ref = n_true if (n_true @ [0, 0, 2.0]) < 0 else -n_true
    err = np.abs(nrm - ref).max()
    assert err < 1e-3, err


def test_estimate_normals_radius_too_few_neighbors():
    from rspc_tpu.cloud import Cloud
    from rspc_tpu.ops.normals import estimate_normals_radius

    pts = np.array([[0, 0, 1.0], [5, 5, 5.0]], np.float32)  # isolated pair
    c = Cloud.from_numpy(pts, valid=np.ones(2, bool))
    nrm, ok = estimate_normals_radius(c, radius=0.05, chunk=128)
    assert not np.asarray(ok).any()
    assert (np.asarray(nrm) == 0).all()
