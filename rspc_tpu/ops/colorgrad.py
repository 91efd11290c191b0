"""Per-point tangent-plane intensity gradients for colored ICP.

Beyond-reference capability (the reference registers geometry only;
SURVEY.md §2b). Motivation, measured on the robustness matrix
(RESULTS.md): on weakly-textured planar scenes the point-to-plane solve
is blind along the surface — the eigenvalue-floored solve deliberately
refuses to move along unobserved directions, so in-plane drift
accumulates uncorrected (the ``combined`` scenario's ~1e-1 wall). RGB
intensity varies *along* surfaces, which is exactly the missing
observability: a colored residual ``g . (T p - q) + (I_src - I_tgt)``
(Park, Zhou, Koltun, "Colored Point Cloud Registration Revisited",
ICCV 2017) has the same row structure as the point-to-plane term with
the unit normal replaced by the target's tangent-plane intensity
gradient ``g``, so it drops into the existing 6x6 moment solve
(ops/umeyama.plane_fit_moments with a residual offset).

TPU-first design: the gradient field is computed ONCE per frame in
IMAGE space (the clouds are organized; central differences over the
pixel grid are three shifted subtractions on the VPU), not from a kNN
graph like Open3D — no neighbor search, no dynamic shapes, and it
fuses into the phase-1 program alongside the normal estimation whose
normals it reuses. Per pixel we solve the 3x3 weighted least squares

    [ dp_u^T ]       [ dI_u ]
    [ dp_v^T ]  g =  [ dI_v ]      rows normalized to unit |dp|,
    [  n^T   ]       [  0   ]      closed-form adjugate inverse,

then project ``g`` exactly onto the tangent plane. Gradients ride
through the voxel downsample as per-voxel means (ops/voxel.py) on the
Cloud.cgrad field.
"""

from __future__ import annotations

import jax.numpy as jnp

from rspc_tpu.cloud import OrganizedCloud


def intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """Luma in [0, 1] from 0..255 RGB (Rec. 601 weights)."""
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ) / 255.0


def _solve3(m: jnp.ndarray, b: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Batched 3x3 solve via the adjugate, elementwise on the VPU
    (a [..,3,3] jnp.linalg.solve lowers to layout-churning batched LU).
    Rows with |det| < eps return 0."""
    a00, a01, a02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a10, a11, a12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    a20, a21, a22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    # c[i][j] above is the ADJUGATE entry adj[i][j] (= cofactor C[j][i]),
    # so the solve below is inv(m) b = adj(m) b / det for any m; the det
    # expansion along row 0 needs the COFACTORS of row 0, i.e. adj
    # column 0 (c00, c10, c20) — using (c00, c01, c02) is only correct
    # for symmetric m.
    det = a00 * c00 + a01 * c10 + a02 * c20
    ok = jnp.abs(det) > eps
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    g0 = (c00 * b0 + c01 * b1 + c02 * b2) * inv_det
    g1 = (c10 * b0 + c11 * b1 + c12 * b2) * inv_det
    g2 = (c20 * b0 + c21 * b1 + c22 * b2) * inv_det
    return jnp.stack([g0, g1, g2], axis=-1)


def color_gradients(
    oc: OrganizedCloud,
    normals: jnp.ndarray,
    normals_valid: jnp.ndarray,
    step_ratio: float = 4.0,
    max_step: float = 0.1,
) -> jnp.ndarray:
    """Tangent-plane intensity gradient ``g f32[H, W, 3]`` (intensity
    units per meter) at every organized pixel.

    ``normals``/``normals_valid`` come from the integral-image estimate
    the phase-1 program already computes (ops/normals.py) — under jit
    the call CSEs with the edge extractor's.

    Pixels whose u/v neighbors are invalid lose the corresponding
    difference row; with both rows gone (or a degenerate system) the
    gradient is zero, which simply mutes the colored residual there.
    """
    i_img = intensity(oc.rgb)
    xyz, valid = oc.xyz, oc.valid

    def diffs(arr, axis):
        """(forward, backward) one-pixel differences along ``axis``
        (their sum is the central difference)."""
        fwd = jnp.roll(arr, -1, axis=axis) - arr
        bwd = arr - jnp.roll(arr, 1, axis=axis)
        return fwd, bwd

    def edge_ok(axis):
        ok = (
            jnp.roll(valid, -1, axis=axis)
            & jnp.roll(valid, 1, axis=axis)
            & valid
        )
        # jnp.roll wraps; kill the image-border rows/cols explicitly
        idx = jnp.arange(ok.shape[axis])
        border = (idx > 0) & (idx < ok.shape[axis] - 1)
        shape = [1, 1]
        shape[axis] = ok.shape[axis]
        return ok & border.reshape(shape)

    def axis_rows(axis):
        pf, pb = diffs(xyz, axis)
        dp = pf + pb  # central difference
        di = jnp.roll(i_img, -1, axis=axis) - jnp.roll(i_img, 1, axis=axis)
        # Depth-discontinuity gate: on one smooth surface the forward and
        # backward steps are near-equal; a row straddling an occlusion
        # edge has one step much larger than the other — its "gradient"
        # is occlusion geometry, not texture. Reject asymmetric rows and
        # (absolute backstop) any step larger than max_step.
        nf = jnp.linalg.norm(pf, axis=-1)
        nb = jnp.linalg.norm(pb, axis=-1)
        symmetric = jnp.maximum(nf, nb) <= (
            step_ratio * jnp.minimum(nf, nb) + 1e-6
        )
        small = jnp.maximum(nf, nb) <= max_step
        return dp, di, edge_ok(axis) & symmetric & small

    dp_v, di_v, ok_v = axis_rows(0)  # along image rows (v direction)
    dp_u, di_u, ok_u = axis_rows(1)  # along image cols (u direction)

    def norm_row(dp, di, ok):
        n2 = jnp.sum(dp * dp, axis=-1)
        inv = jnp.where(n2 > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-12)), 0.0)
        w = (ok & (n2 > 1e-12)).astype(dp.dtype)
        return dp * inv[..., None] * w[..., None], di * inv * w

    au, bu = norm_row(dp_u, di_u, ok_u)
    av, bv = norm_row(dp_v, di_v, ok_v)
    n_row = jnp.where(
        (valid & normals_valid)[..., None], normals, 0.0
    ).astype(xyz.dtype)

    # m = sum_r a_r a_r^T, rhs = sum_r a_r b_r (normal row has b = 0)
    def outer(a):
        return a[..., :, None] * a[..., None, :]

    m = outer(au) + outer(av) + outer(n_row)
    rhs = au * bu[..., None] + av * bv[..., None]
    g = _solve3(m, rhs, eps=1e-6)

    # exact tangency (the LS row only enforces it softly)
    ndot = jnp.sum(g * n_row, axis=-1, keepdims=True)
    g = g - n_row * ndot
    g = jnp.where((valid & normals_valid)[..., None], g, 0.0)
    return jnp.where(jnp.isfinite(g), g, 0.0)
