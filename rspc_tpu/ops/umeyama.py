"""Weighted rigid (SVD/Umeyama) transform estimation.

TPU-native replacement for PCL's ``TransformationEstimationSVD`` — the inner
solver of every ICP iteration (SURVEY.md X1). Runs entirely on-device: a
masked 3x3 cross-covariance (one small matmul at HIGHEST precision) followed
by a Newton **polar iteration** for the optimal rotation.

Why polar iteration instead of plain SVD: the optimal rotation maximizing
``tr(R H)`` (H = sum_i w_i src_i dst_i^T, demeaned) is the orthogonal polar
factor of ``H^T``. TPU's f32 SVD (QDWH-based) leaves ~1e-3 error in the
recovered rotation — above the <1e-3 transform-error budget
(BASELINE.json) — while the quadratically-convergent Newton iteration
``X <- (X + X^-T)/2`` reaches f32 machine precision in ~10 cheap 3x3 steps.
The SVD path is kept as the fallback for reflection/degenerate cases
(det(H) <= 0), matching PCL/Umeyama's smallest-singular-direction flip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """Cofactor (adjugate^T) matrix of a 3x3; inv(m) = adj(m)^T / det,
    so m^{-T} = adj(m) / det."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    return jnp.array(
        [
            [e * i - f * h, f * g - d * i, d * h - e * g],
            [c * h - b * i, a * i - c * g, b * g - a * h],
            [b * f - c * e, c * d - a * f, a * e - b * d],
        ],
        m.dtype,
    )


def _polar_rotation(x: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Orthogonal polar factor of a (nonsingular, det>0) 3x3 via the
    norm-scaled Newton iteration X <- (g X + X^{-T}/g) / 2 with
    g = (||X^-1||_F / ||X||_F)^{1/2} — the scaling keeps convergence fast
    (and bounded) even for ill-conditioned inputs."""
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-30)

    def body(_, x):
        cof = _adjugate3(x)
        det = jnp.sum(x[0] * cof[0])  # det via first-row cofactor expansion
        x_invt = cof / det
        g = jnp.sqrt(
            jnp.maximum(jnp.linalg.norm(x_invt), 1e-30)
            / jnp.maximum(jnp.linalg.norm(x), 1e-30)
        )
        return 0.5 * (g * x + x_invt / g)

    return jax.lax.fori_loop(0, iters, body, x)


def fit_moments(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray):
    """Raw weighted moments of a correspondence set:
    ``(sw, ss f32[3], sd f32[3], m f32[3,3])`` with
    sw = sum w, ss = sum w*src, sd = sum w*dst, m = sum w*src dst^T.

    Moments are additive across shards, so a mesh-sharded fit is just a
    ``psum`` of these followed by ``rigid_fit_from_moments`` — the
    collective-friendly decomposition the multi-chip path uses
    (parallel/icp.py)."""
    w = weights.astype(src.dtype)
    sw = jnp.sum(w)
    ss = jnp.sum(src * w[:, None], axis=0)
    sd = jnp.sum(dst * w[:, None], axis=0)
    # precision=HIGHEST: the N-length contraction feeds the 3x3 rotation
    # solve; TPU bf16 MXU truncation is not acceptable here.
    m = jnp.matmul(
        (src * w[:, None]).T, dst, precision=jax.lax.Precision.HIGHEST
    )
    return sw, ss, sd, m


def rigid_fit_from_moments(sw, ss, sd, m) -> jnp.ndarray:
    """Rigid transform from raw moments (see fit_moments):
    demeaned H = m - ss sd^T / sw; R = argmax tr(R H); t = cd - R cs."""
    swc = jnp.maximum(sw, 1e-12)
    cs = ss / swc
    cd = sd / swc
    h = m - jnp.outer(ss, sd) / swc
    src_dtype = h.dtype

    # Relative nonsingularity test: h is unnormalized (scales with point
    # count), so the det guard must be scale-free. Rank-deficient /
    # near-planar correspondence sets fall through to the SVD path.
    h_norm = jnp.maximum(jnp.linalg.norm(h), 1e-30)
    det_rel = jnp.linalg.det(h / h_norm)
    r_newton = _polar_rotation(h.T)

    # SVD fallback with reflection correction (degenerate/planar sets).
    u, _, vt = jnp.linalg.svd(h)
    v = vt.T
    det = jnp.linalg.det(v @ u.T)
    dvec = jnp.array([1.0, 1.0, 0.0], src_dtype) + jnp.array(
        [0.0, 0.0, 1.0], src_dtype
    ) * det
    r_svd = (v * dvec[None, :]) @ u.T

    r = jnp.where(det_rel > 1e-4, r_newton, r_svd)
    t = cd - r @ cs
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], src_dtype)
    return jnp.concatenate([top, bottom], axis=0)


def rigid_fit(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray,
    psum_axis=None,
) -> jnp.ndarray:
    """Least-squares rigid transform T with ``T @ src ≈ dst``.

    src, dst: ``f32[N,3]`` paired points; weights: ``f32[N]`` (0 masks a
    pair out). Returns ``f32[4,4]``. With fewer than 3 effective pairs the
    problem is degenerate; callers guard on correspondence count (PCL
    requires >= 3, pcl::Registration min_number_correspondences_).

    Semantics follow PCL TransformationEstimationSVD (no scaling): demean
    both sets, H = sum w (src-cs)(dst-cd)^T, R = argmax tr(R H) with
    det(R)=+1, t = centroid_dst - R centroid_src.

    ``psum_axis``: inside ``shard_map`` with the pairs sharded over that
    mesh axis, the additive moments are psum'd (17 scalars) before the
    solve — every device returns the identical global fit.
    """
    moments = fit_moments(src, dst, weights)
    if psum_axis is not None:
        moments = jax.lax.psum(moments, psum_axis)
    return rigid_fit_from_moments(*moments)


def _rodrigues(omega: jnp.ndarray) -> jnp.ndarray:
    """exp([omega]_x): exact rotation from an axis-angle vector."""
    theta = jnp.linalg.norm(omega)
    # sinc-style series keeps theta -> 0 exact in f32
    small = theta < 1e-6
    safe = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta**2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - theta**2 / 24.0, (1.0 - jnp.cos(safe)) / safe**2)
    wx, wy, wz = omega[0], omega[1], omega[2]
    k = jnp.array(
        [[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]], omega.dtype
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + a * k + b * (k @ k)


def plane_fit_moments(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    normal: jnp.ndarray,
    weights: jnp.ndarray,
    offset: jnp.ndarray | None = None,
):
    """Additive moments of the linearized point-to-plane problem:
    rows ``a_i = [src_i x n_i ; n_i]``, residuals ``r_i = n_i . (src_i -
    dst_i) (+ offset_i)``; returns ``(H f32[6,6], g f32[6])`` with
    H = sum w a a^T, g = sum w a r. Additive across shards like
    fit_moments.

    ``offset`` generalizes the row to any scalar residual linear in the
    motion along direction ``normal`` — the colored-ICP term (Park,
    Zhou, Koltun 2017) is exactly this row with the unit normal replaced
    by the target's tangent-plane intensity gradient and
    ``offset = I_dst - I_src`` (see registration/icp.py)."""
    w = weights.astype(src.dtype)
    a = jnp.concatenate([jnp.cross(src, normal), normal], axis=-1)  # [N,6]
    r = jnp.sum((src - dst) * normal, axis=-1)  # [N]
    if offset is not None:
        r = r + offset
    aw = a * w[:, None]
    h = jnp.matmul(aw.T, a, precision=jax.lax.Precision.HIGHEST)
    g = aw.T @ r
    return h, g


def plane_fit_from_moments(h: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve the 6x6 point-to-plane normal equations; returns f32[4,4].

    Rank-deficiency handling: eigenvalues below ``1e-3 * lambda_max`` are
    floored there before inverting. A normal set that never observes a
    direction (e.g. a horizontal sweep that sees no floor/ceiling leaves
    t_y unconstrained) then produces (near-)ZERO motion along it instead
    of a noise-amplified slide — don't move along what you cannot see.
    The well-observed directions keep their exact least-squares step."""
    evals, evecs = jnp.linalg.eigh(h)
    floor = 1e-3 * jnp.maximum(evals[-1], 1e-12)
    evals_f = jnp.maximum(evals, floor)
    x = -(evecs @ ((evecs.T @ g) / evals_f))
    x = jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))
    r = _rodrigues(x[:3])
    t = x[3:]
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], h.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrices."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def point_fit_moments(
    src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray
):
    """Additive 6x6 normal-equation moments of the LINEARIZED
    point-to-point problem (residual vector r = src - dst, Jacobian
    [-[src]_x | I] in (omega, t)). Used to blend a point term into the
    point-to-plane solve when the normal set under-constrains a
    direction (see plane_fit)."""
    w = weights.astype(src.dtype)
    a = jnp.concatenate(
        [-_skew(src), jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), src.shape + (3,))],
        axis=-1,
    )  # [N,3,6]
    r = src - dst
    aw = a * w[:, None, None]
    h = jnp.einsum(
        "nij,nik->jk", aw, a, precision=jax.lax.Precision.HIGHEST
    )
    g = jnp.einsum("nij,ni->j", aw, r)
    return h, g


def plane_fit(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    normal: jnp.ndarray,
    weights: jnp.ndarray,
    point_mix: float = 0.0,
    cgrad: jnp.ndarray | None = None,
    color_resid: jnp.ndarray | None = None,
    color_weights: jnp.ndarray | None = None,
    psum_axis=None,
) -> jnp.ndarray:
    """Least-squares rigid transform minimizing point-to-PLANE error
    ``sum w (n . (T src - dst))^2`` (PCL analog:
    TransformationEstimationPointToPlaneLLS). One linearized Gauss-Newton
    step per call — exact in the ICP outer loop's iteration limit.

    Point-to-plane is the framework's beyond-reference fine-alignment
    option: pixel-grid edge sampling biases point-to-point ICP by up to
    ~z/fx per point *along the surface*, which the plane projection
    removes, and convergence is superlinear instead of ICP's linear
    sliding.

    Conditioning: lever arms are taken about the weighted source
    CENTROID, which decouples the rotation and translation blocks of the
    6x6 system — with scene-absolute coordinates a weakly-constrained
    normal set (e.g. a view dominated by one wall) makes the solve
    explode along its null directions. The solved motion is recomposed
    as a world transform afterwards.

    ``psum_axis``: inside ``shard_map`` with the pairs sharded over that
    mesh axis, the centroid (4 scalars) and the accumulated 6x6 moments
    (42 scalars) are psum'd — every device returns the identical global
    fit, matching the unsharded solve up to f32 reduction order."""
    w = weights.astype(src.dtype)
    sw = jnp.sum(w)
    sc = jnp.sum(src * w[:, None], axis=0)
    if psum_axis is not None:
        sw, sc = jax.lax.psum((sw, sc), psum_axis)
    c = sc / jnp.maximum(sw, 1e-12)
    h, g = plane_fit_moments(src - c, dst - c, normal, weights)
    if cgrad is not None:
        # Colored-ICP rows (Park, Zhou, Koltun ICCV 2017): the same
        # linearized row structure with direction = the target's
        # tangent-plane intensity gradient and residual offset
        # ``color_resid = I_dst - I_src`` (computed at the gather site —
        # intensities are pose-invariant). Centered about the same c so
        # the rotation/translation blocks stay decoupled; the offset is
        # translation-invariant (g . ((s-c)-(d-c)) == g . (s-d)).
        hc, gc = plane_fit_moments(
            src - c, dst - c, cgrad,
            w if color_weights is None else color_weights,
            offset=color_resid,
        )
        h = h + hc
        g = g + gc
    # ``point_mix`` may be a traced scalar (scan-ified stage schedules
    # pass per-iteration mixes); the point term is then always included
    # and a mix of 0.0 adds exactly zero moments. A static float 0.0
    # still skips the term entirely.
    include_point = not isinstance(point_mix, (int, float)) or point_mix > 0.0
    if include_point:
        # Blend in a point-to-point term: scenes whose visible normals
        # span fewer than 3 directions (e.g. a horizontal sweep that
        # never sees floor or ceiling) leave point-to-plane singular
        # along the missing axis; the point term constrains it, and at
        # small mix its in-plane sampling bias stays damped wherever the
        # plane term already dominates.
        hp, gp = point_fit_moments(src - c, dst - c, weights)
        h = h + point_mix * hp
        g = g + point_mix * gp
    if psum_axis is not None:
        h, g = jax.lax.psum((h, g), psum_axis)
    t_c = plane_fit_from_moments(h, g)
    # x_new = R (x - c) + c + t'  =>  T = Trans(c) @ T' @ Trans(-c)
    r = t_c[:3, :3]
    t = t_c[:3, 3] + c - r @ c
    top = jnp.concatenate([r, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], src.dtype)
    return jnp.concatenate([top, bottom], axis=0)
