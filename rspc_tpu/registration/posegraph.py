"""SE(3) pose-graph relaxation (beyond-reference; no PCL/rs-pcl analog).

The reference composes pairwise alignments into absolute poses and stops
(src/icp_edge_based_registration.hpp:113-120) — per-pair noise therefore
accumulates linearly along the chain, which is exactly the measured
failure shape of the noisy partial-overlap robustness scenario
(RESULTS.md: relative errors 6e-3..5e-2 compounding to ~1e-1). A pose
graph treats every pairwise measurement — consecutive chain results AND
redundant skip-pair alignments — as a soft constraint and solves for
the maximum-likelihood trajectory, averaging out the noise instead of
integrating it.

TPU-native design: the whole solve is one jittable Gauss-Newton loop on
a fixed-size batch of constraints. Residuals are right-tangent SE(3)
log-errors r_k = log(M_k^{-1} T_i^{-1} T_j); Jacobians come from
``jax.jacfwd`` over the stacked 6n pose parameters (n <= a few dozen
frames — the dense 6n x 6n normal system is microscopic on an MXU);
the gauge is fixed by pinning pose 0 at the identity. Weighted
constraints (e.g. by inlier count) scale their residual rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

def _rot_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix, differentiable AT zero.

    Gauss-Newton linearizes exactly at omega = 0, where the usual
    normalize-then-Rodrigues form produces NaN gradients (d sqrt at 0;
    ``jnp.where`` does not stop autodiff evaluating the dead branch).
    Written in terms of a^2 with Taylor branches, both branches stay
    finite under differentiation."""
    a2 = jnp.sum(omega * omega)
    small = a2 < 1e-8
    a2s = jnp.where(small, 1.0, a2)
    a = jnp.sqrt(a2s)
    # sin(a)/a and (1 - cos a)/a^2 with their a->0 Taylor limits
    s = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(a) / a)
    c = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(a)) / a2s)
    kx, ky, kz = omega[0], omega[1], omega[2]
    k = jnp.array(
        [[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]], omega.dtype
    )
    eye = jnp.eye(3, dtype=omega.dtype)
    return eye + s * k + c * (k @ k)


def _log_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation-matrix -> axis-angle vector, differentiable AT identity
    (same dead-branch discipline as :func:`_rot_exp`: arccos has an
    infinite derivative at cos = 1, so the near-identity branch uses the
    Taylor form of ang / (2 sin ang) in (1 - cos))."""
    cos = jnp.clip(0.5 * (r[0, 0] + r[1, 1] + r[2, 2] - 1.0), -1.0, 1.0)
    near = cos > 1.0 - 1e-6
    cs = jnp.where(near, 0.0, cos)  # safe value for the exact branch
    exact = jnp.arccos(cs) / (2.0 * jnp.sqrt(jnp.maximum(1.0 - cs * cs, 1e-12)))
    taylor = 0.5 + (1.0 - cos) / 6.0
    s = jnp.where(near, taylor, exact)
    skew = jnp.stack(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]
    )
    return s * skew


def se3_exp(x: jnp.ndarray) -> jnp.ndarray:
    """[6] tangent (omega, v) -> 4x4 rigid transform. First-order-exact
    coupling (translation applied directly, not through the V matrix) —
    consistent with :func:`se3_log` below, which is all Gauss-Newton
    needs (the pair is a bijection near identity with the same
    linearization)."""
    t = jnp.eye(4, dtype=x.dtype)
    t = t.at[:3, :3].set(_rot_exp(x[:3]))
    return t.at[:3, 3].set(x[3:])


def se3_log(t: jnp.ndarray) -> jnp.ndarray:
    """4x4 rigid transform -> [6] tangent (omega, v); inverse of
    :func:`se3_exp`."""
    return jnp.concatenate([_log_so3(t[:3, :3]), t[:3, 3]])


def _inv(t):
    r = t[:3, :3]
    out = jnp.eye(4, dtype=t.dtype)
    out = out.at[:3, :3].set(r.T)
    return out.at[:3, 3].set(-r.T @ t[:3, 3])


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(
    totals: jnp.ndarray,     # f32[n-1, 4, 4] absolute poses frame i+1 -> frame 0
    edges_i: jnp.ndarray,    # i32[m] constraint source frame index (into 0..n-1)
    edges_j: jnp.ndarray,    # i32[m] constraint target frame index (j > i)
    measures: jnp.ndarray,   # f32[m, 4, 4] measured T mapping frame-j coords -> frame-i coords
    weights: jnp.ndarray,    # f32[m] per-constraint weight (0 disables)
    iters: int = 10,
    damping: float = 1e-6,
    huber_delta: float = 0.01,
):
    """Return refined ``totals`` minimizing the robustly-weighted
    residual sum over ||w_k * log(M_k^{-1} T_i^{-1} T_j)|| with T_0 = I
    fixed.

    Poses are parameterized as right-multiplied corrections
    T_i <- T_i exp(dx_i); each Gauss-Newton step solves the dense
    (damped) normal equations over the 6(n-1) free parameters. Each
    step also re-derives Huber IRLS factors min(1, delta/||r_k||) per
    constraint BLOCK — a pairwise measurement whose p2l alignment
    converged to the wrong local optimum produces a large coherent
    6-vector residual and gets discounted by the consensus of the
    redundant constraints, instead of dragging its neighbors off.
    """
    n_free = totals.shape[0]
    dtype = totals.dtype
    eye = jnp.eye(4, dtype=dtype)

    def pose_of(k, x):
        """Absolute pose of frame k (0 = anchored identity)."""
        base = jnp.where(k > 0, 1, 0)
        t = jnp.take(totals, jnp.maximum(k - 1, 0), axis=0)
        t = jnp.where(base, t, eye)
        dx = jnp.take(x.reshape(n_free, 6), jnp.maximum(k - 1, 0), axis=0)
        dx = jnp.where(base, dx, jnp.zeros((6,), dtype))
        return t @ se3_exp(dx)

    sqw = jnp.sqrt(jnp.maximum(weights, 0.0))

    def raw_residuals(x):
        def one(i, j, m):
            ti = pose_of(i, x)
            tj = pose_of(j, x)
            return se3_log(_inv(m) @ _inv(ti) @ tj)

        return jax.vmap(one)(edges_i, edges_j, measures)  # [m, 6]

    def gn_step(x, _):
        # IRLS: robust block weights frozen at the current estimate
        rn = jnp.linalg.norm(raw_residuals(x), axis=1)
        hub = jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-12))
        row_w = sqw * jnp.sqrt(hub)

        def residuals(xx):
            return (raw_residuals(xx) * row_w[:, None]).reshape(-1)

        r = residuals(x)
        jac = jax.jacfwd(residuals)(x)          # [6m, 6n_free]
        h = jac.T @ jac
        g = jac.T @ r
        h = h + (damping * jnp.trace(h) / h.shape[0] + 1e-12) * jnp.eye(
            h.shape[0], dtype=dtype
        )
        dx = jnp.linalg.solve(h, -g)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return x + dx, jnp.sum(r * r)

    x0 = jnp.zeros((n_free * 6,), dtype)
    x_fin, costs = jax.lax.scan(gn_step, x0, None, length=iters)
    refined = jax.vmap(
        lambda t, dx: t @ se3_exp(dx)
    )(totals, x_fin.reshape(n_free, 6))
    return refined, costs
