"""Batched symmetric 3x3 eigendecomposition via cyclic Jacobi sweeps.

``jnp.linalg.eigh`` on TPU lowers to a custom call plus an eigenvalue
sort; inside a large compiled program (the NDT grid finalize runs it on
[D^3, 3, 3] covariances every frame) those cost ~10 ms per call. Five
cyclic Jacobi sweeps are pure elementwise arithmetic + tiny batched
matmuls — branch-free, fusible, and exact to f32 precision for 3x3.

Returns (eigenvalues ascending, eigenvectors as columns), matching the
``jnp.linalg.eigh`` convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAIRS = ((0, 1), (0, 2), (1, 2))


def _rot(a, v, p: int, q: int):
    """One batched Jacobi rotation zeroing A[p, q]."""
    apq = a[..., p, q]
    app = a[..., p, p]
    aqq = a[..., q, q]
    small = jnp.abs(apq) < 1e-30
    tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau==0 -> 45 deg
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    c = jnp.where(small, 1.0, c)
    s = jnp.where(small, 0.0, s)

    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rows = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
    rows[p][p], rows[q][q] = c, c
    rows[p][q] = s
    rows[q][p] = -s
    j = jnp.stack(
        [jnp.stack(r, axis=-1) for r in rows], axis=-2
    )  # [..., 3, 3]
    # explicit fast-path precision: the decomposition feeds eigenvalue
    # INFLATION (a 1% floor) — sub-percent rotation noise is immaterial,
    # and the package default of f32 matmuls would slow the 15 batched
    # rotation products per grid finalize ~3x
    fast = jax.lax.Precision.DEFAULT
    a2 = jnp.einsum("...ji,...jk,...kl->...il", j, a, j, precision=fast)
    # re-symmetrize (rounding drift accumulates over sweeps)
    a2 = 0.5 * (a2 + jnp.swapaxes(a2, -1, -2))
    return a2, jnp.einsum("...ij,...jk->...ik", v, j, precision=fast)


def eigh3(a: jnp.ndarray, sweeps: int = 5):
    """Eigendecomposition of symmetric ``a`` [..., 3, 3].

    Returns (w [..., 3] ascending, v [..., 3, 3] with v[..., :, i] the
    eigenvector for w[..., i])."""
    v = jnp.broadcast_to(jnp.eye(3, dtype=a.dtype), a.shape)
    for _ in range(sweeps):
        for p, q in _PAIRS:
            a, v = _rot(a, v, p, q)
    w = jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1)

    # ascending 3-sort (compare-swap network), carrying eigenvector columns
    def swap(w, v, i, j):
        wi, wj = w[..., i], w[..., j]
        do = wi > wj
        new_wi = jnp.where(do, wj, wi)
        new_wj = jnp.where(do, wi, wj)
        cols = [w[..., k] for k in range(3)]
        cols[i], cols[j] = new_wi, new_wj
        vi, vj = v[..., :, i], v[..., :, j]
        new_vi = jnp.where(do[..., None], vj, vi)
        new_vj = jnp.where(do[..., None], vi, vj)
        vcols = [v[..., :, k] for k in range(3)]
        vcols[i], vcols[j] = new_vi, new_vj
        return jnp.stack(cols, axis=-1), jnp.stack(vcols, axis=-1)

    w, v = swap(w, v, 0, 1)
    w, v = swap(w, v, 1, 2)
    w, v = swap(w, v, 0, 1)
    return w, v
