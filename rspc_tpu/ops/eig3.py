"""Batched symmetric 3x3 eigendecomposition via cyclic Jacobi sweeps.

``jnp.linalg.eigh`` on TPU lowers to a custom call plus an eigenvalue
sort; inside a large compiled program (the NDT grid finalize runs it on
[D^3, 3, 3] covariances every frame) those cost ~10 ms per call.

The Jacobi sweeps here are SCALARIZED: the symmetric matrix is held as
its 6 independent components and the eigenvector basis as 9 component
vectors, and each Givens rotation is the closed-form update of those
components — pure elementwise arithmetic, no [.., 3, 3] matmuls (which
XLA would route through the MXU with layout copies and precision
conversions; the matmul formulation cost >100 fused [D^3,3,3] ops per
compiled NDT finalize).

Returns (eigenvalues ascending, eigenvectors as columns), matching the
``jnp.linalg.eigh`` convention. Exact to f32 precision in 5 sweeps.
"""

from __future__ import annotations

import jax.numpy as jnp

_PAIRS = ((0, 1), (0, 2), (1, 2))


def _givens(app, aqq, apq):
    """Jacobi rotation (c, s) zeroing the (p, q) entry."""
    small = jnp.abs(apq) < 1e-30
    tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau==0 -> 45 deg
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    return jnp.where(small, 1.0, c), jnp.where(small, 0.0, s)


def eigh3(a: jnp.ndarray, sweeps: int = 5):
    """Eigendecomposition of symmetric ``a`` [..., 3, 3].

    Returns (w [..., 3] ascending, v [..., 3, 3] with v[..., :, i] the
    eigenvector for w[..., i])."""
    # unpack the 6 independent components and the 9 basis components
    d = [a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]]  # diagonal
    o = {  # off-diagonal, keyed by sorted index pair
        (0, 1): a[..., 0, 1],
        (0, 2): a[..., 0, 2],
        (1, 2): a[..., 1, 2],
    }
    one = jnp.ones_like(d[0])
    zero = jnp.zeros_like(d[0])
    v = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]

    def off(i, j):
        return o[(i, j) if i < j else (j, i)]

    def set_off(i, j, val):
        o[(i, j) if i < j else (j, i)] = val

    for _ in range(sweeps):
        for p, q in _PAIRS:
            r = 3 - p - q  # the remaining index
            apq = off(p, q)
            c, s = _givens(d[p], d[q], apq)
            cc, ss, cs = c * c, s * s, c * s
            app, aqq = d[p], d[q]
            d[p] = cc * app - 2.0 * cs * apq + ss * aqq
            d[q] = ss * app + 2.0 * cs * apq + cc * aqq
            set_off(p, q, zero)
            arp, arq = off(r, p), off(r, q)
            set_off(r, p, c * arp - s * arq)
            set_off(r, q, s * arp + c * arq)
            for i in range(3):
                vip, viq = v[i][p], v[i][q]
                v[i][p] = c * vip - s * viq
                v[i][q] = s * vip + c * viq

    w = jnp.stack(d, axis=-1)
    vm = jnp.stack(
        [jnp.stack(row, axis=-1) for row in v], axis=-2
    )  # [..., 3(row i), 3(col j)]

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

    w, vm = swap(w, vm, 0, 1)
    w, vm = swap(w, vm, 1, 2)
    w, vm = swap(w, vm, 0, 1)
    return w, vm
