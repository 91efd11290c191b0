"""Normal Distributions Transform registration (Magnusson 2009).

TPU-native replacement for ``pcl::NormalDistributionsTransform`` as
configured by the reference (SURVEY.md X2;
src/ndt_edge_based_registration.hpp:38-43): target voxelization at
``resolution`` into per-voxel Gaussians, Newton optimization of the NDT
score with a More-Thuente line search capped at ``step_size``, pose
parameterized as ``p = (tx, ty, tz, roll, pitch, yaw)`` with
``T = Trans(t) @ Rx(roll) @ Ry(pitch) @ Rz(yaw)`` (PCL convertTransform).

TPU-first design choices:
  * The voxel Gaussian grid is DENSE and INCREMENTAL (see NDTGrid): one
    scatter-add of corner-residual moments per added frame, no sorting,
    with PCL's eigenvalue inflation (eigvals < 0.01 * lambda_max raised)
    via the batched Jacobi 3x3 eigh in ops/eig3.py.
  * PCL's kd-tree radiusSearch over voxel means (radius = resolution)
    becomes a neighborhood lookup over the dense grid (cell index IS the
    slot): 27 adjacent cells reproduce radiusSearch exactly;
    ``NDTConfig.neighborhood`` also offers ndt_omp's DIRECT7/DIRECT1.
  * Score gradient and Hessian are ANALYTIC and single-pass
    (fixed_value_grad_hess): closed-form per-point derivatives in x'
    chained through precomputed rotation-derivative tensors (Magnusson
    2009 eq. 6.12-6.13 structure; verified against autodiff). The
    rotation tensors themselves come from autodiff over the 3 angles —
    constant-size, negligible.
  * Newton solve + More-Thuente line search run inside a
    ``lax.while_loop``; the line search reproduces PCL's
    sufficient-decrease (mu=1e-4) / curvature (nu=0.9) logic with
    interval updating, bounded by ``step_size`` and the trial cap.

Gauss mixture coefficients follow PCL exactly:
  c1 = 10 (1 - outlier_ratio), c2 = outlier_ratio / res^3,
  d3 = -log(c2), d1 = -log(c1 + c2) - d3,
  d2 = -2 log((-log(c1 e^{-1/2} + c2) - d3) / d1).
Per point-voxel pair: score += -d1 exp(-d2/2 x^T S^-1 x), maximized; we
minimize the negation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import NDTConfig
from rspc_tpu.ops.eig3 import eigh3
from rspc_tpu.ops.transform import apply_transform, rotation_matrix

def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class NDTGrid:
    """Target voxel-Gaussian grid (pcl::VoxelGridCovariance equivalent).

    DENSE and INCREMENTAL: cells live in a [D^3] grid anchored at
    ``origin`` (cell index IS the slot — the hot score path resolves a
    point's voxel with one gather, no search), and the grid carries its
    raw moment accumulators so frames can be ADDED without re-sorting the
    accumulated target (``ndt_grid_add``): voxel moments are additive,
    and the re-sort-per-pair of the naive build was the single hottest
    op of the whole registration chain on TPU.

    ``moments`` layout per cell: [count, sum_r(3), sum_rr^T(9)] where r
    is the point residual against its cell corner — corner-relative
    moments keep f32 exact at mm scales and shift back losslessly
    (mean = corner + sum_r/n; covariance is shift-invariant)."""

    moments: jax.Array   # f32[D^3, 13] additive accumulators
    means: jax.Array     # f32[D^3, 3]
    inv_covs: jax.Array  # f32[D^3, 3, 3]
    valid: jax.Array     # bool[D^3] (count >= min_points_per_voxel)
    origin: jax.Array    # i32[3] cell coords of cell (0,0,0)


@_register
@dataclasses.dataclass(frozen=True)
class NDTResult:
    transform: jax.Array   # f32[4,4] final transformation (incl. guess)
    converged: jax.Array   # bool (PCL: true on iterations or epsilon)
    iterations: jax.Array  # i32
    score: jax.Array       # f32 summed NDT score (higher is better)
    trans_probability: jax.Array  # f32 score / n_points (PCL accessor)


def ndt_grid_origin(cloud: Cloud, config: NDTConfig) -> jax.Array:
    """Grid anchor: the occupied bounding box's min cell, centered so the
    [D^3] span has symmetric headroom for frames added later."""
    res = config.resolution
    d = config.dense_grid_dim
    coords = jnp.floor(cloud.xyz / res).astype(jnp.int32)
    big = jnp.int32(2**20)
    cmin = jnp.min(jnp.where(cloud.valid[:, None], coords, big), axis=0)
    cmax = jnp.max(jnp.where(cloud.valid[:, None], coords, -big), axis=0)
    empty = cmin == big
    cmin = jnp.where(empty, 0, cmin)
    cmax = jnp.where(empty, 0, cmax)
    margin = jnp.maximum((d - (cmax - cmin + 1)) // 2, 0)
    return cmin - margin


@partial(jax.jit, static_argnames=("config",))
def ndt_grid_init(origin: jax.Array, config: NDTConfig = NDTConfig()) -> NDTGrid:
    """Empty dense grid anchored at ``origin`` (i32[3] cell coords)."""
    c = config.dense_grid_dim ** 3
    return NDTGrid(
        moments=jnp.zeros((c, 13), jnp.float32),
        means=jnp.zeros((c, 3), jnp.float32),
        inv_covs=jnp.zeros((c, 3, 3), jnp.float32),
        valid=jnp.zeros((c,), jnp.bool_),
        origin=origin.astype(jnp.int32),
    )


def _finalize(moments: jax.Array, origin: jax.Array, config: NDTConfig):
    """Derive (means, inv_covs, valid) from raw cell moments.

    PCL semantics: sample covariance (n-1 normalization), cells with
    fewer than ``min_points_per_voxel`` (6) discarded, eigenvalue
    inflation at 0.01 * lambda_max (VoxelGridCovariance defaults)."""
    d = config.dense_grid_dim
    res = config.resolution
    counts = moments[:, 0]
    cnt = jnp.maximum(counts, 1.0)
    mu_r = moments[:, 1:4] / cnt[:, None]
    sq = moments[:, 4:13].reshape(-1, 3, 3)
    cov = (sq - cnt[:, None, None] * mu_r[:, :, None] * mu_r[:, None, :]) / (
        jnp.maximum(counts - 1.0, 1.0)[:, None, None]
    )
    ok = counts >= config.min_points_per_voxel

    cells = jnp.arange(d**3, dtype=jnp.int32)
    cell_coords = jnp.stack(
        [cells // (d * d), (cells // d) % d, cells % d], axis=-1
    )
    corner = (cell_coords + origin[None, :]).astype(jnp.float32) * res
    means = corner + mu_r

    # Eigenvalue inflation + inverse. Batched Jacobi 3x3 eigh (ops/eig3):
    # jnp.linalg.eigh's custom-call + eigenvalue sort cost ~15 ms per
    # finalize inside the fused registration program.
    cov_safe = jnp.where(ok[:, None, None], cov, jnp.eye(3, dtype=cov.dtype))
    evals, evecs = eigh3(cov_safe)
    lam_max = evals[:, 2]
    floor = 0.01 * lam_max
    evals_inf = jnp.maximum(evals, floor[:, None])
    evals_inf = jnp.maximum(evals_inf, 1e-12)
    inv_cov = jnp.einsum(
        "vij,vj,vkj->vik", evecs, 1.0 / evals_inf, evecs,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (
        jnp.where(ok[:, None], means, 0.0),
        jnp.where(ok[:, None, None], inv_cov, 0.0),
        ok,
    )


def ndt_grid_update_moments(
    moments: jax.Array,
    origin: jax.Array,
    cloud: Cloud,
    config: NDTConfig = NDTConfig(),
    gate=None,
) -> jax.Array:
    """Accumulate a cloud's points into raw cell moments (additive: ONE
    scatter-add of per-point [count, r, r r^T] rows, no sort). Points
    outside the [D^3] span are dropped. ``gate`` (traced bool) folds a
    merge/no-merge decision into the scatter (zeros added when False),
    so scan carries stay in place."""
    res = config.resolution
    d = config.dense_grid_dim
    xyz, valid = cloud.xyz, cloud.valid
    if gate is not None:
        valid = valid & gate
    coords = jnp.floor(xyz / res).astype(jnp.int32)
    rel = coords - origin[None, :]
    in_b = valid & jnp.all((rel >= 0) & (rel < d), axis=-1)
    flat = jnp.where(in_b, (rel[:, 0] * d + rel[:, 1]) * d + rel[:, 2], d**3)
    r = xyz - coords.astype(xyz.dtype) * res  # corner residual in [0, res)
    rr = (r[:, :, None] * r[:, None, :]).reshape(-1, 9)
    upd = jnp.concatenate([jnp.ones_like(r[:, :1]), r, rr], axis=-1)
    upd = jnp.where(in_b[:, None], upd, 0.0)
    return moments.at[flat].add(upd, mode="drop")


def ndt_grid_from_moments(
    moments: jax.Array, origin: jax.Array, config: NDTConfig = NDTConfig()
) -> NDTGrid:
    """Finalize raw cell moments into a queryable NDTGrid."""
    means, inv_covs, ok = _finalize(moments, origin, config)
    return NDTGrid(
        moments=moments, means=means, inv_covs=inv_covs, valid=ok,
        origin=origin,
    )


@partial(jax.jit, static_argnames=("config",))
def ndt_grid_add(
    grid: NDTGrid, cloud: Cloud, config: NDTConfig = NDTConfig()
) -> NDTGrid:
    """Accumulate a cloud's points into the grid and re-finalize."""
    moments = ndt_grid_update_moments(
        grid.moments, grid.origin, cloud, config
    )
    return ndt_grid_from_moments(moments, grid.origin, config)


@partial(jax.jit, static_argnames=("config",))
def build_ndt_grid(target: Cloud, config: NDTConfig = NDTConfig()) -> NDTGrid:
    """Voxelize a target into per-voxel Gaussians (one-shot build:
    origin from the cloud's own bounding box, then one accumulate)."""
    origin = ndt_grid_origin(target, config)
    return ndt_grid_add(ndt_grid_init(origin, config), target, config)


def _gauss_coeffs(config: NDTConfig):
    import math

    c1 = 10.0 * (1.0 - config.outlier_ratio)
    c2 = config.outlier_ratio / (config.resolution**3)
    d3 = -math.log(c2)
    d1 = -math.log(c1 + c2) - d3
    d2 = -2.0 * math.log(
        (-math.log(c1 * math.exp(-0.5) + c2) - d3) / d1
    )
    return d1, d2


def _pose_to_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """T = Trans(p[:3]) @ Rx(p3) @ Ry(p4) @ Rz(p5) (PCL convertTransform)."""
    r = (
        rotation_matrix(p[3], 0)
        @ rotation_matrix(p[4], 1)
        @ rotation_matrix(p[5], 2)
    )
    top = jnp.concatenate([r, p[:3][:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], p.dtype)], axis=0
    )


def _matrix_to_pose(t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _pose_to_matrix: euler extraction for R = Rx(a)Ry(b)Rz(c)
    (Eigen eulerAngles(0,1,2) convention, principal branch)."""
    r = t[:3, :3]
    b = jnp.arcsin(jnp.clip(r[0, 2], -1.0, 1.0))
    c = jnp.arctan2(-r[0, 1], r[0, 0])
    a = jnp.arctan2(-r[1, 2], r[2, 2])
    return jnp.concatenate([t[:3, 3], jnp.stack([a, b, c])])


def _resolve_sweep_cells(config: NDTConfig) -> int:
    """-1 = auto: the dense sweep is ~1.9x for the PCL-default 27-cell
    neighborhood (the gather fetches 27x10 floats/point) and measured
    chain-neutral for DIRECT7/DIRECT1 (RESULTS.md r3). Auto is OPT-IN
    (the config default is 0 = exact gather path): the sweep caps the
    compacted cell count and a scene occupying more valid cells than
    the cap silently loses the dropped cells' evidence."""
    if config.sweep_cells >= 0:
        return config.sweep_cells
    return 512 if config.neighborhood == 27 else 0


def _compact_cells(grid: NDTGrid, config: NDTConfig):
    """Compact the grid's VALID cells (typically a few hundred of D^3)
    into [C]-row tables for the dense sweep (NDTConfig.sweep_cells).

    Mask-equivalence argument (dense sweep vs the widened-table gather):
    the sweep scores point n against compact cell c when
    ``adjacency(rel0_n, cellco_c) & within_radius & cell_valid`` — the
    gather path scores (n, offset j) when ``in_bounds(rel0_n + off_j) &
    cell_valid & within_radius``. For every in-bounds neighbor the two
    enumerate the same (point, cell) pairs: adjacency(rel0, co) holds
    iff co = rel0 + off_j for some offset j of the neighborhood, and a
    compact cell IS an in-bounds cell. Out-of-bounds offsets gather
    zeroed stats and are masked in both paths. So the two paths are the
    same masked sum, differing only in fp reduction order. Valid cells
    beyond the C cap are DROPPED (documented in NDTConfig; size the cap
    to the scene)."""
    d = config.dense_grid_dim
    c_cap = _resolve_sweep_cells(config)
    # valid cells first (stable, so cell-index order within each class)
    order = jnp.argsort(
        jnp.where(grid.valid, 0, 1).astype(jnp.int32), stable=True
    )
    sel = order[:c_cap]
    mu_c = jnp.take(grid.means, sel, axis=0)      # [C,3]
    icg = jnp.take(grid.inv_covs, sel, axis=0)    # [C,3,3]
    ic6_c = jnp.stack(
        [
            icg[:, 0, 0], icg[:, 0, 1], icg[:, 0, 2],
            icg[:, 1, 1], icg[:, 1, 2], icg[:, 2, 2],
        ],
        axis=-1,
    )  # [C,6]
    valid_c = jnp.take(grid.valid, sel, axis=0)   # [C]
    cellco = jnp.stack(
        [sel // (d * d), (sel // d) % d, sel % d], axis=-1
    ).astype(jnp.int32)  # [C,3] grid-relative cell coords
    return mu_c, ic6_c, valid_c, cellco


def _make_objective(src: Cloud, grid: NDTGrid, config: NDTConfig, psum_axis=None):
    """Returns f(p) = -score(p): minimized by Newton. One [N,k] gather +
    quadratic-form + exp sweep, fully fused — or, with
    ``config.sweep_cells > 0``, a gather-free dense [N x C] sweep over
    the compacted valid cells (same math, same frozen-neighborhood
    semantics; see _compact_cells)."""
    d1, d2 = _gauss_coeffs(config)
    res = config.resolution
    xyz, valid = src.xyz, src.valid
    w_src = valid.astype(xyz.dtype)

    if config.neighborhood == 27:
        offs_np = np.stack(
            np.meshgrid(
                np.arange(-1, 2), np.arange(-1, 2), np.arange(-1, 2),
                indexing="ij",
            ),
            axis=-1,
        ).reshape(27, 3).astype(np.int32)
    elif config.neighborhood == 7:
        offs_np = np.asarray(
            [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
             [0, 0, 1], [0, 0, -1]],
            np.int32,
        )
    elif config.neighborhood == 1:
        offs_np = np.zeros((1, 3), np.int32)
    else:
        raise ValueError("neighborhood must be 27, 7, or 1")
    offs = jnp.asarray(offs_np)
    k = offs.shape[0]

    d = config.dense_grid_dim

    if _resolve_sweep_cells(config) > 0:
        # ---- dense compact-cell sweep: ZERO gathers in the Newton loop.
        # The roofline named the per-iteration neighborhood row gather as
        # the Newton stage's floor (~1.1 ms latency-bound at n=4096
        # rows) while the whole evaluation is ~3 MFLOP. With the valid
        # cells compacted to C rows ONCE per align (pose-independent;
        # XLA hoists it out of the while_loop), score/derivatives become
        # a dense [N x C] broadcast-mask-reduce — pure VPU streaming the
        # MXU-fed gram matmul consumes, the same shape discipline as the
        # Pallas NN sweep. Masking below reproduces the gather path's
        # (point, cell) pairs exactly (proof: _compact_cells docstring).
        mu_cells, ic6_cells, valid_cells, cellco = _compact_cells(
            grid, config
        )
        vcell = valid_cells[None, :]  # [1,C]

        def lookup(p):
            """Dense 'lookup': no memory indirection at all — returns
            the (loop-invariant) compact tables plus the [N,C] mask at
            pose p. Frozen-neighborhood semantics are unchanged: the
            Newton body calls this once per iteration and the line
            search differentiates against the frozen mask."""
            t = _pose_to_matrix(p)
            pts = apply_transform(t, xyz)
            rel0 = jnp.floor(pts / res).astype(jnp.int32) - grid.origin
            diff = jnp.abs(cellco[None, :, :] - rel0[:, None, :])  # [N,C,3]
            if config.neighborhood == 27:
                adj = jnp.all(diff <= 1, axis=-1)
            elif config.neighborhood == 7:
                adj = jnp.sum(diff, axis=-1) <= 1
            else:
                adj = jnp.all(diff == 0, axis=-1)
            x = pts[:, None, :] - mu_cells[None, :, :]  # [N,C,3]
            within = jnp.sum(x * x, axis=-1) <= res * res
            mask = (adj & within & vcell).astype(xyz.dtype) * w_src[:, None]
            return mu_cells, ic6_cells, mask

    else:
        lookup = None  # widened-table gather path, built below

    if lookup is None:
        # Per-cell stats packed into ONE [G,10] row — mean(3), the 6 unique
        # symmetric inverse-covariance components, validity(1) — so the
        # neighborhood query below is a single gather instead of three
        # (means + inv_covs + valid). The pack is loop-invariant and XLA
        # hoists it out of the Newton while_loop; the gather was measured as
        # the most expensive part of one Newton iteration (tools/roofline.py).
        icg = grid.inv_covs
        packed = jnp.concatenate(
            [
                grid.means,
                icg[:, 0, 0:3],   # i00 i01 i02
                icg[:, 1, 1:3],   # i11 i12
                icg[:, 2, 2:3],   # i22
                grid.valid.astype(xyz.dtype)[:, None],
            ],
            axis=1,
        )

        # Widened neighbor table: column block j holds packed[g + flat(off_j)]
        # via a roll. flat((x,y,z)) = (x*d + y)*d + z is LINEAR in the cell
        # coords, so flat(center + off) = flat(center) + flat(off) as plain
        # integers, and the per-(point, offset) gather collapses to ONE row
        # gather per point — TPU row gathers are latency-bound per ROW, so k
        # fewer rows is ~k-fold cheaper (measured 1.12 ms for the [N*k]-row
        # form at N=4096, k=7). The roll's mod-G wraparound at grid faces
        # aliases rows exactly where a per-dimension bound is crossed, and
        # ``in_b`` below masks exactly those. Pose-independent: XLA hoists
        # the build out of the Newton while_loop.
        g_cells = d * d * d
        flat_offs = [int((o[0] * d + o[1]) * d + o[2]) for o in offs_np]
        wide = jnp.concatenate(
            [jnp.roll(packed, -f, axis=0) for f in flat_offs], axis=1
        )  # [G, k*10]

        def lookup(p):
            """Neighborhood query at pose p: per (point, offset) the voxel
            Gaussian params (mu [N,k,3], unique inv-cov components ic6
            [N,k,6]) and a hit mask. TPU gathers are the expensive part
            of the NDT evaluation, so the Newton loop calls this ONCE per
            iteration (one widened-table row per point) and differentiates
            the gather-free objective below with the neighborhood frozen —
            the same granularity at which PCL fixes its radiusSearch results
            per computeDerivatives call."""
            t = _pose_to_matrix(p)
            pts = apply_transform(t, xyz)
            coords = jnp.floor(pts / res).astype(jnp.int32)  # [N,3]
            rel0 = coords - grid.origin  # [N,3] center cell
            rel = rel0[:, None, :] + offs[None, :, :]  # [N,k,3]
            in_b = jnp.all((rel >= 0) & (rel < d), axis=-1)
            base = (rel0[:, 0] * d + rel0[:, 1]) * d + rel0[:, 2]
            # mod matches the roll's wraparound: (base % G + flat_off) % G is
            # the rolled row for flat(center)+flat(off), which equals the
            # true neighbor index whenever in_b holds. Non-hit entries gather
            # a real cell's (finite, zeroed-if-invalid) stats and are zeroed
            # by ``mask`` — no NaN can enter the masked exp.
            base = jnp.mod(base, g_cells)
            row = jnp.take(wide, base, axis=0).reshape(-1, k, 10)  # [N,k,10]
            mu = row[..., 0:3]
            ic6 = row[..., 3:9]
            hit = in_b & (row[..., 9] > 0.5)
            x = pts[:, None, :] - mu  # [N,k,3]
            within = jnp.sum(x * x, axis=-1) <= res * res  # radiusSearch(res)
            mask = (hit & within).astype(xyz.dtype) * w_src[:, None]
            return mu, ic6, mask

    def _rot_of(ang):
        return (
            rotation_matrix(ang[0], 0)
            @ rotation_matrix(ang[1], 1)
            @ rotation_matrix(ang[2], 2)
        )

    # ---- gram-matmul derivative core -------------------------------------
    # Two rewrites, each measured (tools/roofline.py):
    #  * the obvious einsum formulation ("nkij,nkj->nki" matvecs,
    #    "nk,nki,nkj->nij" outers) lowered to tiny batched matmuls whose
    #    layout churn left one Newton evaluation at ~1 ms;
    #  * the unrolled elementwise version fixed the layouts but still
    #    issued ~60 separate [N,k]->scalar reductions, leaving the
    #    evaluation latency-bound (0.82 ms for 28k point-neighbor pairs,
    #    ~0.1% of VPU peak — each reduction is microseconds of work).
    # Every moment the gradient/Hessian needs has the form
    #   sum_{n,k} channel_c(n,k) * basis_b(n),
    # channels = [expt, w*Be (3), w*(d2 BeBe^T - B) (6 unique)] and
    # basis = [1, x (3), xx^T (6 unique)]. The basis depends on n ONLY,
    # so each channel reduces over the neighbor/cell axis FIRST (an
    # elementwise-producer reduce XLA fuses into one pass — crucial for
    # the dense [N x C] sweep, where a [10, N*C] operand would
    # materialize tens of MB), then ALL moments are one
    # [10, N] x [N, 10] gram matmul (MXU, f32-HIGHEST), followed by
    # constant-size [3,..] contractions against the rotation-derivative
    # tensors.

    _sym = ((0, 1, 2), (1, 3, 4), (2, 4, 5))  # (i,j) -> unique-pair slot

    def _split(v):  # [..., 3] -> 3 x [...]
        return v[..., 0], v[..., 1], v[..., 2]

    def _common(p, mu, ic6, mask):
        """Shared forward sweep: per-(point, neighbor) residual e,
        B e (unrolled symmetric matvec), weight expt."""
        t = _pose_to_matrix(p)
        pts = apply_transform(t, xyz)
        e0, e1, e2 = _split(pts[:, None, :] - mu)  # each [N,k]
        i00, i01, i02 = ic6[..., 0], ic6[..., 1], ic6[..., 2]
        i11, i12, i22 = ic6[..., 3], ic6[..., 4], ic6[..., 5]
        be0 = i00 * e0 + i01 * e1 + i02 * e2
        be1 = i01 * e0 + i11 * e1 + i12 * e2
        be2 = i02 * e0 + i12 * e1 + i22 * e2
        q = e0 * be0 + e1 * be1 + e2 * be2
        expt = jnp.exp(-0.5 * d2 * q) * mask  # [N,k]
        return (be0, be1, be2), (i00, i01, i02, i11, i12, i22), expt

    def _angular(p):
        dr = jax.jacfwd(_rot_of)(p[3:6])  # [3,3,3] constant-size
        return dr

    def _basis_cols(quadratic):
        """[N,c] basis stack: 1, x, (xx^T unique if quadratic) — one row
        per POINT (channels reduce over the neighbor/cell axis before
        meeting the basis)."""
        x0, x1, x2 = _split(xyz)
        cols = [jnp.ones_like(x0), x0, x1, x2]
        if quadratic:
            cols += [
                x0 * x0, x0 * x1, x0 * x2,
                x1 * x1, x1 * x2, x2 * x2,
            ]
        return jnp.stack(cols, axis=-1)

    def fixed_objective(p, mu, ic6, mask):
        """-score(p) with a frozen neighborhood: pure streaming math, no
        gathers."""
        _, _, expt = _common(p, mu, ic6, mask)
        f = d1 * jnp.sum(expt)
        if psum_axis is not None:
            f = jax.lax.psum(f, psum_axis)
        return f

    def fixed_value_grad(p, mu, ic6, mask):
        """(f, df/dp) in ONE streaming pass — analytic chain rule through
        the per-point map x'(p) = R(ang) x + t (PCL computeDerivatives'
        structure: point-independent angular derivative tensors applied
        per point). Channels reduce over the neighbor/cell axis, then one
        [4, N] x [N, 4] gram matmul carries the f / translational /
        rotational moments together."""
        (be0, be1, be2), _, expt = _common(p, mu, ic6, mask)
        w = d1 * d2 * expt
        ch = jnp.stack(
            [
                jnp.sum(expt, axis=-1),
                jnp.sum(w * be0, axis=-1),
                jnp.sum(w * be1, axis=-1),
                jnp.sum(w * be2, axis=-1),
            ]
        )  # [4,N]
        basis = _basis_cols(quadratic=False)  # [N,4]
        mm = jax.lax.dot(
            ch, basis, precision=jax.lax.Precision.HIGHEST
        )
        f = d1 * mm[0, 0]
        g_t = -mm[1:4, 0]
        m = -mm[1:4, 1:4]  # M[i,j] = sum_n g_pt[n,i] xyz[n,j]
        dr = _angular(p)
        g_a = jnp.einsum("ija,ij->a", dr, m)  # constant-size
        g = jnp.concatenate([g_t, g_a])
        if psum_axis is not None:
            f, g = jax.lax.psum((f, g), psum_axis)
        return f, g

    def fixed_value_grad_hess(p, mu, ic6, mask):
        """(f, grad[6], hess[6,6]) in one pass (Magnusson 2009 eq. 6.12-
        6.13 structure): per-point closed-form gradient/Hessian in x'
        chained through J = [I | dR x] plus the second-order rotation
        term. Channels reduce over the neighbor/cell axis, then one
        [10, N] x [N, 10] gram matmul yields every moment: row 0 = expt
        (f), rows 1-3 = w*Be (gradient), rows 4-9 = the 6 unique
        components of w*(d2 BeBe^T - B) (Hessian); col 0 = plain sums,
        cols 1-3 = first moments vs x, cols 4-9 = second moments vs the
        unique xx^T products."""
        (be0, be1, be2), ii, expt = _common(p, mu, ic6, mask)
        i00, i01, i02, i11, i12, i22 = ii
        w = d1 * d2 * expt  # [N,k] or [N,C]; mask rides in via expt
        chans = (
            expt,
            w * be0,
            w * be1,
            w * be2,
            w * (d2 * be0 * be0 - i00),
            w * (d2 * be0 * be1 - i01),
            w * (d2 * be0 * be2 - i02),
            w * (d2 * be1 * be1 - i11),
            w * (d2 * be1 * be2 - i12),
            w * (d2 * be2 * be2 - i22),
        )
        ch = jnp.stack([jnp.sum(c, axis=-1) for c in chans])  # [10,N]
        basis = _basis_cols(quadratic=True)  # [N,10]
        mm = jax.lax.dot(
            ch, basis, precision=jax.lax.Precision.HIGHEST
        )  # [10,10]

        sym = np.asarray(_sym)
        f = d1 * mm[0, 0]
        g_t = -mm[1:4, 0]
        m = -mm[1:4, 1:4]             # M[i,j]    = sum g_pt[n,i] x[n,j]
        htt = mm[4 + sym, 0]          # [3,3]     = sum h_pt[n,i,j]
        h3 = mm[4 + sym[:, :, None], 1 + np.arange(3)[None, None, :]]
        # h3[i,j,p]   = sum h_pt[n,i,j] x[n,p]
        h4 = mm[4 + sym[:, None, :, None], 4 + sym[None, :, None, :]]
        # h4[i,p,j,q] = sum h_pt[n,i,j] x[n,p] x[n,q]

        ang = p[3:6]
        dr = jax.jacfwd(_rot_of)(ang)              # [3,3,3]
        ddr = jax.jacfwd(jax.jacfwd(_rot_of))(ang)  # [3,3,3,3]

        # all remaining contractions are constant-size [3,..]
        g_a = jnp.einsum("ija,ij->a", dr, m)
        grad = jnp.concatenate([g_t, g_a])

        hta = jnp.einsum("jpa,ijp->ia", dr, h3)            # [3,3]
        haa = jnp.einsum(
            "ipa,jqb,ipjq->ab", dr, dr, h4
        ) + jnp.einsum("ijab,ij->ab", ddr, m)              # [3,3]
        top = jnp.concatenate([htt, hta], axis=1)
        bot = jnp.concatenate([hta.T, haa], axis=1)
        hess = jnp.concatenate([top, bot], axis=0)
        if psum_axis is not None:
            # one fused 43-scalar collective: f + grad + hessian are
            # additive over the sharded source points
            f, grad, hess = jax.lax.psum((f, grad, hess), psum_axis)
        return f, grad, hess

    def objective(p):
        mu, ic, mask = lookup(p)
        return fixed_objective(p, mu, ic, mask)

    return objective, lookup, fixed_objective, fixed_value_grad, fixed_value_grad_hess


def _more_thuente(vg, p, direction, phi0, g0, step_init, step_max, config: NDTConfig):
    """Line search along ``direction`` reproducing PCL computeStepLengthMT's
    acceptance logic: sufficient decrease mu=1e-4 and curvature nu=0.9 on
    phi(a) = f(p + a d), with bisection-style interval updates, at most
    ``line_search_max_iterations`` trials, steps in [step_min, step_max].
    ``vg(q) -> (f, grad)`` is the single-pass analytic evaluation; phi0/g0
    are the already-computed values at ``p`` (no extra sweep).
    """
    mu, nu = 1e-4, 0.9
    step_min = config.transformation_epsilon / 2.0

    dphi0 = jnp.dot(g0, direction)
    # PCL: non-descent direction reverses the step.
    reverse = dphi0 > 0
    direction = jnp.where(reverse, -direction, direction)
    dphi0 = jnp.where(reverse, -dphi0, dphi0)

    a_t = jnp.clip(step_init, step_min, step_max)

    def trial(a):
        f, g = vg(p + a * direction)
        return f, jnp.dot(g, direction)

    def cond(st):
        it, a_l, a_u, a_t, done = st
        return (~done) & (it < config.line_search_max_iterations)

    def body(st):
        it, a_l, a_u, a_t, _ = st
        f_t, g_t = trial(a_t)
        suff = f_t <= phi0 + mu * a_t * dphi0
        curv = jnp.abs(g_t) <= nu * jnp.abs(dphi0)
        # After a few trials, accept on sufficient decrease alone: each
        # extra trial costs a full objective+gradient evaluation, and near
        # the optimum the strong-Wolfe curvature bound can keep bisecting
        # without materially changing the Newton step.
        done = suff & (curv | (it >= 3))
        # interval update (More-Thuente cases collapsed to safeguarded
        # bisection/extrapolation):
        too_high = ~suff
        new_a_u = jnp.where(too_high, a_t, a_u)
        new_a_l = jnp.where(too_high, a_l, a_t)
        # next trial: bisect when bracketed, else extrapolate toward max
        bracketed = new_a_u > 0
        next_a = jnp.where(
            bracketed,
            0.5 * (new_a_l + new_a_u),
            jnp.minimum(2.0 * a_t, step_max),
        )
        next_a = jnp.clip(next_a, step_min, step_max)
        return it + 1, new_a_l, new_a_u, jnp.where(done, a_t, next_a), done

    init = (jnp.int32(0), jnp.zeros(()), jnp.zeros(()), a_t, jnp.bool_(False))
    _, a_l, _, a_fin, done = jax.lax.while_loop(cond, body, init)
    # fall back to the best lower bound if no Wolfe point found
    a_result = jnp.where(done, a_fin, jnp.maximum(a_l, step_min))
    f_res, _ = trial(a_result)
    improved = f_res < phi0
    a_result = jnp.where(improved, a_result, 0.0)
    return a_result, direction


def _more_thuente_exact(vg, p, direction, phi0, g0, step_init, step_max, config: NDTConfig):
    """Full More-Thuente line search, PCL computeStepLengthMT semantics
    (pcl/registration/impl/ndt.hpp; cited constructs: Sun & Yuan 2006 eq.
    2.4.2/2.4.5/2.4.52/2.4.56; More & Thuente 1994 Update Algorithm and
    Trial Value Selection). Differences from :func:`_more_thuente` (the
    shipped fast mode):

    * ``vg`` is expected to REFRESH the voxel neighborhood at every
      trial (the caller passes a fresh-lookup closure), matching PCL's
      per-trial computeDerivatives/radiusSearch.
    * Trial values come from the MT cubic/quadratic/secant interpolants
      with the psi->phi auxiliary-function switch and interval update
      cases U1-U3 — not safeguarded bisection.
    * Termination and fallback match PCL: the final (possibly
      non-Wolfe) trial value is returned as-is; there is no
      improved-over-phi0 gate.

    All state rides a single lax.while_loop; every trial costs one
    objective+gradient sweep including its neighborhood query.
    """
    mu, nu = 1e-4, 0.9
    step_min = config.transformation_epsilon / 2.0
    one = jnp.ones((), p.dtype)

    dphi0 = jnp.dot(g0, direction)
    # PCL: a non-descent direction reverses the step (d_phi_0 == 0
    # returns step 0 — handled by the improved/descent math below, where
    # a zero gradient yields psi_t > 0 for all a and the clamp floor).
    reverse = dphi0 > 0
    direction = jnp.where(reverse, -direction, direction)
    dphi0 = jnp.where(reverse, -dphi0, dphi0)
    zero_grad = dphi0 == 0

    def psi_of(a, phi_a):
        return phi_a - phi0 - mu * a * dphi0

    def dpsi_of(dphi_a):
        return dphi_a - mu * dphi0

    def trial(a):
        f, g = vg(p + a * direction)
        return f, jnp.dot(g, direction)

    def cubic_min(a_l, f_l, g_l, a_t, f_t, g_t):
        # minimizer of the cubic interpolating (a_l,f_l,g_l),(a_t,f_t,g_t)
        # [Sun & Yuan 2006, eq. 2.4.52/2.4.56 as used by PCL]
        z = 3 * (f_t - f_l) / (a_t - a_l) - g_t - g_l
        w = jnp.sqrt(jnp.maximum(z * z - g_t * g_l, 0.0))
        denom = g_t - g_l + 2 * w
        safe = jnp.abs(denom) > 1e-30
        ac = a_l + (a_t - a_l) * (w - g_l - z) / jnp.where(safe, denom, one)
        return jnp.where(safe, ac, a_t)

    def quad_min(a_l, f_l, g_l, a_t, f_t):
        # minimizer of the quadratic interpolating f_l, g_l, f_t [eq 2.4.2]
        denom = g_l - (f_l - f_t) / (a_l - a_t)
        safe = jnp.abs(denom) > 1e-30
        aq = a_l - 0.5 * (a_l - a_t) * g_l / jnp.where(safe, denom, one)
        return jnp.where(safe, aq, a_t)

    def secant_min(a_l, g_l, a_t, g_t):
        # minimizer of the quadratic interpolating g_l, g_t [eq 2.4.5]
        denom = g_l - g_t
        safe = jnp.abs(denom) > 1e-30
        return jnp.where(
            safe, a_l - (a_l - a_t) / jnp.where(safe, denom, one) * g_l, a_t
        )

    def trial_value(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
        """PCL trialValueSelectionMT, cases 1-4, branch-free."""
        a_c = cubic_min(a_l, f_l, g_l, a_t, f_t, g_t)
        a_q = quad_min(a_l, f_l, g_l, a_t, f_t)
        a_s = secant_min(a_l, g_l, a_t, g_t)
        # Case 1: f_t > f_l
        c1 = jnp.where(
            jnp.abs(a_c - a_l) < jnp.abs(a_q - a_l), a_c, 0.5 * (a_q + a_c)
        )
        # Case 2: f_t <= f_l, g_t * g_l < 0
        c2 = jnp.where(jnp.abs(a_c - a_t) >= jnp.abs(a_s - a_t), a_c, a_s)
        # Case 3: |g_t| <= |g_l| (same-sign gradients, still decreasing)
        c3_next = jnp.where(jnp.abs(a_c - a_t) < jnp.abs(a_s - a_t), a_c, a_s)
        c3 = jnp.where(
            a_t > a_l,
            jnp.minimum(a_t + 0.66 * (a_u - a_t), c3_next),
            jnp.maximum(a_t + 0.66 * (a_u - a_t), c3_next),
        )
        # Case 4: cubic against the UPPER endpoint
        c4 = cubic_min(a_u, f_u, g_u, a_t, f_t, g_t)
        return jnp.where(
            f_t > f_l,
            c1,
            jnp.where(
                g_t * g_l < 0,
                c2,
                jnp.where(jnp.abs(g_t) <= jnp.abs(g_l), c3, c4),
            ),
        )

    def update_interval(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_t, g_t):
        """PCL updateIntervalMT: cases U1-U3 (+ converged otherwise)."""
        u1 = f_t > f_l
        u2 = ~u1 & (g_t * (a_l - a_t) > 0)
        u3 = ~u1 & (g_t * (a_l - a_t) < 0)
        new_a_l = jnp.where(u2 | u3, a_t, a_l)
        new_f_l = jnp.where(u2 | u3, f_t, f_l)
        new_g_l = jnp.where(u2 | u3, g_t, g_l)
        new_a_u = jnp.where(u1, a_t, jnp.where(u3, a_l, a_u))
        new_f_u = jnp.where(u1, f_t, jnp.where(u3, f_l, f_u))
        new_g_u = jnp.where(u1, g_t, jnp.where(u3, g_l, g_u))
        converged = ~(u1 | u2 | u3)
        return new_a_l, new_f_l, new_g_l, new_a_u, new_f_u, new_g_u, converged

    # endpoints initialized from psi at a=0 (psi(0)=0, psi'(0)=(1-mu)phi'(0))
    z = jnp.zeros((), p.dtype)
    a_l, f_l, g_l = z, z, dpsi_of(dphi0)
    a_u, f_u, g_u = z, z, dpsi_of(dphi0)

    a_t = jnp.clip(step_init, step_min, step_max)
    phi_t, dphi_t = trial(a_t)
    psi_t, dpsi_t = psi_of(a_t, phi_t), dpsi_of(dphi_t)

    def cond(st):
        (it, a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, dphi_t, psi_t,
         dpsi_t, open_iv, iv_conv) = st
        wolfe = (psi_t <= 0) & (dphi_t <= -nu * dphi0)
        return (
            ~iv_conv
            & (it < config.line_search_max_iterations)
            & ~wolfe
            & ~zero_grad
        )

    def body(st):
        (it, a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, dphi_t, psi_t,
         dpsi_t, open_iv, iv_conv) = st
        # select the next trial from psi (open interval) or phi (closed)
        f_sel = jnp.where(open_iv, psi_t, phi_t)
        g_sel = jnp.where(open_iv, dpsi_t, dphi_t)
        a_new = trial_value(a_l, f_l, g_l, a_u, f_u, g_u, a_t, f_sel, g_sel)
        a_new = jnp.clip(a_new, step_min, step_max)
        phi_n, dphi_n = trial(a_new)
        psi_n, dpsi_n = psi_of(a_new, phi_n), dpsi_of(dphi_n)
        # psi -> phi switch: once psi <= 0 with psi' >= 0, close the
        # interval and convert the stored endpoint values from psi to phi
        close = open_iv & (psi_n <= 0) & (dpsi_n >= 0)
        # PCL's literal conversion is `f += phi_0 - mu*d_phi_0*a` (the
        # textbook inverse of psi is `+ mu*d_phi_0*a`; PCL's sign on that
        # O(mu)=1e-4 term differs, and a_l is usually 0 at switch time so
        # the term mostly vanishes). Mirrored as-is: this mode exists to
        # reproduce PCL's behavior, quirks included.
        f_l = jnp.where(close, f_l + phi0 - mu * dphi0 * a_l, f_l)
        g_l = jnp.where(close, g_l + mu * dphi0, g_l)
        f_u = jnp.where(close, f_u + phi0 - mu * dphi0 * a_u, f_u)
        g_u = jnp.where(close, g_u + mu * dphi0, g_u)
        open_n = open_iv & ~close
        fu_t = jnp.where(open_n, psi_n, phi_n)
        gu_t = jnp.where(open_n, dpsi_n, dphi_n)
        a_l, f_l, g_l, a_u, f_u, g_u, iv_conv = update_interval(
            a_l, f_l, g_l, a_u, f_u, g_u, a_new, fu_t, gu_t
        )
        return (it + 1, a_l, f_l, g_l, a_u, f_u, g_u, a_new, phi_n,
                dphi_n, psi_n, dpsi_n, open_n, iv_conv)

    st = (jnp.int32(0), a_l, f_l, g_l, a_u, f_u, g_u, a_t, phi_t, dphi_t,
          psi_t, dpsi_t, jnp.bool_(True), jnp.bool_(False))
    st = jax.lax.while_loop(cond, body, st)
    a_fin = jnp.where(zero_grad, jnp.zeros((), p.dtype), st[7])
    return a_fin, direction


@partial(jax.jit, static_argnames=("config", "psum_axis"))
def ndt_align(
    src: Cloud,
    grid: NDTGrid,
    config: NDTConfig = NDTConfig(),
    init_guess: jax.Array | None = None,
    psum_axis=None,
) -> NDTResult:
    """Align ``src`` onto the NDT grid (PCL ndt.align(output, guess)).

    Convergence matches PCL: stop when ``|delta_p| < transformation_epsilon``
    or the iteration cap is reached; both report converged=True.
    """
    dtype = src.xyz.dtype
    guess = (
        jnp.eye(4, dtype=dtype) if init_guess is None else init_guess.astype(dtype)
    )
    cap = config.max_source_points
    if 0 < cap < src.capacity and psum_axis is None:
        # Uniform subsample by prefix slice: voxel-downsampled sources
        # arrive in hash-shuffled voxel order (ops/voxel.py), so the
        # first ``cap`` rows are already a spatially uniform subset.
        src = Cloud(
            src.xyz[:cap],
            src.rgb[:cap],
            src.valid[:cap],
            None if src.normal is None else src.normal[:cap],
        )
    (
        objective,
        lookup,
        fixed_objective,
        fixed_value_grad,
        fixed_value_grad_hess,
    ) = _make_objective(src, grid, config, psum_axis)

    p0 = _matrix_to_pose(guess)

    def cond(st):
        p, it, done = st
        return ~done

    def body(st):
        p, it, _ = st
        # One gather pass per Newton iteration; derivatives and the line
        # search run against the frozen neighborhood (see _make_objective).
        mu, ic, mask = lookup(p)
        f0, g, h = fixed_value_grad_hess(p, mu, ic, mask)
        # Safeguarded Newton: solve (H + lambda I) d = -g with small ridge
        # (PCL relies on JacobiSVD least squares; the ridge handles the
        # same rank-deficient cases).
        ridge = 1e-6 * jnp.trace(h) / 6.0
        h_reg = h + jnp.abs(ridge) * jnp.eye(6, dtype=dtype)
        delta = jnp.linalg.solve(h_reg, -g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, -g)
        norm = jnp.linalg.norm(delta)
        direction = delta / jnp.maximum(norm, 1e-30)
        if config.pcl_exact_line_search:
            # PCL-exact: every line-search trial refreshes the voxel
            # neighborhood (computeStepLengthMT -> computeDerivatives ->
            # radiusSearch per trial) and runs the full More-Thuente
            # trial selection. One gather per trial instead of zero.
            vg = lambda q: fixed_value_grad(q, *lookup(q))
            step, direction = _more_thuente_exact(
                vg, p, direction, f0, g, norm, config.step_size, config
            )
        else:
            vg = lambda q: fixed_value_grad(q, mu, ic, mask)
            step, direction = _more_thuente(
                vg, p, direction, f0, g, norm, config.step_size, config
            )
        new_p = p + step * direction
        new_it = it + 1
        done = (step * jnp.ones(()) < config.transformation_epsilon) | (
            new_it >= config.max_iterations
        )
        return new_p, new_it, done

    p_fin, iters, _ = jax.lax.while_loop(
        cond, body, (p0, jnp.int32(0), jnp.bool_(False))
    )

    score = -objective(p_fin)
    n = jnp.sum(src.valid.astype(dtype))
    if psum_axis is not None:
        n = jax.lax.psum(n, psum_axis)
    n = jnp.maximum(n, 1.0)
    return NDTResult(
        transform=_pose_to_matrix(p_fin),
        converged=jnp.bool_(True),
        iterations=iters,
        score=score,
        trans_probability=score / n,
    )
