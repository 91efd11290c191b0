"""Registration schemes: the reference's pipeline layer (SURVEY.md C2-C5).

Mirrors the Strategy / template-method design of src/types.hpp:14-44:

  * ``RegistrationScheme``          — protocol: ``registration(clouds) -> Cloud``
  * ``TwoPhaseRegistrationScheme``  — phase 1 ``extract_features`` per cloud,
                                      phase 2 ``global_registration``
  * ``IncrementalICP``              — plain incremental ICP (C3,
                                      src/incremental_icp.hpp)
  * ``ICPEdgeBasedRegistration``    — coarse ICP + fine ICP on edge clouds
                                      with IMU/static guesses (C4,
                                      src/icp_edge_based_registration.hpp)
  * ``NDTEdgeBasedRegistration``    — NDT coarse + ICP refine (C5,
                                      src/ndt_edge_based_registration.hpp)

TPU-first structure: the sequential per-frame chain (each pair depends on
the accumulated target, SURVEY.md §3.1) compiles to ONE ``lax.scan``
program (``_chain_scan``) — the target buffers and the incremental NDT
moment grid ride the carry as fixed-capacity HBM arrays that grow only by
mask, the per-frame convergence gate folds into the merge scatters, and
the global cloud is assembled afterwards by a batched transform +
concatenate. A semantically identical per-frame Python loop remains
available (``PipelineConfig.use_scan=False``); both honor the reference's
convergence gating (icp_edge_based_registration.hpp:113-123).

Reference quirks reproduced deliberately (SURVEY.md §7):
  * the stored feature cloud of frame 0 is voxel-downsampled in place, so
    the ``edge-0.pcd`` side dump contains the DOWNSAMPLED cloud
    (aliasing at icp_edge_based_registration.hpp:54-69);
  * IMU thetas are rebased by -theta_0 (in-loop mutation == plain
    rebasing, :83-84);
  * the static-guess accumulator advances for every frame, converged or
    not (:98-101);
  * the ICP scheme's IMU guess uses the full XYZ axis mapping while the
    NDT scheme's uses only -theta.y (:86-92 vs ndt:79-80).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import (
    OPTIONAL_VEC_FIELDS,
    Cloud,
    OrganizedCloud,
    map_optional,
)
from rspc_tpu.config import PipelineConfig
from rspc_tpu.ops.edges import extract_edge_features
from rspc_tpu.ops.normals import estimate_normals
from rspc_tpu.ops.transform import (
    apply_transform,
    apply_transform_cloud,
    imu_guess_full,
    imu_guess_y,
    relative_thetas,
    static_y_guess,
)
from rspc_tpu.ops.voxel import voxel_downsample
from rspc_tpu.registration.icp import ICPResult, icp_align
from rspc_tpu.registration.ndt import (
    build_ndt_grid,
    ndt_align,
    ndt_grid_from_moments,
    ndt_grid_init,
    ndt_grid_origin,
    ndt_grid_update_moments,
)


@jax.jit
def merge_append(dst: Cloud, src: Cloud, gate=None) -> Cloud:
    """Append src's valid points into dst's free tail slots
    (PCL ``*dst = *dst + *src``, SURVEY.md X11) without reallocation.
    Overflow beyond dst capacity is dropped.

    ``gate`` (optional traced bool): when False, nothing is appended —
    the gate folds into the scatter indices, so inside a scan the
    not-merged branch needs NO copy of dst (a scatter-then-select would
    force XLA to materialize both versions of the buffers every
    iteration)."""
    order = jnp.argsort(~src.valid, stable=True)
    sxyz = jnp.take(src.xyz, order, axis=0)
    srgb = jnp.take(src.rgb, order, axis=0)
    svalid = jnp.take(src.valid, order, axis=0)
    if gate is not None:
        svalid = svalid & gate
    start = dst.count()
    pos = start + jnp.arange(src.capacity, dtype=jnp.int32)
    pos = jnp.where(svalid, pos, dst.capacity)  # OOB -> dropped
    opt = {
        name: (
            getattr(dst, name).at[pos].set(
                jnp.take(getattr(src, name), order, axis=0), mode="drop"
            )
            if getattr(dst, name) is not None
            and getattr(src, name) is not None
            else None
        )
        for name in OPTIONAL_VEC_FIELDS
    }
    return Cloud(
        xyz=dst.xyz.at[pos].set(sxyz, mode="drop"),
        rgb=dst.rgb.at[pos].set(srgb, mode="drop"),
        valid=dst.valid.at[pos].set(svalid, mode="drop"),
        **opt,
    )


def _block_append(dst: Cloud, src: Cloud, offset, gate=None) -> Cloud:
    """Append ``src``'s WHOLE fixed-capacity buffer (invalid rows carried
    along masked) at ``offset`` — a contiguous ``dynamic_update_slice``
    instead of merge_append's compacting row scatter. The written SET of
    valid points is identical, only slot layout differs (interior holes),
    which every consumer masks; measured ~5x cheaper than the scatter on
    multi-MB carry buffers inside a scan. Caller guarantees
    ``offset + src.capacity <= dst.capacity``."""
    valid = src.valid if gate is None else src.valid & gate
    dus = jax.lax.dynamic_update_slice
    opt = {
        name: (
            dus(getattr(dst, name), getattr(src, name), (offset, 0))
            if getattr(dst, name) is not None
            and getattr(src, name) is not None
            else getattr(dst, name)
        )
        for name in OPTIONAL_VEC_FIELDS
    }
    return Cloud(
        xyz=dus(dst.xyz, src.xyz, (offset, 0)),
        rgb=dus(dst.rgb, src.rgb, (offset, 0)),
        valid=dus(dst.valid, valid, (offset,)),
        **opt,
    )


def _as_unorganized(c) -> Cloud:
    return c.flatten() if isinstance(c, OrganizedCloud) else c


class RegistrationScheme:
    """Abstract base (reference: src/types.hpp:14-20)."""

    def registration(self, clouds: Sequence) -> Cloud:
        raise NotImplementedError


class TwoPhaseRegistrationScheme(RegistrationScheme):
    """Template method: extract features per cloud, then globally register
    (reference: src/types.hpp:22-44)."""

    def extract_features(self, cloud):
        raise NotImplementedError

    def global_registration(
        self, clouds: List[Tuple[Cloud, Cloud]]
    ) -> Cloud:
        raise NotImplementedError

    def batch_extract_features(self, clouds: Sequence):
        """Optional phase-1 fast path: subclasses may return a list of
        feature clouds for all inputs at once (None = per-cloud loop)."""
        return None

    def registration(self, clouds: Sequence) -> Cloud:
        features = self.batch_extract_features(clouds)
        if features is None:
            features = [self.extract_features(c) for c in clouds]
        feature_clouds = [
            (f, _as_unorganized(c)) for f, c in zip(features, clouds)
        ]
        return self.global_registration(feature_clouds)


@partial(
    jax.jit,
    static_argnames=(
        "icp_cfg", "leaf", "voxel_cap", "guard_cap", "rescue_thresh",
        "rescue_cap", "rescue_iters",
    ),
)
def _icp_pair_step(
    target: Cloud, edge: Cloud, guess, icp_cfg, leaf, voxel_cap,
    guard_cap: float = 0.0, guard_fallback=None,
    rescue_thresh: float = 0.0, rescue_cap: float = 0.1,
    rescue_iters: int = 8,
):
    """One frame of the edge-ICP chain: downsample source edges, coarse ICP
    with guess, fine ICP without, compose. The coarse stage's fitness is
    never consumed (only the fine stage's convergence gates merging),
    so its extra sweep is skipped. ``guard_fallback`` overrides the
    never-worsen gate's fallback hypothesis (default: the guess) — used
    by warm-started chains to fall back to the raw, correction-free
    guess. With ``rescue_thresh > 0`` the gated wide-cap rescue
    (:func:`_rescue_from`) is folded into the returned fine result."""
    src_down = voxel_downsample(edge, leaf, voxel_cap)
    coarse_cfg = dataclasses.replace(icp_cfg, compute_fitness=False)
    coarse = icp_align(src_down, target, coarse_cfg, guess)
    if guard_cap > 0.0:
        # hypotheses: the coarse result, the (possibly warmed) guess it
        # started from, and — under warm start — the raw guess as the
        # correction-independent escape hatch. Keeping the warmed guess
        # in the pool matters: the coarse stage can diverge FROM a good
        # prediction into a local optimum that still beats the raw guess
        # (and it gets the _WARM_GUARD_MARGIN score preference — see
        # _chain_scan).
        hyps = [coarse.transform, guess]
        w = None
        if guard_fallback is not None:
            hyps.append(guard_fallback)
            w = (1.0, _WARM_GUARD_MARGIN, 1.0)
        coarse = dataclasses.replace(
            coarse,
            transform=_guard_best(
                hyps, _stride_cloud(src_down, _GUARD_MAX_POINTS),
                target, guard_cap, w,
            ),
        )
    aligned = apply_transform_cloud(coarse.transform, src_down)
    fine = icp_align(aligned, target, icp_cfg)
    fine_aligned = apply_transform_cloud(fine.transform, aligned)
    fine, fine_aligned = _maybe_rescue(
        fine, fine_aligned, target, icp_cfg, rescue_thresh, rescue_cap,
        rescue_iters,
    )
    return coarse, fine, fine_aligned


@partial(
    jax.jit,
    static_argnames=(
        "ndt_cfg", "icp_cfg", "leaf", "voxel_cap", "guard_cap",
        "rescue_thresh", "rescue_cap", "rescue_iters",
    ),
)
def _ndt_pair_step(
    target: Cloud, edge: Cloud, guess, ndt_cfg, icp_cfg, leaf, voxel_cap,
    guard_cap: float = 0.0, guard_fallback=None,
    rescue_thresh: float = 0.0, rescue_cap: float = 0.1,
    rescue_iters: int = 8,
):
    """One frame of the NDT chain: downsample, NDT coarse with guess, fine
    ICP, compose (src/ndt_edge_based_registration.hpp:66-108).
    ``guard_fallback`` / rescue args as in :func:`_icp_pair_step`."""
    src_down = voxel_downsample(edge, leaf, voxel_cap)
    grid = build_ndt_grid(target, ndt_cfg)
    coarse = ndt_align(src_down, grid, ndt_cfg, guess)
    if guard_cap > 0.0:
        # see _icp_pair_step: candidate + started-from guess (+ raw
        # guess under warm start, with the prediction's score margin)
        hyps = [coarse.transform, guess]
        w = None
        if guard_fallback is not None:
            hyps.append(guard_fallback)
            w = (1.0, _WARM_GUARD_MARGIN, 1.0)
        coarse = dataclasses.replace(
            coarse,
            transform=_guard_best(
                hyps, _stride_cloud(src_down, _GUARD_MAX_POINTS),
                target, guard_cap, w,
            ),
        )
    aligned = apply_transform_cloud(coarse.transform, src_down)
    fine = icp_align(aligned, target, icp_cfg)
    fine_aligned = apply_transform_cloud(fine.transform, aligned)
    fine, fine_aligned = _maybe_rescue(
        fine, fine_aligned, target, icp_cfg, rescue_thresh, rescue_cap,
        rescue_iters,
    )
    return coarse, fine, fine_aligned


@partial(jax.jit, static_argnames=("use_ndt",))
def _imu_guesses(thetas, use_ndt: bool):
    """[n-1,4,4] IMU initial guesses, one vmapped launch (module-level
    jit so repeated registration() calls hit the trace cache)."""
    guess_fn = imu_guess_y if use_ndt else imu_guess_full
    return jax.vmap(guess_fn)(relative_thetas(thetas)[1:])


def _nn_sweep(src_xyz, src_valid, tgt_xyz, tgt_valid, use_pallas=True,
              chunk=None):
    """Backend-dispatched NN sweep: the Pallas kernel on TPU, the XLA
    chunked sweep elsewhere (or when ``use_pallas=False`` — needed under
    vmap: the Pallas kernel's scalar-prefetch grid has no batching
    rule). The single place that encodes this choice."""
    from rspc_tpu.ops.nn import nearest_neighbors

    if use_pallas and jax.default_backend() == "tpu":
        from rspc_tpu.ops.nn_pallas import nearest_neighbors_pallas

        return nearest_neighbors_pallas(src_xyz, src_valid, tgt_xyz, tgt_valid)
    kw = {} if chunk is None else {"chunk": chunk}
    return nearest_neighbors(src_xyz, src_valid, tgt_xyz, tgt_valid, **kw)


def _capped_sum(d2, valid, cap: float):
    """Sum of min(NN dist^2, cap^2) over valid rows, and the row count."""
    cap2 = cap * cap
    d2c = jnp.minimum(jnp.where(jnp.isfinite(d2), d2, cap2), cap2)
    w = valid.astype(d2.dtype)
    return jnp.sum(d2c * w), jnp.sum(w)


def _capped_mean_sq(
    src: Cloud, tgt: Cloud, cap: float, use_pallas: bool = True
) -> jax.Array:
    """Mean of min(NN dist^2, cap^2) over valid source points — the
    monotone alignment score the acceptance/guard gates compare. Far /
    unmatched points saturate at the cap instead of dominating."""
    d2, _ = _nn_sweep(src.xyz, src.valid, tgt.xyz, tgt.valid, use_pallas)
    s, n = _capped_sum(d2, src.valid, cap)
    return s / jnp.maximum(n, 1.0)


# Preference multiplier for the constant-velocity prediction inside the
# coarse guard's hypothesis vote: the prediction wins unless a competitor
# beats its capped-NN score by >15%. Rationale (measured on the
# partial-overlap chain): when the coarse stage latches onto the WRONG
# part of the accumulated target, its score lands within ~10% of the
# good prediction's (points sit on surfaces, just the wrong ones; the
# aliasing strengthens as the accumulated target grows). Rejecting a
# genuine coarse improvement is cheap — the prediction is already
# near-truth there and the fine/rescue stages close the residual — while
# accepting an aliased pose poisons the chain, so the margin errs
# aggressive.
_WARM_GUARD_MARGIN = 0.85

# Minimum fine-cap inlier-count growth for a fired rescue to be kept —
# see _rescue_from's keep criterion. Noise-caused firings measure ~1.0x
# gain, genuine local-optimum escapes 2-5x; 1.15 keeps marginal genuine
# escapes on noisy partial-overlap scenes while still rejecting pure
# noise drifts.
_RESCUE_KEEP_GAIN = 1.15

# Source-point budget for the coarse guard's hypothesis sweep. The guard
# compares capped-NN MEANS of the same source under k transforms — a
# paired comparison whose decision noise shrinks the score gap far less
# than 1/sqrt(n) suggests — so a strided 4096-point subsample decides
# identically while cutting the [kN x target] sweep ~2.5x (measured
# ~36 ms of the north-star wall was guard sweeps).
_GUARD_MAX_POINTS = 4096


def _stride_cloud(cloud: Cloud, max_points: int) -> Cloud:
    """Deterministic every-k-th-row subsample for score sweeps. The
    voxel-downsample emits clouds compacted by sorted voxel key, so a
    stride picks a spatially spread subset, not a corner."""
    cap = cloud.capacity
    if max_points <= 0 or cap <= max_points:
        return cloud
    step = -(-cap // max_points)
    return Cloud(
        xyz=cloud.xyz[::step],
        rgb=cloud.rgb[::step],
        valid=cloud.valid[::step],
        **map_optional(cloud, lambda x: x[::step]),
    )


def _guard_best(hypotheses, cloud: Cloud, tgt: Cloud, cap, weights=None):
    """Return the hypothesis transform with the best capped-NN score
    (never-worsen gate; earlier entries win ties, so list the candidate
    first). ``weights`` multiplies each hypothesis's score before the
    vote — a weight < 1 gives that hypothesis a preference margin.

    All hypotheses ride ONE NN sweep: the k transformed copies of the
    source are concatenated into a [kN] problem against the shared
    target — the sweep cost is dominated by streaming the target, which
    is identical for all of them."""
    k = len(hypotheses)
    stacked = jnp.concatenate(
        [apply_transform(t, cloud.xyz) for t in hypotheses], axis=0
    )
    valid = jnp.concatenate([cloud.valid] * k, axis=0)
    d2, _ = _nn_sweep(stacked, valid, tgt.xyz, tgt.valid)
    n = cloud.capacity
    scores = jnp.stack(
        [
            _capped_sum(d2[i * n:(i + 1) * n], cloud.valid, cap)[0]
            for i in range(k)
        ]
    )
    if weights is not None:
        scores = scores * jnp.asarray(weights, scores.dtype)
    return jnp.stack(hypotheses)[jnp.argmin(scores)]


def _guard_transform(candidate_t, fallback_t, cloud: Cloud, tgt: Cloud, cap):
    """Keep ``candidate_t`` only if it scores at least as well as
    ``fallback_t`` under the capped NN metric (never-worsen gate)."""
    return _guard_best([candidate_t, fallback_t], cloud, tgt, cap)


def _rescue_from(
    cur: Cloud, target: Cloud, n_inl, icp_cfg, cap: float, iters: int,
    thresh: float,
):
    """Gated wide-cap rescue (no reference analog; see PipelineConfig
    .rescue_inlier_frac). ``cur`` is the source already at the post-fine
    pose, ``n_inl`` the number of valid source points with a
    correspondence inside the fine cap at that pose. When the inlier
    fraction is below ``thresh``, run ``iters`` point-to-point ICP
    iterations at the wider ``cap`` and re-fine at the original cap.
    Returns (relative transform, fired bool) — the clean path pays only
    the branch test (``lax.cond`` skips the rescue sweeps at runtime
    when the gate doesn't fire).

    Keep criterion: the rescue must not worsen the capped-NN score AND
    must grow the fine-cap inlier count by >=_RESCUE_KEEP_GAIN. A score
    test alone cannot tell the two firing causes apart: under partial
    overlap the capped score is saturation-dominated (genuine escapes
    only move it ~2x), while on a noisy-but-aligned pair (the gate fires
    from noise-depressed inlier fractions, not misalignment) the
    wide-cap solve drifts within the score's noise floor. The inlier
    count separates them sharply — measured gains are 2-5x for genuine
    local-optimum escapes vs ~1x for noise firings."""
    dtype = cur.xyz.dtype
    nv = jnp.sum(cur.valid.astype(dtype))
    frac = n_inl.astype(dtype) / jnp.maximum(nv, 1.0)
    need = frac < thresh
    eye = jnp.eye(4, dtype=dtype)

    def do(_):
        wide_cfg = dataclasses.replace(
            icp_cfg,
            max_correspondence_distance=cap,
            max_iterations=iters,
            transformation_epsilon=1e-12,
            euclidean_fitness_epsilon=1e-12,
            compute_fitness=False,
        )
        r1 = icp_align(cur, target, wide_cfg)
        cur2 = apply_transform_cloud(r1.transform, cur)
        refine_cfg = dataclasses.replace(icp_cfg, compute_fitness=False)
        r2 = icp_align(cur2, target, refine_cfg)
        cand = r2.transform @ r1.transform
        # one [2N] sweep scores both hypotheses and counts both inlier
        # sets (the sweep cost is streaming the shared target)
        both = jnp.concatenate(
            [apply_transform(cand, cur.xyz), cur.xyz], axis=0
        )
        valid2 = jnp.concatenate([cur.valid, cur.valid], axis=0)
        d2, _ = _nn_sweep(both, valid2, target.xyz, target.valid)
        m = cur.capacity
        s_cand, _ = _capped_sum(d2[:m], cur.valid, cap)
        s_stay, _ = _capped_sum(d2[m:], cur.valid, cap)
        fine_cap2 = icp_cfg.max_correspondence_distance ** 2
        inl = lambda dd: jnp.sum(
            (cur.valid & jnp.isfinite(dd) & (dd < fine_cap2)).astype(dtype)
        )
        n_cand, n_stay = inl(d2[:m]), inl(d2[m:])
        keep = (s_cand <= s_stay) & (
            n_cand >= n_stay * _RESCUE_KEEP_GAIN
        )
        return jnp.where(keep, cand, eye)

    rel = jax.lax.cond(need, do, lambda _: eye, None)
    return rel, need


def _maybe_rescue(fine, fine_aligned, target, icp_cfg, thresh, cap, iters):
    """Fold the gated rescue into a (fine result, aligned cloud) pair.
    No-op when ``thresh == 0``. The returned fine result's transform
    includes the rescue correction; its fitness/RMSE diagnostics remain
    those of the pre-rescue pose (recomputing them under the gate would
    cost every clean pair an extra sweep)."""
    if thresh <= 0.0:
        return fine, fine_aligned
    if icp_cfg.compute_fitness:
        n_inl = fine.n_correspondences
    else:
        n_inl, _ = _inlier_stats(
            fine_aligned, target, icp_cfg.max_correspondence_distance,
            icp_cfg.use_pallas,
        )
    rel, _ = _rescue_from(
        fine_aligned, target, n_inl, icp_cfg, cap, iters, thresh
    )
    fine = dataclasses.replace(fine, transform=rel @ fine.transform)
    return fine, apply_transform_cloud(rel, fine_aligned)


def _run_stages(target_full: Cloud, src_t: Cloud, stages):
    """Run the annealed point-to-plane stage schedule; returns
    (last result, relative transform, final aligned cloud)."""
    cur = src_t
    rel = jnp.eye(4, dtype=src_t.xyz.dtype)
    res = None
    for stage_cfg in stages:
        res = icp_align(cur, target_full, stage_cfg)
        cur = apply_transform_cloud(res.transform, cur)
        rel = res.transform @ rel
    return res, rel, cur


def _refine_step(target_full: Cloud, src_full: Cloud, base_t, stages, margin):
    """Full-cloud point-to-plane refinement (RefineConfig): run the
    annealed stage schedule against the accumulated full surface. The
    refined transform is ACCEPTED only if it improves the capped NN
    score — refinement is monotone non-harmful even when the coarse
    stages hand it a start outside the point-to-plane basin.
    Returns (last stage result, accepted bool, total_transform)."""
    src_t = apply_transform_cloud(base_t, src_full)
    res, rel, cur = _run_stages(target_full, src_t, stages)
    cap = stages[-1].max_correspondence_distance * 2.0
    pallas_ok = stages[-1].use_pallas
    before = _capped_mean_sq(src_t, target_full, cap, pallas_ok)
    after = _capped_mean_sq(cur, target_full, cap, pallas_ok)
    accepted = after <= before * margin
    total = jnp.where(accepted, rel @ base_t, base_t)
    return res, accepted, total


def _inlier_stats(src: Cloud, tgt: Cloud, radius: float, use_pallas: bool):
    """(inlier count, inlier mean sq dist) within ``radius`` — the
    overlap-aware gate metric for anchor refinement (a global capped
    mean is saturation-dominated when src and tgt overlap partially)."""
    d2, _ = _nn_sweep(src.xyz, src.valid, tgt.xyz, tgt.valid, use_pallas)
    inl = src.valid & jnp.isfinite(d2) & (d2 < radius * radius)
    n = jnp.sum(inl.astype(src.xyz.dtype))
    mean_sq = jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(n, 1.0)
    mean_sq = jnp.where(n > 0, mean_sq, jnp.asarray(jnp.inf, src.xyz.dtype))
    return n, mean_sq


@partial(jax.jit, static_argnames=("stages", "margin"))
def _refine_pair_step(
    target_full: Cloud, src_full: Cloud, base_t, stages, margin
):
    """Jitted wrapper of _refine_step for the Python-loop path."""
    return _refine_step(target_full, src_full, base_t, stages, margin)


@partial(
    jax.jit,
    static_argnames=("stages", "margin", "gate_radius", "max_points"),
)
def _anchor_refine(
    anchor: Cloud,
    fulls,
    totals,
    stages,
    margin,
    gate_radius=0.03,
    gate_inlier_keep=0.95,
    gate_rmse_blowup=1.5,
    max_points: int = 0,
):
    """Batched anchor refinement (RefineConfig.anchor_to_first): re-align
    every frame's full cloud directly against FRAME 0's full cloud from
    its chain transform. Eliminates chain drift wherever the trajectory
    keeps overlap with the first frame; the per-frame acceptance gate
    keeps the chain transform otherwise.

    All frames share ONE anchor target, so each iteration flattens the
    [B, N] sources into a single NN sweep (one Pallas launch on TPU)
    instead of vmapping per-frame aligns — a vmapped XLA sweep either
    scans chunks per lane or materializes a [B, N, M] score tensor.
    Stages run exactly ``max_iterations`` steps each (their epsilons are
    tight by construction; PCL's convergence criteria would not fire).
    """
    from rspc_tpu.ops.umeyama import plane_fit
    from rspc_tpu.registration.icp import _scale_increment

    if max_points and fulls.valid.shape[1] > max_points:
        # RefineConfig.anchor_max_points: every iteration (and the gate's
        # before/after stats) runs on the same strided subsample — the
        # sweeps are the anchor's dominant cost and shrink linearly.
        step = -(-fulls.valid.shape[1] // max_points)
        fulls = jax.tree.map(lambda x: x[:, ::step], fulls)

    b, n_pts = fulls.valid.shape
    dtype = fulls.xyz.dtype

    def nn_flat(xyz_flat):
        flat_valid = fulls.valid.reshape(b * n_pts)
        return _nn_sweep(
            xyz_flat, flat_valid, anchor.xyz, anchor.valid, chunk=2048
        )

    src0 = jax.vmap(apply_transform_cloud)(totals, fulls)  # [B,N,...]

    def stats_from(d2, idx, xyz_b):
        inl = fulls.valid & jnp.isfinite(d2) & (d2 < gate_radius**2)
        cnt = jnp.sum(inl.astype(dtype), axis=1)
        msq = jnp.sum(jnp.where(inl, d2, 0.0), axis=1) / jnp.maximum(cnt, 1.0)
        msq = jnp.where(cnt > 0, msq, jnp.asarray(jnp.inf, dtype))
        # point-to-plane residual over the same inliers — the quantity the
        # anchor stages actually minimize (see acceptance note below)
        q = jnp.take(anchor.xyz, idx.reshape(-1), axis=0).reshape(b, n_pts, 3)
        nq = jnp.take(anchor.normal, idx.reshape(-1), axis=0).reshape(
            b, n_pts, 3
        )
        r = jnp.sum((xyz_b - q) * nq, axis=-1)
        pmsq = jnp.sum(jnp.where(inl, r * r, 0.0), axis=1) / jnp.maximum(
            cnt, 1.0
        )
        pmsq = jnp.where(cnt > 0, pmsq, jnp.asarray(jnp.inf, dtype))
        return cnt, msq, pmsq

    def inlier_stats(xyz_b):
        d2, idx = nn_flat(xyz_b.reshape(b * n_pts, 3))
        return stats_from(
            d2.reshape(b, n_pts), idx.reshape(b, n_pts), xyz_b
        )

    rel = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (b, 4, 4))
    cur = src0.xyz
    use_color = anchor.cgrad is not None and any(
        s.color_weight > 0.0 for s in stages
    )
    if use_color:
        from rspc_tpu.ops.colorgrad import intensity

        i_src = intensity(fulls.rgb).astype(dtype)     # [b, n_pts]
        i_anchor = intensity(anchor.rgb).astype(dtype)  # [cap]
    before_stats = None
    for stage_cfg in stages:
        mcd2 = stage_cfg.max_correspondence_distance**2
        for _ in range(stage_cfg.max_iterations):
            d2, idx = nn_flat(cur.reshape(b * n_pts, 3))
            d2 = d2.reshape(b, n_pts)
            idx = idx.reshape(b, n_pts)
            if before_stats is None:
                # the very first sweep runs at the src0 poses — exactly
                # the acceptance gate's "before" measurement; reuse it
                # instead of re-sweeping the anchor at the end
                before_stats = stats_from(d2, idx, cur)
            w = (
                (d2 <= mcd2) & fulls.valid & jnp.isfinite(d2)
            ).astype(dtype)
            q = jnp.take(anchor.xyz, idx.reshape(-1), axis=0).reshape(
                b, n_pts, 3
            )
            nrm = jnp.take(anchor.normal, idx.reshape(-1), axis=0).reshape(
                b, n_pts, 3
            )
            if stage_cfg.huber_delta is not None:
                r = jnp.sum((cur - q) * nrm, axis=-1)
                w = w * jnp.minimum(
                    1.0,
                    stage_cfg.huber_delta / jnp.maximum(jnp.abs(r), 1e-12),
                )
            if use_color and stage_cfg.color_weight > 0.0:
                # colored-ICP rows against the anchor's gradient field
                # (see registration/icp.py for the residual definition)
                g = jnp.take(
                    anchor.cgrad, idx.reshape(-1), axis=0
                ).reshape(b, n_pts, 3)
                di = (
                    jnp.take(i_anchor, idx.reshape(-1), axis=0).reshape(
                        b, n_pts
                    )
                    - i_src
                )
                w_c = w * jnp.asarray(stage_cfg.color_weight, dtype)
                if stage_cfg.color_huber_delta is not None:
                    r_c = jnp.sum((cur - q) * g, axis=-1) + di
                    w_c = w_c * jnp.minimum(
                        1.0,
                        stage_cfg.color_huber_delta
                        / jnp.maximum(jnp.abs(r_c), 1e-12),
                    )
                t_inc = jax.vmap(
                    lambda s, d, nn, ww, gg, dd, wc: plane_fit(
                        s, d, nn, ww, stage_cfg.point_plane_mix,
                        cgrad=gg, color_resid=dd, color_weights=wc,
                    )
                )(cur, q, nrm, w, g, di, w_c)
            else:
                t_inc = jax.vmap(
                    lambda s, d, nn, ww: plane_fit(
                        s, d, nn, ww, stage_cfg.point_plane_mix
                    )
                )(cur, q, nrm, w)
            # per-lane trust region (see registration/icp.py)
            def clip_one(t, c_xyz, c_valid):
                ang = jnp.arccos(
                    jnp.clip(
                        0.5 * (t[0, 0] + t[1, 1] + t[2, 2] - 1.0), -1.0, 1.0
                    )
                )
                span = jnp.sqrt(
                    jnp.max(
                        jnp.where(
                            c_valid,
                            jnp.sum(
                                (c_xyz - jnp.mean(c_xyz, axis=0)) ** 2, -1
                            ),
                            0.0,
                        )
                    )
                )
                move = ang * span + jnp.linalg.norm(t[:3, 3])
                limit = 2.0 * stage_cfg.max_correspondence_distance
                sc = jnp.minimum(1.0, limit / jnp.maximum(move, 1e-12))
                return jnp.where(sc < 1.0, _scale_increment(t, sc), t)

            t_inc = jax.vmap(clip_one)(t_inc, cur, fulls.valid)
            rel = jnp.einsum("bij,bjk->bik", t_inc, rel)
            cur = jax.vmap(apply_transform)(t_inc, cur)

    # Overlap-aware acceptance: refinement must roughly keep its matched
    # points (gate_inlier_keep slack — inliers churn across the radius
    # boundary even for pure improvements) and must tighten the
    # POINT-TO-PLANE residual (margin bound) — the quantity the stages
    # minimize. Gating on point rmse instead silently rejected genuine
    # improvements: p2l trades meaningless in-plane point distance for
    # out-of-plane accuracy, so a better pose can RAISE point rmse
    # (measured: the rejected frames were exactly the ones with the
    # largest ground-truth error). Point rmse keeps only a
    # gate_rmse_blowup guard against in-plane slip on low-structure
    # scenes where the plane residual alone is blind. Constants live in
    # RefineConfig; tests/test_gate_sensitivity.py pins their stability
    # band.
    nb, rb, pb = (
        before_stats if before_stats is not None
        else inlier_stats(src0.xyz)  # zero-iteration stage schedule
    )
    na, ra, pa = inlier_stats(cur)
    accepted = (
        (na >= nb * gate_inlier_keep)
        & (pa <= pb * margin)
        & (ra <= rb * gate_rmse_blowup)
    )
    refined = jnp.einsum("bij,bjk->bik", rel, totals)
    total = jnp.where(accepted[:, None, None], refined, totals)
    return total, accepted


def _pose_graph_refine(
    fulls,            # Cloud, stacked [n, cap, ...] per-frame full_down clouds
    totals,           # f32[n-1, 4, 4] absolute poses (frame i+1 -> frame 0)
    stages,           # p2l stage schedule (use_pallas=False — runs under vmap)
    skips,            # tuple of frame offsets, e.g. (1, 2, 3)
    gate_radius: float,
    min_overlap: float = 0.25,
    max_points: int = 0,
):
    """Pose-graph relaxation over redundant pairwise constraints
    (RefineConfig.pose_graph; registration/posegraph.py has the solver
    rationale). For every frame pair (i, i+off), off in ``skips``, a
    batched point-to-plane alignment of frame j's full cloud onto frame
    i's — initialized from the current absolute poses — yields a
    relative measurement; constraints are weighted by their inlier
    count and dropped below ``min_overlap`` inlier fraction (pairs that
    no longer see each other contribute nothing). The SE(3) graph solve
    then redistributes per-pair noise across the whole trajectory
    instead of letting the chain integrate it."""
    from rspc_tpu.registration.posegraph import optimize_pose_graph

    n = fulls.valid.shape[0]
    dtype = totals.dtype
    ei_l, ej_l = [], []
    for off in skips:
        for i in range(n - off):
            ei_l.append(i)
            ej_l.append(i + off)
    ei = jnp.asarray(ei_l, jnp.int32)
    ej = jnp.asarray(ej_l, jnp.int32)

    if max_points and fulls.valid.shape[1] > max_points:
        step = -(-fulls.valid.shape[1] // max_points)
        fulls_src = jax.tree.map(lambda x: x[:, ::step], fulls)
    else:
        fulls_src = fulls

    eye = jnp.eye(4, dtype=dtype)
    abs_poses = jnp.concatenate([eye[None], totals], axis=0)  # [n, 4, 4]
    tgt_b = jax.tree.map(lambda x: x[ei], fulls)
    src_b = jax.tree.map(lambda x: x[ej], fulls_src)
    init_b = jax.vmap(
        lambda i, j: _rigid_inverse(abs_poses[i]) @ abs_poses[j]
    )(ei, ej)

    rel = init_b
    cur = jax.vmap(apply_transform_cloud)(init_b, src_b)
    for stage_cfg in stages:
        res = jax.vmap(lambda s, t: icp_align(s, t, stage_cfg))(cur, tgt_b)
        rel = jnp.einsum("bij,bjk->bik", res.transform, rel)
        cur = jax.vmap(apply_transform_cloud)(res.transform, cur)

    n_inl, _ = jax.vmap(
        lambda s, t: _inlier_stats(s, t, gate_radius, False)
    )(cur, tgt_b)
    nv = jax.vmap(lambda s: jnp.sum(s.valid.astype(dtype)))(src_b)
    frac = n_inl / jnp.maximum(nv, 1.0)
    w = jnp.where(frac >= min_overlap, n_inl, 0.0)

    # Anchor priors: one (0, j) constraint per frame whose measurement
    # is the frame's CURRENT (anchor-refined) absolute pose, at a
    # typical measured weight. The graph then FUSES the anchor solution
    # with the pairwise evidence instead of replacing it — without
    # priors, frames whose anchor estimate was already excellent drift
    # toward the (noisier) pairwise consensus; with them, only frames
    # whose prior CONFLICTS with the redundant pairwise majority move
    # (the solver's Huber block weights arbitrate).
    n_frames = n
    prior_j = jnp.arange(1, n_frames, dtype=jnp.int32)
    prior_i = jnp.zeros((n_frames - 1,), jnp.int32)
    prior_w = jnp.full(
        (n_frames - 1,),
        4.0 * jnp.nanmedian(jnp.where(w > 0, w, jnp.nan)),
        dtype,
    )
    prior_w = jnp.where(jnp.isfinite(prior_w), prior_w, 1.0)
    ei = jnp.concatenate([ei, prior_i])
    ej = jnp.concatenate([ej, prior_j])
    rel = jnp.concatenate([rel, totals], axis=0)
    w = jnp.concatenate([w, prior_w])

    refined, _ = optimize_pose_graph(totals, ei, ej, rel, w)
    return refined


def _map_anchor_stages(stages):
    """anchor_stages are tuned use_pallas=False for the batched/vmapped
    frame-0 anchor; the map anchor's sweeps are single flat [m x cap]
    launches where the Pallas kernel applies."""
    return tuple(dataclasses.replace(s, use_pallas=True) for s in stages)


def _rigid_inverse(t):
    """Inverse of a rigid 4x4 (R^T, -R^T p) — no linear solve."""
    r = t[:3, :3]
    p = t[:3, 3]
    return (
        jnp.eye(4, dtype=t.dtype)
        .at[:3, :3].set(r.T)
        .at[:3, 3].set(-r.T @ p)
    )


@partial(
    jax.jit,
    static_argnames=(
        "stages", "margin", "gate_radius", "gate_inlier_keep",
        "gate_rmse_blowup",
    ),
)
def _anchor_refine_map(
    fulls_all: Cloud,
    totals,
    stages,
    margin,
    gate_radius=0.03,
    gate_inlier_keep=0.95,
    gate_rmse_blowup=1.5,
):
    """Progressive map anchoring (RefineConfig.anchor_mode="map"): a
    local-map SLAM step for trajectories that rotate away from frame 0.

    Frames refine SEQUENTIALLY (lax.scan) against a growing fixed-
    capacity map holding every previously ACCEPTED frame's refined full
    cloud (frame 0 seeds it). Two properties the batched frame-0 anchor
    cannot provide:

      * every frame keeps full-overlap targets (its accepted
        predecessors are in the map), so the acceptance gate fires on
        alignment quality, not on lost frame-0 overlap;
      * each accepted correction carries onto the NEXT frame's start
        (``corr`` in the carry) — a drift correction at frame i moves
        frames i+1.. with it instead of leaving them on the drifted
        chain.

    The map is prefix-dense (contiguous appends at a carried offset;
    rejected frames write masked-out rows that the next accepted frame
    overwrites), so the NN sweep's dynamic live bound keeps early
    steps cheap.

    Acceptance mirrors _anchor_refine's overlap-aware gate (inlier keep
    + POINT-TO-PLANE residual margin + point-rmse blowup guard), not
    _refine_step's capped point mean: the stages minimize the plane
    residual and legitimately trade meaningless in-plane point distance
    for out-of-plane accuracy, so a point-distance gate rejects genuine
    improvements (measured: +10% capped point mean on a refine that
    moved the pose 4e-3 closer). Returns (totals', accepted[n-1])."""
    n, m = fulls_all.valid.shape
    dtype = fulls_all.xyz.dtype
    cap = n * m

    zeros_rgb = jnp.zeros((cap, 3), dtype)
    map_xyz = jnp.zeros((cap, 3), dtype).at[:m].set(fulls_all.xyz[0])
    map_nrm = jnp.zeros((cap, 3), dtype).at[:m].set(fulls_all.normal[0])
    map_val = jnp.zeros((cap,), bool).at[:m].set(fulls_all.valid[0])
    # Colored stages need the map to carry per-point intensity (rgb) and
    # the gradient field; plain-geometry runs keep the lean 3-buffer
    # carry (the choice is static — cgrad presence and stage configs).
    use_color = fulls_all.cgrad is not None and any(
        s.color_weight > 0.0 for s in stages
    )
    if use_color:
        map_rgb = jnp.zeros((cap, 3), dtype).at[:m].set(fulls_all.rgb[0])
        map_cg = jnp.zeros((cap, 3), dtype).at[:m].set(fulls_all.cgrad[0])

    rest = jax.tree.map(lambda x: x[1:], fulls_all)

    pallas_ok = stages[-1].use_pallas

    def gate_stats(c: Cloud, tgt: Cloud):
        d2, idx = _nn_sweep(c.xyz, c.valid, tgt.xyz, tgt.valid, pallas_ok)
        inl = c.valid & jnp.isfinite(d2) & (d2 < gate_radius * gate_radius)
        cnt = jnp.sum(inl.astype(dtype))
        msq = jnp.sum(jnp.where(inl, d2, 0.0)) / jnp.maximum(cnt, 1.0)
        msq = jnp.where(cnt > 0, msq, jnp.asarray(jnp.inf, dtype))
        q = jnp.take(tgt.xyz, idx, axis=0)
        nq = jnp.take(tgt.normal, idx, axis=0)
        rr = jnp.sum((c.xyz - q) * nq, axis=-1)
        pmsq = jnp.sum(jnp.where(inl, rr * rr, 0.0)) / jnp.maximum(cnt, 1.0)
        pmsq = jnp.where(cnt > 0, pmsq, jnp.asarray(jnp.inf, dtype))
        return cnt, msq, pmsq

    def step(carry, inp):
        if use_color:
            mx, mn, mv, mrgb, mcg, off, corr = carry
        else:
            mx, mn, mv, off, corr = carry
            mrgb, mcg = zeros_rgb, None
        src, total = inp
        base_t = corr @ total
        tgt = Cloud(mx, mrgb, mv, normal=mn, cgrad=mcg)
        src_t = apply_transform_cloud(base_t, src)
        _, rel, cur = _run_stages(tgt, src_t, stages)
        nb, rb, pb = gate_stats(src_t, tgt)
        na, ra, pa = gate_stats(cur, tgt)
        accepted = (
            (na >= nb * gate_inlier_keep)
            & (pa <= pb * margin)
            & (ra <= rb * gate_rmse_blowup)
        )
        total_new = jnp.where(accepted, rel @ base_t, base_t)
        corr_new = jnp.where(
            accepted, total_new @ _rigid_inverse(total), corr
        )
        placed = apply_transform_cloud(total_new, src)
        mx2 = jax.lax.dynamic_update_slice(mx, placed.xyz, (off, 0))
        mn2 = jax.lax.dynamic_update_slice(mn, placed.normal, (off, 0))
        mv2 = jax.lax.dynamic_update_slice(
            mv, placed.valid & accepted, (off,)
        )
        off2 = off + jnp.where(accepted, m, 0)
        if use_color:
            mrgb2 = jax.lax.dynamic_update_slice(mrgb, placed.rgb, (off, 0))
            mcg2 = jax.lax.dynamic_update_slice(mcg, placed.cgrad, (off, 0))
            return (
                (mx2, mn2, mv2, mrgb2, mcg2, off2, corr_new),
                (total_new, accepted),
            )
        return (mx2, mn2, mv2, off2, corr_new), (total_new, accepted)

    if use_color:
        init = (
            map_xyz, map_nrm, map_val, map_rgb, map_cg, jnp.int32(m),
            jnp.eye(4, dtype=dtype),
        )
    else:
        init = (
            map_xyz, map_nrm, map_val, jnp.int32(m), jnp.eye(4, dtype=dtype)
        )
    _, (totals_new, accepted) = jax.lax.scan(step, init, (rest, totals))
    return totals_new, accepted


@partial(
    jax.jit,
    static_argnames=(
        "edge_cfg", "leaf", "cap", "with_full", "dec", "purity", "color",
    ),
)
def _phase1_prepare(
    stacked: OrganizedCloud, edge_cfg, leaf, cap, with_full, dec=1,
    purity=0.0, color=False,
):
    """Batched phase 1: edge clouds (and, when ``with_full``, the refine
    stage's full downsampled clouds) for all frames in one launch."""

    def one(oc):
        e = extract_edge_features(oc, edge_cfg)
        if with_full:
            return e, _prepare_full_down(
                oc, edge_cfg, leaf, cap, dec, purity, color
            )
        return e, ()

    return jax.vmap(one)(stacked)


@partial(
    jax.jit,
    static_argnames=("edge_cfg", "leaf", "cap", "dec", "purity", "color"),
)
def _prepare_full_down(
    oc: OrganizedCloud, edge_cfg, leaf, cap, dec=1, purity=0.0, color=False
) -> Cloud:
    """Phase-1 prep for the refine stage: attach integral-image normals to
    the full organized cloud and voxel-downsample (means of coplanar
    points stay on the plane). Under jit the normal estimation CSEs with
    the edge extractor's own estimate_normals call.

    ``dec`` > 1 keeps every dec-th pixel per axis before the downsample
    (RefineConfig.decimate): the voxel means average a uniform subsample
    instead of every pixel, cutting the sort+scatter traffic dec^2-fold.
    Normals still come from the full-resolution image (they CSE with the
    edge path), so decimation does not coarsen the gradients.

    ``color`` additionally computes the tangent-plane intensity gradient
    field (ops/colorgrad.py) in image space — three shifted differences
    plus a closed-form 3x3 solve per pixel, fused into this program —
    and carries its voxel means on ``Cloud.cgrad`` for the colored-ICP
    residual (RefineConfig.color)."""
    nrm, nv = estimate_normals(oc, edge_cfg)
    xyz, rgb = oc.xyz, oc.rgb
    valid = oc.valid & nv
    cg = None
    if color:
        from rspc_tpu.ops.colorgrad import color_gradients

        cg = color_gradients(oc, nrm, nv)
    if dec > 1:
        xyz = xyz[::dec, ::dec]
        rgb = rgb[::dec, ::dec]
        valid = valid[::dec, ::dec]
        nrm = nrm[::dec, ::dec]
        if cg is not None:
            cg = cg[::dec, ::dec]
    m = xyz.shape[0] * xyz.shape[1]
    flat = Cloud(
        xyz.reshape(m, 3),
        rgb.reshape(m, 3),
        valid.reshape(m),
        normal=nrm.reshape(m, 3),
        cgrad=None if cg is None else cg.reshape(m, 3),
    )
    return voxel_downsample(flat, leaf, cap, min_normal_purity=purity)


@jax.jit
def _assemble_global(originals, totals, converged):
    """Global cloud from per-frame originals + composed transforms.

    Kept OUT of the frame scan (the scan only needs the transforms): each
    frame occupies a static slice of the output, so assembly is a batched
    transform + concatenate — no scatter, no re-layout of the stacked
    originals (stacking [n, 307200, 3] forced a ~1 s transposing copy)."""
    eye = jnp.eye(4, dtype=totals.dtype)
    all_t = jnp.concatenate([eye[None], totals], axis=0)
    conv_all = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), converged], axis=0
    )
    moved = [
        apply_transform_cloud(all_t[i], c) for i, c in enumerate(originals)
    ]
    return Cloud(
        xyz=jnp.concatenate([m.xyz for m in moved], axis=0),
        rgb=jnp.concatenate([m.rgb for m in moved], axis=0),
        valid=jnp.concatenate(
            [m.valid & conv_all[i] for i, m in enumerate(moved)], axis=0
        ),
    )


@partial(
    jax.jit,
    static_argnames=(
        "use_ndt",
        "ndt_cfg",
        "icp_cfg",
        "refine_stages",
        "leaf",
        "voxel_cap",
        "target_cap",
        "refine_target_cap",
        "coarse_guard_cap",
        "refine_margin",
        "warm_start",
        "rescue_thresh",
        "rescue_cap",
        "rescue_iters",
    ),
)
def _chain_scan(
    edges_all,      # Cloud, leaves stacked [n, edge_cap, ...]
    full_all,       # Cloud with normals stacked [n, full_cap, ...] or None
    guesses,        # f32[n-1, 4, 4]
    use_ndt: bool,
    ndt_cfg,
    icp_cfg,
    refine_stages,
    leaf: float,
    voxel_cap: int,
    target_cap: int,
    refine_target_cap: int,
    coarse_guard_cap: float,
    refine_margin: float = 0.75,
    warm_start: bool = False,
    rescue_thresh: float = 0.0,
    rescue_cap: float = 0.1,
    rescue_iters: int = 8,
):
    """The whole phase-2 frame chain as ONE compiled program.

    The reference's chain is inherently sequential (each pair aligns
    against the accumulated target, SURVEY.md §3.1), but nothing about it
    needs the host: with fixed-capacity target/global buffers every
    iteration has identical shapes, so the loop is a ``lax.scan`` whose
    carry is (edge target, refine target, global cloud). This removes the
    per-frame dispatch latency and host syncs of the Python loop — on the
    axon TPU tunnel each avoided round trip is ~25 ms, which at 10 frames
    exceeds the entire compute budget of the north-star benchmark.

    The per-frame convergence gate (icp_edge_based_registration.hpp:
    113-123: a non-converged frame is simply not merged) becomes a
    ``jnp.where`` select over the carry.
    """
    refine = full_all is not None

    edges_down = jax.vmap(lambda c: voxel_downsample(c, leaf, voxel_cap))(
        edges_all
    )
    first = lambda t: jax.tree.map(lambda x: x[0], t)
    rest = lambda t: jax.tree.map(lambda x: x[1:], t)

    target0 = first(edges_down)
    target = merge_append(
        Cloud.empty(target_cap, with_normal=target0.normal is not None),
        target0,
    )
    if use_ndt:
        # Incremental dense NDT grid: seeded from frame 0, then each
        # converged frame's aligned edges are scatter-added — voxel
        # moments are additive, so this equals rebuilding from the whole
        # accumulated target (which cost a 10x-larger sort per pair).
        # Only the raw moments ride in the carry; the derived Gaussians
        # are (re)finalized inside the body.
        origin = ndt_grid_origin(target0, ndt_cfg)
        moments = ndt_grid_update_moments(
            ndt_grid_init(origin, ndt_cfg).moments, origin, target0, ndt_cfg
        )
    else:
        origin = ()
        moments = ()
    if refine:
        target_full = merge_append(
            Cloud.empty(
                refine_target_cap,
                with_normal=True,
                with_cgrad=full_all.cgrad is not None,
            ),
            first(full_all),
        )
    else:
        target_full = ()

    coarse_icp_cfg = dataclasses.replace(icp_cfg, compute_fitness=False)

    def body(carry, x):
        target, moments, target_full, prev_total, c_local = carry
        edge_i, full_i, guess, rel_g = x

        raw_guess = guess
        if warm_start:
            # Constant-velocity warm start (PipelineConfig
            # .coarse_warm_start): predict this pair's absolute transform
            # as (previous achieved transform) o (this pair's raw guess
            # INCREMENT) o (carried LOCAL correction). The local
            # correction c = inv(rel_g) @ inv(T_prev) @ T_cur is the
            # per-frame motion the guess missed, expressed in the source
            # frame — under constant motion the prediction is exact.
            # (The earlier global-frame form ``corr @ guess`` could only
            # express accumulated-rotation drift: a per-frame LOCAL
            # translation — the partial-overlap scenario — stayed
            # uncorrectable at |t| per pair no matter how well the
            # previous pair ended.)
            guess = prev_total @ rel_g @ c_local
        if use_ndt:
            grid = ndt_grid_from_moments(moments, origin, ndt_cfg)
            coarse = ndt_align(edge_i, grid, ndt_cfg, guess)
        else:
            coarse = icp_align(edge_i, target, coarse_icp_cfg, guess)
        if coarse_guard_cap > 0.0:
            # Hypothesis pool: the coarse result, the (possibly warmed)
            # guess it started from, and under warm_start additionally
            # the RAW guess. The warmed guess must stay in the pool —
            # the coarse stage can diverge FROM a good constant-velocity
            # prediction into a local optimum that still beats the raw
            # guess (measured on partial overlap: warmed 2.8 cm off /
            # score 4.7e-3, NDT result 21 cm off / score 5.1e-3, raw
            # 24 cm off / score 9.8e-3 — a raw-only fallback keeps the
            # bad NDT pose). The raw guess stays as the
            # correction-independent escape hatch: a poisoned carry
            # loses the score vote per-pair instead of compounding.
            hyps = [coarse.transform, guess]
            w = None
            if warm_start:
                hyps.append(raw_guess)
                w = (1.0, _WARM_GUARD_MARGIN, 1.0)
            coarse = dataclasses.replace(
                coarse,
                transform=_guard_best(
                    hyps, _stride_cloud(edge_i, _GUARD_MAX_POINTS),
                    target, coarse_guard_cap, w,
                ),
            )
        aligned = apply_transform_cloud(coarse.transform, edge_i)
        fine = icp_align(aligned, target, icp_cfg)
        if rescue_thresh > 0.0:
            fine_aligned = apply_transform_cloud(fine.transform, aligned)
            fine, _ = _maybe_rescue(
                fine, fine_aligned, target, icp_cfg, rescue_thresh,
                rescue_cap, rescue_iters,
            )
        t2 = fine.transform @ coarse.transform

        if refine:
            ref, _, total = _refine_step(
                target_full, full_i, t2, refine_stages, refine_margin
            )
        else:
            ref = ()
            total = t2

        conv = fine.converged
        edge_total = apply_transform_cloud(total, edge_i)
        # gates fold into the scatters: not-converged frames append
        # nothing / add zero moments, keeping every carry in place.
        # (A _block_append variant was measured here: the sparser target
        # blocks cost MORE in NN sweep coverage than the compacting
        # scatter they replace — the dense-prefix target keeps the NN
        # kernel's live bound tight. The incremental full-cloud chain has
        # the opposite trade: see _incremental_scan.)
        target = merge_append(target, edge_total, gate=conv)
        if use_ndt:
            moments = ndt_grid_update_moments(
                moments, origin, edge_total, ndt_cfg, gate=conv
            )
        if refine:
            target_full = merge_append(
                target_full,
                apply_transform_cloud(total, full_i),
                gate=conv,
            )
        if warm_start:
            # The carried local correction comes from the achieved FULL
            # pair transform (coarse + fine + rescue + refine) — carrying
            # only the coarse transform was measured to defeat the rescue
            # stage: a rescued pair's fix never reached the next pair's
            # start, which then sat beyond the rescue cap's own basin.
            # Only a pair whose fine ICP converged may update the local
            # correction; a non-converged pair's is untrusted (the
            # guard's raw-guess fallback stays the escape hatch). The
            # prediction anchor prev_total however updates UNGATED:
            # ``total`` is the chain's best absolute estimate even for
            # non-converged pairs (edge-starved scenes converge 0/9 yet
            # carry accurate totals — gating it froze prev_total at
            # identity and collapsed every prediction to a single-frame
            # increment, measured 3 orders of magnitude off on the
            # low-texture scenario).
            new_c = _rigid_inverse(rel_g) @ _rigid_inverse(prev_total) @ total
            c_local = jnp.where(conv, new_c, c_local)
            prev_total = total
        return (
            (target, moments, target_full, prev_total, c_local),
            (coarse, fine, ref, total),
        )

    if warm_start:
        # per-pair guess increments rel_g[i] = inv(G[i-1]) @ G[i] (G[-1]
        # = identity): the raw guesses are absolute frame->frame-0
        # estimates, the warm start needs their per-frame motion
        inv_prev = jax.vmap(_rigid_inverse)(guesses[:-1])
        rel_guesses = jnp.concatenate(
            [
                guesses[:1],
                jnp.einsum("nij,njk->nik", inv_prev, guesses[1:]),
            ],
            axis=0,
        )
    else:
        rel_guesses = guesses  # unused by the body
    xs = (
        rest(edges_down),
        rest(full_all) if refine else (),  # () scans as an empty pytree
        guesses,
        rel_guesses,
    )
    eye4 = jnp.eye(4, dtype=guesses.dtype)
    (target, moments, target_full, _, _), ys = jax.lax.scan(
        body, (target, moments, target_full, eye4, eye4), xs
    )
    coarse_s, fine_s, ref_s, totals = ys
    return {
        "target": target,
        "target_full": target_full,
        "coarse": coarse_s,
        "fine": fine_s,
        "refine": ref_s,
        "totals": totals,
        "edges_down0": target0,
    }


@partial(
    jax.jit,
    static_argnames=(
        "edge_cfg",
        "use_ndt",
        "ndt_cfg",
        "icp_cfg",
        "refine_cfg",
        "leaf",
        "voxel_cap",
        "coarse_guard_cap",
        "warm_start",
        "rescue_thresh",
        "rescue_cap",
        "rescue_iters",
    ),
)
def _registration_fused(
    stacked: OrganizedCloud,   # [n, H, W, ...]
    guesses,                   # f32[n-1, 4, 4]
    edge_cfg,
    use_ndt: bool,
    ndt_cfg,
    icp_cfg,
    refine_cfg,
    leaf: float,
    voxel_cap: int,
    coarse_guard_cap: float,
    warm_start: bool = False,
    rescue_thresh: float = 0.0,
    rescue_cap: float = 0.1,
    rescue_iters: int = 8,
):
    """The ENTIRE registration — phase-1 feature extraction, the phase-2
    frame chain, anchor refinement, and global-cloud assembly — as ONE
    compiled program.

    Splitting these into separate jit calls costs a host round trip per
    stage; on the axon TPU tunnel each round trip carries multi-ten-ms
    latency and jitter, which at 4-5 stages rivals the whole device-side
    compute of the north-star workload. One program also lets XLA overlap
    independent pieces (e.g. later frames' phase-1 scatters with the
    first chain steps)."""
    r = refine_cfg
    feats, full = _phase1_prepare(
        stacked, edge_cfg, r.leaf_size, r.max_points, r.enabled, r.decimate,
        r.normal_purity, r.color,
    )
    return _registration_body(
        stacked,
        feats,
        full,
        guesses,
        use_ndt,
        ndt_cfg,
        icp_cfg,
        refine_cfg,
        leaf,
        voxel_cap,
        coarse_guard_cap,
        warm_start,
        rescue_thresh,
        rescue_cap,
        rescue_iters,
    )


@partial(
    jax.jit,
    static_argnames=(
        "use_ndt",
        "ndt_cfg",
        "icp_cfg",
        "refine_cfg",
        "leaf",
        "voxel_cap",
        "coarse_guard_cap",
        "warm_start",
        "rescue_thresh",
        "rescue_cap",
        "rescue_iters",
    ),
)
def _registration_body(
    stacked: OrganizedCloud,   # [n, H, W, ...]
    feats,                     # Cloud [n, edge_cap, ...] (phase-1 output)
    full,                      # Cloud [n, full_cap, ...] or () (phase-1)
    guesses,                   # f32[n-1, 4, 4]
    use_ndt: bool,
    ndt_cfg,
    icp_cfg,
    refine_cfg,
    leaf: float,
    voxel_cap: int,
    coarse_guard_cap: float,
    warm_start: bool = False,
    rescue_thresh: float = 0.0,
    rescue_cap: float = 0.1,
    rescue_iters: int = 8,
):
    """Everything after phase-1: the frame chain, anchor refinement, and
    global assembly. Factored out of :func:`_registration_fused` so
    callers with their own feature frontend (pre-extracted edge clouds,
    a different detector) can enter the pipeline at the chain boundary.

    Do NOT vmap this over a sequence batch: a batch axis re-tiles the
    [N, 3] geometry buffers (the 3-wide coordinate axis lands in the
    128-lane tile) and masks every while-loop carry per iteration —
    measured 13x device-time inflation on the north-star workload.
    Batch sequences with ``lax.map`` / ``shard_map`` instead
    (``parallel/chain.py::batched_registration``)."""
    n = stacked.xyz.shape[0]
    r = refine_cfg
    out = _chain_scan(
        feats,
        full if (r.enabled and r.chain) else None,
        guesses,
        use_ndt,
        ndt_cfg,
        icp_cfg,
        r.stages,
        leaf,
        voxel_cap,
        voxel_cap * n,
        r.max_points * n,
        coarse_guard_cap,
        r.accept_margin,
        warm_start,
        rescue_thresh,
        rescue_cap,
        rescue_iters,
    )
    totals = out["totals"]
    accepted = ()
    if r.enabled and r.anchor_to_first:
        if r.anchor_mode == "map":
            totals, accepted = _anchor_refine_map(
                full, totals, _map_anchor_stages(r.anchor_stages),
                r.map_accept_margin, r.gate_radius, r.gate_inlier_keep,
                r.gate_rmse_blowup,
            )
        else:
            first = jax.tree.map(lambda x: x[0], full)
            restf = jax.tree.map(lambda x: x[1:], full)
            totals, accepted = _anchor_refine(
                first, restf, totals, r.anchor_stages, 1.0,
                r.gate_radius, r.gate_inlier_keep, r.gate_rmse_blowup,
                max_points=r.anchor_max_points,
            )
    if r.enabled and r.pose_graph and n >= 3:
        totals = _pose_graph_refine(
            full, totals, r.anchor_stages, r.pose_graph_skips,
            r.gate_radius, max_points=r.anchor_max_points,
        )
    out["totals"] = totals
    out["anchor_accepted"] = accepted
    out["features"] = feats
    out["full_down"] = full

    # global cloud from the already-stacked originals: one batched
    # transform over [n, H*W, 3], gated per frame by convergence. A frame
    # the anchor gate ACCEPTED is verified-aligned against frame 0 even
    # if its fine edge-ICP reported non-convergence (edge-starved scenes:
    # the robustness matrix's low-texture room converges 0/9 on edges yet
    # lands at 3.5e-4 after anchoring) — merge it rather than drop it.
    merge_ok = out["fine"].converged
    if not isinstance(accepted, tuple):
        merge_ok = merge_ok | accepted
    hw = stacked.xyz.shape[1] * stacked.xyz.shape[2]
    eye = jnp.eye(4, dtype=totals.dtype)
    all_t = jnp.concatenate([eye[None], totals], axis=0)
    conv_all = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), merge_ok], axis=0
    )
    xyz = jax.vmap(apply_transform)(all_t, stacked.xyz.reshape(n, hw, 3))
    out["global"] = Cloud(
        xyz=xyz.reshape(n * hw, 3),
        rgb=stacked.rgb.reshape(n * hw, 3),
        valid=(stacked.valid.reshape(n, hw) & conv_all[:, None]).reshape(
            n * hw
        ),
    )
    return out


class _EdgeBasedRegistration(TwoPhaseRegistrationScheme):
    """Shared skeleton of the ICP- and NDT-based edge schemes."""

    use_ndt_coarse = False
    saves_edge_pcds = False

    def __init__(
        self,
        thetas: Optional[np.ndarray] = None,
        rads: Optional[float] = None,
        config: PipelineConfig = PipelineConfig(),
        dataset_dir: Optional[str] = None,
    ):
        # ctor overloads mirror the reference (no-guess / IMU / user rads)
        self.config = config
        self.use_imu = thetas is not None
        self.thetas = (
            jnp.asarray(np.asarray(thetas, np.float32)) if thetas is not None else None
        )
        self.rads = float(rads) if rads is not None else config.default_rads
        self.dataset_dir = dataset_dir
        self.results: List[Tuple[object, ICPResult]] = []  # (coarse, fine) per frame
        self.refine_results: List[ICPResult] = []
        self.total_transforms = None  # [n-1,4,4] composed per-frame transforms
        self._full_down: Optional[List[Cloud]] = None

    def registration(self, clouds: Sequence) -> Cloud:
        r = self.config.refine
        self._full_down = None
        if r.enabled and not all(
            isinstance(c, OrganizedCloud) for c in clouds
        ):
            raise ValueError(
                "the refine stage needs organized input clouds "
                "(normal estimation is image-shaped)"
            )
        if (
            self.config.use_scan
            and len(clouds) >= 2
            and all(isinstance(c, OrganizedCloud) for c in clouds)
            and len({(c.height, c.width) for c in clouds}) == 1
        ):
            return self._registration_fused_path(clouds)
        features = self.batch_extract_features(clouds)
        if features is None:
            features = [self.extract_features(c) for c in clouds]
        if r.enabled and self._full_down is None:
            self._full_down = [
                _prepare_full_down(
                    c, self.config.edge, r.leaf_size, r.max_points,
                    r.decimate, r.normal_purity, r.color,
                )
                for c in clouds
            ]
        feature_clouds = [
            (f, _as_unorganized(c)) for f, c in zip(features, clouds)
        ]
        return self.global_registration(feature_clouds)

    def _registration_fused_path(self, clouds: Sequence) -> Cloud:
        """Uniform organized batch: run the whole pipeline as one program
        (``_registration_fused``) — no per-stage host round trips."""
        cfg = self.config
        r = cfg.refine
        n = len(clouds)
        if self.use_imu:
            assert self.thetas.shape[0] == n, "thetas/clouds size mismatch"
        stacked = OrganizedCloud(
            xyz=jnp.stack([c.xyz for c in clouds]),
            rgb=jnp.stack([c.rgb for c in clouds]),
            valid=jnp.stack([c.valid for c in clouds]),
        )
        out = _registration_fused(
            stacked,
            self._guesses(n),
            cfg.edge,
            self.use_ndt_coarse,
            cfg.ndt,
            cfg.icp,
            r,
            cfg.voxel.leaf_size,
            cfg.voxel.max_points,
            cfg.coarse_guard_cap,
            cfg.coarse_warm_start,
            cfg.rescue_inlier_frac,
            cfg.rescue_cap,
            cfg.rescue_iterations,
        )
        # Per-frame diagnostics (results / refine_results / _full_down)
        # materialize LAZILY on first attribute access: slicing the
        # stacked outputs into per-frame pytrees dispatches ~100 tiny
        # device ops, each paying tunnel latency — deferring them keeps
        # the timed registration path at one program launch.
        self._fused_out = (out, n)
        self._results = None
        self._refine_results = None
        self._full_down = None
        if r.enabled and r.anchor_to_first:
            self.anchor_accepted = out["anchor_accepted"]
        self.total_transforms = out["totals"]
        self._dump_edges(
            [out["edges_down0"]]
            + [
                jax.tree.map(lambda x: x[i], out["features"])
                for i in range(1, n)
            ]
            if self.saves_edge_pcds and self.dataset_dir is not None
            else [],
            out["target"],
        )
        return out["global"]

    def _materialize_fused(self):
        out, n = self._fused_out
        r = self.config.refine
        pick = lambda t, i: jax.tree.map(lambda x: x[i], t)
        if self._results is None:
            self._results = [
                (pick(out["coarse"], i), pick(out["fine"], i))
                for i in range(n - 1)
            ]
            self._refine_results = (
                [pick(out["refine"], i) for i in range(n - 1)]
                if (r.enabled and r.chain)
                else []
            )
            if r.enabled:
                self._full_down = [
                    pick(out["full_down"], i) for i in range(n)
                ]

    def _settle_fused(self):
        """Materialize any pending fused output, then drop the cache —
        called by both setters so an explicit assignment can never be
        overwritten by later lazy materialization, regardless of which
        attribute is assigned first."""
        if getattr(self, "_fused_out", None) is not None:
            if getattr(self, "_results", None) is None:
                self._materialize_fused()
            self._fused_out = None

    @property
    def results(self):
        if getattr(self, "_fused_out", None) is not None:
            self._materialize_fused()
        return self._results

    @results.setter
    def results(self, v):
        self._settle_fused()
        self._results = v

    @property
    def refine_results(self):
        if getattr(self, "_fused_out", None) is not None:
            self._materialize_fused()
        return self._refine_results

    @refine_results.setter
    def refine_results(self, v):
        self._settle_fused()
        self._refine_results = v

    def extract_features(self, cloud):
        if not isinstance(cloud, OrganizedCloud):
            raise ValueError(
                "edge-based registration needs organized clouds "
                "(PCL OrganizedEdgeFromRGBNormals requires an organized input)"
            )
        return extract_edge_features(cloud, self.config.edge)

    def batch_extract_features(self, clouds):
        """Phase 1 vmapped over frames when all clouds share one shape —
        one device launch for the whole sequence instead of N (the frames
        are independent; this is the per-frame data parallelism SURVEY.md
        §2c identifies). When the refine stage is on, the same launch also
        produces the full downsampled clouds with normals (the normal
        image CSEs with the edge detector's own estimate)."""
        if not all(isinstance(c, OrganizedCloud) for c in clouds):
            return None
        shapes = {(c.height, c.width) for c in clouds}
        if len(shapes) != 1 or len(clouds) < 2:
            return None
        r = self.config.refine
        stacked = OrganizedCloud(
            xyz=jnp.stack([c.xyz for c in clouds]),
            rgb=jnp.stack([c.rgb for c in clouds]),
            valid=jnp.stack([c.valid for c in clouds]),
        )
        batched, full = _phase1_prepare(
            stacked, self.config.edge, r.leaf_size, r.max_points, r.enabled,
            r.decimate, r.normal_purity, r.color,
        )
        idx = lambda t, i: jax.tree.map(lambda x: x[i], t)
        if r.enabled:
            self._full_down = [idx(full, i) for i in range(len(clouds))]
        return [idx(batched, i) for i in range(len(clouds))]

    def _guesses(self, n: int):
        """Stacked [n-1,4,4] initial guesses. The static-guess accumulator
        advances for every frame, converged or not (reference :98-101), so
        all guesses are computable up front in both modes.

        Static guesses are pure constants — built host-side in numpy (one
        transfer, zero device dispatches); IMU guesses are one vmapped
        launch over the rebased thetas."""
        if not self.use_imu:
            acc = self.rads * np.arange(1, n, dtype=np.float64)
            c, s = np.cos(acc), np.sin(acc)
            t = np.tile(np.eye(4, dtype=np.float32), (n - 1, 1, 1))
            t[:, 0, 0] = c
            t[:, 0, 2] = s
            t[:, 2, 0] = -s
            t[:, 2, 2] = c
            return jnp.asarray(t)
        return _imu_guesses(self.thetas, self.use_ndt_coarse)

    def _dump_edges(self, edges: List[Cloud], target: Cloud | None):
        if not (self.saves_edge_pcds and self.dataset_dir is not None):
            return
        from rspc_tpu.io.pcd import save_pcd

        os.makedirs(self.dataset_dir, exist_ok=True)
        for i, e in enumerate(edges):
            save_pcd(
                os.path.join(self.dataset_dir, f"edge-{i}.pcd"),
                e,
                keep_invalid=False,
            )
        if target is not None:
            save_pcd(
                os.path.join(self.dataset_dir, "edge_cloud.pcd"),
                target,
                keep_invalid=False,
            )

    def global_registration(self, clouds: List[Tuple[Cloud, Cloud]]) -> Cloud:
        cfg = self.config
        n = len(clouds)
        if self.use_imu:
            assert self.thetas.shape[0] == n, "thetas/clouds size mismatch"

        edges = [c[0] for c in clouds]
        originals = [c[1] for c in clouds]

        uniform = (
            n >= 2
            and len({e.capacity for e in edges}) == 1
            and len({o.capacity for o in originals}) == 1
            and len({e.normal is None for e in edges}) == 1
        )
        if cfg.use_scan and uniform:
            return self._global_registration_scan(edges, originals)
        return self._global_registration_loop(edges, originals)

    def _global_registration_scan(
        self, edges: List[Cloud], originals: List[Cloud]
    ) -> Cloud:
        cfg = self.config
        n = len(edges)
        refine_on = cfg.refine.enabled
        chain_refine = refine_on and cfg.refine.chain
        stack = lambda lst: jax.tree.map(lambda *x: jnp.stack(x), *lst)

        out = _chain_scan(
            stack(edges),
            stack(self._full_down) if chain_refine else None,
            self._guesses(n),
            self.use_ndt_coarse,
            cfg.ndt,
            cfg.icp,
            cfg.refine.stages,
            cfg.voxel.leaf_size,
            cfg.voxel.max_points,
            cfg.voxel.max_points * n,
            cfg.refine.max_points * n,
            cfg.coarse_guard_cap,
            cfg.refine.accept_margin,
            cfg.coarse_warm_start,
            cfg.rescue_inlier_frac,
            cfg.rescue_cap,
            cfg.rescue_iterations,
        )

        pick = lambda t, i: jax.tree.map(lambda x: x[i], t)
        self.results = [
            (pick(out["coarse"], i), pick(out["fine"], i))
            for i in range(n - 1)
        ]
        self.refine_results = (
            [pick(out["refine"], i) for i in range(n - 1)]
            if chain_refine
            else []
        )
        totals = out["totals"]
        if refine_on and cfg.refine.anchor_to_first and n >= 2:
            if cfg.refine.anchor_mode == "map":
                totals, self.anchor_accepted = _anchor_refine_map(
                    stack(self._full_down),
                    totals,
                    _map_anchor_stages(cfg.refine.anchor_stages),
                    cfg.refine.map_accept_margin,
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                )
            else:
                totals, self.anchor_accepted = _anchor_refine(
                    self._full_down[0],
                    stack(self._full_down[1:]),
                    totals,
                    cfg.refine.anchor_stages,
                    1.0,  # inlier gate: monotone rmse bound
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                    max_points=cfg.refine.anchor_max_points,
                )
        if refine_on and cfg.refine.pose_graph and n >= 3:
            totals = _pose_graph_refine(
                stack(self._full_down), totals, cfg.refine.anchor_stages,
                cfg.refine.pose_graph_skips, cfg.refine.gate_radius,
                max_points=cfg.refine.anchor_max_points,
            )
        self.total_transforms = totals
        self._dump_edges(
            [out["edges_down0"]] + list(edges[1:]), out["target"]
        )
        merge_ok = out["fine"].converged
        if getattr(self, "anchor_accepted", None) is not None and not (
            isinstance(self.anchor_accepted, tuple)
        ):
            # anchor-accepted frames are verified-aligned; merge them
            # even when the fine edge-ICP was starved (see _chain_fused)
            merge_ok = merge_ok | self.anchor_accepted
        return _assemble_global(originals, totals, merge_ok)

    def _global_registration_loop(
        self, edges: List[Cloud], originals: List[Cloud]
    ) -> Cloud:
        cfg = self.config
        n = len(edges)
        refine_on = cfg.refine.enabled
        voxel_cap = cfg.voxel.max_points
        target_cap = voxel_cap * n
        global_cap = sum(o.capacity for o in originals)
        guesses = self._guesses(n)

        # target starts as the voxel-downsampled edges of frame 0
        # (downsampled IN PLACE in the reference — edge-0.pcd dumps the
        # downsampled cloud; reproduced below)
        target0 = voxel_downsample(edges[0], cfg.voxel.leaf_size, voxel_cap)
        target = merge_append(
            Cloud.empty(target_cap, with_normal=target0.normal is not None),
            target0,
        )
        global_cloud = merge_append(Cloud.empty(global_cap), originals[0])
        edges = [target0] + list(edges[1:])
        if refine_on:
            target_full = merge_append(
                Cloud.empty(cfg.refine.max_points * n, with_normal=True),
                self._full_down[0],
            )

        self._dump_edges(edges, None)

        self.results = []
        self.refine_results = []
        totals = []
        eye4 = jnp.eye(4, dtype=jnp.float32)
        prev_total, c_local = eye4, eye4
        for idx in range(1, n):
            raw_guess = guess = guesses[idx - 1]
            if cfg.coarse_warm_start:
                # constant-velocity warm start — see _chain_scan body
                rel_g = (
                    guesses[0]
                    if idx == 1
                    else _rigid_inverse(guesses[idx - 2]) @ guesses[idx - 1]
                )
                guess = prev_total @ rel_g @ c_local
            fb = raw_guess if cfg.coarse_warm_start else None
            rescue_kw = dict(
                rescue_thresh=cfg.rescue_inlier_frac,
                rescue_cap=cfg.rescue_cap,
                rescue_iters=cfg.rescue_iterations,
            )
            if self.use_ndt_coarse:
                coarse, fine, fine_aligned = _ndt_pair_step(
                    target, edges[idx], guess, cfg.ndt, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap, cfg.coarse_guard_cap,
                    guard_fallback=fb, **rescue_kw,
                )
            else:
                coarse, fine, fine_aligned = _icp_pair_step(
                    target, edges[idx], guess, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap, cfg.coarse_guard_cap,
                    guard_fallback=fb, **rescue_kw,
                )
            self.results.append((coarse, fine))
            total = fine.transform @ coarse.transform
            if refine_on:
                ref, accepted, total = _refine_pair_step(
                    target_full, self._full_down[idx], total,
                    cfg.refine.stages, cfg.refine.accept_margin,
                )
                self.refine_results.append(ref)
                delta = jnp.where(
                    accepted, ref.transform, jnp.eye(4, dtype=total.dtype)
                )
                fine_aligned = apply_transform_cloud(delta, fine_aligned)
            if cfg.coarse_warm_start:
                # local correction gated on convergence, prediction
                # anchor ungated (see _chain_scan)
                if bool(fine.converged):
                    c_local = (
                        _rigid_inverse(rel_g) @ _rigid_inverse(prev_total)
                        @ total
                    )
                prev_total = total
            totals.append(total)
            if bool(fine.converged):
                transformed = apply_transform_cloud(total, originals[idx])
                target = merge_append(target, fine_aligned)
                if refine_on:
                    target_full = merge_append(
                        target_full,
                        apply_transform_cloud(total, self._full_down[idx]),
                    )
                global_cloud = merge_append(global_cloud, transformed)

        totals_arr = jnp.stack(totals) if totals else None
        if (
            refine_on
            and cfg.refine.anchor_to_first
            and totals_arr is not None
        ):
            if cfg.refine.anchor_mode == "map":
                totals_arr, self.anchor_accepted = _anchor_refine_map(
                    jax.tree.map(
                        lambda *x: jnp.stack(x), *self._full_down
                    ),
                    totals_arr,
                    _map_anchor_stages(cfg.refine.anchor_stages),
                    cfg.refine.map_accept_margin,
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                )
            else:
                totals_arr, self.anchor_accepted = _anchor_refine(
                    self._full_down[0],
                    jax.tree.map(
                        lambda *x: jnp.stack(x), *self._full_down[1:]
                    ),
                    totals_arr,
                    cfg.refine.anchor_stages,
                    1.0,  # inlier gate: monotone rmse bound
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                    max_points=cfg.refine.anchor_max_points,
                )
        if (
            refine_on
            and cfg.refine.pose_graph
            and totals_arr is not None
            and n >= 3
        ):
            totals_arr = _pose_graph_refine(
                jax.tree.map(lambda *x: jnp.stack(x), *self._full_down),
                totals_arr,
                cfg.refine.anchor_stages,
                cfg.refine.pose_graph_skips,
                cfg.refine.gate_radius,
                max_points=cfg.refine.anchor_max_points,
            )
        self.total_transforms = totals_arr

        if self.saves_edge_pcds and self.dataset_dir is not None:
            from rspc_tpu.io.pcd import save_pcd

            save_pcd(
                os.path.join(self.dataset_dir, "edge_cloud.pcd"),
                target,
                keep_invalid=False,
            )
        if refine_on and cfg.refine.anchor_to_first and totals_arr is not None:
            # anchored transforms supersede the in-loop merges;
            # anchor-accepted frames merge even if fine edge-ICP starved
            # (see _chain_fused)
            conv = jnp.asarray(
                [bool(f.converged) for _, f in self.results]
            )
            if not isinstance(self.anchor_accepted, tuple):
                conv = conv | jnp.asarray(self.anchor_accepted)
            return _assemble_global(originals, totals_arr, conv)
        return global_cloud


class ICPEdgeBasedRegistration(_EdgeBasedRegistration):
    """Coarse ICP + fine ICP on RGB-edge clouds; used by ``--all``
    (reference C4). Saves edge-{i}.pcd / edge_cloud.pcd side outputs when a
    dataset_dir is given (icp_edge_based_registration.hpp:66-69,126)."""

    use_ndt_coarse = False
    saves_edge_pcds = True


class NDTEdgeBasedRegistration(_EdgeBasedRegistration):
    """NDT coarse + fine ICP; used by ``--registration`` (reference C5).
    Does not save edge pcds."""

    use_ndt_coarse = True
    saves_edge_pcds = False


@partial(jax.jit, static_argnames=("icp_cfg", "leaf", "voxel_cap"))
def _incremental_step(target: Cloud, cloud: Cloud, icp_cfg, leaf, voxel_cap):
    src_down = voxel_downsample(cloud, leaf, voxel_cap)
    res = icp_align(src_down, target, icp_cfg)
    transformed = apply_transform_cloud(res.transform, cloud)
    return res, transformed


@partial(jax.jit, static_argnames=("icp_cfg", "leaf", "voxel_cap", "cap"))
def _incremental_scan(stacked: Cloud, icp_cfg, leaf, voxel_cap, cap):
    """The whole incremental chain as ONE program: phase-0 downsamples
    batched up front (they are target-independent), then a ``lax.scan``
    whose carry is the accumulated full-resolution target. The per-pair
    convergence gate folds into the merge — the Python loop's
    ``bool(res.converged)`` costs a host round trip per pair.

    One deliberate deviation from the generic path, measured on the
    6x307k workload: frames append as CONTIGUOUS blocks
    (``dynamic_update_slice`` at frame-sized offsets, invalid rows
    carried along masked) instead of compacting scatters — a 3.7 MB
    block copy replaces a ~26 ms row scatter into the 22 MB carry. NN
    masks invalid rows, so interior holes are free.

    ``icp_cfg.compute_fitness`` is honored exactly like in the Python
    loop path, so ``results[i].fitness`` means the same thing whichever
    path ran (it is NaN under ``compute_fitness=False``, which the fast
    presets select — matching PCL, where ``align()`` never computes
    fitness and ``getFitnessScore`` is a separate on-demand call; the
    per-pair fitness sweep over a ~1.8M-point target costs ~80 ms)."""
    n, frame_cap = stacked.valid.shape
    first = jax.tree.map(lambda x: x[0], stacked)
    rest = jax.tree.map(lambda x: x[1:], stacked)

    target = Cloud(
        xyz=jnp.zeros((cap, 3), stacked.xyz.dtype)
        .at[:frame_cap]
        .set(first.xyz),
        rgb=jnp.zeros((cap, 3), stacked.rgb.dtype)
        .at[:frame_cap]
        .set(first.rgb),
        valid=jnp.zeros((cap,), jnp.bool_).at[:frame_cap].set(first.valid),
    )
    src_downs = jax.vmap(lambda c: voxel_downsample(c, leaf, voxel_cap))(
        rest
    )

    def body(carry, x):
        target, offset = carry
        src_down, cloud_i = x
        res = icp_align(src_down, target, icp_cfg)
        transformed = apply_transform_cloud(res.transform, cloud_i)
        target = Cloud(
            xyz=jax.lax.dynamic_update_slice(
                target.xyz, transformed.xyz, (offset, 0)
            ),
            rgb=jax.lax.dynamic_update_slice(
                target.rgb, transformed.rgb, (offset, 0)
            ),
            valid=jax.lax.dynamic_update_slice(
                target.valid, transformed.valid & res.converged, (offset,)
            ),
        )
        return (target, offset + frame_cap), res

    (target, _), results = jax.lax.scan(
        body, (target, jnp.int32(frame_cap)), (src_downs, rest)
    )
    return target, results


class IncrementalICP(RegistrationScheme):
    """Plain (non-edge) incremental registration (reference C3,
    src/incremental_icp.hpp): per cloud i >= 1, voxel-downsample the source,
    ICP against the accumulated target with NO initial guess, and on
    convergence merge the transformed full cloud."""

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self.results: List[ICPResult] = []

    def registration(self, clouds: Sequence) -> Cloud:
        cfg = self.config
        clouds = [_as_unorganized(c) for c in clouds]
        cap = sum(c.capacity for c in clouds)
        n = len(clouds)
        if (
            cfg.use_scan
            and n >= 2
            and len({c.capacity for c in clouds}) == 1
            and len({c.normal is None for c in clouds}) == 1
        ):
            stacked = jax.tree.map(lambda *x: jnp.stack(x), *clouds)
            target, results = _incremental_scan(
                stacked, cfg.icp, cfg.voxel.leaf_size, cfg.voxel.max_points,
                cap,
            )
            pick = lambda i: jax.tree.map(lambda x: x[i], results)
            self.results = [pick(i) for i in range(n - 1)]
            return target
        target = merge_append(Cloud.empty(cap), clouds[0])
        self.results = []
        for idx in range(1, len(clouds)):
            res, transformed = _incremental_step(
                target, clouds[idx], cfg.icp, cfg.voxel.leaf_size,
                cfg.voxel.max_points,
            )
            self.results.append(res)
            if bool(res.converged):
                target = merge_append(target, transformed)
        return target
