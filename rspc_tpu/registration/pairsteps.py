"""Per-pair alignment steps, coarse guard, and wide-cap rescue.

The jitted coarse->fine pair programs of both edge schemes
(src/icp_edge_based_registration.hpp:41-52,
src/ndt_edge_based_registration.hpp:38-43) plus the beyond-reference
never-worsen guard and inlier-collapse rescue mechanisms. Split out of
schemes.py (VERDICT r2 #8).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.ops.transform import apply_transform
from rspc_tpu.ops.transform import apply_transform_cloud
from rspc_tpu.ops.transform import imu_guess_full
from rspc_tpu.ops.transform import imu_guess_y
from rspc_tpu.ops.transform import relative_thetas
from rspc_tpu.ops.voxel import voxel_downsample
from rspc_tpu.registration.icp import icp_align
from rspc_tpu.registration.ndt import build_ndt_grid
from rspc_tpu.registration.ndt import ndt_align
from rspc_tpu.registration.bufferops import _stride_cloud
from rspc_tpu.registration.measures import _capped_sum
from rspc_tpu.registration.measures import _inlier_stats
from rspc_tpu.registration.measures import _nn_sweep


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
# gain, genuine local-optimum escapes 2-5x. 1.5 sits in the measured
# separation: on the `combined` drift wall the colored wide-cap escapes
# it keeps all gain >2x and the marginal (<1.5x) accepts it drops were
# net-harmful — max err 7.8e-2 (gate 1.15) -> 5.2e-2 (gate 1.5, stable:
# identical at 2.0) — while partial_overlap's genuine escapes (2-5x)
# are untouched. Raising it further starts rejecting real escapes on
# the loop trajectories (loop_drift colored: 9.5e-2 at 2.0).
_RESCUE_KEEP_GAIN = 1.5

# Source-point budget for the coarse guard's hypothesis sweep. The guard
# compares capped-NN MEANS of the same source under k transforms — a
# paired comparison whose decision noise shrinks the score gap far less
# than 1/sqrt(n) suggests — so a strided 4096-point subsample decides
# identically while cutting the [kN x target] sweep ~2.5x (measured
# ~36 ms of the north-star wall was guard sweeps).
_GUARD_MAX_POINTS = 4096


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
    fraction is below ``thresh``, run ``iters`` ICP iterations at the
    wider ``cap`` (inheriting the preset's residual — variant, huber,
    colored rows; see the wide_cfg comment below) and re-fine at the
    original cap.
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
            # The escape solve INHERITS the preset's variant/huber/color
            # — measured, not theorized. A review pass once pinned this
            # to plain point-to-point ("p2l refuses in-plane motion and
            # mm-scale huber/colored weighting crushes ~10 cm
            # residuals"), which is a no-op for the non-colored presets
            # (their fine config IS p2p/no-huber) but deterministically
            # regressed the colored preset's own scenario, `combined`:
            # 7.8e-2 -> 1.3e-1 max err (bisected on-chip, bit-exact
            # reproduction either side). Mechanism: on a drifted-but-
            # overlapping pair the inherited colored-p2l wide solve is a
            # wide-cap COLORED realignment — the geometric huber mutes
            # wrong-surface chasing at the 10 cm radius while the color
            # rows (own huber, raw-mask weights) supply exactly the
            # in-plane correction the drift lacks; pinned p2p chased
            # wrong-surface NN instead and the inlier-growth gate kept
            # it. On partial_overlap (genuine ~10 cm escapes) the
            # colored preset measures 3.8e-3 with or without the pin.
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
    if icp_cfg.compute_fitness and icp_cfg.max_source_points <= 0:
        n_inl = fine.n_correspondences
    else:
        # With max_source_points > 0 the solve strides its source, so
        # fine.n_correspondences counts inliers over the strided subset
        # while _rescue_from normalizes by the FULL cloud's valid count —
        # the gate would read ~stride-ratio low and fire on clean pairs.
        # Recount on the full aligned cloud instead (one extra sweep,
        # only on strided-fitness configs).
        n_inl, _ = _inlier_stats(
            fine_aligned, target, icp_cfg.max_correspondence_distance,
            icp_cfg.use_pallas,
        )
    rel, _ = _rescue_from(
        fine_aligned, target, n_inl, icp_cfg, cap, iters, thresh
    )
    fine = dataclasses.replace(fine, transform=rel @ fine.transform)
    return fine, apply_transform_cloud(rel, fine_aligned)
