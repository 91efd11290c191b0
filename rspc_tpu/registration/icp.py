"""Point-to-point ICP with PCL-parity convergence semantics.

TPU-native replacement for ``pcl::IterativeClosestPoint`` as configured by
the reference (SURVEY.md X1; src/icp_edge_based_registration.hpp:41-52,
src/incremental_icp.hpp:46-49). The whole solve is one jittable
``lax.while_loop``: tiled-NN correspondences -> weighted rigid fit ->
transform update -> PCL ``DefaultConvergenceCriteria`` evaluation, with all
cloud state in fixed-capacity padded buffers.

Parity notes (the part SURVEY.md §6 flags as hard):
  * PCL maps ``setTransformationEpsilon(e)`` to translation threshold
    ``translation_sqr <= e`` and rotation threshold ``cos_angle >= 1 - e``
    (when no separate rotation epsilon is set), and
    ``setEuclideanFitnessEpsilon`` to the *relative MSE* threshold. With the
    reference's e=1 / fitness=1000, the TRANSFORM criterion fires after the
    FIRST iteration for any incremental step below 90 deg / 1 m — so the
    reference's "100-iteration" ICP really performs one NN + one SVD step.
  * Criteria order per iteration: max-iterations -> transform -> absolute
    MSE -> relative MSE; reaching max iterations still reports
    ``converged = True`` (PCL's ``failure_after_max_iterations_`` defaults
    to false).
  * Fewer than ``min_number_correspondences`` (3) matches aborts with
    ``converged = False`` (state NO_CORRESPONDENCES) — the reference then
    skips merging that frame (icp_edge_based_registration.hpp:113-123).
  * ``align(output, guess)`` seeds ``final_transformation`` with the guess
    and correspondences are searched from the guess-transformed source;
    ``getFinalTransformation()`` includes the guess.
  * MSE for the ABS/REL criteria is the mean *squared* correspondence
    distance of the current iteration's matches (pre-update), as in
    ``DefaultConvergenceCriteria::calculateMSE``; ``prev_mse`` starts at
    +max like PCL's ``correspondences_prev_mse_``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.ops.nn import nearest_neighbors
from rspc_tpu.registration.bufferops import _stride_cloud
from rspc_tpu.ops.transform import apply_transform
from rspc_tpu.ops.umeyama import _rodrigues, plane_fit, rigid_fit


def _scale_increment(t_inc: jax.Array, s: jax.Array) -> jax.Array:
    """Shrink a rigid increment toward identity by factor ``s`` in the
    log map (rotation angle and translation scale linearly)."""
    r = t_inc[:3, :3]
    cos = jnp.clip(0.5 * (r[0, 0] + r[1, 1] + r[2, 2] - 1.0), -1.0, 1.0)
    ang = jnp.arccos(cos)
    sin = jnp.sin(ang)
    skew = jnp.stack(
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]
    )
    axis = skew / jnp.maximum(2.0 * sin, 1e-12)
    omega = jnp.where(ang > 1e-7, s * ang * axis, jnp.zeros(3, t_inc.dtype))
    r_s = _rodrigues(omega)
    top = jnp.concatenate([r_s, (s * t_inc[:3, 3])[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], t_inc.dtype)
    return jnp.concatenate([top, bottom], axis=0)

# Convergence states, numerically matching pcl::registration::
# DefaultConvergenceCriteria::ConvergenceState.
NOT_CONVERGED = 0
ITERATIONS = 1
TRANSFORM = 2
ABS_MSE = 3
REL_MSE = 4
NO_CORRESPONDENCES = 5


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class ICPResult:
    """Mirror of the PCL accessors the reference consumes:
    ``getFinalTransformation`` / ``hasConverged`` plus the fitness/RMSE the
    baseline metric requires (SURVEY.md §5 'Metrics')."""

    transform: jax.Array          # f32[4,4] final transformation (incl. guess)
    converged: jax.Array          # bool
    state: jax.Array              # i32, ConvergenceState
    iterations: jax.Array         # i32
    fitness: jax.Array            # f32 mean squared NN distance (getFitnessScore)
    inlier_rmse: jax.Array        # f32 RMSE over inlier correspondences
    n_correspondences: jax.Array  # i32 inliers at the final pose


@partial(jax.jit, static_argnames=("config", "psum_axis"))
def icp_align(
    src: Cloud,
    tgt: Cloud,
    config: ICPConfig = ICPConfig(),
    init_guess: jax.Array | None = None,
    psum_axis=None,
) -> ICPResult:
    """Align ``src`` onto ``tgt``; returns the PCL-parity result bundle.

    Equivalent reference call: ``icp.align(output, guess)`` with the
    settings in ``config`` (see ICPConfig for the exact PCL mapping).

    ``psum_axis``: inside ``shard_map`` with ``src`` sharded over that
    mesh axis (target replicated), every source reduction — fit moments,
    correspondence counts, MSE and fitness sums — is psum'd over ICI, so
    each device runs the identical outer loop and returns the identical
    global result (parallel/icp.py wraps this for standalone use; the
    fused chain threads it through directly). The internal
    ``max_source_points`` stride is skipped then: the caller strides the
    FULL cloud before sharding so the solve population matches the
    single-device path exactly.
    """
    dtype = src.xyz.dtype
    eye = jnp.eye(4, dtype=dtype)
    guess = eye if init_guess is None else init_guess.astype(dtype)

    # TPU knob (0 = all points, PCL behavior): strided uniform subsample
    # of the SOLVE's source — every sweep is linear in the source count
    # and an LLS pose from n/2 well-spread points moves by ~sqrt(2) of
    # its noise floor, not its accuracy floor. The caller still
    # transforms/merges the FULL cloud; fitness/RMSE then describe the
    # subsample (same estimator, fewer samples).
    if psum_axis is None:
        src = _stride_cloud(src, config.max_source_points)

    p2l = config.variant == "point_to_plane"
    if p2l and tgt.normal is None:
        raise ValueError(
            "point_to_plane ICP needs a target cloud with normals "
            "(edge clouds carry them; see extract_edge_features)"
        )
    # Colored-ICP residual (Park, Zhou, Koltun 2017; ops/colorgrad.py):
    # engages only when the target carries tangent-plane intensity
    # gradients AND the config asks for it — both static, so the plain
    # geometric program is untouched otherwise.
    colored = (
        p2l and config.color_weight > 0.0 and tgt.cgrad is not None
    )
    if colored:
        from rspc_tpu.ops.colorgrad import intensity

        i_src = intensity(src.rgb).astype(dtype)   # pose-invariant
        i_tgt = intensity(tgt.rgb).astype(dtype)

    max_d2 = jnp.asarray(
        config.max_correspondence_distance**2, dtype
    )
    trans_thresh = jnp.asarray(config.transformation_epsilon, dtype)
    rot_thresh = jnp.asarray(1.0 - config.transformation_epsilon, dtype)
    mse_abs = jnp.asarray(config.mse_threshold_absolute, dtype)
    mse_rel = jnp.asarray(config.euclidean_fitness_epsilon, dtype)
    # prev_mse seed: PCL uses numeric_limits<double>::max(). Using the f32
    # max here breaks the REL_MSE criterion on TPU: XLA lowers x/prev to
    # x * (1/prev), and 1/3.4e38 is subnormal, which the TPU flushes to
    # zero — making the relative-MSE test read 0 < eps and fire on the
    # first iteration for ANY epsilon. 1e18 keeps the reciprocal normal
    # while still dwarfing any real MSE, preserving PCL's first-iteration
    # semantics (rel ~= 1.0).
    big = jnp.asarray(1e18, dtype)

    use_pallas = config.use_pallas and jax.default_backend() == "tpu"
    if use_pallas:
        from rspc_tpu.ops.nn_pallas import nearest_neighbors_pallas

    def correspondences(final_t):
        src_t = apply_transform(final_t, src.xyz)
        if use_pallas:
            d2, idx = nearest_neighbors_pallas(
                src_t, src.valid, tgt.xyz, tgt.valid
            )
        else:
            d2, idx = nearest_neighbors(
                src_t, src.valid, tgt.xyz, tgt.valid, chunk=config.target_chunk
            )
        w = (
            (d2 <= max_d2) & src.valid & jnp.isfinite(d2)
        ).astype(dtype)
        return src_t, d2, idx, w

    def cond(st):
        done = st[4]
        return ~done

    def body(st):
        final_t, it, prev_mse, state, prev_done = st
        src_t, d2, idx, w = correspondences(final_t)
        n_corr = jnp.sum(w)
        mse_sum = jnp.sum(jnp.where(w > 0, d2, 0.0))
        if psum_axis is not None:
            n_corr, mse_sum = jax.lax.psum((n_corr, mse_sum), psum_axis)
        cur_mse = mse_sum / jnp.maximum(n_corr, 1.0)

        too_few = n_corr < config.min_number_correspondences

        tgt_m = jnp.take(tgt.xyz, idx, axis=0)
        if p2l:
            tgt_n = jnp.take(tgt.normal, idx, axis=0)
            w_fit = w
            if config.huber_delta is not None:
                r = jnp.sum((src_t - tgt_m) * tgt_n, axis=-1)
                w_fit = w * jnp.minimum(
                    1.0,
                    config.huber_delta / jnp.maximum(jnp.abs(r), 1e-12),
                )
            color_kw = {}
            if colored:
                g_m = jnp.take(tgt.cgrad, idx, axis=0)
                di = jnp.take(i_tgt, idx, axis=0) - i_src
                w_c = w * jnp.asarray(config.color_weight, dtype)
                if config.color_huber_delta is not None:
                    r_c = jnp.sum((src_t - tgt_m) * g_m, axis=-1) + di
                    w_c = w_c * jnp.minimum(
                        1.0,
                        config.color_huber_delta
                        / jnp.maximum(jnp.abs(r_c), 1e-12),
                    )
                color_kw = dict(
                    cgrad=g_m, color_resid=di, color_weights=w_c
                )
            t_inc = plane_fit(
                src_t, tgt_m, tgt_n, w_fit,
                point_mix=config.point_plane_mix,
                psum_axis=psum_axis,
                **color_kw,
            )
            # Trust region: correspondences were searched within
            # max_correspondence_distance; an increment moving any point
            # farther than ~2x that is extrapolating beyond the matches
            # (it happens when the normal set under-constrains a
            # direction). Scale the whole increment back into range.
            ang = jnp.arccos(
                jnp.clip(
                    0.5 * (t_inc[0, 0] + t_inc[1, 1] + t_inc[2, 2] - 1.0),
                    -1.0,
                    1.0,
                )
            )
            if psum_axis is None:
                mean_t = jnp.mean(src_t, axis=0)
            else:
                # unmasked row mean, matching the single-device path:
                # total rows = local rows x shard count (both static)
                n_sh = jax.lax.psum(1, psum_axis)
                mean_t = jax.lax.psum(jnp.sum(src_t, axis=0), psum_axis) / (
                    src_t.shape[0] * n_sh
                )
            span_sq = jnp.max(
                jnp.where(
                    src.valid,
                    jnp.sum((src_t - mean_t) ** 2, -1),
                    0.0,
                )
            )
            if psum_axis is not None:
                span_sq = jax.lax.pmax(span_sq, psum_axis)
            span = jnp.sqrt(span_sq)
            move = ang * span + jnp.linalg.norm(t_inc[:3, 3])
            limit = 2.0 * config.max_correspondence_distance
            scale = jnp.minimum(1.0, limit / jnp.maximum(move, 1e-12))
            t_inc = jnp.where(
                scale < 1.0,
                _scale_increment(t_inc, scale),
                t_inc,
            )
        else:
            t_inc = rigid_fit(src_t, tgt_m, w, psum_axis=psum_axis)
        new_final = t_inc @ final_t
        new_it = it + 1

        # PCL DefaultConvergenceCriteria, in order.
        hit_iters = new_it >= config.max_iterations
        r = t_inc[:3, :3]
        cos_angle = 0.5 * (r[0, 0] + r[1, 1] + r[2, 2] - 1.0)
        t_sqr = jnp.sum(t_inc[:3, 3] ** 2)
        hit_transform = (cos_angle >= rot_thresh) & (t_sqr <= trans_thresh)
        hit_abs = jnp.abs(cur_mse - prev_mse) < mse_abs
        hit_rel = (
            jnp.abs(cur_mse - prev_mse) / jnp.maximum(prev_mse, 1e-30) < mse_rel
        )

        new_state = jnp.where(
            too_few,
            NO_CORRESPONDENCES,
            jnp.where(
                hit_iters,
                ITERATIONS,
                jnp.where(
                    hit_transform,
                    TRANSFORM,
                    jnp.where(hit_abs, ABS_MSE, jnp.where(hit_rel, REL_MSE, NOT_CONVERGED)),
                ),
            ),
        ).astype(jnp.int32)
        done = new_state != NOT_CONVERGED

        # On a too-few abort PCL breaks before updating the transform.
        out_final = jnp.where(too_few, final_t, new_final)
        # Under vmap, lax.while_loop keeps executing the body until ALL
        # lanes finish; freeze lanes that already converged so their
        # state stops evolving (no-op in the unbatched case — the loop
        # exits as soon as done is set).
        out_final = jnp.where(prev_done, final_t, out_final)
        new_it = jnp.where(prev_done, it, new_it)
        cur_mse = jnp.where(prev_done, prev_mse, cur_mse)
        new_state = jnp.where(prev_done, state, new_state)
        done = done | prev_done
        return (out_final, new_it, cur_mse, new_state, done)

    init = (guess, jnp.int32(0), big, jnp.int32(NOT_CONVERGED), jnp.bool_(False))
    final_t, iters, _, state, _ = jax.lax.while_loop(cond, body, init)

    converged = (state != NOT_CONVERGED) & (state != NO_CORRESPONDENCES)

    if config.compute_fitness:
        # getFitnessScore(): mean squared NN distance at the final pose over
        # all valid source points (max_range defaults to +inf in PCL), plus
        # the inlier-only RMSE the bench reports. Costs one extra sweep.
        src_t, d2, _, w = correspondences(final_t)
        finite_d2 = jnp.where(
            src.valid, jnp.where(jnp.isfinite(d2), d2, 0.0), 0.0
        )
        sums = (
            jnp.sum(finite_d2),
            jnp.sum(src.valid.astype(dtype)),
            jnp.sum(jnp.where(w > 0, d2, 0.0)),
            jnp.sum(w),
        )
        if psum_axis is not None:
            sums = jax.lax.psum(sums, psum_axis)
        fit_sum, nv, inl_sum, n_inl = sums
        fitness = fit_sum / jnp.maximum(nv, 1.0)
        inlier_rmse = jnp.sqrt(inl_sum / jnp.maximum(n_inl, 1.0))
    else:
        fitness = jnp.asarray(jnp.nan, dtype)
        inlier_rmse = jnp.asarray(jnp.nan, dtype)
        n_inl = jnp.asarray(0.0, dtype)

    return ICPResult(
        transform=final_t,
        converged=converged,
        state=state,
        iterations=iters,
        fitness=fitness,
        inlier_rmse=inlier_rmse,
        n_correspondences=n_inl.astype(jnp.int32),
    )
