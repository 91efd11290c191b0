"""Mesh-sharded ICP: data-parallel source sweep with psum'd fit moments.

Multi-chip version of registration/icp.py. The source cloud is sharded
along the ``points`` mesh axis (each chip owns N/D source points; the
target is replicated), and every ICP iteration becomes:

  local tiled NN sweep  ->  local fit moments (sw, ss, sd, m — additive,
  ops/umeyama.fit_moments)  ->  ``psum`` over ICI  ->  identical rigid
  solve + convergence evaluation on every chip.

The per-iteration collective is 16 scalars (1 + 3 + 3 + 9) plus the MSE
accumulator — pure latency, no bandwidth term — so scaling is limited only
by the local sweep, which shrinks linearly in D. Convergence semantics are
identical to the single-chip path (PCL DefaultConvergenceCriteria; see
registration/icp.py docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.ops.nn import nearest_neighbors
from rspc_tpu.ops.transform import apply_transform
from rspc_tpu.ops.umeyama import (
    fit_moments,
    plane_fit_from_moments,
    plane_fit_moments,
    rigid_fit_from_moments,
)
from rspc_tpu.registration.icp import (
    ABS_MSE,
    ICPResult,
    ITERATIONS,
    NOT_CONVERGED,
    NO_CORRESPONDENCES,
    REL_MSE,
    TRANSFORM,
)


def _local_icp(config: ICPConfig, axis: str):
    """Build the per-device ICP body (source shard resident, target
    replicated, moments psum'd over ``axis``). Shared by the single-pair
    and batched entry points below."""
    max_d2 = config.max_correspondence_distance**2
    trans_thresh = config.transformation_epsilon
    rot_thresh = 1.0 - config.transformation_epsilon
    mse_abs = config.mse_threshold_absolute
    mse_rel = config.euclidean_fitness_epsilon

    p2l = config.variant == "point_to_plane"
    # colored-ICP rows (Park-Zhou-Koltun; registration/icp.py has the
    # residual definition): additive like the geometric moments, so they
    # fold into the SAME 43-scalar psum. Static on config, so the plain
    # geometric program carries no color inputs' compute (the zero
    # placeholders the entry points pass are dead-code-eliminated).
    colored = p2l and config.color_weight > 0.0

    def local(sxyz, svalid, s_int, txyz, tvalid, tnrm, t_int, t_cg, guess_rep):
        dtype = sxyz.dtype
        # see registration/icp.py: f32-max reciprocal is subnormal on TPU
        big = jnp.asarray(1e18, dtype)

        def correspondences(final_t):
            src_t = apply_transform(final_t, sxyz)
            d2, idx = nearest_neighbors(
                src_t, svalid, txyz, tvalid, chunk=config.target_chunk
            )
            w = ((d2 <= max_d2) & svalid & jnp.isfinite(d2)).astype(dtype)
            return src_t, d2, idx, w

        def body(st):
            final_t, it, prev_mse, state, _ = st
            src_t, d2, idx, w = correspondences(final_t)
            tgt_m = jnp.take(txyz, idx, axis=0)

            mse_sum = jnp.sum(jnp.where(w > 0, d2, 0.0))
            if p2l:
                tgt_n = jnp.take(tnrm, idx, axis=0)
                w_fit = w
                if config.huber_delta is not None:
                    r_res = jnp.sum((src_t - tgt_m) * tgt_n, axis=-1)
                    w_fit = w * jnp.minimum(
                        1.0,
                        config.huber_delta
                        / jnp.maximum(jnp.abs(r_res), 1e-12),
                    )
                # global weighted centroid for the conditioning shift
                # (one 4-scalar psum), then additive 6x6 moments (one
                # 43-scalar psum) — both pure-latency collectives
                swl = jnp.sum(w_fit)
                scl = jnp.sum(src_t * w_fit[:, None], axis=0)
                sw_c, sc = jax.lax.psum((swl, scl), axis)
                c = sc / jnp.maximum(sw_c, 1e-12)
                h6, g6 = plane_fit_moments(
                    src_t - c, tgt_m - c, tgt_n, w_fit
                )
                if colored:
                    # photometric rows weight from the RAW mask w (the
                    # geometric huber must not mute color rows) with
                    # their own huber, exactly as registration/icp.py
                    g_m = jnp.take(t_cg, idx, axis=0)
                    di = jnp.take(t_int, idx, axis=0) - s_int
                    w_col = w * jnp.asarray(config.color_weight, dtype)
                    if config.color_huber_delta is not None:
                        r_c = jnp.sum((src_t - tgt_m) * g_m, axis=-1) + di
                        w_col = w_col * jnp.minimum(
                            1.0,
                            config.color_huber_delta
                            / jnp.maximum(jnp.abs(r_c), 1e-12),
                        )
                    hc, gc = plane_fit_moments(
                        src_t - c, tgt_m - c, g_m, w_col, offset=di
                    )
                    h6 = h6 + hc
                    g6 = g6 + gc
                n_local = jnp.sum(w)
                h6, g6, n_corr, mse_sum = jax.lax.psum(
                    (h6, g6, n_local, mse_sum), axis
                )
                t_c = plane_fit_from_moments(h6, g6)
                rot = t_c[:3, :3]
                tr = t_c[:3, 3] + c - rot @ c
                t_inc = jnp.concatenate(
                    [
                        jnp.concatenate([rot, tr[:, None]], axis=1),
                        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype),
                    ],
                    axis=0,
                )
            else:
                sw, ss, sd, m = fit_moments(src_t, tgt_m, w)
                # one fused psum over ICI: 17 scalars
                sw, ss, sd, m, mse_sum = jax.lax.psum(
                    (sw, ss, sd, m, mse_sum), axis
                )
                n_corr = sw
                t_inc = rigid_fit_from_moments(sw, ss, sd, m)
            cur_mse = mse_sum / jnp.maximum(n_corr, 1.0)
            too_few = n_corr < config.min_number_correspondences
            new_final = t_inc @ final_t
            new_it = it + 1

            hit_iters = new_it >= config.max_iterations
            r = t_inc[:3, :3]
            cos_angle = 0.5 * (r[0, 0] + r[1, 1] + r[2, 2] - 1.0)
            t_sqr = jnp.sum(t_inc[:3, 3] ** 2)
            hit_transform = (cos_angle >= rot_thresh) & (t_sqr <= trans_thresh)
            hit_abs = jnp.abs(cur_mse - prev_mse) < mse_abs
            hit_rel = (
                jnp.abs(cur_mse - prev_mse) / jnp.maximum(prev_mse, 1e-30)
                < mse_rel
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
                        jnp.where(
                            hit_abs, ABS_MSE,
                            jnp.where(hit_rel, REL_MSE, NOT_CONVERGED),
                        ),
                    ),
                ),
            ).astype(jnp.int32)
            done = new_state != NOT_CONVERGED
            out_final = jnp.where(too_few, final_t, new_final)
            return (out_final, new_it, cur_mse, new_state, done)

        init = (
            guess_rep,
            jnp.int32(0),
            big,
            jnp.int32(NOT_CONVERGED),
            jnp.bool_(False),
        )
        final_t, iters, _, state, _ = jax.lax.while_loop(
            lambda st: ~st[4], body, init
        )

        converged = (state != NOT_CONVERGED) & (state != NO_CORRESPONDENCES)

        src_t, d2, _, w = correspondences(final_t)
        finite_d2 = jnp.where(svalid, jnp.where(jnp.isfinite(d2), d2, 0.0), 0.0)
        sums = jax.lax.psum(
            (
                jnp.sum(finite_d2),
                jnp.sum(svalid.astype(dtype)),
                jnp.sum(jnp.where(w > 0, d2, 0.0)),
                jnp.sum(w),
            ),
            axis,
        )
        fit_sum, nv, inl_sum, n_inl = sums
        fitness = fit_sum / jnp.maximum(nv, 1.0)
        inlier_rmse = jnp.sqrt(inl_sum / jnp.maximum(n_inl, 1.0))

        return ICPResult(
            transform=final_t,
            converged=converged,
            state=state,
            iterations=iters,
            fitness=fitness,
            inlier_rmse=inlier_rmse,
            n_correspondences=n_inl.astype(jnp.int32),
        )

    return local


def _color_inputs(src: Cloud, tgt: Cloud, config: ICPConfig):
    """(i_src, i_tgt, t_cgrad) for the colored residual; zero
    placeholders when the config/target do not engage it (the local body
    never touches them then, so XLA dead-code-eliminates the zeros)."""
    if config.variant == "point_to_plane" and config.color_weight > 0.0:
        if tgt.cgrad is None:
            raise ValueError(
                "color_weight > 0 needs a target cloud carrying cgrad "
                "(ops/colorgrad.py; EdgeConfig.carry_cgrad)"
            )
        from rspc_tpu.ops.colorgrad import intensity

        return (
            intensity(src.rgb).astype(src.xyz.dtype),
            intensity(tgt.rgb).astype(src.xyz.dtype),
            tgt.cgrad,
        )
    return (
        jnp.zeros(src.xyz.shape[:-1], src.xyz.dtype),
        jnp.zeros(tgt.xyz.shape[:-1], src.xyz.dtype),
        jnp.zeros_like(tgt.xyz),
    )


def _rep_result(spec) -> ICPResult:
    return ICPResult(
        transform=spec, converged=spec, state=spec, iterations=spec,
        fitness=spec, inlier_rmse=spec, n_correspondences=spec,
    )


def sharded_icp_align(
    src: Cloud,
    tgt: Cloud,
    mesh: Mesh,
    config: ICPConfig = ICPConfig(),
    init_guess: jnp.ndarray | None = None,
    axis: str = "points",
) -> ICPResult:
    """Align ``src`` onto ``tgt`` with the source sharded over ``axis``.
    Result is replicated; numerically identical to the single-chip
    registration/icp.py (the psum'd moments are the same sums)."""
    dtype = src.xyz.dtype
    guess = (
        jnp.eye(4, dtype=dtype) if init_guess is None else init_guess.astype(dtype)
    )
    if config.variant == "point_to_plane" and tgt.normal is None:
        raise ValueError("point_to_plane needs a target cloud with normals")
    tnrm = (
        tgt.normal if tgt.normal is not None else jnp.zeros_like(tgt.xyz)
    )
    s_int, t_int, t_cg = _color_inputs(src, tgt, config)
    rep = P()
    fn = jax.shard_map(
        _local_icp(config, axis),
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), rep, rep, rep, rep, rep, rep),
        out_specs=_rep_result(rep),
        check_vma=False,
    )
    return fn(
        src.xyz, src.valid, s_int, tgt.xyz, tgt.valid, tnrm, t_int, t_cg,
        guess,
    )


def batched_sharded_icp_align(
    src: Cloud,
    tgt: Cloud,
    guesses: jnp.ndarray,
    mesh: Mesh,
    config: ICPConfig = ICPConfig(),
    data_axis: str = "data",
    points_axis: str = "points",
) -> ICPResult:
    """The full multi-chip step: a BATCH of alignment problems sharded over
    the ``data`` mesh axis (pure DP — independent frame pairs), each
    problem's source points sharded over the ``points`` axis (psum'd fit
    moments over ICI). src/tgt carry a leading batch dim [B, N, ...];
    guesses is [B, 4, 4]. This is the 'training step' analog the
    multi-chip dry run exercises (__graft_entry__.dryrun_multichip)."""
    if config.variant == "point_to_plane" and tgt.normal is None:
        raise ValueError("point_to_plane needs a target cloud with normals")
    tnrm = (
        tgt.normal if tgt.normal is not None else jnp.zeros_like(tgt.xyz)
    )
    s_int, t_int, t_cg = _color_inputs(src, tgt, config)
    local = _local_icp(config, points_axis)
    batched = jax.vmap(local, in_axes=(0,) * 9)
    dp = P(data_axis)
    dsp = P(data_axis, points_axis)
    fn = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(dsp, dsp, dsp, dp, dp, dp, dp, dp, dp),
        out_specs=_rep_result(dp),
        check_vma=False,
    )
    return fn(
        src.xyz, src.valid, s_int, tgt.xyz, tgt.valid, tnrm, t_int, t_cg,
        guesses,
    )
