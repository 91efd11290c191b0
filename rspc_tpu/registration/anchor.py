"""Refinement stages: per-pair refine, frame-0 / progressive-map
anchoring, and the pose-graph glue (beyond-reference accuracy layer).
Split out of schemes.py (VERDICT r2 #8).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.ops.transform import apply_transform
from rspc_tpu.ops.transform import apply_transform_cloud
from rspc_tpu.registration.icp import icp_align
from rspc_tpu.registration.bufferops import _rigid_inverse
from rspc_tpu.registration.measures import _capped_mean_sq
from rspc_tpu.registration.measures import _inlier_stats
from rspc_tpu.registration.measures import _nn_sweep


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

    # The stage schedule runs as ONE lax.scan over per-iteration
    # parameter rows instead of a sum(max_iterations)-fold unrolled
    # Python loop: the sweep + gather + plane-fit iteration body was
    # being emitted 6x in the north-star fused program, a large slice
    # of the ~28 MB executable whose tunnel load dominates warm starts
    # (VERDICT r3 #1). Stage knobs that vary per iteration ride as
    # traced scalars; knobs that pick a code PATH stay static and are
    # harmonized exactly: huber_delta=None == +inf (min(1, inf/|r|) ==
    # 1), color_weight=0 zeroes the photometric rows, point_mix=0 adds
    # exactly zero moments — so the fused body computes the identical
    # math for every schedule.
    use_huber = any(s.huber_delta is not None for s in stages)
    use_mix = any(s.point_plane_mix > 0.0 for s in stages)
    step_rows = []
    for s in stages:
        row = (
            s.max_correspondence_distance**2,
            s.huber_delta if s.huber_delta is not None else jnp.inf,
            s.color_weight if use_color else 0.0,
            s.color_huber_delta
            if getattr(s, "color_huber_delta", None) is not None
            else jnp.inf,
            s.point_plane_mix,
            2.0 * s.max_correspondence_distance,  # trust-region limit
        )
        step_rows.extend([row] * s.max_iterations)
    n_steps = len(step_rows)

    def iter_body(carry, inp):
        rel, cur, nb, rb, pb = carry
        mcd2, hub, cw, chub, mix, limit = inp
        d2, idx = nn_flat(cur.reshape(b * n_pts, 3))
        d2 = d2.reshape(b, n_pts)
        idx = idx.reshape(b, n_pts)
        # the first sweep runs at the src0 poses — exactly the
        # acceptance gate's "before" measurement; capture it from the
        # carry's NaN sentinel instead of re-sweeping at the end
        sb = stats_from(d2, idx, cur)
        fresh = jnp.isnan(nb[0])
        nb, rb, pb = (
            jnp.where(fresh, sb[0], nb),
            jnp.where(fresh, sb[1], rb),
            jnp.where(fresh, sb[2], pb),
        )
        w = ((d2 <= mcd2) & fulls.valid & jnp.isfinite(d2)).astype(dtype)
        q = jnp.take(anchor.xyz, idx.reshape(-1), axis=0).reshape(
            b, n_pts, 3
        )
        nrm = jnp.take(anchor.normal, idx.reshape(-1), axis=0).reshape(
            b, n_pts, 3
        )
        w_fit = w
        if use_huber:
            r = jnp.sum((cur - q) * nrm, axis=-1)
            w_fit = w * jnp.minimum(
                1.0, hub / jnp.maximum(jnp.abs(r), 1e-12)
            )
        if use_color:
            # colored-ICP rows against the anchor's gradient field —
            # SAME weighting as registration/icp.py: the photometric
            # rows start from the RAW correspondence mask ``w`` (not
            # the geometric-huber-reweighted w_fit; a large plane
            # residual must not also mute a point's color row) and
            # get their own color huber
            g = jnp.take(
                anchor.cgrad, idx.reshape(-1), axis=0
            ).reshape(b, n_pts, 3)
            di = (
                jnp.take(i_anchor, idx.reshape(-1), axis=0).reshape(
                    b, n_pts
                )
                - i_src
            )
            r_c = jnp.sum((cur - q) * g, axis=-1) + di
            w_c = (
                w * cw
                * jnp.minimum(1.0, chub / jnp.maximum(jnp.abs(r_c), 1e-12))
            )
            t_inc = jax.vmap(
                lambda s, d, nn, ww, gg, dd, wc: plane_fit(
                    s, d, nn, ww, mix if use_mix else 0.0,
                    cgrad=gg, color_resid=dd, color_weights=wc,
                )
            )(cur, q, nrm, w_fit, g, di, w_c)
        else:
            t_inc = jax.vmap(
                lambda s, d, nn, ww: plane_fit(
                    s, d, nn, ww, mix if use_mix else 0.0,
                )
            )(cur, q, nrm, w_fit)

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
            sc = jnp.minimum(1.0, limit / jnp.maximum(move, 1e-12))
            return jnp.where(sc < 1.0, _scale_increment(t, sc), t)

        t_inc = jax.vmap(clip_one)(t_inc, cur, fulls.valid)
        rel = jnp.einsum("bij,bjk->bik", t_inc, rel)
        cur = jax.vmap(apply_transform)(t_inc, cur)
        return (rel, cur, nb, rb, pb), None

    before_stats = None
    if n_steps:
        nan_b = jnp.full((b,), jnp.nan, dtype)
        (rel, cur, nb0, rb0, pb0), _ = jax.lax.scan(
            iter_body,
            (rel, cur, nan_b, nan_b, nan_b),
            jnp.asarray(step_rows, dtype),
        )
        before_stats = (nb0, rb0, pb0)

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
