"""Phase-1 preparation and the one-program fused chain
(``lax.scan`` over frame pairs; SURVEY.md section 3.1 sequential chain).
Split out of schemes.py (VERDICT r2 #8).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.ops.edges import extract_edge_features
from rspc_tpu.ops.normals import estimate_normals
from rspc_tpu.ops.transform import apply_transform
from rspc_tpu.ops.transform import apply_transform_cloud
from rspc_tpu.ops.voxel import voxel_downsample
from rspc_tpu.registration.icp import icp_align
from rspc_tpu.registration.ndt import ndt_align
from rspc_tpu.registration.ndt import ndt_grid_from_moments
from rspc_tpu.registration.ndt import ndt_grid_init
from rspc_tpu.registration.ndt import ndt_grid_origin
from rspc_tpu.registration.ndt import ndt_grid_update_moments
from rspc_tpu.registration.anchor import _anchor_refine
from rspc_tpu.registration.anchor import _anchor_refine_map
from rspc_tpu.registration.anchor import _map_anchor_stages
from rspc_tpu.registration.anchor import _pose_graph_refine
from rspc_tpu.registration.anchor import _refine_step
from rspc_tpu.registration.bufferops import _rigid_inverse
from rspc_tpu.registration.bufferops import _stride_cloud
from rspc_tpu.registration.bufferops import merge_append
from rspc_tpu.registration.pairsteps import (
    _GUARD_MAX_POINTS,
    _WARM_GUARD_MARGIN,
    _guard_best,
)
from rspc_tpu.registration.pairsteps import _maybe_rescue


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



def _shard_points(c: Cloud, axis: str, n: int) -> Cloud:
    """This device's contiguous chunk of a replicated cloud's points axis
    (pad-with-invalid when the capacity does not divide): inside
    ``shard_map`` the per-pair solves sweep only their chunk and psum the
    additive fit moments, so the O(S x T) NN cost shrinks by the mesh
    size while every merge/carry stays replicated."""
    cap = c.xyz.shape[0]
    chunk = -(-cap // n)
    pad = n * chunk - cap
    if pad:
        def padf(x):
            width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, width)  # False/0 rows are invalid points

        c = jax.tree.map(padf, c)
    i = jax.lax.axis_index(axis)
    return jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=0),
        c,
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
        "psum_axis",
        "psum_n",
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
    psum_axis=None,
    psum_n: int = 1,
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

    ``psum_axis``/``psum_n``: inside ``shard_map`` over a points mesh
    axis (SURVEY.md §2c(c) — the sharded NN-argmin scale-out applied to
    the REAL single-sequence pipeline, VERDICT r3 #6), each device
    sweeps only its ``1/psum_n`` chunk of every pair solve's source
    (coarse NDT/ICP + fine ICP, the dominant O(S x T) sweeps) and the
    additive moments/reductions ride one tiny psum per Newton/ICP
    iteration; guard, rescue, refine, and merges stay replicated so
    every device carries identical target buffers with no collective.
    Sources are capped/strided BEFORE sharding, so the solve population
    is exactly the single-device one.
    """
    refine = full_all is not None

    edges_down = jax.vmap(lambda c: voxel_downsample(c, leaf, voxel_cap))(
        edges_all
    )
    first = lambda t: jax.tree.map(lambda x: x[0], t)
    rest = lambda t: jax.tree.map(lambda x: x[1:], t)

    target0 = first(edges_down)
    target = merge_append(
        Cloud.empty(
            target_cap,
            with_normal=target0.normal is not None,
            with_cgrad=target0.cgrad is not None,
        ),
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
            src_c = edge_i
            if psum_axis is not None:
                cap_ndt = ndt_cfg.max_source_points
                if 0 < cap_ndt < src_c.xyz.shape[0]:
                    # the same prefix slice ndt_align applies internally
                    # when unsharded (hash-shuffled voxel order makes the
                    # prefix a uniform subset)
                    src_c = jax.tree.map(lambda x: x[:cap_ndt], src_c)
                src_c = _shard_points(src_c, psum_axis, psum_n)
            coarse = ndt_align(src_c, grid, ndt_cfg, guess, psum_axis)
        else:
            src_c = edge_i
            if psum_axis is not None:
                src_c = _shard_points(
                    _stride_cloud(src_c, icp_cfg.max_source_points),
                    psum_axis, psum_n,
                )
            coarse = icp_align(
                src_c, target, coarse_icp_cfg, guess, psum_axis=psum_axis
            )
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
        if psum_axis is None:
            fine = icp_align(aligned, target, icp_cfg)
        else:
            fine = icp_align(
                _shard_points(
                    _stride_cloud(aligned, icp_cfg.max_source_points),
                    psum_axis, psum_n,
                ),
                target, icp_cfg, psum_axis=psum_axis,
            )
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
        "psum_axis",
        "psum_n",
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
    psum_axis=None,
    psum_n: int = 1,
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
        psum_axis,
        psum_n,
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
        "psum_axis",
        "psum_n",
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
    psum_axis=None,
    psum_n: int = 1,
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
        psum_axis=psum_axis,
        psum_n=psum_n,
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
