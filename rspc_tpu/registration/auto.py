"""Trajectory-adaptive robust registration (the ``auto`` scheme).

No single preset dominates the robustness matrix (RESULTS.md): the
colored fine stage owns the texture-starved drift wall (``combined``)
but regresses 3x on loop trajectories, the pose graph owns the loop
cells but needs closure structure to pay off, and the plain north-star
preset beats every robust mechanism on clean scenes. The reference has
ONE behavior per scheme (icp_edge_based_registration.hpp:26-130) and
simply fails the hard trajectories; picking a preset by docstring
folklore is not an answer for an unknown trajectory.

``auto_register`` removes the choice by MEASURING instead of guessing:

1. Build a small candidate ladder, simplest first — the plain
   north-star pipeline, the robust map-anchored stack, plus (only when
   the trajectory's own signals justify them) the colored fine stage
   (texture present) and the pose graph (closure structure in the
   guesses).
2. Run every candidate (each is the one-program fused chain; steady
   state a few hundred ms per run on chip).
3. Score each run's trajectory WITHOUT ground truth: capped mean-square
   NN consistency (plus a photometric term when texture is present —
   in-plane drift slides along surfaces invisibly to geometry) over
   validation pair GROUPS — sequential pairs, mid-skip pairs, and every
   detected closure pair — evaluated on the full voxel-downsampled
   clouds at the candidate's final absolute poses. Closure pairs are
   exactly where integrated drift becomes visible; sequential pairs
   keep locally-broken runs from winning on closures alone.
4. Keep the SIMPLEST candidate unless a challenger demonstrates a
   measured improvement on some group by ``margin`` without regressing
   any other group (hysteresis, :func:`select`): on a clean trajectory
   the robust stack measures within noise of plain and plain is kept.

The score is the same capped-mean-square alignment measure the
acceptance/guard gates already trust (registration/measures.py), at
trajectory scope.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.ops.colorgrad import intensity
from rspc_tpu.registration.measures import _capped_sum, _nn_sweep
from rspc_tpu.ops.transform import apply_transform_cloud


def detect_closures(
    guesses: np.ndarray,
    rot_tol: float = 0.03,
    trans_tol: float = 0.05,
    min_skip: int = 4,
) -> tuple:
    """Skip offsets at which the guessed trajectory re-observes itself.

    ``guesses`` are the scheme's [n-1, 4, 4] absolute initial transforms
    (frame i+1 -> frame 0) — IMU-derived or static; no registration
    output is needed. A pair (i, j) is a closure candidate when the
    guessed relative motion between the two frames is small (rotation
    angle < ``rot_tol`` AND translation < ``trans_tol``); IMU guesses
    carry no translation, so the rotation test is the live one there.
    ``min_skip`` keeps ordinary short-baseline neighbors (already
    covered by the default {1,2,3} graph skips) out of the closure set.

    Returns a tuple of skip offsets (empty when the trajectory never
    returns) — the format of ``RefineConfig.pose_graph_skips``.
    """
    g = np.asarray(guesses, np.float64)
    n = g.shape[0] + 1
    abs_p = np.concatenate([np.eye(4)[None], g], axis=0)
    skips = set()
    for i in range(n):
        for j in range(i + min_skip, n):
            rel = np.linalg.inv(abs_p[i]) @ abs_p[j]
            ang = float(
                np.arccos(np.clip((np.trace(rel[:3, :3]) - 1.0) / 2.0, -1, 1))
            )
            if ang < rot_tol and np.linalg.norm(rel[:3, 3]) < trans_tol:
                skips.add(j - i)
    return tuple(sorted(skips))


def closure_pairs(n: int, skips: Sequence[int]) -> list:
    """All (i, j) frame pairs implied by closure skip offsets."""
    return [(i, i + off) for off in skips for i in range(n - off)]


def texture_score(clouds, max_frames: int = 3) -> float:
    """Mean absolute image-space intensity gradient over valid pixels —
    the cheap 'is there texture for the colored residual to use' signal.
    Sampled from the first ``max_frames`` organized frames."""
    vals = []
    for c in clouds[:max_frames]:
        i = intensity(c.rgb)
        gx = jnp.abs(jnp.diff(i, axis=1))
        gy = jnp.abs(jnp.diff(i, axis=0))
        vx = c.valid[:, 1:] & c.valid[:, :-1]
        vy = c.valid[1:] & c.valid[:-1]
        s = jnp.sum(jnp.where(vx, gx, 0.0)) + jnp.sum(jnp.where(vy, gy, 0.0))
        m = jnp.sum(vx) + jnp.sum(vy)
        vals.append(s / jnp.maximum(m, 1))
    return float(np.mean([np.asarray(v) for v in vals]))


@partial(
    jax.jit, static_argnames=("pair_groups", "radius", "color_weight")
)
def _consistency_score(
    fulls: Cloud,
    totals,
    pair_groups: tuple,
    radius: float,
    color_weight: float = 0.0,
):
    """Trajectory consistency at the given absolute poses, WITHOUT
    ground truth: for every validation pair (i, j), frame j's full cloud
    is scored against frame i's, both placed by their poses.

    Two residuals per pair (both dimensionless):

    * geometric — capped mean-square NN distance / radius^2. Far /
      non-overlapping points saturate at the cap instead of dominating,
      so a diverged pair costs ~1 while a tight pair contributes its
      true (normalized) residual.
    * photometric (``color_weight`` > 0) — mean-square intensity
      difference at the INLIER NN matches (d^2 < radius^2). Drift along
      a surface slides NN correspondences without raising the geometric
      residual at all (the same in-plane null space the colored-ICP
      residual exists for, ops/umeyama.plane_fit); with texture present
      the slide IS visible photometrically. Inlier-only: cross-surface
      matches would compare unrelated texture.

    ``pair_groups`` is a tuple of pair tuples; each group pools its
    pairs' sums and the result is the per-group score VECTOR (selection
    compares groups pairwise — see :func:`select`). Grouping is the
    sensitivity mechanism, measured twice over: pooling everything
    together dilutes a diverged closure under dozens of healthy
    sequential pairs (a 3.1e-1-error loop_drift run scored within 14% of
    an accurate one — under the selection margin), and reducing the
    groups to their WORST scalar lets a low-overlap group's saturation
    floor (skip-4 pairs under 0.25 rad/frame yaw saturate ~90% of their
    points at ANY accuracy) mask the closure group's discrimination
    entirely."""
    dtype = totals.dtype
    eye = jnp.eye(4, dtype=dtype)
    abs_p = jnp.concatenate([eye[None], totals], axis=0)
    cap2 = radius * radius
    n_groups = len(pair_groups)
    # ONE traced NN sweep for every pair (lax.map over stacked pair
    # indices, per-group segment sums after) — unrolling a Pallas sweep
    # instance per pair made the score program's remote compile dominate
    # the whole auto run.
    iis, jjs, gis = [], [], []
    for g, pairs in enumerate(pair_groups):
        for i, j in pairs:
            iis.append(i)
            jjs.append(j)
            gis.append(g)
    ii_a = jnp.asarray(iis, jnp.int32)
    jj_a = jnp.asarray(jjs, jnp.int32)
    gi_a = jnp.asarray(gis, jnp.int32)

    def one_pair(args):
        i, j = args
        src = apply_transform_cloud(
            abs_p[j], jax.tree.map(lambda x: x[j], fulls)
        )
        tgt = apply_transform_cloud(
            abs_p[i], jax.tree.map(lambda x: x[i], fulls)
        )
        d2, idx = _nn_sweep(src.xyz, src.valid, tgt.xyz, tgt.valid)
        s, m = _capped_sum(d2, src.valid, radius)
        if color_weight > 0.0:
            ib = intensity(src.rgb)
            it = intensity(jnp.take(fulls.rgb[i], idx, axis=0))
            inl = src.valid & (d2 < cap2)
            w = inl.astype(dtype)
            cs = jnp.sum((ib - it) ** 2 * w)
            cm = jnp.sum(w)
        else:
            cs = jnp.zeros((), dtype)
            cm = jnp.zeros((), dtype)
        return s, m, cs, cm

    s_a, m_a, cs_a, cm_a = jax.lax.map(one_pair, (ii_a, jj_a))
    num = jax.ops.segment_sum(s_a, gi_a, n_groups)
    den = jax.ops.segment_sum(m_a, gi_a, n_groups)
    scores = num / jnp.maximum(den, 1.0) / cap2
    if color_weight > 0.0:
        cnum = jax.ops.segment_sum(cs_a, gi_a, n_groups)
        cden = jax.ops.segment_sum(cm_a, gi_a, n_groups)
        scores = scores + color_weight * cnum / jnp.maximum(cden, 1.0)
    return scores


@dataclasses.dataclass
class AutoResult:
    """Outcome of :func:`auto_register`."""

    global_cloud: Cloud
    total_transforms: jnp.ndarray
    selected: str                 # winning candidate name
    scores: dict                  # name -> per-group consistency tuple
                                  # (fast path: only the ran candidates)
    closures: tuple               # detected closure skip offsets
    texture: float                # measured texture score
    scheme: object                # the winning scheme instance (diagnostics)
    escalated: bool = True        # False = fast path kept the simplest
                                  # candidate without running the ladder


def build_ladder(
    texture: float, closures: tuple, texture_min: float = 0.001
) -> dict:
    """The candidate ladder, simplest first, gated on the trajectory's
    own signals: the colored fine stage only when texture is present
    (the photometric rows have nothing to hold on to otherwise, and
    colored REGRESSES loop trajectories 3x — RESULTS.md), the pose graph
    only when the guessed trajectory has closure structure.

    ``texture_min`` calibration (measured texture_score on the synthetic
    robustness scenes): full texture 0.0052, the `combined` scenario's
    30% contrast + heavy noise 0.0016 — where the colored stage is the
    measured best mechanism and MUST enter the ladder — and
    `low_texture`'s 15% contrast 0.0008, where color measures identical
    to map (candidate run wasted). 0.001 separates the two."""
    from rspc_tpu.presets import north_star_config, robust_config

    candidates = {"north_star": north_star_config()}
    candidates["robust_map"] = robust_config(anchor_mode="map")
    if texture >= texture_min:
        candidates["robust_color"] = robust_config(
            anchor_mode="map", color=True
        )
    if closures:
        cfg_g = robust_config(anchor_mode="map", pose_graph=True)
        cfg_g = dataclasses.replace(
            cfg_g,
            refine=dataclasses.replace(
                cfg_g.refine,
                pose_graph_skips=tuple(sorted({1, 2, 3} | set(closures))),
            ),
        )
        candidates["robust_graph"] = cfg_g
    return candidates


def select(scores: dict, margin: float) -> str:
    """Hysteresis selection over an ORDERED {name: score-vector} dict
    (simplest first; each vector holds the per-group consistency scores,
    lower is better). A challenger takes over only when it DEMONSTRATES
    an improvement: at least one group better than the incumbent's by
    ``margin``, and no group worse by ``margin``.

    ``margin`` is an ABSOLUTE difference in the normalized score units
    (fraction of the cap^2 mean-square, see _consistency_score) — a
    margin of 0.015 means "1.5% of the saturation budget moved". A
    FRACTIONAL margin was measured too blunt: the scores carry a large
    common floor (inter-frame voxel sampling residual + low-overlap
    saturation, 0.17 on a perfectly-aligned clean pair, up to ~0.9 on
    hard trajectories), so a 10x accuracy difference can be only ~6% of
    the total while 0.04 absolute — the floor is common to every
    candidate on the same validation pairs, differences are the signal.

    Per-group comparison is equally load-bearing (measured, RESULTS.md
    r4): pooling all pairs dilutes a diverged closure group under
    healthy sequential pairs, and taking the worst group lets a
    low-overlap group's saturation floor mask the discriminating group.
    A mechanism built for one failure mode (closures for loop drift)
    shows up in ITS group; requiring no-regression elsewhere keeps e.g.
    the colored candidate from winning a loop trajectory on a fluke.
    Scalars are accepted as 1-vectors."""
    names = list(scores)

    def vec(v):
        return tuple(v) if hasattr(v, "__len__") else (v,)

    winner = names[0]
    for name in names[1:]:
        cur, inc = vec(scores[name]), vec(scores[winner])
        wins = any(i - c > margin for c, i in zip(cur, inc))
        safe = all(c - i <= margin for c, i in zip(cur, inc))
        if wins and safe:
            winner = name
    return winner


def collapse_signature(fine_inliers, frac: float = 0.15) -> bool:
    """The texture-starved drift signature the colored fine stage was
    built for (RESULTS.md `combined`): fine-cap edge inlier counts
    collapsing across the chain — late frames' minimum under ``frac`` of
    early frames' maximum. ``fine_inliers`` is the per-pair
    n_correspondences sequence of a finished run."""
    fine_inl = np.asarray(fine_inliers, np.float64)
    if fine_inl.size < 2:
        return False
    third = max(2, fine_inl.size // 3)
    early = float(fine_inl[:third].max())
    late = float(fine_inl[-third:].min())
    return early > 0 and late / max(early, 1.0) < frac


def colored_tiebreak(
    winner: str, scores: dict, collapsed: bool, margin: float
) -> str:
    """Decide whether the colored candidate takes the win on its
    mechanism's measured record (see auto_register's inline rationale).

    The tiebreak fires ONLY when all three hold: the collapse signature
    fired on the winning run, the colored candidate actually ran, and
    its score is within ``margin`` of the incumbent on EVERY validation
    group. The third condition is the false-positive guard: a collapse
    signature on a trajectory where color is measurably WRONG (e.g.
    wrong-lock aliasing on repeated texture, or a loop where color
    regresses the closure group) shows up as a >margin regression on
    some group, and the incumbent is kept."""
    if not collapsed or "robust_color" not in scores:
        return winner
    if winner == "robust_color":
        return winner

    def vec(v):
        return tuple(v) if hasattr(v, "__len__") else (v,)

    cur, inc = vec(scores["robust_color"]), vec(scores[winner])
    within = all(c - i <= margin for c, i in zip(cur, inc))
    return "robust_color" if within else winner


def auto_register(
    clouds,
    thetas: Optional[np.ndarray] = None,
    rads: Optional[float] = None,
    margin: float = 0.015,
    texture_min: float = 0.001,
    score_radius: float = 0.05,
    candidates: Optional[dict] = None,
    fast: bool = True,
    escalate_score: float = 0.30,
) -> AutoResult:
    """Register a sequence with measured candidate selection (see module
    docstring). ``thetas``/``rads`` follow the scheme ctor conventions
    (capture IMU output / fixed per-frame yaw).

    ``margin`` is the hysteresis: a later (more complex) candidate must
    improve some validation group's consistency score by this ABSOLUTE
    amount (normalized units, see :func:`select`) without regressing
    another to be selected. ``texture_min`` gates the colored candidate
    (mean |dI| per pixel step; texture-free scenes give the photometric
    rows nothing to hold on to). ``candidates`` overrides the ladder as
    an ordered {name: PipelineConfig} dict.

    ``fast`` (VERDICT r4 #8): run the FIRST (simplest) candidate alone
    and return it unless the trajectory's own signals say it is hard —
    closure structure in the guesses (the loop scenarios, where the
    ladder's map/graph candidates exist), the fine-inlier collapse
    signature on the first run (the texture-starved drift wall), or the
    first run's SEQUENTIAL-pair group scoring above ``escalate_score``.
    The sequential group is the right escalation signal because its
    floor is trajectory-independent (pure inter-frame voxel sampling
    residual), while the mid-skip group's floor moves with per-frame
    motion (overlap saturation) — measured on the full matrix at seed 2
    (RESULTS.md r5): clean / low_texture sequential scores are 0.173 /
    0.172 while EVERY scenario that needs a robust candidate measures
    >= 0.449 (noise_mild), so 0.30 splits them with ~1.5x margin on
    BOTH sides; the clean mid-skip score (0.503) would sit above any
    workable shared threshold. A clean trajectory then costs ONE chain +
    one score instead of the 3-4 chain ladder; any escalation signal
    runs the remaining candidates and selects exactly as ``fast=False``
    would.
    """
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    n = len(clouds)
    guess_kw = {"thetas": thetas} if thetas is not None else {}
    if thetas is None and rads is not None:
        guess_kw = {"rads": rads}

    # --- trajectory signals (no registration output needed) -----------
    probe = NDTEdgeBasedRegistration(**guess_kw)
    guesses_np = np.asarray(probe._guesses(n))
    closures = detect_closures(guesses_np)
    tex = texture_score(clouds)

    if candidates is None:
        candidates = build_ladder(tex, closures, texture_min)

    # Validation pair groups (worst group wins — see _consistency_score):
    # sequential pairs keep locally-broken runs from winning; mid-skip
    # pairs amplify integrated drift ~skip-fold while keeping overlap;
    # closure pairs are where out-and-back drift becomes fully visible.
    mid = max(2, min(4, n - 1))
    groups = [
        tuple((i, i + 1) for i in range(n - 1)),
        tuple((i, i + mid) for i in range(n - mid)),
    ]
    if closures:
        groups.append(tuple(closure_pairs(n, closures)))
    pair_groups = tuple(g for g in groups if g)
    score_color = 1.0 if tex >= texture_min else 0.0

    # --- run + score candidates ---------------------------------------
    runs = {}
    scores = {}
    fulls_ref = None

    def run_and_score(name, cfg):
        nonlocal fulls_ref
        s = NDTEdgeBasedRegistration(config=cfg, **guess_kw)
        g = s.registration(clouds)
        out, _n = s._fused_out
        if fulls_ref is None:
            # one canonical full-cloud set scores every candidate — the
            # per-frame clouds are pose-independent data, and a shared
            # target removes any cloud-prep differences from the vote
            fulls_ref = Cloud(
                xyz=out["full_down"].xyz,
                rgb=out["full_down"].rgb,
                valid=out["full_down"].valid,
            )
        runs[name] = (s, g)
        scores[name] = tuple(
            float(v)
            for v in _consistency_score(
                fulls_ref,
                s.total_transforms,
                pair_groups,
                score_radius,
                color_weight=score_color,
            )
        )

    names = list(candidates)
    run_and_score(names[0], candidates[names[0]])

    # fast path (VERDICT r4 #8): keep the simplest candidate outright
    # when nothing says the trajectory is hard — see docstring
    escalate = (
        not fast
        or len(names) == 1
        or bool(closures)
        or collapse_signature(
            [int(f.n_correspondences) for _, f in runs[names[0]][0].results]
        )
        # sequential group only — pair_groups[0] by construction; the
        # mid-skip group's floor moves with per-frame motion (docstring)
        or scores[names[0]][0] > escalate_score
    )
    if escalate:
        for name in names[1:]:
            run_and_score(name, candidates[name])

    # --- hysteresis selection: simplest-first, challengers must win ---
    winner = select(scores, margin)

    # Colored tiebreak on the inlier-collapse signature. The colored
    # fine stage's own scenario — texture-starved DRIFT (RESULTS.md
    # `combined`: late frames see one weakly-textured wall, fine-cap
    # edge inliers collapse 1118 -> 45, pose under-observed in-plane) —
    # is invisible to BOTH consistency residuals: in-plane drift slides
    # NN matches along the surface (geometric term flat) and the
    # photometric term's floor is the texture sampled at ~voxel-size NN
    # offsets, which dwarfs the drift increment at 30% contrast. So when
    # the signature the mechanism was built for fires on the winning
    # run (texture present + inlier collapse across the chain) and the
    # colored candidate is within-noise on every validation group (it
    # ran; a regression > margin would mean color is measurably hurting,
    # e.g. aliasing on repeated texture — keep the incumbent), prefer it
    # on the mechanism's measured record rather than an unobservable
    # score difference.
    if "robust_color" in runs and winner != "robust_color":
        collapsed = collapse_signature(
            [int(f.n_correspondences) for _, f in runs[winner][0].results]
        )
        winner = colored_tiebreak(winner, scores, collapsed, margin)

    s, g = runs[winner]
    return AutoResult(
        global_cloud=g,
        total_transforms=s.total_transforms,
        selected=winner,
        scores=scores,
        closures=closures,
        texture=tex,
        scheme=s,
        escalated=escalate,
    )
