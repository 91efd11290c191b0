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
   NN consistency over validation pairs — every sequential pair plus
   every detected closure pair, evaluated on the full voxel-downsampled
   clouds at the candidate's final absolute poses. Closure pairs are
   exactly where integrated drift becomes visible; sequential pairs
   keep locally-broken runs from winning on closures alone.
4. Keep the SIMPLEST candidate unless a challenger beats the incumbent
   score by ``margin`` (hysteresis): on a clean trajectory the robust
   stack measures within noise of plain and plain is kept; a mechanism
   must demonstrate a real, measured improvement on THIS trajectory to
   be selected.

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
    from rspc_tpu.ops.colorgrad import intensity

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


@partial(jax.jit, static_argnames=("pairs", "radius"))
def _consistency_score(fulls: Cloud, totals, pairs: tuple, radius: float):
    """Trajectory consistency at the given absolute poses: for every
    validation pair (i, j), the capped mean-square NN distance of frame
    j's full cloud against frame i's, both placed by their poses. Far /
    non-overlapping points saturate at ``radius``^2 instead of
    dominating, so a diverged pair costs the cap while a tight pair
    contributes its true residual. Returns the pooled mean over all
    pairs' points (one scalar; lower is better)."""
    dtype = totals.dtype
    eye = jnp.eye(4, dtype=dtype)
    abs_p = jnp.concatenate([eye[None], totals], axis=0)
    num = jnp.zeros((), dtype)
    den = jnp.zeros((), dtype)
    for i, j in pairs:
        src = apply_transform_cloud(
            abs_p[j], jax.tree.map(lambda x: x[j], fulls)
        )
        tgt = apply_transform_cloud(
            abs_p[i], jax.tree.map(lambda x: x[i], fulls)
        )
        d2, _ = _nn_sweep(src.xyz, src.valid, tgt.xyz, tgt.valid)
        s, m = _capped_sum(d2, src.valid, radius)
        num = num + s
        den = den + m
    return num / jnp.maximum(den, 1.0)


@dataclasses.dataclass
class AutoResult:
    """Outcome of :func:`auto_register`."""

    global_cloud: Cloud
    total_transforms: jnp.ndarray
    selected: str                 # winning candidate name
    scores: dict                  # candidate name -> float consistency
    closures: tuple               # detected closure skip offsets
    texture: float                # measured texture score
    scheme: object                # the winning scheme instance (diagnostics)


def build_ladder(
    texture: float, closures: tuple, texture_min: float = 0.002
) -> dict:
    """The candidate ladder, simplest first, gated on the trajectory's
    own signals: the colored fine stage only when texture is present
    (the photometric rows have nothing to hold on to otherwise, and
    colored REGRESSES loop trajectories 3x — RESULTS.md), the pose graph
    only when the guessed trajectory has closure structure."""
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
    """Hysteresis selection over an ORDERED {name: score} dict (simplest
    first, lower is better): a challenger must beat the incumbent by
    ``margin`` (fractionally) to take over — within-noise ties keep the
    simpler candidate."""
    names = list(scores)
    winner = names[0]
    for name in names[1:]:
        if scores[name] < scores[winner] * (1.0 - margin):
            winner = name
    return winner


def auto_register(
    clouds,
    thetas: Optional[np.ndarray] = None,
    rads: Optional[float] = None,
    margin: float = 0.15,
    texture_min: float = 0.002,
    score_radius: float = 0.1,
    candidates: Optional[dict] = None,
) -> AutoResult:
    """Register a sequence with measured candidate selection (see module
    docstring). ``thetas``/``rads`` follow the scheme ctor conventions
    (capture IMU output / fixed per-frame yaw).

    ``margin`` is the hysteresis: a later (more complex) candidate must
    improve the pooled consistency score by this fraction over the
    current incumbent to be selected. ``texture_min`` gates the colored
    candidate (mean |dI| per pixel step; texture-free scenes give the
    photometric rows nothing to hold on to). ``candidates`` overrides
    the ladder as an ordered {name: PipelineConfig} dict.
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

    pairs = tuple(
        [(i, i + 1) for i in range(n - 1)] + closure_pairs(n, closures)
    )

    # --- run + score every candidate ----------------------------------
    runs = {}
    scores = {}
    fulls_ref = None
    for name, cfg in candidates.items():
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
        scores[name] = float(
            _consistency_score(
                fulls_ref, s.total_transforms, pairs, score_radius
            )
        )

    # --- hysteresis selection: simplest-first, challengers must win ---
    winner = select(scores, margin)
    s, g = runs[winner]
    return AutoResult(
        global_cloud=g,
        total_transforms=s.total_transforms,
        selected=winner,
        scores=scores,
        closures=closures,
        texture=tex,
        scheme=s,
    )
