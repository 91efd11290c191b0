"""Tests for the trajectory-adaptive ``auto`` scheme (VERDICT r3 #4).

The reference has one fixed behavior per scheme
(src/icp_edge_based_registration.hpp:26-130); ``auto_register`` instead
measures a candidate ladder on the trajectory itself and keeps the
simplest candidate that wins. The ladder construction and the hysteresis
selection rule are pure functions tested directly (running the full
ladder compiles several fused pipelines — minutes of XLA:CPU compile per
config — so only ONE small end-to-end run is exercised here; the
on-chip robustness matrix measures the full thing,
benchmarks/robustness.py ndt_edge_auto).
"""

import numpy as np

from rspc_tpu.capture.synthetic import SyntheticSequence
from rspc_tpu.ops.deproject import Intrinsics
from rspc_tpu.registration.auto import (
    auto_register,
    build_ladder,
    closure_pairs,
    collapse_signature,
    colored_tiebreak,
    detect_closures,
    select,
    texture_score,
)


def _yaw_abs(yaws):
    """Absolute [n-1,4,4] guesses from per-frame yaw angles (frame 0 is
    the identity and is not included, matching scheme._guesses)."""
    out = []
    for y in yaws[1:]:
        c, s = np.cos(y), np.sin(y)
        t = np.eye(4, dtype=np.float64)
        t[0, 0] = c
        t[0, 2] = s
        t[2, 0] = -s
        t[2, 2] = c
        out.append(t)
    return np.stack(out)


def test_detect_closures_out_and_back():
    # out-and-back yaw sweep: frames 6..9 re-observe frames 4..1
    yaws = [-0.2 * y for y in (0, 1, 2, 3, 4, 5, 4, 3, 2, 1)]
    skips = detect_closures(_yaw_abs(yaws))
    # equal-yaw pairs are (1,9),(2,8),(3,7),(4,6) -> skips {8,6,4}
    # ((4,6) survives min_skip=4; nothing shorter does)
    assert set(skips) == {4, 6, 8}, skips


def test_detect_closures_monotonic_none():
    yaws = [-0.15 * y for y in range(10)]
    assert detect_closures(_yaw_abs(yaws)) == ()


def test_closure_pairs():
    assert closure_pairs(5, (3,)) == [(0, 3), (1, 4)]
    assert closure_pairs(4, ()) == []


def test_texture_score_orders_contrast():
    intr = Intrinsics.simple(160, 120)
    full = SyntheticSequence(n_frames=1, intr=intr).clouds()
    low = SyntheticSequence(
        n_frames=1, intr=intr, texture_contrast=0.05
    ).clouds()
    assert texture_score(full) > 3 * texture_score(low)


def test_build_ladder_gates_on_signals():
    # textureless + monotonic: neither colored nor graph enters
    plain = build_ladder(texture=0.0, closures=())
    assert list(plain) == ["north_star", "robust_map"]
    # texture present: colored enters
    tex = build_ladder(texture=0.01, closures=())
    assert "robust_color" in tex and "robust_graph" not in tex
    # closure structure: graph enters with the closure skips merged in
    loop = build_ladder(texture=0.0, closures=(4, 6, 8))
    assert "robust_graph" in loop and "robust_color" not in loop
    skips = loop["robust_graph"].refine.pose_graph_skips
    assert set(skips) >= {1, 2, 3, 4, 6, 8}
    # ladder order is simplest-first in every case
    assert list(loop)[0] == "north_star"


def test_select_hysteresis():
    # within-noise challenger loses; a real win takes over
    assert select({"plain": 1.0, "robust": 0.99}, margin=0.15) == "plain"
    assert select({"plain": 1.0, "robust": 0.5}, margin=0.15) == "robust"
    # later challengers compare against the CURRENT winner
    assert (
        select({"a": 1.0, "b": 0.5, "c": 0.45}, margin=0.15) == "b"
    )
    assert select({"a": 1.0, "b": 0.5, "c": 0.3}, margin=0.15) == "c"
    assert select({"only": 2.0}, margin=0.15) == "only"


def test_select_per_group():
    # a challenger that wins ITS group without regressing others takes
    # over even when other (saturated) groups barely move
    m = 0.15
    assert (
        select({"plain": (0.9, 0.5, 0.8), "graph": (0.9, 0.49, 0.2)}, m)
        == "graph"
    )
    # a big win in one group cannot buy a regression in another
    assert (
        select({"plain": (0.9, 0.5, 0.8), "color": (0.9, 0.7, 0.1)}, m)
        == "plain"
    )
    # within-noise everywhere: simplest stays
    assert (
        select({"plain": (0.9, 0.5), "map": (0.89, 0.49)}, m) == "plain"
    )


def test_collapse_signature():
    # healthy chain: counts stay high -> no signature
    assert not collapse_signature([1100, 1050, 980, 1010, 990, 1020])
    # the measured `combined` shape: 1118 -> 45 fires it
    assert collapse_signature([1118, 900, 600, 300, 120, 45])
    # degenerate inputs never fire
    assert not collapse_signature([])
    assert not collapse_signature([500])
    assert not collapse_signature([0, 0, 0, 0])


def test_colored_tiebreak_false_positive_guard():
    """VERDICT r4 #2: a collapse signature where color is NOT the right
    answer must not flip the winner. When the colored candidate's score
    REGRESSES some validation group by more than the margin (color
    measurably hurting — e.g. wrong-lock aliasing on repeated texture,
    or a loop trajectory where color breaks the closure group), the
    incumbent is kept even though the signature fired."""
    m = 0.015
    # color regresses the closure group (3rd) by 4x margin: keep map
    scores = {
        "north_star": (0.50, 0.60, 0.80),
        "robust_map": (0.40, 0.50, 0.30),
        "robust_color": (0.40, 0.50, 0.36),
    }
    assert colored_tiebreak("robust_map", scores, True, m) == "robust_map"
    # within-noise on every group + collapse: tiebreak fires
    scores_ok = {
        "robust_map": (0.40, 0.50, 0.30),
        "robust_color": (0.41, 0.50, 0.31),
    }
    assert colored_tiebreak("robust_map", scores_ok, True, m) == "robust_color"
    # no collapse: never fires even within noise
    assert colored_tiebreak("robust_map", scores_ok, False, m) == "robust_map"
    # color absent from the ladder (no texture): no-op
    assert colored_tiebreak("robust_map", {"robust_map": (0.4,)}, True, m) == "robust_map"
    # color already the winner: stable
    assert colored_tiebreak("robust_color", scores_ok, True, m) == "robust_color"


def test_auto_register_end_to_end_keeps_simplest():
    """One small full run: on a clean scene the robust stack measures
    within noise of plain and hysteresis keeps plain. The ladder is
    overridden to two candidates to bound compile cost (the full default
    ladder is exercised on-chip by benchmarks/robustness.py)."""
    from rspc_tpu.presets import north_star_config, robust_config

    # 80x60, 3 frames: the same shapes as test_viz_cli's preset tests,
    # so the two fused-chain programs compile ONCE per process when the
    # modules share a test group (guesses are traced inputs)
    seq = SyntheticSequence(
        n_frames=3, yaw_step=-0.08, seed=0, intr=Intrinsics.simple(80, 60)
    )
    clouds = seq.clouds()
    res = auto_register(
        clouds,
        rads=-0.08,
        fast=False,
        candidates={
            "north_star": north_star_config(),
            "robust_map": robust_config(anchor_mode="map"),
        },
    )
    assert res.selected == "north_star", res.scores
    assert set(res.scores) == {"north_star", "robust_map"}
    assert res.closures == ()
    assert res.escalated  # fast=False always runs the full ladder
    gts = np.stack([seq.gt_transform(i) for i in range(1, 3)])
    err = float(np.abs(np.asarray(res.total_transforms) - gts).max())
    assert err < 5e-2, err
    assert int(np.asarray(res.global_cloud.valid).sum()) > 0
