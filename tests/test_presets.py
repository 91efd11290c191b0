"""Preset invariants.

``robust_config`` exists because a knob validated on the clean scene
silently broke the hard-trajectory presets (NDT source subsample
4096 -> 2048 took partial_overlap rescue/map from 1.2e-2/3.7e-3 to
~4.8e-1 — RESULTS.md r2 regression note). These tests pin the contract
so a future preset edit cannot detach the robustness stack from the
dense coarse stage it was measured with.
"""

from rspc_tpu.presets import north_star_config, robust_config


def test_robust_config_pins_dense_ndt_source():
    cfg = robust_config()
    # the whole point of the preset: hard trajectories need the denser
    # coarse stage (measured bisection, RESULTS.md)
    assert cfg.ndt.max_source_points >= 4096
    assert cfg.coarse_warm_start is True
    assert cfg.rescue_inlier_frac == 0.55
    # base preset stays reference-parity: robustness mechanisms off
    base = north_star_config()
    assert base.coarse_warm_start is False
    assert not base.rescue_inlier_frac


def test_robust_config_modes():
    cfg = robust_config(anchor_mode="map", pose_graph=True)
    assert cfg.refine.anchor_mode == "map"
    assert cfg.refine.pose_graph is True
    # defaults untouched when not requested
    plain = robust_config()
    assert plain.refine.anchor_mode == north_star_config().refine.anchor_mode
    assert plain.refine.pose_graph is False


def test_robust_config_only_intended_deltas():
    """Everything not named in the docstring matches the north star —
    the preset is a delta, not a fork."""
    base = north_star_config()
    cfg = robust_config()
    import dataclasses

    # intended delta: the fine-solve stride is a clean-scene speed knob;
    # drift trajectories need every edge inlier (see robust_config)
    assert cfg.icp.max_source_points == 0
    ic = dataclasses.replace(
        cfg.icp, max_source_points=base.icp.max_source_points
    )
    assert ic == base.icp
    assert cfg.edge == base.edge
    assert cfg.voxel == base.voxel
    assert cfg.refine == base.refine
    assert cfg.coarse_guard_cap == base.coarse_guard_cap
    nd = dataclasses.replace(cfg.ndt, max_source_points=base.ndt.max_source_points)
    assert nd == base.ndt
