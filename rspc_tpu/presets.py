"""Shared pipeline presets.

``north_star_config()`` is THE configuration measured by ``bench.py``
(the BASELINE.json north-star workload) and re-used by
``benchmarks/workloads.py`` — one definition so the RESULTS.md table and
the bench can never drift apart. Rationale for each knob lives in the
inline comments.

``robust_config()`` layers the opt-in robustness mechanisms (constant-
velocity warm start, gated wide-cap rescue, optionally progressive map
anchoring / pose-graph relaxation) on top, WITH the denser 4096-point
NDT coarse stage they need: the north-star preset's 2048-point subsample
is measured identical on the clean scene but on hard trajectories
(partial overlap: 14 deg + 14 cm per frame) it starves the coarse
basin — rescue/map regressed 1.2e-2/3.7e-3 -> ~4.8e-1 at 2048 and
recovered exactly at 4096 (RESULTS.md robustness matrix, r2).
"""

from __future__ import annotations

import dataclasses

from rspc_tpu.config import (
    EdgeConfig,
    ICPConfig,
    NDTConfig,
    PipelineConfig,
    RefineConfig,
    VoxelConfig,
)


def north_star_config() -> PipelineConfig:
    """Reference algorithmic defaults with TPU capacity/accuracy knobs
    sized for the 10-frame 640x480 north-star workload."""
    return PipelineConfig(
        # fine-stage source stride: _stride_cloud keeps
        # cap/ceil(cap/max) points of the VOXEL-DOWNSAMPLED edge cloud
        # (10240-cap here, so step 2 -> 5120 points kept), not 8192 of
        # the raw 16384-cap edge cloud. The sweeps are linear in the
        # source count and the LLS pose from half the (well-spread)
        # edge points is unchanged — bench err identical (3.29e-4) at
        # ~8% less wall; the full cloud still merges. 4096 was measured
        # to start moving the err (3.4e-4). Per the r2 "2048-NDT-subsample" lesson the full
        # matrix WAS re-run: geometric hard rows are unchanged
        # (partial_overlap map 3.65e-3) but loop_drift cells pay 10-20%
        # (map 2.16e-2 -> 2.58e-2) — so robust_config() unpins this back
        # to 0, exactly as it re-densifies the NDT source.
        icp=ICPConfig(target_chunk=4096, max_source_points=8192),
        # DIRECT7-style neighborhood: ~4x fewer gathers in the NDT score
        # path for near-identical optima (the coarse guard + refine stage
        # absorb the residual difference). 4096-point uniform subsample:
        # the coarse stage only has to land inside the fine stage's
        # basin, and every Newton pass is linear in the source count.
        # transformation_epsilon 2.5x the PCL default: the coarse stage
        # only needs to reach the fine/anchor stages' basin, and the last
        # few Newton+line-search passes per pair are pure overhead there.
        ndt=NDTConfig(
            neighborhood=7,
            # 2048-point uniform subsample: Newton cost is linear in the
            # source count and the coarse stage only has to land inside
            # the fine/anchor basin — bench err identical to 4096 (and
            # even 1024), ~9 ms saved
            max_source_points=2048,
            transformation_epsilon=0.025,
        ),
        # coarse_warm_start is left OFF: measured no wall-time gain here
        # (the looser NDT epsilon already removed the tail iterations) and
        # with it on, the never-worsen guard's fallback is the WARMED
        # guess — a contaminated correction would poison both hypotheses.
        # only the RGB_CANNY class feeds registration (the reference
        # computes all five but consumes one — PCL setEdgeType analog)
        edge=EdgeConfig(max_edge_points=16384, edge_types=("rgb_canny",)),
        voxel=VoxelConfig(leaf_size=0.01, max_points=10240),
        # Beyond-reference accuracy stages: drift-free anchoring of every
        # frame against frame 0 on full voxel-downsampled clouds (edge
        # points are pixel-grid samples whose in-plane bias caps
        # point-to-point accuracy at a few mm; see RefineConfig).
        refine=RefineConfig(
            enabled=True, leaf_size=0.04, max_points=10240,
            # 2x2 pixel decimation before the 4 cm voxel means: a voxel
            # spans >10 px/axis at these depths, so the means keep dozens
            # of samples each while the downsample traffic drops 4x.
            decimate=2,
            # Drop crease voxels (cells straddling two surfaces): their
            # means lie on neither plane and their averaged normals point
            # nowhere, which fed the anchor stage a consistent bias that
            # DRAGGED frames off sub-mm starts (measured: one frame
            # drifted monotonically to 4e-3 before this filter; 4e-4
            # after).
            normal_purity=0.995,
            # anchor-only: the drift-free per-frame anchoring subsumes
            # the in-chain refinement (same accuracy, one fewer p2l stage
            # per pair inside the scan); annealed wide->tight caps
            # converge in 3+3 iterations from chain-initialized starts
            chain=False, anchor_to_first=True,
            # the anchor is NN-sweep-bound; 4096 of 10240 points decide
            # and fit the same poses (bench err unchanged, ~25 ms saved)
            anchor_max_points=4096,
            anchor_stages=(
                ICPConfig(
                    max_iterations=3,
                    max_correspondence_distance=0.05,
                    transformation_epsilon=1e-12,
                    euclidean_fitness_epsilon=1e-12,
                    mse_threshold_absolute=1e-16,
                    variant="point_to_plane",
                    huber_delta=0.003,
                    compute_fitness=False,
                    use_pallas=False,
                    target_chunk=16384,
                ),
                ICPConfig(
                    max_iterations=3,
                    max_correspondence_distance=0.02,
                    transformation_epsilon=1e-12,
                    euclidean_fitness_epsilon=1e-12,
                    mse_threshold_absolute=1e-16,
                    variant="point_to_plane",
                    huber_delta=0.001,
                    compute_fitness=False,
                    use_pallas=False,
                    target_chunk=16384,
                ),
            ),
        ),
        # Never let the 1 m-resolution NDT stage worsen a good guess.
        coarse_guard_cap=0.1,
    )


def robust_config(
    anchor_mode: str | None = None,
    pose_graph: bool = False,
    color: bool = False,
    color_weight: float = 2.0,
) -> PipelineConfig:
    """North-star preset + the robustness stack (all opt-in mechanisms
    measured in the RESULTS.md adversarial matrix).

    * ``coarse_warm_start``: constant-velocity prediction of each pair's
      motion — fixes the systematic drift of static/IMU guesses under
      per-frame translation.
    * ``rescue_inlier_frac``: fine-cap inlier-collapse detector firing a
      gated 10 cm wide-cap re-solve (never-worsen guarded).
    * ``ndt.max_source_points=4096``: hard trajectories need the denser
      coarse stage (see module docstring); costs ~9 ms over the
      clean-scene 2048 default.
    * ``icp.max_source_points=0``: the north-star preset's 8192-point
      fine-solve stride is free on the clean scene but costs 10-20% max
      err on the loop_drift cells (map 2.16e-2 -> 2.58e-2 measured
      on-chip) — drift trajectories need every edge inlier in the
      solve, same lesson as the NDT knob above.
    * ``anchor_mode="map"`` (opt): progressive local-map anchoring for
      trajectories that rotate away from frame 0.
    * ``pose_graph=True`` (opt): SE(3) relaxation over redundant
      skip-pair constraints — averages per-pair noise instead of
      integrating it.
    * ``color=True`` (opt): colored-ICP residual (Park-Zhou-Koltun;
      ops/colorgrad.py) in the FINE chain stage — the fine stage runs as
      point-to-plane on edge clouds carrying tangent-plane intensity
      gradients (EdgeConfig.carry_cgrad; RGB canny edges are exactly the
      high-gradient pixels). This adds the in-plane observability the
      geometric plane residual lacks on weakly-textured planar scenes
      (the `combined` drift wall: per-pair drift accumulates as fine-cap
      edge inliers collapse — measured on-chip: fine-stage color
      1.2e-1 -> 7.8e-2 max err with the best mean (3.0e-2); anchor-stage
      color (RefineConfig.color, also available) reached only 9.2e-2
      with a worse mean, and both together matched fine-only's max with
      a worse mean). ``color_weight`` scales the photometric rows
      against the geometric ones (intensity vs meter units; see
      ICPConfig).
    """
    cfg = north_star_config()
    refine = cfg.refine
    if anchor_mode is not None:
        refine = dataclasses.replace(refine, anchor_mode=anchor_mode)
    if pose_graph:
        refine = dataclasses.replace(refine, pose_graph=True)
    if color:
        cfg = dataclasses.replace(
            cfg,
            icp=dataclasses.replace(
                cfg.icp,
                variant="point_to_plane",
                huber_delta=0.003,
                color_weight=color_weight,
            ),
            edge=dataclasses.replace(cfg.edge, carry_cgrad=True),
        )
    return dataclasses.replace(
        cfg,
        coarse_warm_start=True,
        rescue_inlier_frac=0.55,
        ndt=dataclasses.replace(cfg.ndt, max_source_points=4096),
        icp=dataclasses.replace(cfg.icp, max_source_points=0),
        refine=refine,
    )
