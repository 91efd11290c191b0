"""Registration schemes: the reference's pipeline layer (SURVEY.md C2-C5).

Mirrors the Strategy / template-method design of src/types.hpp:14-44:

  * ``RegistrationScheme``          — protocol: ``registration(clouds) -> Cloud``
  * ``TwoPhaseRegistrationScheme``  — phase 1 ``extract_features`` per cloud,
                                      phase 2 ``global_registration``
  * ``IncrementalICP``              — plain incremental ICP (C3,
                                      src/incremental_icp.hpp)
  * ``ICPEdgeBasedRegistration``    — coarse ICP + fine ICP on edge clouds
                                      with IMU/static guesses (C4,
                                      src/icp_edge_based_registration.hpp)
  * ``NDTEdgeBasedRegistration``    — NDT coarse + ICP refine (C5,
                                      src/ndt_edge_based_registration.hpp)

TPU-first structure: the sequential per-frame chain (each pair depends on
the accumulated target, SURVEY.md §3.1) compiles to ONE ``lax.scan``
program (``_chain_scan``) — the target buffers and the incremental NDT
moment grid ride the carry as fixed-capacity HBM arrays that grow only by
mask, the per-frame convergence gate folds into the merge scatters, and
the global cloud is assembled afterwards by a batched transform +
concatenate. A semantically identical per-frame Python loop remains
available (``PipelineConfig.use_scan=False``); both honor the reference's
convergence gating (icp_edge_based_registration.hpp:113-123).

Reference quirks reproduced deliberately (SURVEY.md §7):
  * the stored feature cloud of frame 0 is voxel-downsampled in place, so
    the ``edge-0.pcd`` side dump contains the DOWNSAMPLED cloud
    (aliasing at icp_edge_based_registration.hpp:54-69);
  * IMU thetas are rebased by -theta_0 (in-loop mutation == plain
    rebasing, :83-84);
  * the static-guess accumulator advances for every frame, converged or
    not (:98-101);
  * the ICP scheme's IMU guess uses the full XYZ axis mapping while the
    NDT scheme's uses only -theta.y (:86-92 vs ndt:79-80).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import Cloud, OrganizedCloud
from rspc_tpu.config import PipelineConfig
from rspc_tpu.ops.edges import extract_edge_features
from rspc_tpu.ops.transform import (
    apply_transform_cloud,
    imu_guess_full,
    imu_guess_y,
    relative_thetas,
    static_y_guess,
)
from rspc_tpu.ops.voxel import voxel_downsample
from rspc_tpu.registration.icp import ICPResult, icp_align
from rspc_tpu.registration.ndt import build_ndt_grid, ndt_align

# The pipeline layer was split for coherence (VERDICT r2 #8); the
# re-exports below keep the historical import surface of this module
# stable for callers and tests.
from rspc_tpu.registration.bufferops import (  # noqa: F401
    _as_unorganized,
    _block_append,
    _rigid_inverse,
    _stride_cloud,
    merge_append,
)
from rspc_tpu.registration.measures import (  # noqa: F401
    _capped_mean_sq,
    _capped_sum,
    _inlier_stats,
    _nn_sweep,
)
from rspc_tpu.registration.pairsteps import (  # noqa: F401
    _guard_best,
    _guard_transform,
    _icp_pair_step,
    _imu_guesses,
    _maybe_rescue,
    _ndt_pair_step,
    _rescue_from,
)
from rspc_tpu.registration.anchor import (  # noqa: F401
    _anchor_refine,
    _anchor_refine_map,
    _map_anchor_stages,
    _pose_graph_refine,
    _refine_pair_step,
    _refine_step,
    _run_stages,
)
from rspc_tpu.registration.chainscan import (  # noqa: F401
    _assemble_global,
    _chain_scan,
    _phase1_prepare,
    _prepare_full_down,
    _registration_body,
    _registration_fused,
)


class RegistrationScheme:
    """Abstract base (reference: src/types.hpp:14-20)."""

    def registration(self, clouds: Sequence) -> Cloud:
        raise NotImplementedError



class TwoPhaseRegistrationScheme(RegistrationScheme):
    """Template method: extract features per cloud, then globally register
    (reference: src/types.hpp:22-44)."""

    def extract_features(self, cloud):
        raise NotImplementedError

    def global_registration(
        self, clouds: List[Tuple[Cloud, Cloud]]
    ) -> Cloud:
        raise NotImplementedError

    def batch_extract_features(self, clouds: Sequence):
        """Optional phase-1 fast path: subclasses may return a list of
        feature clouds for all inputs at once (None = per-cloud loop)."""
        return None

    def registration(self, clouds: Sequence) -> Cloud:
        features = self.batch_extract_features(clouds)
        if features is None:
            features = [self.extract_features(c) for c in clouds]
        feature_clouds = [
            (f, _as_unorganized(c)) for f, c in zip(features, clouds)
        ]
        return self.global_registration(feature_clouds)



class _EdgeBasedRegistration(TwoPhaseRegistrationScheme):
    """Shared skeleton of the ICP- and NDT-based edge schemes."""

    use_ndt_coarse = False
    saves_edge_pcds = False

    def __init__(
        self,
        thetas: Optional[np.ndarray] = None,
        rads: Optional[float] = None,
        config: PipelineConfig = PipelineConfig(),
        dataset_dir: Optional[str] = None,
    ):
        # ctor overloads mirror the reference (no-guess / IMU / user rads)
        self.config = config
        self.use_imu = thetas is not None
        self.thetas = (
            jnp.asarray(np.asarray(thetas, np.float32)) if thetas is not None else None
        )
        self.rads = float(rads) if rads is not None else config.default_rads
        self.dataset_dir = dataset_dir
        self.results: List[Tuple[object, ICPResult]] = []  # (coarse, fine) per frame
        self.refine_results: List[ICPResult] = []
        self.total_transforms = None  # [n-1,4,4] composed per-frame transforms
        self._full_down: Optional[List[Cloud]] = None

    def registration(self, clouds: Sequence) -> Cloud:
        r = self.config.refine
        self._full_down = None
        if r.enabled and not all(
            isinstance(c, OrganizedCloud) for c in clouds
        ):
            raise ValueError(
                "the refine stage needs organized input clouds "
                "(normal estimation is image-shaped)"
            )
        if (
            self.config.use_scan
            and len(clouds) >= 2
            and all(isinstance(c, OrganizedCloud) for c in clouds)
            and len({(c.height, c.width) for c in clouds}) == 1
        ):
            return self._registration_fused_path(clouds)
        features = self.batch_extract_features(clouds)
        if features is None:
            features = [self.extract_features(c) for c in clouds]
        if r.enabled and self._full_down is None:
            self._full_down = [
                _prepare_full_down(
                    c, self.config.edge, r.leaf_size, r.max_points,
                    r.decimate, r.normal_purity, r.color,
                )
                for c in clouds
            ]
        feature_clouds = [
            (f, _as_unorganized(c)) for f, c in zip(features, clouds)
        ]
        return self.global_registration(feature_clouds)

    def _registration_fused_path(self, clouds: Sequence) -> Cloud:
        """Uniform organized batch: run the whole pipeline as one program
        (``_registration_fused``) — no per-stage host round trips."""
        cfg = self.config
        r = cfg.refine
        n = len(clouds)
        if self.use_imu:
            assert self.thetas.shape[0] == n, "thetas/clouds size mismatch"
        stacked = OrganizedCloud(
            xyz=jnp.stack([c.xyz for c in clouds]),
            rgb=jnp.stack([c.rgb for c in clouds]),
            valid=jnp.stack([c.valid for c in clouds]),
        )
        out = _registration_fused(
            stacked,
            self._guesses(n),
            cfg.edge,
            self.use_ndt_coarse,
            cfg.ndt,
            cfg.icp,
            r,
            cfg.voxel.leaf_size,
            cfg.voxel.max_points,
            cfg.coarse_guard_cap,
            cfg.coarse_warm_start,
            cfg.rescue_inlier_frac,
            cfg.rescue_cap,
            cfg.rescue_iterations,
        )
        # Per-frame diagnostics (results / refine_results / _full_down)
        # materialize LAZILY on first attribute access: slicing the
        # stacked outputs into per-frame pytrees dispatches ~100 tiny
        # device ops, each paying tunnel latency — deferring them keeps
        # the timed registration path at one program launch.
        self._fused_out = (out, n)
        self._results = None
        self._refine_results = None
        self._full_down = None
        if r.enabled and r.anchor_to_first:
            self.anchor_accepted = out["anchor_accepted"]
        self.total_transforms = out["totals"]
        self._dump_edges(
            [out["edges_down0"]]
            + [
                jax.tree.map(lambda x: x[i], out["features"])
                for i in range(1, n)
            ]
            if self.saves_edge_pcds and self.dataset_dir is not None
            else [],
            out["target"],
        )
        return out["global"]

    def _materialize_fused(self):
        out, n = self._fused_out
        r = self.config.refine
        pick = lambda t, i: jax.tree.map(lambda x: x[i], t)
        if self._results is None:
            self._results = [
                (pick(out["coarse"], i), pick(out["fine"], i))
                for i in range(n - 1)
            ]
            self._refine_results = (
                [pick(out["refine"], i) for i in range(n - 1)]
                if (r.enabled and r.chain)
                else []
            )
            if r.enabled:
                self._full_down = [
                    pick(out["full_down"], i) for i in range(n)
                ]

    def _settle_fused(self):
        """Materialize any pending fused output, then drop the cache —
        called by both setters so an explicit assignment can never be
        overwritten by later lazy materialization, regardless of which
        attribute is assigned first."""
        if getattr(self, "_fused_out", None) is not None:
            if getattr(self, "_results", None) is None:
                self._materialize_fused()
            self._fused_out = None

    @property
    def results(self):
        if getattr(self, "_fused_out", None) is not None:
            self._materialize_fused()
        return self._results

    @results.setter
    def results(self, v):
        self._settle_fused()
        self._results = v

    @property
    def refine_results(self):
        if getattr(self, "_fused_out", None) is not None:
            self._materialize_fused()
        return self._refine_results

    @refine_results.setter
    def refine_results(self, v):
        self._settle_fused()
        self._refine_results = v

    def extract_features(self, cloud):
        if not isinstance(cloud, OrganizedCloud):
            raise ValueError(
                "edge-based registration needs organized clouds "
                "(PCL OrganizedEdgeFromRGBNormals requires an organized input)"
            )
        return extract_edge_features(cloud, self.config.edge)

    def batch_extract_features(self, clouds):
        """Phase 1 vmapped over frames when all clouds share one shape —
        one device launch for the whole sequence instead of N (the frames
        are independent; this is the per-frame data parallelism SURVEY.md
        §2c identifies). When the refine stage is on, the same launch also
        produces the full downsampled clouds with normals (the normal
        image CSEs with the edge detector's own estimate)."""
        if not all(isinstance(c, OrganizedCloud) for c in clouds):
            return None
        shapes = {(c.height, c.width) for c in clouds}
        if len(shapes) != 1 or len(clouds) < 2:
            return None
        r = self.config.refine
        stacked = OrganizedCloud(
            xyz=jnp.stack([c.xyz for c in clouds]),
            rgb=jnp.stack([c.rgb for c in clouds]),
            valid=jnp.stack([c.valid for c in clouds]),
        )
        batched, full = _phase1_prepare(
            stacked, self.config.edge, r.leaf_size, r.max_points, r.enabled,
            r.decimate, r.normal_purity, r.color,
        )
        idx = lambda t, i: jax.tree.map(lambda x: x[i], t)
        if r.enabled:
            self._full_down = [idx(full, i) for i in range(len(clouds))]
        return [idx(batched, i) for i in range(len(clouds))]

    def _guesses(self, n: int):
        """Stacked [n-1,4,4] initial guesses. The static-guess accumulator
        advances for every frame, converged or not (reference :98-101), so
        all guesses are computable up front in both modes.

        Static guesses are pure constants — built host-side in numpy (one
        transfer, zero device dispatches); IMU guesses are one vmapped
        launch over the rebased thetas."""
        if not self.use_imu:
            acc = self.rads * np.arange(1, n, dtype=np.float64)
            c, s = np.cos(acc), np.sin(acc)
            t = np.tile(np.eye(4, dtype=np.float32), (n - 1, 1, 1))
            t[:, 0, 0] = c
            t[:, 0, 2] = s
            t[:, 2, 0] = -s
            t[:, 2, 2] = c
            return jnp.asarray(t)
        return _imu_guesses(self.thetas, self.use_ndt_coarse)

    def _dump_edges(self, edges: List[Cloud], target: Cloud | None):
        if not (self.saves_edge_pcds and self.dataset_dir is not None):
            return
        from rspc_tpu.io.pcd import save_pcd

        os.makedirs(self.dataset_dir, exist_ok=True)
        for i, e in enumerate(edges):
            save_pcd(
                os.path.join(self.dataset_dir, f"edge-{i}.pcd"),
                e,
                keep_invalid=False,
            )
        if target is not None:
            save_pcd(
                os.path.join(self.dataset_dir, "edge_cloud.pcd"),
                target,
                keep_invalid=False,
            )

    def global_registration(self, clouds: List[Tuple[Cloud, Cloud]]) -> Cloud:
        cfg = self.config
        n = len(clouds)
        if self.use_imu:
            assert self.thetas.shape[0] == n, "thetas/clouds size mismatch"

        edges = [c[0] for c in clouds]
        originals = [c[1] for c in clouds]

        uniform = (
            n >= 2
            and len({e.capacity for e in edges}) == 1
            and len({o.capacity for o in originals}) == 1
            and len({e.normal is None for e in edges}) == 1
        )
        if cfg.use_scan and uniform:
            return self._global_registration_scan(edges, originals)
        return self._global_registration_loop(edges, originals)

    def _global_registration_scan(
        self, edges: List[Cloud], originals: List[Cloud]
    ) -> Cloud:
        cfg = self.config
        n = len(edges)
        refine_on = cfg.refine.enabled
        chain_refine = refine_on and cfg.refine.chain
        stack = lambda lst: jax.tree.map(lambda *x: jnp.stack(x), *lst)

        out = _chain_scan(
            stack(edges),
            stack(self._full_down) if chain_refine else None,
            self._guesses(n),
            self.use_ndt_coarse,
            cfg.ndt,
            cfg.icp,
            cfg.refine.stages,
            cfg.voxel.leaf_size,
            cfg.voxel.max_points,
            cfg.voxel.max_points * n,
            cfg.refine.max_points * n,
            cfg.coarse_guard_cap,
            cfg.refine.accept_margin,
            cfg.coarse_warm_start,
            cfg.rescue_inlier_frac,
            cfg.rescue_cap,
            cfg.rescue_iterations,
        )

        pick = lambda t, i: jax.tree.map(lambda x: x[i], t)
        self.results = [
            (pick(out["coarse"], i), pick(out["fine"], i))
            for i in range(n - 1)
        ]
        self.refine_results = (
            [pick(out["refine"], i) for i in range(n - 1)]
            if chain_refine
            else []
        )
        totals = out["totals"]
        if refine_on and cfg.refine.anchor_to_first and n >= 2:
            if cfg.refine.anchor_mode == "map":
                totals, self.anchor_accepted = _anchor_refine_map(
                    stack(self._full_down),
                    totals,
                    _map_anchor_stages(cfg.refine.anchor_stages),
                    cfg.refine.map_accept_margin,
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                )
            else:
                totals, self.anchor_accepted = _anchor_refine(
                    self._full_down[0],
                    stack(self._full_down[1:]),
                    totals,
                    cfg.refine.anchor_stages,
                    1.0,  # inlier gate: monotone rmse bound
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                    max_points=cfg.refine.anchor_max_points,
                )
        if refine_on and cfg.refine.pose_graph and n >= 3:
            totals = _pose_graph_refine(
                stack(self._full_down), totals, cfg.refine.anchor_stages,
                cfg.refine.pose_graph_skips, cfg.refine.gate_radius,
                max_points=cfg.refine.anchor_max_points,
            )
        self.total_transforms = totals
        self._dump_edges(
            [out["edges_down0"]] + list(edges[1:]), out["target"]
        )
        merge_ok = out["fine"].converged
        if getattr(self, "anchor_accepted", None) is not None and not (
            isinstance(self.anchor_accepted, tuple)
        ):
            # anchor-accepted frames are verified-aligned; merge them
            # even when the fine edge-ICP was starved (see _chain_fused)
            merge_ok = merge_ok | self.anchor_accepted
        return _assemble_global(originals, totals, merge_ok)

    def _global_registration_loop(
        self, edges: List[Cloud], originals: List[Cloud]
    ) -> Cloud:
        cfg = self.config
        n = len(edges)
        refine_on = cfg.refine.enabled
        voxel_cap = cfg.voxel.max_points
        target_cap = voxel_cap * n
        global_cap = sum(o.capacity for o in originals)
        guesses = self._guesses(n)

        # target starts as the voxel-downsampled edges of frame 0
        # (downsampled IN PLACE in the reference — edge-0.pcd dumps the
        # downsampled cloud; reproduced below)
        target0 = voxel_downsample(edges[0], cfg.voxel.leaf_size, voxel_cap)
        target = merge_append(
            Cloud.empty(
                target_cap,
                with_normal=target0.normal is not None,
                with_cgrad=target0.cgrad is not None,
            ),
            target0,
        )
        global_cloud = merge_append(Cloud.empty(global_cap), originals[0])
        edges = [target0] + list(edges[1:])
        if refine_on:
            target_full = merge_append(
                Cloud.empty(cfg.refine.max_points * n, with_normal=True),
                self._full_down[0],
            )

        self._dump_edges(edges, None)

        self.results = []
        self.refine_results = []
        totals = []
        eye4 = jnp.eye(4, dtype=jnp.float32)
        prev_total, c_local = eye4, eye4
        for idx in range(1, n):
            raw_guess = guess = guesses[idx - 1]
            if cfg.coarse_warm_start:
                # constant-velocity warm start — see _chain_scan body
                rel_g = (
                    guesses[0]
                    if idx == 1
                    else _rigid_inverse(guesses[idx - 2]) @ guesses[idx - 1]
                )
                guess = prev_total @ rel_g @ c_local
            fb = raw_guess if cfg.coarse_warm_start else None
            rescue_kw = dict(
                rescue_thresh=cfg.rescue_inlier_frac,
                rescue_cap=cfg.rescue_cap,
                rescue_iters=cfg.rescue_iterations,
            )
            if self.use_ndt_coarse:
                coarse, fine, fine_aligned = _ndt_pair_step(
                    target, edges[idx], guess, cfg.ndt, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap, cfg.coarse_guard_cap,
                    guard_fallback=fb, **rescue_kw,
                )
            else:
                coarse, fine, fine_aligned = _icp_pair_step(
                    target, edges[idx], guess, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap, cfg.coarse_guard_cap,
                    guard_fallback=fb, **rescue_kw,
                )
            self.results.append((coarse, fine))
            total = fine.transform @ coarse.transform
            if refine_on:
                ref, accepted, total = _refine_pair_step(
                    target_full, self._full_down[idx], total,
                    cfg.refine.stages, cfg.refine.accept_margin,
                )
                self.refine_results.append(ref)
                delta = jnp.where(
                    accepted, ref.transform, jnp.eye(4, dtype=total.dtype)
                )
                fine_aligned = apply_transform_cloud(delta, fine_aligned)
            if cfg.coarse_warm_start:
                # local correction gated on convergence, prediction
                # anchor ungated (see _chain_scan)
                if bool(fine.converged):
                    c_local = (
                        _rigid_inverse(rel_g) @ _rigid_inverse(prev_total)
                        @ total
                    )
                prev_total = total
            totals.append(total)
            if bool(fine.converged):
                transformed = apply_transform_cloud(total, originals[idx])
                target = merge_append(target, fine_aligned)
                if refine_on:
                    target_full = merge_append(
                        target_full,
                        apply_transform_cloud(total, self._full_down[idx]),
                    )
                global_cloud = merge_append(global_cloud, transformed)

        totals_arr = jnp.stack(totals) if totals else None
        if (
            refine_on
            and cfg.refine.anchor_to_first
            and totals_arr is not None
        ):
            if cfg.refine.anchor_mode == "map":
                totals_arr, self.anchor_accepted = _anchor_refine_map(
                    jax.tree.map(
                        lambda *x: jnp.stack(x), *self._full_down
                    ),
                    totals_arr,
                    _map_anchor_stages(cfg.refine.anchor_stages),
                    cfg.refine.map_accept_margin,
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                )
            else:
                totals_arr, self.anchor_accepted = _anchor_refine(
                    self._full_down[0],
                    jax.tree.map(
                        lambda *x: jnp.stack(x), *self._full_down[1:]
                    ),
                    totals_arr,
                    cfg.refine.anchor_stages,
                    1.0,  # inlier gate: monotone rmse bound
                    cfg.refine.gate_radius,
                    cfg.refine.gate_inlier_keep,
                    cfg.refine.gate_rmse_blowup,
                    max_points=cfg.refine.anchor_max_points,
                )
        if (
            refine_on
            and cfg.refine.pose_graph
            and totals_arr is not None
            and n >= 3
        ):
            totals_arr = _pose_graph_refine(
                jax.tree.map(lambda *x: jnp.stack(x), *self._full_down),
                totals_arr,
                cfg.refine.anchor_stages,
                cfg.refine.pose_graph_skips,
                cfg.refine.gate_radius,
                max_points=cfg.refine.anchor_max_points,
            )
        self.total_transforms = totals_arr

        if self.saves_edge_pcds and self.dataset_dir is not None:
            from rspc_tpu.io.pcd import save_pcd

            save_pcd(
                os.path.join(self.dataset_dir, "edge_cloud.pcd"),
                target,
                keep_invalid=False,
            )
        if refine_on and cfg.refine.anchor_to_first and totals_arr is not None:
            # anchored transforms supersede the in-loop merges;
            # anchor-accepted frames merge even if fine edge-ICP starved
            # (see _chain_fused)
            conv = jnp.asarray(
                [bool(f.converged) for _, f in self.results]
            )
            if not isinstance(self.anchor_accepted, tuple):
                conv = conv | jnp.asarray(self.anchor_accepted)
            return _assemble_global(originals, totals_arr, conv)
        return global_cloud



class ICPEdgeBasedRegistration(_EdgeBasedRegistration):
    """Coarse ICP + fine ICP on RGB-edge clouds; used by ``--all``
    (reference C4). Saves edge-{i}.pcd / edge_cloud.pcd side outputs when a
    dataset_dir is given (icp_edge_based_registration.hpp:66-69,126)."""

    use_ndt_coarse = False
    saves_edge_pcds = True



class NDTEdgeBasedRegistration(_EdgeBasedRegistration):
    """NDT coarse + fine ICP; used by ``--registration`` (reference C5).
    Does not save edge pcds."""

    use_ndt_coarse = True
    saves_edge_pcds = False



@partial(jax.jit, static_argnames=("icp_cfg", "leaf", "voxel_cap"))
def _incremental_step(target: Cloud, cloud: Cloud, icp_cfg, leaf, voxel_cap):
    src_down = voxel_downsample(cloud, leaf, voxel_cap)
    res = icp_align(src_down, target, icp_cfg)
    transformed = apply_transform_cloud(res.transform, cloud)
    return res, transformed



@partial(jax.jit, static_argnames=("icp_cfg", "leaf", "voxel_cap", "cap"))
def _incremental_scan(stacked: Cloud, icp_cfg, leaf, voxel_cap, cap):
    """The whole incremental chain as ONE program: phase-0 downsamples
    batched up front (they are target-independent), then a ``lax.scan``
    whose carry is the accumulated full-resolution target. The per-pair
    convergence gate folds into the merge — the Python loop's
    ``bool(res.converged)`` costs a host round trip per pair.

    One deliberate deviation from the generic path, measured on the
    6x307k workload: frames append as CONTIGUOUS blocks
    (``dynamic_update_slice`` at frame-sized offsets, invalid rows
    carried along masked) instead of compacting scatters — a 3.7 MB
    block copy replaces a ~26 ms row scatter into the 22 MB carry. NN
    masks invalid rows, so interior holes are free.

    ``icp_cfg.compute_fitness`` is honored exactly like in the Python
    loop path, so ``results[i].fitness`` means the same thing whichever
    path ran (it is NaN under ``compute_fitness=False``, which the fast
    presets select — matching PCL, where ``align()`` never computes
    fitness and ``getFitnessScore`` is a separate on-demand call; the
    per-pair fitness sweep over a ~1.8M-point target costs ~80 ms)."""
    n, frame_cap = stacked.valid.shape
    first = jax.tree.map(lambda x: x[0], stacked)
    rest = jax.tree.map(lambda x: x[1:], stacked)

    target = Cloud(
        xyz=jnp.zeros((cap, 3), stacked.xyz.dtype)
        .at[:frame_cap]
        .set(first.xyz),
        rgb=jnp.zeros((cap, 3), stacked.rgb.dtype)
        .at[:frame_cap]
        .set(first.rgb),
        valid=jnp.zeros((cap,), jnp.bool_).at[:frame_cap].set(first.valid),
    )
    src_downs = jax.vmap(lambda c: voxel_downsample(c, leaf, voxel_cap))(
        rest
    )

    def body(carry, x):
        target, offset = carry
        src_down, cloud_i = x
        res = icp_align(src_down, target, icp_cfg)
        transformed = apply_transform_cloud(res.transform, cloud_i)
        target = Cloud(
            xyz=jax.lax.dynamic_update_slice(
                target.xyz, transformed.xyz, (offset, 0)
            ),
            rgb=jax.lax.dynamic_update_slice(
                target.rgb, transformed.rgb, (offset, 0)
            ),
            valid=jax.lax.dynamic_update_slice(
                target.valid, transformed.valid & res.converged, (offset,)
            ),
        )
        return (target, offset + frame_cap), res

    (target, _), results = jax.lax.scan(
        body, (target, jnp.int32(frame_cap)), (src_downs, rest)
    )
    return target, results



class IncrementalICP(RegistrationScheme):
    """Plain (non-edge) incremental registration (reference C3,
    src/incremental_icp.hpp): per cloud i >= 1, voxel-downsample the source,
    ICP against the accumulated target with NO initial guess, and on
    convergence merge the transformed full cloud."""

    def __init__(self, config: PipelineConfig = PipelineConfig()):
        self.config = config
        self.results: List[ICPResult] = []

    def registration(self, clouds: Sequence) -> Cloud:
        cfg = self.config
        clouds = [_as_unorganized(c) for c in clouds]
        cap = sum(c.capacity for c in clouds)
        n = len(clouds)
        if (
            cfg.use_scan
            and n >= 2
            and len({c.capacity for c in clouds}) == 1
            and len({c.normal is None for c in clouds}) == 1
        ):
            stacked = jax.tree.map(lambda *x: jnp.stack(x), *clouds)
            target, results = _incremental_scan(
                stacked, cfg.icp, cfg.voxel.leaf_size, cfg.voxel.max_points,
                cap,
            )
            pick = lambda i: jax.tree.map(lambda x: x[i], results)
            self.results = [pick(i) for i in range(n - 1)]
            return target
        target = merge_append(Cloud.empty(cap), clouds[0])
        self.results = []
        for idx in range(1, len(clouds)):
            res, transformed = _incremental_step(
                target, clouds[idx], cfg.icp, cfg.voxel.leaf_size,
                cfg.voxel.max_points,
            )
            self.results.append(res)
            if bool(res.converged):
                target = merge_append(target, transformed)
        return target
