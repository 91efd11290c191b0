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
the accumulated target, SURVEY.md §3.1) stays a Python loop, but every
iteration calls ONE jitted pair-step of fixed shapes — the target and
global clouds live in fixed-capacity HBM buffers that grow only by mask,
so the whole N-frame registration compiles exactly once and never
reallocates. Host sync per frame is a single ``converged`` flag read
(mirroring the reference's per-frame convergence gate,
icp_edge_based_registration.hpp:113-123).

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


@jax.jit
def merge_append(dst: Cloud, src: Cloud) -> Cloud:
    """Append src's valid points into dst's free tail slots
    (PCL ``*dst = *dst + *src``, SURVEY.md X11) without reallocation.
    Overflow beyond dst capacity is dropped."""
    order = jnp.argsort(~src.valid, stable=True)
    sxyz = jnp.take(src.xyz, order, axis=0)
    srgb = jnp.take(src.rgb, order, axis=0)
    svalid = jnp.take(src.valid, order, axis=0)
    start = dst.count()
    pos = start + jnp.arange(src.capacity, dtype=jnp.int32)
    pos = jnp.where(svalid, pos, dst.capacity)  # OOB -> dropped
    keep_normal = dst.normal is not None and src.normal is not None
    return Cloud(
        xyz=dst.xyz.at[pos].set(sxyz, mode="drop"),
        rgb=dst.rgb.at[pos].set(srgb, mode="drop"),
        valid=dst.valid.at[pos].set(svalid, mode="drop"),
        normal=(
            dst.normal.at[pos].set(
                jnp.take(src.normal, order, axis=0), mode="drop"
            )
            if keep_normal
            else None
        ),
    )


def _as_unorganized(c) -> Cloud:
    return c.flatten() if isinstance(c, OrganizedCloud) else c


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


@partial(jax.jit, static_argnames=("icp_cfg", "leaf", "voxel_cap"))
def _icp_pair_step(target: Cloud, edge: Cloud, guess, icp_cfg, leaf, voxel_cap):
    """One frame of the edge-ICP chain: downsample source edges, coarse ICP
    with guess, fine ICP without, compose. The coarse stage's fitness is
    never consumed (only the fine stage's convergence gates merging),
    so its extra sweep is skipped."""
    import dataclasses as _dc

    src_down = voxel_downsample(edge, leaf, voxel_cap)
    coarse_cfg = _dc.replace(icp_cfg, compute_fitness=False)
    coarse = icp_align(src_down, target, coarse_cfg, guess)
    aligned = apply_transform_cloud(coarse.transform, src_down)
    fine = icp_align(aligned, target, icp_cfg)
    fine_aligned = apply_transform_cloud(fine.transform, aligned)
    return coarse, fine, fine_aligned


@partial(jax.jit, static_argnames=("ndt_cfg", "icp_cfg", "leaf", "voxel_cap"))
def _ndt_pair_step(target: Cloud, edge: Cloud, guess, ndt_cfg, icp_cfg, leaf, voxel_cap):
    """One frame of the NDT chain: downsample, NDT coarse with guess, fine
    ICP, compose (src/ndt_edge_based_registration.hpp:66-108)."""
    src_down = voxel_downsample(edge, leaf, voxel_cap)
    grid = build_ndt_grid(target, ndt_cfg)
    coarse = ndt_align(src_down, grid, ndt_cfg, guess)
    aligned = apply_transform_cloud(coarse.transform, src_down)
    fine = icp_align(aligned, target, icp_cfg)
    fine_aligned = apply_transform_cloud(fine.transform, aligned)
    return coarse, fine, fine_aligned


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
        §2c identifies)."""
        if not all(isinstance(c, OrganizedCloud) for c in clouds):
            return None
        shapes = {(c.height, c.width) for c in clouds}
        if len(shapes) != 1 or len(clouds) < 2:
            return None
        stacked = OrganizedCloud(
            xyz=jnp.stack([c.xyz for c in clouds]),
            rgb=jnp.stack([c.rgb for c in clouds]),
            valid=jnp.stack([c.valid for c in clouds]),
        )
        batched = jax.vmap(
            lambda oc: extract_edge_features(oc, self.config.edge)
        )(stacked)
        return [
            Cloud(
                batched.xyz[i],
                batched.rgb[i],
                batched.valid[i],
                None if batched.normal is None else batched.normal[i],
            )
            for i in range(len(clouds))
        ]

    def _guess(self, idx: int, rel_thetas, acc_rads: float):
        if self.use_imu:
            theta = rel_thetas[idx]
            return (
                imu_guess_full(theta)
                if not self.use_ndt_coarse
                else imu_guess_y(theta)
            )
        return static_y_guess(acc_rads)

    def global_registration(self, clouds: List[Tuple[Cloud, Cloud]]) -> Cloud:
        cfg = self.config
        n = len(clouds)
        if self.use_imu:
            assert self.thetas.shape[0] == n, "thetas/clouds size mismatch"
            rel = relative_thetas(self.thetas)
        else:
            rel = None

        voxel_cap = cfg.voxel.max_points
        target_cap = voxel_cap * n
        edges = [c[0] for c in clouds]
        originals = [c[1] for c in clouds]
        global_cap = sum(o.capacity for o in originals)

        # target starts as the voxel-downsampled edges of frame 0
        # (downsampled IN PLACE in the reference — edge-0.pcd dumps the
        # downsampled cloud; reproduced below)
        target0 = voxel_downsample(edges[0], cfg.voxel.leaf_size, voxel_cap)
        target = merge_append(
            Cloud.empty(target_cap, with_normal=target0.normal is not None),
            target0,
        )
        global_cloud = merge_append(Cloud.empty(global_cap), originals[0])
        edges = [target0] + list(edges[1:])

        if self.saves_edge_pcds and self.dataset_dir is not None:
            from rspc_tpu.io.pcd import save_pcd

            os.makedirs(self.dataset_dir, exist_ok=True)
            for i, e in enumerate(edges):
                save_pcd(
                    os.path.join(self.dataset_dir, f"edge-{i}.pcd"),
                    e,
                    keep_invalid=False,
                )

        acc_rads = 0.0
        self.results = []
        for idx in range(1, n):
            if not self.use_imu:
                acc_rads += self.rads  # advances even on non-convergence
            guess = self._guess(idx, rel, acc_rads)
            if self.use_ndt_coarse:
                coarse, fine, fine_aligned = _ndt_pair_step(
                    target, edges[idx], guess, cfg.ndt, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap,
                )
            else:
                coarse, fine, fine_aligned = _icp_pair_step(
                    target, edges[idx], guess, cfg.icp,
                    cfg.voxel.leaf_size, voxel_cap,
                )
            self.results.append((coarse, fine))
            if bool(fine.converged):
                total = fine.transform @ coarse.transform
                transformed = apply_transform_cloud(total, originals[idx])
                target = merge_append(target, fine_aligned)
                global_cloud = merge_append(global_cloud, transformed)

        if self.saves_edge_pcds and self.dataset_dir is not None:
            from rspc_tpu.io.pcd import save_pcd

            save_pcd(
                os.path.join(self.dataset_dir, "edge_cloud.pcd"),
                target,
                keep_invalid=False,
            )
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
