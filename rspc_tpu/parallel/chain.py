"""Sequence-batched registration: data parallelism over independent
RGBD sequences.

The reference registers ONE sequence per process invocation
(/root/reference/src/main.cpp:76-99 loads one dataset and runs one
scheme). On TPU the natural throughput axis for production serving is
the *batch of sequences*: every sequence runs the identical fixed-shape
program (`registration/schemes.py::_registration_fused` — phase-1
feature extraction, the sequential frame chain, anchor refinement,
global assembly), so a batch is one compiled program on a single chip
and one `data`-sharded `shard_map` across a mesh. Sequences are
independent — the sharded program contains NO collectives; scale-out
over ICI is linear by construction and each device runs the same
one-sequence program the single-chip bench measures.

Within a chip the batch runs as ``lax.map`` (a scan over sequences),
NOT ``vmap``. Measured on the north-star workload (10 frames, 640x480):
the vmapped batch took 4.6 s at B=1 vs 0.19 s for the same pipeline
unbatched — a unit batch axis re-tiles the geometry buffers (e.g.
``f32[1,10240,3]{1,0,2:T(1,128)}``: the 3-wide coordinate axis lands in
the 128-lane tile, ~98% padding on every load) and the batched
while-loops mask every carry per iteration; device op time inflated
13x. ``lax.map`` keeps the proven unbatched layouts inside the scan
body, costs B x (single-sequence device time) + ONE dispatch — on the
tunneled chip amortizing the dispatch is the entire point of batching,
and a chip has to do B sequences of work either way. (This is the
RESULTS.md "[N,3] layout churn" lesson resurfacing at the batch level.)

This is the scheme-level counterpart of the op-level DP APIs in
``parallel/icp.py`` (`batched_sharded_icp_align`: one batched *pair*
step, points-axis sharded with psum'd moments). Here the unit is the
whole *pipeline*; within a sequence the frame chain stays sequential
(SURVEY.md §3.1: each pair aligns against the accumulated target).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.config import PipelineConfig


def _one_seq(
    seq: OrganizedCloud, g, use_ndt, config, include_global,
    psum_axis=None, psum_n=1,
):
    from rspc_tpu.registration.schemes import _registration_fused

    n = seq.xyz.shape[0]
    out = _registration_fused(
        seq,
        g,
        config.edge,
        use_ndt,
        config.ndt,
        config.icp,
        config.refine,
        config.voxel.leaf_size,
        config.voxel.max_points,
        config.coarse_guard_cap,
        config.coarse_warm_start,
        config.rescue_inlier_frac,
        config.rescue_cap,
        config.rescue_iterations,
        psum_axis=psum_axis,
        psum_n=psum_n,
    )
    accepted = out["anchor_accepted"]
    if isinstance(accepted, tuple):  # anchor disabled
        accepted = jnp.zeros((n - 1,), jnp.bool_)
    slim = {
        "totals": out["totals"],
        "converged": out["fine"].converged,
        "fitness": out["fine"].fitness,
        "anchor_accepted": accepted,
    }
    if include_global:
        slim["global"] = out["global"]
    return slim


# jit caches by FUNCTION IDENTITY first: a fresh closure per call would
# re-trace the whole pipeline every time (measured: ~3.7 s of Python
# tracing per serving call, 15x the device time). The callables are
# cached on the hashable (config, mode) key instead, so repeat serving
# calls hit the jit cache and pay device time + one dispatch only.
@functools.lru_cache(maxsize=32)
def _jitted_local(use_ndt: bool, config, include_global: bool):
    def map_local(st, g):
        return jax.lax.map(
            lambda x: _one_seq(*x, use_ndt, config, include_global), (st, g)
        )

    return jax.jit(map_local), map_local


@functools.lru_cache(maxsize=32)
def _jitted_sharded(
    use_ndt: bool, config, include_global: bool, mesh: jax.sharding.Mesh
):
    _, map_local = _jitted_local(use_ndt, config, include_global)
    pspec = jax.sharding.PartitionSpec("data")
    return jax.jit(
        jax.shard_map(
            map_local,
            mesh=mesh,
            in_specs=(pspec, pspec),
            out_specs=pspec,
            # no collectives: every output is per-sequence; nothing
            # needs a replication check across the mesh
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=32)
def _jitted_points_sharded(
    use_ndt: bool,
    config,
    include_global: bool,
    mesh: jax.sharding.Mesh,
    axis: str,
):
    d = mesh.shape[axis]
    rep = jax.sharding.PartitionSpec()

    def local(seq, g):
        return _one_seq(
            seq, g, use_ndt, config, include_global,
            psum_axis=axis, psum_n=d,
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(rep, rep),
            out_specs=rep,
            check_vma=False,
        )
    )


def points_sharded_registration(
    stacked: OrganizedCloud,
    guesses: jnp.ndarray,
    config: PipelineConfig,
    mesh: jax.sharding.Mesh,
    use_ndt: bool = True,
    axis: str = "points",
    include_global: bool = True,
) -> Dict[str, Any]:
    """ONE sequence's full fused pipeline with every pair solve sharded
    over the ``axis`` mesh axis (VERDICT r3 #6: multi-chip buying
    single-sequence LATENCY, not just DP throughput).

    Inputs arrive replicated; inside the program each device sweeps only
    its 1/D chunk of every coarse-NDT/ICP and fine-ICP source (the
    dominant O(S x T) NN sweeps) and the additive fit moments ride one
    ~tens-of-scalars psum per solver iteration — pure ICI latency, no
    bandwidth term. Guard/rescue/refine/merge stages stay replicated
    (identical on every device, collective-free), so the result equals
    the single-device ``_registration_fused`` up to f32 psum reduction
    order. See registration/chainscan.py::_chain_scan (psum_axis).

    Args mirror :func:`batched_registration` minus the batch axis:
    ``stacked`` is ``[n, H, W, ...]``, ``guesses`` ``f32[n-1, 4, 4]``.
    """
    if stacked.xyz.ndim != 4:
        raise ValueError(
            "stacked must be a single [n, H, W, 3] sequence; got xyz "
            f"shape {stacked.xyz.shape}"
        )
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh needs a '{axis}' axis; has {mesh.axis_names}")
    fit = _jitted_points_sharded(
        use_ndt, config, include_global, mesh, axis
    )
    return fit(stacked, guesses)


def batched_registration(
    stacked: OrganizedCloud,
    guesses: jnp.ndarray,
    config: PipelineConfig,
    use_ndt: bool = True,
    mesh: Optional[jax.sharding.Mesh] = None,
    include_global: bool = True,
) -> Dict[str, Any]:
    """Register ``B`` independent sequences in one compiled program.

    Args:
      stacked: ``OrganizedCloud`` whose leaves carry a leading
        ``[B, n, H, W, ...]`` sequence batch (same frame count and
        resolution per sequence — fixed shapes are what make the batch
        one program).
      guesses: ``f32[B, n-1, 4, 4]`` initial-guess transforms per pair
        (the same quantity a single-sequence scheme builds from IMU
        thetas or the static accumulated rotation).
      config: pipeline configuration, applied per sequence exactly as
        in the single-sequence path.
      use_ndt: NDT coarse stage (the `NDTEdgeBasedRegistration`
        pipeline) if True, else coarse ICP (`ICPEdgeBasedRegistration`).
      mesh: optional ``jax.sharding.Mesh`` with a ``"data"`` axis; the
        batch is sharded over it (B must divide by the axis size) and
        each device maps over its local shard. With no mesh the whole
        batch maps on the default device.
      include_global: also return the assembled per-sequence global
        clouds (``[B, n*H*W]`` points — the dominant output memory; turn
        off when only trajectories are wanted).

    Returns a dict of stacked results:
      ``totals`` f32[B, n-1, 4, 4] — absolute frame->frame-0 transforms;
      ``converged`` bool[B, n-1] — fine-ICP convergence per pair;
      ``fitness`` f32[B, n-1] — fine-ICP fitness per pair (NaN when
      ``config.icp.compute_fitness`` is off);
      ``anchor_accepted`` bool[B, n-1] — anchor acceptance (all-False
      when the anchor stage is disabled);
      ``global`` Cloud[B, n*H*W] — only when ``include_global``.
    """
    if stacked.xyz.ndim != 5:
        raise ValueError(
            "stacked must be a [B, n, H, W, 3] sequence batch; got xyz "
            f"shape {stacked.xyz.shape}"
        )
    b, n = stacked.xyz.shape[:2]
    if guesses.shape[:2] != (b, n - 1):
        raise ValueError(
            f"guesses must be [B={b}, n-1={n - 1}, 4, 4]; got "
            f"{guesses.shape}"
        )

    if mesh is None:
        fit, _ = _jitted_local(use_ndt, config, include_global)
        return fit(stacked, guesses)

    if "data" not in mesh.axis_names:
        raise ValueError(f"mesh needs a 'data' axis; has {mesh.axis_names}")
    d = mesh.shape["data"]
    if b % d:
        raise ValueError(f"batch {b} not divisible by data axis {d}")
    fit = _jitted_sharded(use_ndt, config, include_global, mesh)
    spec = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")
    )
    shard = lambda t: jax.tree.map(lambda x: jax.device_put(x, spec), t)
    return fit(shard(stacked), shard(guesses))
