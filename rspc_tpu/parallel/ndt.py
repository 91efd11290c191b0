"""Mesh-sharded NDT: source points sharded, grid replicated, derivatives
psum'd over ICI.

Multi-chip version of registration/ndt.py, mirroring parallel/icp.py's
decomposition: the score, its 6-gradient, and 6x6 Hessian are additive
over source points, so every Newton iteration (and every line-search
trial) reduces to ONE fused 43-scalar ``psum`` — pure latency, no
bandwidth term. The Newton solve and More-Thuente logic then run
identically (replicated) on every chip. Results match the single-chip
optimum; trajectories are not bitwise-identical — the per-shard gram
matmuls psum'd over the mesh sum in a different order than one global
gram, and the line-search/epsilon stops are threshold branches, so an
iteration count can differ by one (tests/test_parallel.py pins the
same-optimum contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import NDTConfig
from rspc_tpu.registration.ndt import NDTGrid, NDTResult, ndt_align


def sharded_ndt_align(
    src: Cloud,
    grid: NDTGrid,
    mesh: Mesh,
    config: NDTConfig = NDTConfig(),
    init_guess: jnp.ndarray | None = None,
    axis: str = "points",
) -> NDTResult:
    """Align ``src`` (sharded over ``axis``) onto a replicated NDT grid."""
    dtype = src.xyz.dtype
    guess = (
        jnp.eye(4, dtype=dtype)
        if init_guess is None
        else init_guess.astype(dtype)
    )
    rep = P()
    sh = P(axis)

    def local(sxyz, srgb, svalid, grid_rep, guess_rep):
        cloud = Cloud(sxyz, srgb, svalid)
        return ndt_align(cloud, grid_rep, config, guess_rep, psum_axis=axis)

    rep_grid = jax.tree.map(lambda _: rep, grid)
    rep_res = NDTResult(
        transform=rep, converged=rep, iterations=rep, score=rep,
        trans_probability=rep,
    )
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(sh, sh, sh, rep_grid, rep),
        out_specs=rep_res,
        check_vma=False,
    )
    return fn(src.xyz, src.rgb, src.valid, grid, guess)
