"""On-chip pytest lane (VERDICT r3 #3): ``RSPC_ONCHIP_TESTS=1 pytest -m tpu``.

Runs the compiled (non-interpreted) lowerings on a real TPU backend:
the resident and HBM-streaming Pallas NN kernels, a fused-chain smoke,
the colored-ICP path, and a serving batch. The default CPU suite covers
the same logic in interpreter mode; a compiled-lowering regression
(tiling, scalar prefetch, emit_pipeline) only surfaces here.
bench.py invokes this lane on the chip before recording a run, so every
BENCH_r*.json carries its outcome.

Shapes are kept small so the whole lane compiles through the remote
tunnel in a couple of minutes cold and seconds warm (the persistent
compile cache is active on TPU backends — rspc_tpu/__init__.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="on-chip lane needs a real TPU backend "
        "(RSPC_ONCHIP_TESTS=1 pytest -m tpu)",
    ),
]

from rspc_tpu.capture.synthetic import SyntheticSequence  # noqa: E402
from rspc_tpu.config import (  # noqa: E402
    EdgeConfig,
    ICPConfig,
    NDTConfig,
    PipelineConfig,
    VoxelConfig,
)
from rspc_tpu.ops.deproject import Intrinsics  # noqa: E402

N_FRAMES = 4
YAW = -0.06
INTR = Intrinsics.simple(160, 120)


def _lane_config(**kw):
    """Scaled-down north-star-shaped config: NDT coarse + p2p fine +
    guard, fused scan path, no anchor (the anchor path is CPU-covered
    and would double the lane's compile)."""
    return PipelineConfig(
        icp=ICPConfig(
            max_iterations=30,
            transformation_epsilon=1e-8,
            euclidean_fitness_epsilon=1e-12,
            max_correspondence_distance=0.25,
            target_chunk=1024,
        ),
        ndt=NDTConfig(dense_grid_dim=16),
        edge=EdgeConfig(max_edge_points=4096),
        voxel=VoxelConfig(leaf_size=0.05, max_points=2048),
        coarse_guard_cap=0.1,
        **kw,
    )


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=N_FRAMES, yaw_step=YAW, intr=INTR)


def test_pallas_nn_resident_compiled():
    """The VMEM-resident Pallas NN kernel, REAL lowering, adversarial
    suite (ties, invalid rows, all-invalid targets, ...)."""
    from rspc_tpu.ops.nn_check import run_nn_checks
    from rspc_tpu.ops.nn_pallas import nearest_neighbors_pallas

    failures = run_nn_checks(
        lambda s, sv, t, tv: nearest_neighbors_pallas(
            jnp.asarray(s), jnp.asarray(sv), jnp.asarray(t), jnp.asarray(tv)
        )
    )
    assert not failures, failures


def test_pallas_nn_hbm_streaming_compiled(monkeypatch):
    """The emit_pipeline HBM-streaming variant, compiled on-chip (the
    CPU suite only reaches it in interpret mode), vs float64 brute
    force. The threshold is lowered so a test-sized target exercises the
    streaming path."""
    import rspc_tpu.ops.nn_pallas as nnp

    monkeypatch.setattr(nnp, "MAX_VMEM_TARGET", 2000)
    rng = np.random.default_rng(11)
    src = rng.uniform(-1, 1, (345, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (6200, 3)).astype(np.float32)
    sv = np.ones(345, bool)
    sv[7] = False
    tv = np.ones(6200, bool)
    tv[2000:2600] = False
    d2, idx = nnp.nearest_neighbors_pallas(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt), jnp.asarray(tv)
    )
    d2, idx = np.asarray(d2), np.asarray(idx)
    full = (
        (src[:, None, :].astype(np.float64) - tgt[None, :, :].astype(np.float64))
        ** 2
    ).sum(-1)
    full[:, ~tv] = np.inf
    np.testing.assert_array_equal(idx[sv], full.argmin(1)[sv])
    np.testing.assert_allclose(d2[sv], full.min(1)[sv], rtol=1e-5, atol=1e-7)
    assert np.isinf(d2[~sv]).all()


def test_fused_chain_smoke_onchip(seq):
    """The fused one-program chain (phase 1 + NDT coarse + fine ICP +
    assembly) compiled and executed on the chip: all pairs converge and
    the composed transforms roughly recover the ground-truth poses.

    The pose bound is a coarse sanity check only (the lane's 160x120
    4-frame scene without the anchor stage accumulates up to ~6 cm of
    chain drift — identical in CPU interpret mode, so it is scene
    calibration, not a lowering effect). Compiled-lowering CORRECTNESS
    is what test_serving_batch_onchip pins (5e-4 cross-path parity);
    this test pins that the fused program compiles, runs, and stays in
    the right basin on the chip."""
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    scheme = NDTEdgeBasedRegistration(rads=YAW, config=_lane_config())
    result = scheme.registration(seq.clouds())
    assert all(bool(f.converged) for _, f in scheme.results)
    totals = np.asarray(scheme.total_transforms)
    for i in range(1, N_FRAMES):
        want = seq.gt_transform(i)
        np.testing.assert_allclose(totals[i - 1], want, atol=0.1)
    assert int(result.count()) > 0


def test_colored_path_onchip(seq):
    """The colored-ICP fine stage (cgrad carried through phase 1 and the
    edge clouds, photometric rows in the p2l solve) compiled on-chip."""
    import dataclasses

    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    cfg = _lane_config()
    cfg = dataclasses.replace(
        cfg,
        icp=dataclasses.replace(
            cfg.icp,
            variant="point_to_plane",
            huber_delta=0.01,
            color_weight=1.0,
        ),
        edge=dataclasses.replace(cfg.edge, carry_cgrad=True),
    )
    scheme = NDTEdgeBasedRegistration(rads=YAW, config=cfg)
    scheme.registration(seq.clouds())
    totals = np.asarray(scheme.total_transforms)
    for i in range(1, N_FRAMES):
        np.testing.assert_allclose(totals[i - 1], seq.gt_transform(i), atol=0.03)


def test_serving_batch_onchip(seq):
    """Sequence-batched serving (lax.map over B sequences, one program)
    on the chip: per-sequence totals match the single-sequence fused
    path run on the same frames."""
    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.parallel.chain import batched_registration
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    cfg = _lane_config()
    clouds = seq.clouds()
    one = OrganizedCloud(
        xyz=jnp.stack([c.xyz for c in clouds]),
        rgb=jnp.stack([c.rgb for c in clouds]),
        valid=jnp.stack([c.valid for c in clouds]),
    )
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), one)
    scheme = NDTEdgeBasedRegistration(rads=YAW, config=cfg)
    guesses1 = scheme._guesses(N_FRAMES)
    guesses = jnp.stack([guesses1, guesses1])
    out = batched_registration(
        stacked, guesses, cfg, use_ndt=True, include_global=False
    )
    assert bool(out["converged"].all())
    totals = np.asarray(out["totals"])
    # both batch rows are the same sequence -> identical results
    np.testing.assert_allclose(totals[0], totals[1], atol=1e-6)
    scheme.registration(clouds)
    want = np.asarray(scheme.total_transforms)
    np.testing.assert_allclose(totals[0], want, atol=5e-4)
