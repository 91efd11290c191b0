"""SE(3) pose-graph relaxation (registration/posegraph.py)."""

import numpy as np
import jax.numpy as jnp

from rspc_tpu.registration.posegraph import (
    optimize_pose_graph,
    se3_exp,
    se3_log,
)


def rand_tangent(rng, rot=0.3, trans=0.5):
    x = np.zeros(6, np.float32)
    x[:3] = rng.normal(0, rot, 3)
    x[3:] = rng.normal(0, trans, 3)
    return jnp.asarray(x)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        x = rand_tangent(rng)
        np.testing.assert_allclose(
            np.asarray(se3_log(se3_exp(x))), np.asarray(x),
            rtol=1e-5, atol=1e-6,
        )


def make_trajectory(n, rng, yaw=-0.2, trans=(0.1, 0.0, 0.05)):
    """Ground-truth absolute poses (frame k -> frame 0) for constant
    per-frame motion A."""
    a = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    a[0, 0] = c; a[0, 2] = s; a[2, 0] = -s; a[2, 2] = c
    a[:3, 3] = trans
    gts = [np.eye(4, dtype=np.float32)]
    for _ in range(n - 1):
        gts.append((gts[-1] @ a).astype(np.float32))
    return gts


def noisy(t, rng, rot=0.004, trans=0.004):
    d = np.zeros(6, np.float32)
    d[:3] = rng.normal(0, rot, 3)
    d[3:] = rng.normal(0, trans, 3)
    return np.asarray(t @ np.asarray(se3_exp(jnp.asarray(d))))


def build_graph(gts, rng, skips=(1, 2, 3), noise=0.004):
    ei, ej, ms = [], [], []
    n = len(gts)
    for off in skips:
        for i in range(n - off):
            j = i + off
            m = np.linalg.inv(gts[i]) @ gts[j]
            ei.append(i); ej.append(j)
            ms.append(noisy(m, rng, noise, noise))
    return (
        jnp.asarray(np.asarray(ei, np.int32)),
        jnp.asarray(np.asarray(ej, np.int32)),
        jnp.asarray(np.stack(ms)),
    )


def test_perfect_measurements_recover_exactly():
    rng = np.random.default_rng(1)
    gts = make_trajectory(6, rng)
    ei, ej, ms = build_graph(gts, rng, noise=0.0)
    # start from a perturbed trajectory
    totals0 = jnp.asarray(
        np.stack([noisy(g, rng, 0.02, 0.02) for g in gts[1:]])
    )
    refined, costs = optimize_pose_graph(
        totals0, ei, ej, ms, jnp.ones((ei.shape[0],)), iters=15
    )
    err = max(
        np.abs(np.asarray(refined[i]) - gts[i + 1]).max() for i in range(5)
    )
    assert err < 1e-4, err
    assert float(costs[-1]) < 1e-8


def test_graph_beats_integrated_chain():
    """Redundant skip constraints average out per-pair noise: the graph
    solution's endpoint error is well below the integrated chain's."""
    rng = np.random.default_rng(2)
    n = 10
    gts = make_trajectory(n, rng)
    ei, ej, ms = build_graph(gts, rng, skips=(1, 2, 3), noise=0.005)

    # integrated chain = compose the noisy consecutive measurements
    chain = [np.eye(4, dtype=np.float32)]
    cons = {(int(a), int(b)): np.asarray(m) for a, b, m in zip(ei, ej, ms)}
    for i in range(n - 1):
        chain.append((chain[-1] @ cons[(i, i + 1)]).astype(np.float32))
    totals0 = jnp.asarray(np.stack(chain[1:]))

    refined, _ = optimize_pose_graph(
        totals0, ei, ej, ms, jnp.ones((ei.shape[0],)), iters=10
    )
    chain_err = np.abs(np.stack(chain[1:]) - np.stack(gts[1:])).max()
    graph_err = np.abs(np.asarray(refined) - np.stack(gts[1:])).max()
    assert graph_err < 0.6 * chain_err, (graph_err, chain_err)


def test_pipeline_pose_graph_end_to_end():
    """The pose_graph refine pass runs inside both chain paths, keeps
    the trajectory registered, and the two paths agree."""
    import dataclasses

    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    yaw = -0.06
    n = 4
    seq = SyntheticSequence(
        n_frames=n, yaw_step=yaw, intr=Intrinsics.simple(160, 120)
    )
    clouds = seq.clouds()
    gts = [np.asarray(seq.gt_transform(i)) for i in range(1, n)]
    base = north_star_config()
    results = {}
    for scan in (True, False):
        cfg = dataclasses.replace(
            base,
            use_scan=scan,
            refine=dataclasses.replace(
                base.refine, pose_graph=True, pose_graph_skips=(1, 2),
                anchor_max_points=2048,
            ),
        )
        s = NDTEdgeBasedRegistration(rads=yaw, config=cfg)
        s.registration(clouds)
        results[scan] = np.asarray(s.total_transforms)
    t_scan, t_loop = results[True], results[False]
    assert np.all(np.isfinite(t_scan))
    np.testing.assert_allclose(t_scan, t_loop, rtol=0, atol=5e-4)
    errs = [np.abs(t_scan[i] - gts[i]).max() for i in range(n - 1)]
    assert max(errs) < 0.02, errs


def test_zero_weight_constraints_ignored():
    rng = np.random.default_rng(3)
    gts = make_trajectory(5, rng)
    ei, ej, ms = build_graph(gts, rng, skips=(1,), noise=0.0)
    # append a wildly wrong constraint with weight 0
    ei = jnp.concatenate([ei, jnp.asarray([0], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.asarray([4], jnp.int32)])
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = (5.0, 5.0, 5.0)
    ms = jnp.concatenate([ms, jnp.asarray(bad)[None]])
    w = jnp.concatenate([jnp.ones((4,)), jnp.zeros((1,))])
    totals0 = jnp.asarray(np.stack(gts[1:]))
    refined, costs = optimize_pose_graph(totals0, ei, ej, ms, w, iters=8)
    err = np.abs(np.asarray(refined) - np.stack(gts[1:])).max()
    assert err < 1e-5, err
