"""Gated wide-cap rescue stage (PipelineConfig.rescue_inlier_frac).

The failure mode it targets (measured on the partial-overlap robustness
scenario): the coarse stage lands in a local optimum several cm off, the
1 cm fine-ICP cap cannot recover (inlier fraction collapses to
0.09-0.29), and the pose is simply kept. The rescue detects the inlier
collapse and re-solves at a 10 cm cap. No reference analog — the
reference keeps coarse-stage local optima unconditionally
(src/ndt_edge_based_registration.hpp:101-111 merges any converged
fine result).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rspc_tpu.cloud import Cloud
from rspc_tpu.config import ICPConfig
from rspc_tpu.registration.schemes import _icp_pair_step


def corner_cloud(spacing=0.005, extent=0.5, seed=0):
    """Three orthogonal 1 cm-grid planes meeting at a corner — constrains
    all six pose DoF for point-to-point ICP."""
    ax = np.arange(0.0, extent, spacing, dtype=np.float32)
    u, v = np.meshgrid(ax, ax, indexing="ij")
    u, v = u.ravel(), v.ravel()
    zeros = np.zeros_like(u)
    pts = np.concatenate(
        [
            np.stack([u, v, zeros], -1),
            np.stack([u, zeros, v], -1),
            np.stack([zeros, u, v], -1),
        ]
    )
    rng = np.random.default_rng(seed)
    pts = pts + rng.normal(0.0, 2e-4, pts.shape).astype(np.float32)
    rgb = np.full_like(pts, 0.5)
    valid = np.ones(len(pts), bool)
    return Cloud(jnp.asarray(pts), jnp.asarray(rgb), jnp.asarray(valid))


def shifted(cloud, offset):
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = offset
    xyz = cloud.xyz @ jnp.asarray(t[:3, :3].T) + jnp.asarray(t[:3, 3])
    return Cloud(xyz, cloud.rgb, cloud.valid), t


CFG = ICPConfig(target_chunk=2048)
LEAF = 0.01
CAP = 16384


def run_pair(src, tgt, thresh):
    coarse, fine, _ = _icp_pair_step(
        tgt, src, jnp.eye(4), CFG, LEAF, CAP,
        rescue_thresh=thresh, rescue_cap=0.1, rescue_iters=8,
    )
    return np.asarray(fine.transform @ coarse.transform)


class TestRescue:
    def test_recovers_offset_outside_fine_cap(self):
        """A 5 cm offset is outside the 1 cm fine cap: without rescue the
        pose stays several cm off; the rescue recovers it to < 5 mm."""
        tgt = corner_cloud()
        src, t_gt = shifted(corner_cloud(seed=1), (0.04, 0.02, 0.03))
        # ground truth maps src back onto tgt: inverse translation
        want = np.linalg.inv(t_gt)

        t_off = run_pair(src, tgt, 0.0)
        t_on = run_pair(src, tgt, 0.55)
        err_off = np.abs(t_off - want).max()
        err_on = np.abs(t_on - want).max()
        assert err_off > 0.02, err_off   # stuck without rescue
        # recovered (the residual few mm comes from the PCL-parity fine
        # stage stopping after one iteration — transEps=1 semantics)
        assert err_on < 0.008, err_on
        assert err_on <= err_off         # never-worsen

    def test_gate_does_not_fire_when_aligned(self):
        """A 2 mm offset is inside the fine basin: the inlier fraction
        stays high, the gate must not fire, and the result must be
        IDENTICAL to the rescue-off path (the cond's clean branch)."""
        tgt = corner_cloud()
        src, _ = shifted(corner_cloud(seed=1), (0.002, 0.0, 0.001))
        t_off = run_pair(src, tgt, 0.0)
        t_on = run_pair(src, tgt, 0.55)
        np.testing.assert_array_equal(t_on, t_off)

    def test_guard_rejects_harmful_rescue(self):
        """With an unmatched source (target far away), the rescue may
        fire but the never-worsen guard must keep the pose from drifting
        further than the capped-NN score allows."""
        tgt = corner_cloud()
        src, t_gt = shifted(corner_cloud(seed=1), (0.5, 0.5, 0.5))
        want = np.linalg.inv(t_gt)
        t_on = run_pair(src, tgt, 0.99)
        t_off = run_pair(src, tgt, 0.0)
        # guard metric: the rescued pose's capped NN score never exceeds
        # the un-rescued one (here we just require it did not blow up
        # the transform; both stay near identity as nothing matches)
        assert np.abs(t_on).max() < 2.0
        assert np.abs(t_off).max() < 2.0

    def test_compute_fitness_off_path(self):
        """With fitness off the gate derives the inlier count from its
        own sweep — same recovery as the fitness-on path."""
        cfg = dataclasses.replace(CFG, compute_fitness=False)
        tgt = corner_cloud()
        src, t_gt = shifted(corner_cloud(seed=1), (0.04, 0.02, 0.03))
        want = np.linalg.inv(t_gt)
        coarse, fine, _ = _icp_pair_step(
            tgt, src, jnp.eye(4), cfg, LEAF, CAP,
            rescue_thresh=0.55, rescue_cap=0.1, rescue_iters=8,
        )
        t_on = np.asarray(fine.transform @ coarse.transform)
        assert np.abs(t_on - want).max() < 0.008


class TestGuardVote:
    def test_margin_prefers_prediction_within_band(self):
        """With the _WARM_GUARD_MARGIN weight, a prediction whose capped
        score is within the margin band of the candidate's wins the
        vote; without weights the raw best-score hypothesis wins."""
        from rspc_tpu.registration.schemes import _guard_best

        tgt = corner_cloud()
        src = corner_cloud(seed=1)

        def t_of(dx):
            t = np.eye(4, dtype=np.float32)
            t[0, 3] = dx
            return jnp.asarray(t)

        cand, pred = t_of(0.005), t_of(0.0052)
        # unweighted: candidate's (slightly) better score wins
        best = np.asarray(_guard_best([cand, pred], src, tgt, 0.1))
        np.testing.assert_array_equal(best, np.asarray(cand))
        # margin-weighted: the prediction's 15% preference flips it
        best_w = np.asarray(
            _guard_best([cand, pred], src, tgt, 0.1, weights=(1.0, 0.85))
        )
        np.testing.assert_array_equal(best_w, np.asarray(pred))
        # a CLEAR candidate improvement still beats the margin
        best_c = np.asarray(
            _guard_best(
                [t_of(0.001), pred], src, tgt, 0.1, weights=(1.0, 0.85)
            )
        )
        np.testing.assert_array_equal(best_c, np.asarray(t_of(0.001)))

    def test_stride_cloud(self):
        from rspc_tpu.registration.schemes import _stride_cloud

        c = corner_cloud()
        s = _stride_cloud(c, 4096)
        step = -(-c.capacity // 4096)
        assert s.capacity == c.xyz[::step].shape[0]
        np.testing.assert_array_equal(
            np.asarray(s.xyz), np.asarray(c.xyz)[::step]
        )
        np.testing.assert_array_equal(
            np.asarray(s.valid), np.asarray(c.valid)[::step]
        )
        # no-op cases return the cloud unchanged
        assert _stride_cloud(c, 0) is c
        assert _stride_cloud(c, c.capacity) is c


@pytest.mark.parametrize("use_scan", [True, False])
def test_chain_rescue_scan_loop_agree(use_scan):
    """The fused-scan and Python-loop chains expose the same rescue
    behavior: a mid-sequence frame displaced outside the fine cap is
    recovered in both paths."""
    from rspc_tpu.capture.synthetic import SyntheticSequence
    from rspc_tpu.ops.deproject import Intrinsics
    from rspc_tpu.presets import north_star_config
    from rspc_tpu.registration.schemes import ICPEdgeBasedRegistration

    yaw = -0.05
    seq = SyntheticSequence(
        n_frames=3, yaw_step=yaw, intr=Intrinsics.simple(160, 120),
        translation_step=(0.05, 0.0, 0.03),
    )
    clouds = seq.clouds()
    cfg = dataclasses.replace(
        north_star_config(),
        rescue_inlier_frac=0.55,
        use_scan=use_scan,
        refine=dataclasses.replace(
            north_star_config().refine, enabled=False, anchor_to_first=False
        ),
    )
    s = ICPEdgeBasedRegistration(rads=yaw, config=cfg)
    s.registration(clouds)
    t = np.asarray(s.total_transforms)
    gts = [np.asarray(seq.gt_transform(i)) for i in range(1, 3)]
    # the yaw-only static guess ignores the 6 cm/frame translation; the
    # rescue must pull every pair inside ~1 cm of ground truth
    for i in range(2):
        assert np.abs(t[i] - gts[i]).max() < 0.012, (use_scan, i)


def _aliased_lines_scene(spacing=0.05, shift=-0.035, seed=3):
    """Edge-like geometry with a texture-resolvable aliasing trap.

    Parallel lines along x on the z=1 plane (normals +z), ``spacing``
    apart in y — the unit-scale model of the `combined` scenario's edge
    clouds. The source is the same structure shifted IN-PLANE by
    ``shift`` in y (beyond the 1 cm fine cap, within the 10 cm rescue
    cap, past half the line spacing): the nearest GEOMETRIC alignment
    snaps to the wrong line (error = spacing + shift), while the smooth
    intensity field varying along y identifies the true line."""
    rng = np.random.default_rng(seed)
    xs = np.arange(-0.5, 0.5, 0.002, dtype=np.float32)
    ys = np.arange(-0.25, 0.2501, spacing, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack(
        [gx.ravel(), gy.ravel(), np.ones(gx.size, np.float32)], -1
    )

    def intensity(w):
        # luma in [0,1]; Cloud.rgb carries 0..255 (ops/colorgrad.py::
        # intensity divides by 255 — storing [0,1] here once hid the
        # color term entirely: di shrank 255x below the gradient term
        # and the "colored" escape snapped geometrically)
        return (
            0.5
            + 0.25 * np.sin(13.0 * w[:, 1])
            + 0.10 * np.sin(7.0 * w[:, 0])
        )

    def grad(w):
        return np.stack(
            [
                0.10 * 7.0 * np.cos(7.0 * w[:, 0]),
                0.25 * 13.0 * np.cos(13.0 * w[:, 1]),
                np.zeros(len(w), np.float32),
            ],
            -1,
        ).astype(np.float32)

    n = len(pts)
    tgt = Cloud(
        xyz=jnp.asarray(pts),
        rgb=jnp.asarray(
            np.repeat(
                255.0 * intensity(pts)[:, None], 3, 1
            ).astype(np.float32)
        ),
        valid=jnp.ones((n,), bool),
        normal=jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3)
        ),
        cgrad=jnp.asarray(grad(pts)),
    )
    # source: x-jittered resampling of the same lines, expressed in a
    # frame shifted by -shift (so the TRUE correction is +shift in y)
    src_pts = pts.copy()
    src_pts[:, 0] += rng.uniform(-0.001, 0.001, n).astype(np.float32)
    world = src_pts.copy()
    src_pts[:, 1] -= shift
    src = Cloud(
        xyz=jnp.asarray(src_pts),
        rgb=jnp.asarray(
            np.repeat(
                255.0 * intensity(world)[:, None], 3, 1
            ).astype(np.float32)
        ),
        valid=jnp.ones((n,), bool),
    )
    t_true = np.eye(4, dtype=np.float32)
    t_true[1, 3] = shift
    return src, tgt, t_true


def test_rescue_escape_inherits_colored_residual():
    """REGRESSION PIN for the r3 'rescue variant pin' incident: the
    wide-cap escape solve must inherit the preset's residual. A pinned
    point-to-point escape snaps the aliased-lines scene to the WRONG
    line (passing the keep-gate with a full inlier set — exactly how
    the pin regressed `combined` 7.8e-2 -> 1.3e-1 on-chip); the
    inherited colored-p2l escape recovers the true in-plane shift."""
    from rspc_tpu.registration.pairsteps import _rescue_from

    src, tgt, t_true = _aliased_lines_scene()
    colored_cfg = ICPConfig(
        variant="point_to_plane",
        max_iterations=100,
        max_correspondence_distance=0.01,
        transformation_epsilon=1e-12,
        euclidean_fitness_epsilon=1e-12,
        mse_threshold_absolute=1e-16,
        huber_delta=0.003,
        color_weight=2.0,
        target_chunk=2048,
        use_pallas=False,
        compute_fitness=False,
    )
    n_inl = jnp.asarray(0, jnp.int32)  # collapsed fine stage: gate fires
    rel_colored, fired = _rescue_from(
        src, tgt, n_inl, colored_cfg, cap=0.1, iters=8, thresh=0.55
    )
    assert bool(fired)
    err_colored = np.abs(np.asarray(rel_colored) - t_true).max()
    assert err_colored < 5e-3, err_colored

    pinned_cfg = dataclasses.replace(
        colored_cfg,
        variant="point_to_point",
        huber_delta=None,
        color_weight=0.0,
    )
    rel_pinned, fired_p = _rescue_from(
        src, tgt, n_inl, pinned_cfg, cap=0.1, iters=8, thresh=0.55
    )
    assert bool(fired_p)
    err_pinned = np.abs(np.asarray(rel_pinned) - t_true).max()
    # the geometric escape lands a full line-spacing away (or refuses)
    assert err_pinned > 1e-2, err_pinned
