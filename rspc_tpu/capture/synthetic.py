"""Synthetic RGBD + IMU sequence generator.

No camera attaches to a TPU host, so the framework ships a synthetic
source that renders depth/color frames of a textured room from a camera
trajectory and synthesizes a consistent IMU stream — the test/bench
counterpart of the reference's live D435i capture (SURVEY.md §7 step 8:
"a Replay source that feeds recordings through the same interface as live
capture"). Ground-truth poses are returned so registration accuracy can be
measured absolutely (the reference has no such oracle — SURVEY.md §4).

The renderer is a jitted per-pixel ray caster against the six axis-aligned
walls of a room, with a procedural checker + stripe texture that gives the
RGB Canny extractor real edges to latch onto. Depth is RealSense-style
z-depth in Z16 millimeter units (depth_scale 0.001).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.estimators.rotation import ACCEL, GYRO, ImuSample
from rspc_tpu.ops.deproject import Intrinsics, rgbd_to_organized_cloud
from rspc_tpu.ops.transform import rotation_matrix

ROOM = 6.0  # room edge length [m]

# (axis, offset, base RGB) for the six walls
_WALLS = (
    (0, 0.0, (200, 80, 80)),
    (0, ROOM, (80, 200, 80)),
    (1, 0.0, (80, 80, 200)),
    (1, ROOM, (200, 200, 80)),
    (2, 0.0, (200, 80, 200)),
    (2, ROOM, (80, 200, 200)),
)

# Axis-aligned boxes standing on the floor ((min xyz), (max xyz), base
# RGB). They give every view genuine 3-D structure — a single flat wall
# leaves point-to-point ICP slide-ambiguous — and their top faces plus
# the visible floor supply the horizontal (y-normal) constraints a
# point-to-plane solver needs (a scene with walls only is singular in
# t_y, which is a property of the scene, not the solver).
_BOXES = (
    ((2.2, 0.0, 4.2), (2.9, 1.4, 4.9), (240, 160, 40)),
    ((3.6, 0.0, 4.6), (4.3, 0.9, 5.3), (40, 160, 240)),
    ((2.8, 0.0, 5.0), (3.5, 1.9, 5.7), (160, 240, 120)),
    ((1.2, 0.0, 3.6), (1.7, 1.1, 4.1), (230, 90, 180)),
    ((4.4, 0.0, 3.4), (5.0, 0.7, 3.9), (120, 120, 250)),
)


def _texture(p: jnp.ndarray, axis: int, base) -> jnp.ndarray:
    """Procedural texture: 0.25 m checker + 1 m stripes over the two
    in-plane coordinates."""
    coords = [p[..., i] for i in range(3) if i != axis]
    u, v = coords
    checker = (jnp.floor(u / 0.25) + jnp.floor(v / 0.25)) % 2.0
    stripe = (jnp.floor(u / 1.0) % 2.0) * 0.5
    shade = 0.45 + 0.4 * checker + 0.15 * stripe
    col = jnp.asarray(base, jnp.float32)
    return col[None, None, :] * shade[..., None]


@partial(jax.jit, static_argnames=("intr",))
def render_frame(pose_c2w: jnp.ndarray, intr: Intrinsics):
    """Render (depth_z16 u16[H,W], color u8[H,W,3]) from a camera-to-world
    pose inside the room."""
    h, w = intr.height, intr.width
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    d_cam = jnp.stack(
        [(u - intr.ppx) / intr.fx, (v - intr.ppy) / intr.fy, jnp.ones((h, w))],
        axis=-1,
    )
    r = pose_c2w[:3, :3]
    o = pose_c2w[:3, 3]
    d_w = d_cam @ r.T  # [H,W,3]

    best_t = jnp.full((h, w), jnp.inf)
    best_col = jnp.zeros((h, w, 3))
    eps = 1e-6

    def consider(axis, offset, base, bounds):
        nonlocal best_t, best_col
        denom = d_w[..., axis]
        t = (offset - o[axis]) / jnp.where(jnp.abs(denom) < eps, eps, denom)
        p = o[None, None, :] + t[..., None] * d_w
        inside = jnp.ones((h, w), bool)
        for i in range(3):
            if i != axis:
                lo, hi = bounds[i]
                inside &= (p[..., i] >= lo - 1e-3) & (p[..., i] <= hi + 1e-3)
        hit = (t > 0.05) & inside & (t < best_t)
        best_t = jnp.where(hit, t, best_t)
        col = _texture(p, axis, base)
        best_col = jnp.where(hit[..., None], col, best_col)

    full = ((0.0, ROOM),) * 3
    for axis, offset, base in _WALLS:
        consider(axis, offset, base, full)
    for mn, mx, base in _BOXES:
        bounds = tuple((mn[i], mx[i]) for i in range(3))
        for axis in range(3):
            consider(axis, mn[axis], base, bounds)
            consider(axis, mx[axis], base, bounds)

    depth_m = jnp.where(jnp.isfinite(best_t), best_t, 0.0)
    # round-to-nearest millimeter: a real sensor quantizes symmetrically;
    # astype() truncation would bias every depth -0.5 mm toward the
    # camera (a radial shrink that biases registration oracles)
    depth_z16 = jnp.clip(jnp.round(depth_m * 1000.0), 0, 65535).astype(
        jnp.uint16
    )
    color = jnp.clip(best_col, 0, 255).astype(jnp.uint8)
    return depth_z16, color


@dataclasses.dataclass(frozen=True)
class DepthNoise:
    """RealSense-style depth sensor noise (VERDICT r1 #5: the round-1
    scene was noise-free beyond Z16 quantization).

    * axial: sigma_z(z) = axial_a + axial_b * z^2  [m] — the standard
      stereo-depth error model (disparity noise maps to depth error
      growing quadratically with range; D435-class defaults).
    * lateral: Gaussian pixel jitter — depth is resampled at a jittered
      pixel location, which turns surface gradients and object boundaries
      into depth error exactly the way sensor lateral noise does.
    * dropout: fraction of pixels invalidated at random (z = 0), on top
      of whatever the renderer already marks invalid.

    Applied deterministically per frame (seed + frame index)."""

    axial_a: float = 0.001     # 1 mm floor
    axial_b: float = 0.0019    # +1.9 mm at 1 m, +7.6 mm at 2 m
    lateral_px: float = 0.0    # std of the pixel jitter
    dropout: float = 0.0       # fraction of pixels dropped

    def apply(self, depth_z16: np.ndarray, rng: np.random.Generator):
        d = depth_z16.astype(np.float32) * 1e-3  # meters
        h, w = d.shape
        if self.lateral_px > 0:
            vv, uu = np.meshgrid(
                np.arange(h, dtype=np.float32),
                np.arange(w, dtype=np.float32),
                indexing="ij",
            )
            ju = np.clip(
                np.rint(uu + rng.normal(0, self.lateral_px, d.shape)),
                0,
                w - 1,
            ).astype(np.int64)
            jv = np.clip(
                np.rint(vv + rng.normal(0, self.lateral_px, d.shape)),
                0,
                h - 1,
            ).astype(np.int64)
            d = d[jv, ju]
        valid = d > 0
        if self.axial_a > 0 or self.axial_b > 0:
            sigma = self.axial_a + self.axial_b * d * d
            d = np.where(valid, d + rng.normal(0, 1, d.shape) * sigma, 0.0)
        if self.dropout > 0:
            d = np.where(rng.random(d.shape) < self.dropout, 0.0, d)
        return np.clip(np.rint(d * 1000.0), 0, 65535).astype(np.uint16)


@dataclasses.dataclass
class SyntheticSequence:
    """A camera yawing in place at the room center: frame i pose =
    base @ Ry(i * yaw_step), optionally translating by ``translation_step``
    per frame (partial-overlap trajectories). Mirrors the reference's
    turntable-style usage (README's -30 deg/frame default guess).

    Provides RGBD frames, ground-truth relative transforms (mapping frame-i
    points into frame-0 coordinates), and a consistent IMU stream with one
    (gyro, accel) pair per frameset at 2 s spacing (the reference's capture
    throttle, src/capture.hpp:168-170).

    Robustness knobs (VERDICT r1 #5):
      * ``noise`` — DepthNoise model applied to every depth frame;
      * ``texture_contrast`` — scales the procedural texture's contrast
        about its mean (1.0 = round-1 scene; 0.15 = low-texture room that
        starves the RGB-Canny edge extractor);
      * ``translation_step`` — per-frame camera translation in world
        coords (combined with yaw_step this produces partial-overlap
        pairs instead of pure rotation about a fixed center);
      * ``yaw_schedule`` — explicit per-frame absolute yaw angles (rad),
        overriding the linear ``i * yaw_step`` ramp. An out-and-back
        schedule (0, s, 2s, 3s, 2s, s, 0, ...) makes late frames
        RE-OBSERVE early views — the loop-closure structure a pose-graph
        solver needs and which a forward-sweeping turntable never
        produces (RESULTS.md r2: the pose graph could only tie `map`
        because every skip-pair was blind along the same directions).
        The IMU stream stays consistent (per-interval gyro rates from
        the yaw differences)."""

    n_frames: int = 4
    yaw_step: float = -0.2  # rad per frame, about the camera y axis
    intr: Intrinsics = Intrinsics.simple(160, 120)
    seed: int = 0
    noise: DepthNoise | None = None
    texture_contrast: float = 1.0
    translation_step: tuple = (0.0, 0.0, 0.0)
    yaw_schedule: tuple | None = None
    # explicit per-frame world-position offsets [n_frames][3], overriding
    # the linear i * translation_step ramp (out-and-back trajectories)
    translation_schedule: tuple | None = None

    def __post_init__(self):
        c = ROOM / 2.0
        base = np.eye(4, dtype=np.float32)
        # tripod-height camera: the floor (and the boxes' top faces)
        # enter the field of view, as in any real indoor scan — a camera
        # at mid-room height sees walls only, which leaves registration
        # unconstrained in t_y for plane-based solvers
        base[:3, 3] = [c, 1.2, c]
        if self.yaw_schedule is not None:
            if len(self.yaw_schedule) != self.n_frames:
                raise ValueError(
                    f"yaw_schedule needs {self.n_frames} entries, got "
                    f"{len(self.yaw_schedule)}"
                )
            self.yaws = [float(y) for y in self.yaw_schedule]
        else:
            self.yaws = [i * self.yaw_step for i in range(self.n_frames)]
        self.poses = []
        step = np.asarray(self.translation_step, np.float32)
        if self.translation_schedule is not None:
            if len(self.translation_schedule) != self.n_frames:
                raise ValueError(
                    f"translation_schedule needs {self.n_frames} entries"
                )
            offsets = [
                np.asarray(t, np.float32) for t in self.translation_schedule
            ]
        else:
            offsets = [i * step for i in range(self.n_frames)]
        for i, yaw in enumerate(self.yaws):
            ry = np.asarray(rotation_matrix(jnp.float32(yaw), 1))
            p = base.copy()
            p[:3, :3] = base[:3, :3] @ ry
            p[:3, 3] = base[:3, 3] + offsets[i]
            self.poses.append(p)

    def gt_transform(self, i: int) -> np.ndarray:
        """Maps frame-i camera coords into frame-0 camera coords:
        inv(C2W_0) @ C2W_i = Ry(i * yaw_step) for this trajectory."""
        return np.linalg.inv(self.poses[0]) @ self.poses[i]

    def frames(self):
        for i, p in enumerate(self.poses):
            depth, color = render_frame(jnp.asarray(p), self.intr)
            if self.texture_contrast != 1.0:
                c = np.asarray(color, np.float32)
                mean = c.mean(axis=(0, 1), keepdims=True)
                c = mean + self.texture_contrast * (c - mean)
                color = jnp.asarray(
                    np.clip(c, 0, 255).astype(np.uint8)
                )
            if self.noise is not None:
                rng = np.random.default_rng(self.seed * 1000 + i)
                depth = jnp.asarray(
                    self.noise.apply(np.asarray(depth), rng)
                )
            yield depth, color

    def clouds(self, center_crop: bool = False, bgr: bool = False):
        out = []
        for depth, color in self.frames():
            oc = rgbd_to_organized_cloud(depth, color, self.intr, bgr=bgr)
            if center_crop:
                oc = oc.center_crop_3_5()
            out.append(oc)
        return out

    def imu_stream(self):
        """One (gyro, accel) event pair per frame, 2 s apart.

        The camera yaws about its own +y axis by yaw_step per 2 s, so the
        gyro reads angular rate (0, omega, 0) with omega = yaw_step / 2 s;
        the filter integrates theta.y += -gy*dt, giving theta_i.y - theta_0.y
        = -i*yaw_step, and the NDT guess Ry(-theta.y) = Ry(i*yaw_step) — the
        ground-truth rotation. Accel reads gravity (0, +g, 0) + tiny z so
        theta x/z stay constant across frames (level camera).
        Returns (ImuSample stream, snapshot indices — one per frame, at the
        accel event, mirroring get_theta() after processing both samples).
        """
        kinds, data, ts = [], [], []
        # per-interval rates from the yaw differences (constant
        # yaw_step/2 on the default linear ramp); omega_0 uses the first
        # interval's rate — it cancels in the theta DIFFERENCES the
        # guess path consumes
        steps = [
            b - a for a, b in zip(self.yaws[:-1], self.yaws[1:])
        ] or [0.0]
        diffs = [steps[0]] + steps
        t = 1000.0
        snap = []
        for i in range(self.n_frames):
            omega = diffs[i] / 2.0
            kinds.append(GYRO)
            data.append([0.0, omega, 0.0])
            ts.append(t)
            kinds.append(ACCEL)
            data.append([0.0, 9.81, 1e-3])
            ts.append(t)
            snap.append(len(kinds) - 1)
            t += 2000.0
        return (
            ImuSample.stream(kinds, np.asarray(data, np.float32), np.asarray(ts, np.float32)),
            np.asarray(snap),
        )

    def thetas(self) -> np.ndarray:
        """Per-frame filter outputs, as the capture loop records them
        (src/capture.hpp:160-166)."""
        from rspc_tpu.estimators.rotation import rotation_from_imu_stream

        stream, snap = self.imu_stream()
        _, all_thetas = rotation_from_imu_stream(stream)
        return np.asarray(all_thetas)[snap]
