"""IMU complementary-filter rotation estimation.

TPU-native replacement for the reference's ``RotationEstimator``
(src/rotation_estimator.hpp): a gyro-integrating / accel-blending
complementary filter with alpha = 0.98. Implemented as a ``lax.scan`` over a
replayed, time-ordered stream of interleaved gyro/accel samples — the
functional equivalent of the mutex-guarded stateful class (the reference is
single-threaded despite the mutex; SURVEY.md C7).

Exact semantics reproduced (sign/axis conventions matter downstream —
the initial-guess builders in ops/transform.py consume this theta):
  * gyro (process_gyro, rotation_estimator.hpp:22-46): the FIRST gyro
    sample only records its timestamp; later samples integrate
    ``theta += (-gz*dt, -gy*dt, +gx*dt)`` with ``dt = (ts - last_ts)/1000``
    (RealSense timestamps are in ms).
  * accel (process_accel, :48-73): ``angle.z = atan2(ay, az)``,
    ``angle.x = atan2(ax, sqrt(ay^2 + az^2))``; the FIRST accel sample
    initializes ``theta = (angle.x, PI, angle.z)`` (y = PI by convention);
    later samples blend only x and z:
    ``theta.{x,z} = alpha*theta.{x,z} + (1-alpha)*angle.{x,z}``.
  * The ``first`` flag is shared: it is cleared by the first accel sample,
    so gyro samples arriving before any accel keep resetting the gyro
    timestamp without integrating — reproduced exactly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

GYRO = 0
ACCEL = 1


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class ImuSample:
    """One IMU event: kind (0=gyro, 1=accel), xyz reading, timestamp [ms]."""

    kind: jax.Array  # i32[...]
    data: jax.Array  # f32[..., 3]
    ts: jax.Array    # f32[...] milliseconds

    @staticmethod
    def stream(kinds, data, ts) -> "ImuSample":
        return ImuSample(
            jnp.asarray(kinds, jnp.int32),
            jnp.asarray(data, jnp.float32),
            jnp.asarray(ts, jnp.float32),
        )


@_register
@dataclasses.dataclass(frozen=True)
class FilterState:
    theta: jax.Array         # f32[3]
    first: jax.Array         # bool — true until the first accel sample
    last_ts_gyro: jax.Array  # f32 ms
    has_gyro_ts: jax.Array   # bool — a gyro timestamp has been recorded


def init_state(dtype=jnp.float32) -> FilterState:
    return FilterState(
        theta=jnp.zeros(3, dtype),
        first=jnp.bool_(True),
        last_ts_gyro=jnp.asarray(0.0, dtype),
        has_gyro_ts=jnp.bool_(False),
    )


def _gyro_step(state: FilterState, data, ts) -> FilterState:
    dt = (ts - state.last_ts_gyro) / 1000.0
    delta = jnp.stack([-data[2] * dt, -data[1] * dt, data[0] * dt])
    integrate = ~state.first
    theta = jnp.where(integrate, state.theta + delta, state.theta)
    # reference: while first, process_gyro only updates last_ts and returns
    return FilterState(
        theta=theta,
        first=state.first,
        last_ts_gyro=ts,
        has_gyro_ts=jnp.bool_(True),
    )


def _accel_step(state: FilterState, data, alpha) -> FilterState:
    angle_z = jnp.arctan2(data[1], data[2])
    angle_x = jnp.arctan2(data[0], jnp.sqrt(data[1] ** 2 + data[2] ** 2))
    init_theta = jnp.stack([angle_x, jnp.asarray(math.pi, data.dtype), angle_z])
    blended = jnp.stack(
        [
            state.theta[0] * alpha + angle_x * (1.0 - alpha),
            state.theta[1],
            state.theta[2] * alpha + angle_z * (1.0 - alpha),
        ]
    )
    theta = jnp.where(state.first, init_theta, blended)
    return FilterState(
        theta=theta,
        first=jnp.bool_(False),
        last_ts_gyro=state.last_ts_gyro,
        has_gyro_ts=state.has_gyro_ts,
    )


def step(state: FilterState, sample: ImuSample, alpha: float = 0.98) -> FilterState:
    """Process one IMU event (jittable)."""
    a = jnp.asarray(alpha, sample.data.dtype)
    gyro_state = _gyro_step(state, sample.data, sample.ts)
    accel_state = _accel_step(state, sample.data, a)
    is_gyro = sample.kind == GYRO
    return jax.tree_util.tree_map(
        lambda g, acc: jnp.where(is_gyro, g, acc), gyro_state, accel_state
    )


def rotation_from_imu_stream(
    samples: ImuSample,
    alpha: float = 0.98,
    snapshot_mask: jax.Array | None = None,
):
    """Run the filter over a [T]-length event stream with ``lax.scan``.

    Returns ``(final_theta f32[3], thetas_at_all_steps f32[T,3])``. The
    capture loop snapshots ``get_theta()`` right after processing each
    frameset's gyro+accel pair (src/capture.hpp:160-166); use
    ``thetas_at_all_steps`` indexed at those positions (or gather with
    ``snapshot_mask``) to reproduce the per-frame thetas.
    """

    def body(state, sample):
        new_state = step(state, sample, alpha)
        return new_state, new_state.theta

    final_state, thetas = jax.lax.scan(body, init_state(samples.data.dtype), samples)
    if snapshot_mask is not None:
        idx = jnp.nonzero(snapshot_mask, size=int(snapshot_mask.sum()))[0]
        return final_state.theta, thetas[idx]
    return final_state.theta, thetas


class RotationEstimator:
    """Stateful convenience wrapper mirroring the reference class's API
    (process_gyro / process_accel / get_theta) for host-side streaming use;
    the jittable path is ``rotation_from_imu_stream``."""

    def __init__(self, alpha: float = 0.98):
        self.alpha = alpha
        self._state = init_state()

    def process_gyro(self, gyro_xyz, ts_ms: float) -> None:
        sample = ImuSample.stream(GYRO, np.asarray(gyro_xyz, np.float32), ts_ms)
        self._state = step(self._state, sample, self.alpha)

    def process_accel(self, accel_xyz) -> None:
        sample = ImuSample.stream(ACCEL, np.asarray(accel_xyz, np.float32), 0.0)
        self._state = step(self._state, sample, self.alpha)

    def get_theta(self) -> np.ndarray:
        return np.asarray(self._state.theta)
