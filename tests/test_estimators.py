"""Estimator tests against straightforward Python oracles."""

import math

import jax.numpy as jnp
import numpy as np

from rspc_tpu.estimators import (
    ImuSample,
    RotationEstimator,
    estimate_translation,
    rotation_from_imu_stream,
)
from rspc_tpu.estimators.rotation import ACCEL, GYRO


class _OracleRotation:
    """Direct Python port of the reference filter's update equations
    (rotation_estimator.hpp), used as the test oracle."""

    def __init__(self, alpha=0.98):
        self.alpha = alpha
        self.theta = np.zeros(3)
        self.first = True
        self.last_ts = 0.0

    def gyro(self, g, ts):
        if self.first:
            self.last_ts = ts
            return
        dt = (ts - self.last_ts) / 1000.0
        self.last_ts = ts
        self.theta += np.array([-g[2] * dt, -g[1] * dt, g[0] * dt])

    def accel(self, a):
        az = math.atan2(a[1], a[2])
        ax = math.atan2(a[0], math.sqrt(a[1] ** 2 + a[2] ** 2))
        if self.first:
            self.first = False
            self.theta = np.array([ax, math.pi, az])
        else:
            self.theta[0] = self.theta[0] * self.alpha + ax * (1 - self.alpha)
            self.theta[2] = self.theta[2] * self.alpha + az * (1 - self.alpha)


def _random_stream(rng, n=60):
    kinds, data, ts = [], [], []
    t = 1000.0
    for i in range(n):
        t += rng.uniform(3, 8)
        if i % 2 == 0:
            kinds.append(GYRO)
            data.append(rng.normal(0, 0.5, 3))
        else:
            kinds.append(ACCEL)
            data.append(rng.normal(0, 1, 3) + [0, -9.8, 1.0])
        ts.append(t)
    return kinds, np.array(data, np.float32), np.array(ts, np.float32)


def test_rotation_filter_matches_oracle():
    rng = np.random.default_rng(0)
    kinds, data, ts = _random_stream(rng)
    oracle = _OracleRotation()
    for k, d, t in zip(kinds, data, ts):
        if k == GYRO:
            oracle.gyro(d, t)
        else:
            oracle.accel(d)

    theta, _ = rotation_from_imu_stream(ImuSample.stream(kinds, data, ts))
    np.testing.assert_allclose(np.asarray(theta), oracle.theta, atol=1e-4)


def test_rotation_first_flag_shared_between_gyro_and_accel():
    """Gyro samples before the first accel must not integrate (the shared
    'first' flag is only cleared by accel) — reference quirk."""
    kinds = [GYRO, GYRO, GYRO, ACCEL, GYRO]
    data = np.array(
        [[1, 1, 1], [1, 1, 1], [1, 1, 1], [0, -9.8, 1], [0.5, 0, 0]], np.float32
    )
    ts = np.array([0, 10, 20, 25, 30], np.float32)
    theta, _ = rotation_from_imu_stream(ImuSample.stream(kinds, data, ts))
    oracle = _OracleRotation()
    oracle.gyro([1, 1, 1], 0)
    oracle.gyro([1, 1, 1], 10)
    oracle.gyro([1, 1, 1], 20)
    oracle.accel([0, -9.8, 1])
    oracle.gyro([0.5, 0, 0], 30)
    np.testing.assert_allclose(np.asarray(theta), oracle.theta, atol=1e-5)
    # only the last gyro integrated (dt = 5ms after accel reset? no — dt is
    # vs the last gyro ts 20 -> 10ms): theta.z = accel init + 0.5*0.01
    assert abs(float(theta[2]) - (math.atan2(-9.8, 1) + 0.005)) < 1e-4


def test_rotation_stateful_wrapper():
    est = RotationEstimator()
    est.process_gyro([0.1, 0.2, 0.3], 100.0)
    est.process_accel([0.0, -9.8, 0.5])
    est.process_gyro([0.1, 0.2, 0.3], 110.0)
    theta = est.get_theta()
    oracle = _OracleRotation()
    oracle.gyro([0.1, 0.2, 0.3], 100.0)
    oracle.accel([0.0, -9.8, 0.5])
    oracle.gyro([0.1, 0.2, 0.3], 110.0)
    np.testing.assert_allclose(theta, oracle.theta, atol=1e-5)


def _oracle_translation(ref, cmp_, rot, max_iter=500):
    """Direct Python port of the reference grid search (per axis)."""
    from rspc_tpu.ops.transform import rotation_matrix

    r = np.asarray(
        rotation_matrix(jnp.float32(rot[0]), 2)
        @ rotation_matrix(jnp.float32(-rot[1]), 1)
        @ rotation_matrix(jnp.float32(rot[2]), 0)
    )
    out = np.zeros(3)
    for axis in range(3):
        best = None
        best_m = None
        m = -1.0 * (max_iter / 200.0)
        for _ in range(max_iter):
            t = np.zeros(3)
            t[axis] = m
            translated = cmp_ @ r.T + t
            sq = ((translated[:, axis] - ref[:, axis]) ** 2).sum()
            if best is None or sq < best:
                best, best_m = sq, m
            m += 0.01
        out[axis] = best_m
    return out


def test_translation_grid_search_matches_oracle():
    rng = np.random.default_rng(1)
    ref = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    rot = np.array([0.05, -0.1, 0.02], np.float32)
    # build cmp so that ref = R cmp + t_true
    t_true = np.array([0.37, -0.82, 1.13], np.float32)
    from rspc_tpu.ops.transform import rotation_matrix

    r = np.asarray(
        rotation_matrix(jnp.float32(rot[0]), 2)
        @ rotation_matrix(jnp.float32(-rot[1]), 1)
        @ rotation_matrix(jnp.float32(rot[2]), 0)
    )
    cmp_ = ((ref - t_true) @ np.linalg.inv(r).T).astype(np.float32)

    got = np.asarray(
        estimate_translation(jnp.asarray(ref), jnp.asarray(cmp_), jnp.asarray(rot))
    )
    want = _oracle_translation(ref, cmp_, rot)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # grid resolution is 0.01 -> recovered translation within half a step
    np.testing.assert_allclose(got, t_true, atol=0.006)
