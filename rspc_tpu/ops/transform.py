"""Rigid 3-D transforms and the reference's initial-guess builders.

Replaces ``pcl::transformPointCloud`` (SURVEY.md X9) and the Eigen
angle-axis guess construction in the registration schemes. All functions are
jittable and batch under ``vmap``.

Conventions: transforms are homogeneous ``f32[4,4]`` acting on column
vectors, ``p' = T @ [p;1]``; points are row-major ``[N,3]`` so application is
``p @ R^T + t`` — identical to Eigen/PCL.
"""

from __future__ import annotations

import jax.numpy as jnp

from rspc_tpu.cloud import Cloud, map_optional


def rotation_matrix(angle, axis: int) -> jnp.ndarray:
    """3x3 rotation about a coordinate axis (0=X, 1=Y, 2=Z), Eigen
    ``AngleAxisf(angle, Unit<axis>())`` semantics (right-handed, CCW)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == 1:
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    elif axis == 2:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    else:
        raise ValueError(f"axis must be 0..2, got {axis}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def make_rigid(rotation: jnp.ndarray, translation=None) -> jnp.ndarray:
    """Assemble a 4x4 homogeneous transform from R (3x3) and t (3,)."""
    t = jnp.zeros(3, rotation.dtype) if translation is None else translation
    top = jnp.concatenate([rotation, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], rotation.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Transform composition a∘b (apply b first): ``a @ b``."""
    return a @ b


def rotate_points(rot: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """``xyz @ rot^T`` as explicit per-component FMAs.

    A [N,3]x[3,3] contraction on the MXU wastes 125/128 of the systolic
    depth AND makes XLA carry bf16 shadow copies of the point array
    through surrounding loops (the default-precision dot truncates
    operands); three vector FMAs are exact f32 and keep everything on
    the VPU with no extra layouts."""
    c = [
        xyz[..., 0] * rot[..., i, 0, None]
        + xyz[..., 1] * rot[..., i, 1, None]
        + xyz[..., 2] * rot[..., i, 2, None]
        for i in range(3)
    ]
    return jnp.stack(c, axis=-1)


def apply_transform(transform: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to ``[..., N, 3]`` points
    (pcl::transformPointCloud, SURVEY.md X9)."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return rotate_points(rot, xyz) + t[..., None, :]


def apply_transform_cloud(transform: jnp.ndarray, cloud: Cloud) -> Cloud:
    rot = transform[..., :3, :3]
    return Cloud(
        xyz=apply_transform(transform, cloud.xyz),
        rgb=cloud.rgb,
        valid=cloud.valid,
        # per-point direction fields (normals, tangent-plane intensity
        # gradients) rotate without translating (rigid => R^-T == R)
        **map_optional(cloud, lambda v: rotate_points(rot, v)),
    )


def imu_guess_full(theta: jnp.ndarray) -> jnp.ndarray:
    """ICP-edge IMU initial guess: full-XYZ axis mapping.

    Reference (src/icp_edge_based_registration.hpp:86-92):
      ``T(0) * AngleAxis(theta.x, UnitZ) * AngleAxis(-theta.y, UnitY)
      * AngleAxis(theta.z, UnitX)``
    i.e. R = Rz(theta.x) @ Ry(-theta.y) @ Rx(theta.z). theta is the
    complementary-filter output (x=pitch accum, y=yaw, z=roll accum).
    """
    r = (
        rotation_matrix(theta[..., 0], 2)
        @ rotation_matrix(-theta[..., 1], 1)
        @ rotation_matrix(theta[..., 2], 0)
    )
    return make_rigid(r)


def imu_guess_y(theta: jnp.ndarray) -> jnp.ndarray:
    """NDT-edge IMU initial guess: y-rotation only.

    Reference (src/ndt_edge_based_registration.hpp:79-80): uses only
    ``AngleAxis(-theta.y, UnitY)`` — unlike the ICP scheme's full mapping.
    """
    return make_rigid(rotation_matrix(-theta[..., 1], 1))


def static_y_guess(acc_rads) -> jnp.ndarray:
    """Static accumulated y-rotation guess
    (src/icp_edge_based_registration.hpp:98-101,
    src/ndt_edge_based_registration.hpp:86-89). Callers accumulate
    ``acc_rads += rads`` per frame before calling."""
    return make_rigid(rotation_matrix(jnp.asarray(acc_rads), 1))


def relative_thetas(thetas: jnp.ndarray) -> jnp.ndarray:
    """Rebase IMU thetas against frame 0.

    Reference quirk (src/icp_edge_based_registration.hpp:83-84): the loop
    mutates ``thetas[cloud_idx] += -thetas[0]`` in place for idx >= 1; since
    each index is touched once and index 0 is never rebased, this equals
    ``theta_i - theta_0`` for i >= 1 and ``theta_0`` for i = 0.
    (Also note src/capture_opencv.hpp:228-237 ``make_thetas_relative`` is a
    no-op in the reference — pass-by-value; we implement the intent here.)
    """
    rebased = thetas - thetas[:1]
    return jnp.concatenate([thetas[:1], rebased[1:]], axis=0)
