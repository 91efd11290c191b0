"""Fixed-capacity cloud buffer ops shared by the registration layer.

Split out of schemes.py (VERDICT r2 #8); see schemes.py for the layer
overview and reference mapping (SURVEY.md C2-C5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud
from rspc_tpu.cloud import OPTIONAL_VEC_FIELDS
from rspc_tpu.cloud import OrganizedCloud
from rspc_tpu.cloud import map_optional


@jax.jit
def merge_append(dst: Cloud, src: Cloud, gate=None) -> Cloud:
    """Append src's valid points into dst's free tail slots
    (PCL ``*dst = *dst + *src``, SURVEY.md X11) without reallocation.
    Overflow beyond dst capacity is dropped.

    ``gate`` (optional traced bool): when False, nothing is appended —
    the gate folds into the scatter indices, so inside a scan the
    not-merged branch needs NO copy of dst (a scatter-then-select would
    force XLA to materialize both versions of the buffers every
    iteration)."""
    order = jnp.argsort(~src.valid, stable=True)
    sxyz = jnp.take(src.xyz, order, axis=0)
    srgb = jnp.take(src.rgb, order, axis=0)
    svalid = jnp.take(src.valid, order, axis=0)
    if gate is not None:
        svalid = svalid & gate
    start = dst.count()
    pos = start + jnp.arange(src.capacity, dtype=jnp.int32)
    pos = jnp.where(svalid, pos, dst.capacity)  # OOB -> dropped
    opt = {
        name: (
            getattr(dst, name).at[pos].set(
                jnp.take(getattr(src, name), order, axis=0), mode="drop"
            )
            if getattr(dst, name) is not None
            and getattr(src, name) is not None
            else None
        )
        for name in OPTIONAL_VEC_FIELDS
    }
    return Cloud(
        xyz=dst.xyz.at[pos].set(sxyz, mode="drop"),
        rgb=dst.rgb.at[pos].set(srgb, mode="drop"),
        valid=dst.valid.at[pos].set(svalid, mode="drop"),
        **opt,
    )



def _block_append(dst: Cloud, src: Cloud, offset, gate=None) -> Cloud:
    """Append ``src``'s WHOLE fixed-capacity buffer (invalid rows carried
    along masked) at ``offset`` — a contiguous ``dynamic_update_slice``
    instead of merge_append's compacting row scatter. The written SET of
    valid points is identical, only slot layout differs (interior holes),
    which every consumer masks; measured ~5x cheaper than the scatter on
    multi-MB carry buffers inside a scan. Caller guarantees
    ``offset + src.capacity <= dst.capacity``."""
    valid = src.valid if gate is None else src.valid & gate
    dus = jax.lax.dynamic_update_slice
    opt = {
        name: (
            dus(getattr(dst, name), getattr(src, name), (offset, 0))
            if getattr(dst, name) is not None
            and getattr(src, name) is not None
            else getattr(dst, name)
        )
        for name in OPTIONAL_VEC_FIELDS
    }
    return Cloud(
        xyz=dus(dst.xyz, src.xyz, (offset, 0)),
        rgb=dus(dst.rgb, src.rgb, (offset, 0)),
        valid=dus(dst.valid, valid, (offset,)),
        **opt,
    )



def _as_unorganized(c) -> Cloud:
    return c.flatten() if isinstance(c, OrganizedCloud) else c



def _stride_cloud(cloud: Cloud, max_points: int) -> Cloud:
    """Deterministic every-k-th-row subsample for score sweeps. The
    voxel-downsample emits clouds compacted by sorted voxel key, so a
    stride picks a spatially spread subset, not a corner."""
    cap = cloud.capacity
    if max_points <= 0 or cap <= max_points:
        return cloud
    step = -(-cap // max_points)
    return Cloud(
        xyz=cloud.xyz[::step],
        rgb=cloud.rgb[::step],
        valid=cloud.valid[::step],
        **map_optional(cloud, lambda x: x[::step]),
    )



def _rigid_inverse(t):
    """Inverse of a rigid 4x4 (R^T, -R^T p) — no linear solve."""
    r = t[:3, :3]
    p = t[:3, 3]
    return (
        jnp.eye(4, dtype=t.dtype)
        .at[:3, :3].set(r.T)
        .at[:3, 3].set(-r.T @ p)
    )
