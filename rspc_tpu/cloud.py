"""Core point-cloud containers as JAX pytrees.

TPU-first design: clouds are **fixed-capacity padded arrays** so that every
op downstream is shape-static and jittable/batchable. A cloud is

  * ``Cloud``          — unorganized: ``xyz f32[N,3]``, ``rgb f32[N,3]`` (0..255),
                         ``valid bool[N]``; capacity ``N`` is static, the live
                         point count is ``valid.sum()``.
  * ``OrganizedCloud`` — image-shaped: ``xyz f32[H,W,3]``, ``rgb f32[H,W,3]``,
                         ``valid bool[H,W]`` (the edge extractor and
                         deprojection are image-shaped; reference:
                         src/edge_extractor.hpp operates on organized clouds,
                         src/capture.hpp:87-91 indexes row-major).

The reference's equivalents are ``pcl::PointCloud<pcl::PointXYZRGB>`` with
``width/height/is_dense`` (reference: src/types.hpp:8-12). PCL marks invalid
points with NaN or leaves them at the origin (librealsense emits (0,0,0) for
invalid depth); we carry an explicit validity mask instead and treat
non-finite or z<=0 points as invalid when importing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    """Register a dataclass as a JAX pytree (all fields are children)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


# Optional per-point [.., 3] vector payloads beyond xyz/rgb. Every op
# that restructures a cloud (compact, concatenate, merge, stride, crop,
# flatten) maps over this list so a new optional field can never be
# silently dropped by one forgotten enumeration.
OPTIONAL_VEC_FIELDS = ("normal", "cgrad")


def map_optional(cloud, fn) -> dict:
    """Apply ``fn`` to each non-None optional vector field; returns the
    kwargs dict ({} entries stay None)."""
    return {
        name: (None if getattr(cloud, name) is None else fn(getattr(cloud, name)))
        for name in OPTIONAL_VEC_FIELDS
    }


@_register
@dataclasses.dataclass(frozen=True)
class Cloud:
    """Unorganized colored point cloud with a validity mask.

    Reference analog: ``rgb_point_cloud`` (src/types.hpp:9) with
    ``height == 1`` (de-organized).
    """

    xyz: jax.Array   # f32[N, 3]
    rgb: jax.Array   # f32[N, 3], 0..255
    valid: jax.Array  # bool[N]
    # Optional per-point unit normals (PCL analog: PointXYZRGBNormal,
    # consumed by the point-to-plane ICP variant). None = not carried;
    # presence is static, so jitted consumers specialize on it.
    normal: Optional[jax.Array] = None  # f32[N, 3] or None
    # Optional tangent-plane intensity gradients (intensity/meter),
    # consumed by the colored-ICP residual (ops/colorgrad.py). Like
    # normals: None = not carried, presence is static.
    cgrad: Optional[jax.Array] = None  # f32[N, 3] or None

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        """Live point count (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(
        capacity: int,
        dtype=jnp.float32,
        with_normal: bool = False,
        with_cgrad: bool = False,
    ) -> "Cloud":
        return Cloud(
            xyz=jnp.zeros((capacity, 3), dtype),
            rgb=jnp.zeros((capacity, 3), dtype),
            valid=jnp.zeros((capacity,), jnp.bool_),
            normal=jnp.zeros((capacity, 3), dtype) if with_normal else None,
            cgrad=jnp.zeros((capacity, 3), dtype) if with_cgrad else None,
        )

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        rgb: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        valid: Optional[np.ndarray] = None,
    ) -> "Cloud":
        """Build a padded Cloud from host arrays.

        If ``valid`` is not given, points with non-finite coordinates or
        z == 0 are marked invalid (librealsense uses the origin for invalid
        depth; the reference viewer skips z==0 points,
        src/visualizer.hpp:86-88).
        """
        xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
        n = xyz.shape[0]
        if rgb is None:
            rgb = np.zeros((n, 3), np.float32)
        rgb = np.asarray(rgb, np.float32).reshape(-1, 3)
        if valid is None:
            valid = np.isfinite(xyz).all(axis=-1) & (xyz[:, 2] != 0.0)
        valid = np.asarray(valid, bool).reshape(-1)
        cap = capacity if capacity is not None else n
        if n > cap:
            raise ValueError(f"{n} points exceed capacity {cap}")
        pad = cap - n
        xyz = np.pad(np.nan_to_num(xyz), ((0, pad), (0, 0)))
        rgb = np.pad(rgb, ((0, pad), (0, 0)))
        valid = np.pad(valid, (0, pad))
        return Cloud(jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(valid))

    def to_numpy(self) -> tuple[np.ndarray, np.ndarray]:
        """Return (xyz, rgb) of only the valid points, as host arrays."""
        valid = np.asarray(self.valid)
        return np.asarray(self.xyz)[valid], np.asarray(self.rgb)[valid]

    def pad_to(self, capacity: int) -> "Cloud":
        """Grow capacity (no-op if already at least ``capacity``)."""
        cap = self.capacity
        if capacity <= cap:
            return self
        pad = capacity - cap
        return Cloud(
            xyz=jnp.pad(self.xyz, ((0, pad), (0, 0))),
            rgb=jnp.pad(self.rgb, ((0, pad), (0, 0))),
            valid=jnp.pad(self.valid, (0, pad)),
            **map_optional(self, lambda x: jnp.pad(x, ((0, pad), (0, 0)))),
        )


@_register
@dataclasses.dataclass(frozen=True)
class OrganizedCloud:
    """Image-shaped (organized) colored point cloud.

    Reference analog: organized ``pcl::PointCloud`` with width/height from the
    stream profile (src/capture.hpp:79-88, src/capture_opencv.hpp:128-160).
    """

    xyz: jax.Array    # f32[H, W, 3]
    rgb: jax.Array    # f32[H, W, 3], 0..255
    valid: jax.Array  # bool[H, W]
    normal: Optional[jax.Array] = None  # f32[H, W, 3] or None
    # Tangent-plane intensity gradients (ops/colorgrad.py), like normal:
    # None = not carried; presence is static.
    cgrad: Optional[jax.Array] = None   # f32[H, W, 3] or None

    @property
    def height(self) -> int:
        return self.xyz.shape[-3]

    @property
    def width(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=(-1, -2))

    def flatten(self) -> Cloud:
        """Row-major flatten to an unorganized Cloud (capacity = H*W)."""
        hw = self.height * self.width
        return Cloud(
            xyz=self.xyz.reshape(hw, 3),
            rgb=self.rgb.reshape(hw, 3),
            valid=self.valid.reshape(hw),
            **map_optional(self, lambda x: x.reshape(hw, 3)),
        )

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        rgb: Optional[np.ndarray] = None,
        valid: Optional[np.ndarray] = None,
    ) -> "OrganizedCloud":
        xyz = np.asarray(xyz, np.float32)
        if xyz.ndim != 3 or xyz.shape[-1] != 3:
            raise ValueError(f"xyz must be [H,W,3], got {xyz.shape}")
        h, w, _ = xyz.shape
        if rgb is None:
            rgb = np.zeros((h, w, 3), np.float32)
        rgb = np.asarray(rgb, np.float32)
        if valid is None:
            valid = np.isfinite(xyz).all(axis=-1) & (xyz[..., 2] != 0.0)
        valid = np.asarray(valid, bool)
        return OrganizedCloud(
            jnp.asarray(np.nan_to_num(xyz)), jnp.asarray(rgb), jnp.asarray(valid)
        )

    def center_crop_3_5(self) -> "OrganizedCloud":
        """Center-crop to the middle 3/5 x 3/5 of the image.

        Reproduces the reference's ``BlurFilter::filter`` / ``convert_to_pcl``
        crop: rows [H/5, 4H/5) x cols [W/5, 4W/5), with new width/height
        computed as 3/5 of the originals via integer division
        (src/blur_filter.hpp:18-36, src/capture.hpp:79-88). Note the
        reference resizes to (W*3/5)*(H*3/5) points but copies
        (4H/5-H/5)*(4W/5-W/5) of them — identical when H, W are multiples
        of 5 (the real streams are 640x480/1280x720); we require that.
        """
        h, w = self.height, self.width
        if h % 5 or w % 5:
            raise ValueError("center_crop_3_5 requires H, W divisible by 5")
        r0, r1 = h // 5, (h // 5) * 4
        c0, c1 = w // 5, (w // 5) * 4
        return OrganizedCloud(
            xyz=self.xyz[r0:r1, c0:c1],
            rgb=self.rgb[r0:r1, c0:c1],
            valid=self.valid[r0:r1, c0:c1],
            **map_optional(self, lambda x: x[r0:r1, c0:c1]),
        )


def concatenate(a: Cloud, b: Cloud) -> Cloud:
    """Append ``b``'s points after ``a``'s (reference: PCL operator+ on
    clouds, SURVEY.md X11). Capacity is the sum; invalid padding is moved to
    the tail by compaction so the result stays densely packed."""
    xyz = jnp.concatenate([a.xyz, b.xyz], axis=0)
    rgb = jnp.concatenate([a.rgb, b.rgb], axis=0)
    valid = jnp.concatenate([a.valid, b.valid], axis=0)
    opt = {
        name: (
            jnp.concatenate([getattr(a, name), getattr(b, name)], axis=0)
            if getattr(a, name) is not None and getattr(b, name) is not None
            else None
        )
        for name in OPTIONAL_VEC_FIELDS
    }
    return compact(Cloud(xyz, rgb, valid, **opt))


def compact(c: Cloud, capacity: Optional[int] = None) -> Cloud:
    """Stable-compact valid points to the front (static output capacity).

    This is the shape-static substitute for PCL's dynamically-sized
    ``copyPointCloud(cloud, indices, out)`` (reference:
    src/edge_extractor.hpp:26-36): downstream kernels read a dense prefix
    and mask on ``valid``.
    """
    cap = capacity if capacity is not None else c.capacity
    n = c.capacity
    order = jnp.argsort(~c.valid, stable=True)  # valid first, stable
    if cap <= n:
        order = order[:cap]
    take = lambda x: jnp.take(x, order, axis=0)
    out = Cloud(
        take(c.xyz),
        take(c.rgb),
        take(c.valid),
        **map_optional(c, take),
    )
    return out.pad_to(cap)
