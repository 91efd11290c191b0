"""Organized multi-modal edge detection (5 label classes).

TPU-native replacement for ``pcl::OrganizedEdgeFromRGBNormals``
(src/edge_extractor.hpp:8-24; SURVEY.md X3). Produces the same five label
classes on an organized cloud:

  index 0  NAN_BOUNDARY    — valid point bordering an invalid region whose
                              far side can't be resolved
  index 1  OCCLUDING       — closer side of a depth discontinuity
  index 2  OCCLUDED        — farther side of a depth discontinuity
  index 3  HIGH_CURVATURE  — Canny NMS+hysteresis on the normal-image
                              (nx, ny) components (PCL OrganizedEdgeFromNormals)
  index 4  RGB_CANNY       — Canny on mean-RGB intensity (PCL
                              OrganizedEdgeFromRGB); the only class the
                              reference consumes (edge_extractor.hpp:36-38)

Semantics mirrored from PCL:
  * depth discontinuity is relative: |dz| > threshold * z (the reference's
    0.2 is a fraction, despite its "2cm" comment);
  * across invalid (NaN/zero-depth) runs, the detector searches up to
    ``max_search_neighbors`` pixels along each of the 8 directions for the
    first valid pixel to classify the boundary as occluding/occluded; if
    none is found the point is a NAN_BOUNDARY. Implemented as a
    data-parallel ``fori_loop`` of shifted-image updates (one [H,W] pass
    per step) instead of PCL's per-pixel pointer walk — same result, VPU
    friendly;
  * label classes are mutually exclusive; later extraction stages
    overwrite earlier ones (base -> high-curvature -> rgb), so RGB_CANNY
    wins ties, matching PCL's compute() ordering.

Divergence (documented): PCL copies edge *points* including non-finite
ones into the per-class clouds; we compact only valid points — PCL's NaN
edge points produce no kd-tree correspondences downstream, so registration
behavior is identical.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud, OrganizedCloud, compact
from rspc_tpu.config import EdgeConfig
from rspc_tpu.ops.canny import canny, canny_from_gradients
from rspc_tpu.ops.image import shift2d
from rspc_tpu.ops.normals import estimate_normals

# Label codes of the label image returned by extract_organized_edges
# (0 = no edge; 1..5 = the classes above in PCL's label_indices order).
LABEL_NONE = 0
LABEL_NAN_BOUNDARY = 1
LABEL_OCCLUDING = 2
LABEL_OCCLUDED = 3
LABEL_HIGH_CURVATURE = 4
LABEL_RGB_CANNY = 5

_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


_SHUFFLE_BLOCK = 128


def _shuffle_priority(n: int) -> jnp.ndarray:
    """Constant i32[n] rank giving each pixel its position under a fixed
    pseudo-random 128-element-block shuffle (blocks permuted, order within
    a block kept). Capacity truncation by ascending rank then drops pixels
    uniformly across the image instead of amputating the bottom rows —
    row-major truncation silently destroys registration overlap whenever a
    frame saturates its capacity. Block granularity (not per-pixel) keeps
    the associated gathers contiguous; a per-pixel permutation of a
    640x480 image cost ~12 ms/frame of random-access DMA."""
    import numpy as _np

    nb = -(-n // _SHUFFLE_BLOCK)
    rng = _np.random.default_rng(0x5EED)
    perm_b = rng.permutation(nb)  # output block j reads input block perm_b[j]
    inv = _np.argsort(perm_b)     # input block b lands at output slot inv[b]
    i = _np.arange(n)
    pri = inv[i // _SHUFFLE_BLOCK] * _SHUFFLE_BLOCK + i % _SHUFFLE_BLOCK
    return jnp.asarray(pri.astype("int32"))


def _first_valid_along(z, valid, dr, dc, max_steps):
    """For each pixel: depth of the first *valid* pixel at offset
    k*(dr,dc), k in [1, max_steps], and whether one exists.

    Log-doubling construction, O(log max_steps) image ops instead of a
    max_steps-long shift chain: ``F_k`` = (first-valid depth, found) over
    the next 2^k pixels along the direction; ``F_{k+1} = combine(F_k,
    shift(F_k, 2^k))``; windows for an arbitrary max_steps compose from
    its binary digits. Exactly equivalent to PCL's per-pixel walk of
    max_search_neighbors steps."""

    def shift_state(st, steps):
        fz, fv = st
        return (
            shift2d(fz, dr * steps, dc * steps, fill=0.0),
            shift2d(fv, dr * steps, dc * steps, fill=False),
        )

    def combine(a, b):
        """first-valid of window a followed by window b."""
        az, av = a
        bz, bv = b
        return jnp.where(av, az, bz), av | bv

    # F_0: window of 1 pixel at offset 1.
    f = shift_state((z, valid), 1)
    span = 1
    result = None
    covered = 0
    remaining = max_steps
    while remaining > 0:
        if remaining & 1:
            block = shift_state(f, covered) if covered else f
            result = block if result is None else combine(result, block)
            covered += span
        remaining >>= 1
        if remaining:
            f = combine(f, shift_state(f, span))
            span *= 2
    return result


def _depth_edges(cloud: OrganizedCloud, config: EdgeConfig):
    """NAN_BOUNDARY / OCCLUDING / OCCLUDED labeling."""
    z = cloud.xyz[..., 2]
    valid = cloud.valid
    thresh = config.depth_discontinuity_threshold * jnp.abs(z)

    occluding = jnp.zeros(z.shape, jnp.bool_)
    occluded = jnp.zeros(z.shape, jnp.bool_)
    nan_boundary = jnp.zeros(z.shape, jnp.bool_)

    for dr, dc in _DIRS:
        nbr_z = shift2d(z, dr, dc, fill=0.0)
        nbr_v = shift2d(valid, dr, dc, fill=False)

        # valid neighbor: direct depth comparison
        dz = nbr_z - z
        occluding |= valid & nbr_v & (dz > thresh)
        occluded |= valid & nbr_v & (dz < -thresh)

        # invalid neighbor: search past the hole for the first valid pixel
        far_z, far_found = _first_valid_along(
            z, valid, dr, dc, config.max_search_neighbors
        )
        at_hole = valid & ~nbr_v
        dz_far = far_z - z
        occluding |= at_hole & far_found & (dz_far > thresh)
        occluded |= at_hole & far_found & (dz_far < -thresh)
        nan_boundary |= at_hole & (
            ~far_found | (far_found & (jnp.abs(dz_far) <= thresh))
        )

    return nan_boundary, occluding, occluded


@partial(jax.jit, static_argnames=("config",))
def extract_organized_edges(
    cloud: OrganizedCloud, config: EdgeConfig = EdgeConfig()
) -> jnp.ndarray:
    """Full 5-class edge labeling. Returns ``labels i32[H,W]`` with the
    LABEL_* codes (PCL: compute(labels, label_indices))."""
    labels, _, _ = _organized_edges_with_normals(cloud, config)
    return labels


def _organized_edges_with_normals(
    cloud: OrganizedCloud, config: EdgeConfig
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Labels plus the normal image (and its validity mask) the
    high-curvature stage already computes (reused by
    extract_edge_features so edge clouds carry normals at zero extra
    cost). Classes absent from ``config.edge_types`` are skipped
    entirely (PCL setEdgeType analog) — their image sweeps never enter
    the program."""
    types = frozenset(config.edge_types)
    want_depth = types & {"nan_boundary", "occluding", "occluded"}

    labels = jnp.zeros(cloud.valid.shape, jnp.int32)
    if want_depth:
        nan_b, occluding, occluded = _depth_edges(cloud, config)
        # base classes (within-base priority: occluded > occluding > nan)
        if "nan_boundary" in types:
            labels = jnp.where(nan_b, LABEL_NAN_BOUNDARY, labels)
        if "occluding" in types:
            labels = jnp.where(occluding, LABEL_OCCLUDING, labels)
        if "occluded" in types:
            labels = jnp.where(occluded, LABEL_OCCLUDED, labels)

    # normals are computed regardless: the edge cloud carries them for
    # the point-to-plane stages even when HIGH_CURVATURE is disabled
    normals, n_valid = estimate_normals(cloud, config)
    if "high_curvature" in types:
        hc = canny_from_gradients(
            normals[..., 0],
            normals[..., 1],
            config.hc_canny_low_threshold,
            config.hc_canny_high_threshold,
            valid=n_valid,
        )
        # later PCL stages overwrite earlier ones
        labels = jnp.where(hc & cloud.valid, LABEL_HIGH_CURVATURE, labels)

    if "rgb_canny" in types:
        intensity = jnp.mean(cloud.rgb, axis=-1)
        rgb_edge = canny(
            intensity, config.canny_low_threshold, config.canny_high_threshold
        )
        labels = jnp.where(rgb_edge & cloud.valid, LABEL_RGB_CANNY, labels)
    return labels, normals, n_valid


@partial(jax.jit, static_argnames=("config", "label", "capacity"))
def edge_cloud(
    cloud: OrganizedCloud,
    labels: jnp.ndarray,
    label: int,
    capacity: int,
    config: EdgeConfig = EdgeConfig(),
) -> Cloud:
    """Compact the points of one label class into a fixed-capacity Cloud
    (PCL: copyPointCloud(cloud, label_indices[k], out))."""
    flat = cloud.flatten()
    sel = (labels.reshape(-1) == label) & flat.valid
    return compact(Cloud(flat.xyz, flat.rgb, sel), capacity=capacity)


@partial(jax.jit, static_argnames=("config",))
def extract_edge_features(
    cloud: OrganizedCloud, config: EdgeConfig = EdgeConfig()
) -> Cloud:
    """The reference's ``extract_edge_features``: run the full 5-class
    detector but return only the RGB_CANNY class as a compacted cloud
    (src/edge_extractor.hpp:7-39).

    The returned cloud additionally carries the per-point surface normals
    the detector already computed for its high-curvature stage — free
    metadata that enables the point-to-plane fine-ICP variant downstream
    (the reference discards the normal image after compute()).

    Edge pixels beyond ``max_edge_points`` are dropped in a STATICALLY
    SHUFFLED pixel order (a fixed pseudo-random permutation baked into
    the program): row-major truncation would amputate the bottom of the
    image, which silently destroys registration overlap whenever a frame
    saturates its capacity.

    Compaction runs as ONE i32 key sort + per-component row gathers of
    only the surviving ``max_edge_points`` rows. (An earlier design packed
    a [H*W, 10] payload, shuffle-gathered it, and unpacked by column
    slices — the narrow lane dimension made those slices ~17 ms/frame of
    pure re-layout DMA.)"""
    labels, normals, n_valid = _organized_edges_with_normals(cloud, config)
    flat = cloud.flatten()
    hw = flat.capacity
    sel = (labels.reshape(-1) == LABEL_RGB_CANNY) & flat.valid
    # selected pixels keyed by shuffled rank, everything else pushed past
    # the end; ascending argsort == stable compaction in shuffled order
    sentinel = jnp.int32(2**31 - 1)
    keys = jnp.where(sel, _shuffle_priority(hw), sentinel)
    order = jnp.argsort(keys)[: config.max_edge_points]
    take = lambda x: jnp.take(x, order, axis=0)
    cgrad = None
    if config.carry_cgrad:
        # Tangent-plane intensity gradients at the edge pixels — RGB
        # canny edges ARE the high-|g| subset of the image, so carrying
        # g here is what makes the colored fine-stage residual
        # (ICPConfig.color_weight) meaningful on edge clouds. Reuses the
        # normal image computed above (ops/colorgrad.py).
        from rspc_tpu.ops.colorgrad import color_gradients

        cg = color_gradients(cloud, normals, n_valid)
        cgrad = take(cg.reshape(hw, 3))
    out = Cloud(
        take(flat.xyz),
        take(flat.rgb),
        take(keys) != sentinel,
        take(normals.reshape(hw, 3)),
        cgrad=cgrad,
    )
    return out.pad_to(config.max_edge_points)
