"""Point-cloud filters: pass-through and statistical outlier removal.

TPU-native equivalents of ``pcl::PassThrough`` and
``pcl::StatisticalOutlierRemoval`` (SURVEY.md X6). In the reference these
appear only in dead code (``filter_pcl``, src/capture.hpp:112-132 — never
called, and buggy: it sets the z limits *after* filtering and returns an
untouched empty cloud); they are implemented here for capability parity
with the *intended* behavior, as SURVEY.md §7 directs.

Both are mask updates over fixed-capacity clouds — no reallocation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rspc_tpu.cloud import Cloud

_FIELD_IDX = {"x": 0, "y": 1, "z": 2}


def passthrough(
    cloud: Cloud, field: str = "z", lower: float = 0.2, upper: float = 2.5
) -> Cloud:
    """Keep points whose ``field`` coordinate lies in [lower, upper]
    (pcl::PassThrough with setFilterFieldName/setFilterLimits; the
    reference's intended limits were (0.2, 2.5), capture.hpp:119-122)."""
    v = cloud.xyz[:, _FIELD_IDX[field]]
    keep = cloud.valid & (v >= lower) & (v <= upper)
    return Cloud(cloud.xyz, cloud.rgb, keep)


@partial(jax.jit, static_argnames=("mean_k", "chunk"))
def statistical_outlier_removal(
    cloud: Cloud,
    mean_k: int = 50,
    stddev_mult: float = 1.5,
    chunk: int = 1024,
) -> Cloud:
    """pcl::StatisticalOutlierRemoval semantics: compute each point's mean
    distance to its ``mean_k`` nearest neighbors, then drop points whose
    mean distance exceeds (global mean + stddev_mult * global stddev).

    kNN is a chunked brute-force top-k sweep (the dataset sizes this runs
    on — post-capture clouds — fit the O(N^2/chunk) tiling comfortably).
    """
    xyz, valid = cloud.xyz, cloud.valid
    n = cloud.capacity
    dtype = xyz.dtype
    inf = jnp.asarray(jnp.inf, dtype)

    pad = (-n) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    num_chunks = (n + pad) // chunk
    src_chunks = xyz_p.reshape(num_chunks, chunk, 3)
    srcv_chunks = valid_p.reshape(num_chunks, chunk)
    base = jnp.arange(num_chunks) * chunk

    def per_chunk(args):
        s, sv, b = args
        d2 = jnp.sum((s[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
        # exclude self and invalid targets
        tgt_idx = jnp.arange(n)[None, :]
        self_mask = tgt_idx == (b + jnp.arange(chunk))[:, None]
        d2 = jnp.where(valid[None, :] & ~self_mask, d2, inf)
        neg_top, _ = jax.lax.top_k(-d2, mean_k)
        dists = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
        finite = jnp.isfinite(dists)
        cnt = jnp.maximum(jnp.sum(finite, axis=1), 1)
        mean_d = jnp.sum(jnp.where(finite, dists, 0.0), axis=1) / cnt
        return jnp.where(sv, mean_d, jnp.nan)

    mean_dists = jax.lax.map(per_chunk, (src_chunks, srcv_chunks, base)).reshape(-1)[
        :n
    ]

    ok = valid & jnp.isfinite(mean_dists)
    cnt = jnp.maximum(jnp.sum(ok), 1.0)
    mu = jnp.sum(jnp.where(ok, mean_dists, 0.0)) / cnt
    var = jnp.sum(jnp.where(ok, (mean_dists - mu) ** 2, 0.0)) / cnt
    thresh = mu + stddev_mult * jnp.sqrt(var)
    keep = ok & (mean_dists <= thresh)
    return Cloud(cloud.xyz, cloud.rgb, keep)
