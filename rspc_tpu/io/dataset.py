"""Dataset directory conventions, mirroring the reference exactly.

The reference persists everything under ``dataset/``:
  * capture writes ``dataset/{prefix}-{i}.pcd`` (src/main.cpp:53),
  * registration re-loads those (src/main.cpp:79-83) and writes
    ``dataset/{prefix}-registration`` — note the deliberate missing ``.pcd``
    extension, preserved here as a documented quirk (src/main.cpp:87),
  * per-frame edge clouds ``dataset/edge-{i}.pcd`` and the accumulated edge
    target ``dataset/edge_cloud.pcd`` (src/icp_edge_based_registration.hpp:66-69,126),
  * the ``--all`` result ``dataset/{file}.pcd`` (src/main.cpp:133).

This two-stage capture -> registration flow through the dataset dir is the
reference's de-facto checkpoint/resume mechanism (SURVEY.md §5); we keep PCD
as the interchange/checkpoint format.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

from rspc_tpu.cloud import Cloud, OrganizedCloud
from rspc_tpu.io.pcd import load_pcd, save_pcd

CloudLike = Union[Cloud, OrganizedCloud]


def dataset_path(prefix: str, index: int, dataset_dir: str = "dataset") -> str:
    return os.path.join(dataset_dir, f"{prefix}-{index}.pcd")


def _peek_header(path: str):
    """(width, height, data_mode, standard_layout) from the PCD header."""
    hdr = {}
    with open(path, "rb") as f:
        for raw in f:
            line = raw.decode("ascii", "replace").strip()
            if line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            hdr[key] = rest
            if key == "DATA":
                break
    std = (
        hdr.get("FIELDS") == "x y z rgb"
        and hdr.get("SIZE") == "4 4 4 4"
        and hdr.get("TYPE") == "F F F F"
        and hdr.get("COUNT", "1 1 1 1") == "1 1 1 1"
    )
    return (
        int(hdr.get("WIDTH", 0)),
        int(hdr.get("HEIGHT", 1)),
        hdr.get("DATA", ""),
        std,
    )


def load_dataset_clouds(
    prefix: str, frames: int, dataset_dir: str = "dataset"
) -> List[CloudLike]:
    """Load ``dataset/{prefix}-{i}.pcd`` for i in [0, frames)
    (reference: src/main.cpp:79-83).

    Standard-layout files (x/y/z/rgb float records — everything this
    framework writes) go through the native THREADED loader
    (native/loader.cpp): one worker per file, straight into padded host
    buffers. Anything else falls back to the general Python reader
    per file."""
    paths = [dataset_path(prefix, i, dataset_dir) for i in range(frames)]
    import numpy as np

    from rspc_tpu.io import native as _native

    try:
        heads = [_peek_header(p) for p in paths]
    except (OSError, ValueError):
        heads = None
    if heads is not None and all(h[3] for h in heads):
        cap = max(h[0] * h[1] for h in heads)
        loaded = _native.load_dataset(paths, cap) if cap > 0 else None
        if loaded is not None:
            xyz, rgb, valid, counts = loaded
            out: List[CloudLike] = []
            for i, (w, h, _, _) in enumerate(heads):
                if counts[i] < 0:  # per-file fallback
                    out.append(load_pcd(paths[i]))
                    continue
                n = w * h
                if h > 1 and counts[i] == n:
                    out.append(
                        OrganizedCloud.from_numpy(
                            xyz[i, :n].reshape(h, w, 3),
                            rgb[i, :n].reshape(h, w, 3),
                            valid[i, :n].reshape(h, w),
                        )
                    )
                else:
                    out.append(
                        Cloud.from_numpy(
                            xyz[i, :n], rgb[i, :n], valid=valid[i, :n]
                        )
                    )
            return out
    return [load_pcd(p) for p in paths]


def save_dataset_clouds(
    prefix: str,
    clouds: Sequence[CloudLike],
    dataset_dir: str = "dataset",
    mode: str = "binary",
) -> None:
    """Save clouds as ``dataset/{prefix}-{i}.pcd`` (reference: src/main.cpp:52-53)."""
    os.makedirs(dataset_dir, exist_ok=True)
    for i, c in enumerate(clouds):
        save_pcd(dataset_path(prefix, i, dataset_dir), c, mode=mode)


def registration_output_path(prefix: str, dataset_dir: str = "dataset") -> str:
    """Reference quirk preserved: no ``.pcd`` extension (src/main.cpp:87)."""
    return os.path.join(dataset_dir, f"{prefix}-registration")
