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


def load_dataset_clouds(
    prefix: str, frames: int, dataset_dir: str = "dataset"
) -> List[CloudLike]:
    """Load ``dataset/{prefix}-{i}.pcd`` for i in [0, frames)
    (reference: src/main.cpp:79-83)."""
    return [load_pcd(dataset_path(prefix, i, dataset_dir)) for i in range(frames)]


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
