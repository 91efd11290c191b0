"""Shared helpers for the standalone viewer examples.

The reference's examples use PCL's own viewers (CloudViewer /
PCLVisualizer, examples/visualizer/*.cpp), which display ALL finite
points and auto-fit their camera to the cloud. The library's load path
instead follows the app convention (librealsense marks invalid depth
with the origin; the app viewer skips z == 0, src/visualizer.hpp:86-88)
— correct for sensor data, but it would blank the reference's own 2-D
sample clouds (example.pcd: 213 points, all z == 0). These helpers give
the example scripts PCL-viewer semantics:

* ``revalidate_finite`` re-marks validity as finite-only;
* ``fit_to_view`` re-expresses PCLVisualizer's camera auto-fit as a
  cloud transform for the fixed-camera headless renderer (center the
  cloud, push it in front of the camera by ~1.7x its extent).
"""

from __future__ import annotations

import numpy as np

from rspc_tpu.cloud import Cloud


def revalidate_finite(cloud: Cloud) -> Cloud:
    xyz = np.asarray(cloud.xyz)
    return Cloud(
        cloud.xyz, cloud.rgb, np.isfinite(xyz).all(axis=-1)
    )


def fit_to_view(cloud: Cloud) -> Cloud:
    """Center the valid points and place them in front of the renderer's
    fixed camera (origin, looking +z, 60 deg fov) at a distance where
    the whole cloud is in frame — the PCLVisualizer auto-camera analog."""
    xyz = np.asarray(cloud.xyz, np.float32)
    valid = np.asarray(cloud.valid)
    if not valid.any():
        return cloud
    pts = xyz[valid]
    center = pts.mean(axis=0)
    extent = float(np.linalg.norm(pts - center, axis=1).max())
    shifted = xyz - center + np.float32([0.0, 0.0, max(1.7 * extent, 1e-3)])
    return Cloud(shifted, cloud.rgb, valid)
