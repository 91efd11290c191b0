#!/usr/bin/env python
"""Standalone cloud viewer example.

Mirror of the reference's examples/visualizer/{cloudViewer,
pcdVisualization}.cpp: load a .pcd and render it. The GL window becomes a
headless render to PNG (same camera model, viz/render.py); pass extra yaw/
pitch arguments to emulate the interactive drag state.

Usage: python examples/cloud_viewer.py FILE.pcd [YAW] [PITCH]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    path = sys.argv[1]
    yaw = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    pitch = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

    from rspc_tpu.io.pcd import load_pcd
    from rspc_tpu.viz.render import ViewState, render_to_png
    from rspc_tpu.cloud import Cloud, OrganizedCloud

    from _viewer_common import fit_to_view, revalidate_finite

    cloud = load_pcd(path)
    if isinstance(cloud, OrganizedCloud):
        cloud = Cloud(
            cloud.xyz.reshape(-1, 3),
            cloud.rgb.reshape(-1, 3),
            cloud.valid.reshape(-1),
        )
    # PCL CloudViewer semantics: all finite points, auto-fitted camera
    # (the library load path's z==0-invalid rule is the APP viewer's
    # convention — see _viewer_common)
    cloud = fit_to_view(revalidate_finite(cloud))
    st = ViewState(yaw=yaw, pitch=pitch)
    # write next to the CWD, never beside a (possibly read-only) input
    out = os.path.basename(path) + ".view.png"
    render_to_png(out, cloud, state=st)
    print(f"rendered {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
