#!/usr/bin/env python
"""Standalone PCD visualization example.

Mirror of the reference's examples/visualizer/pcdVisualization.cpp: load a
.pcd, run radius-search normal estimation at two radii (0.05 and 0.1 —
computed and, exactly like the reference, not consumed by the render), and
display the cloud. The PCLVisualizer window becomes a headless PNG render.

Usage: python examples/pcd_visualization.py FILE.pcd
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    path = sys.argv[1]

    from rspc_tpu.io.pcd import load_pcd
    from rspc_tpu.ops.normals import estimate_normals_radius
    from rspc_tpu.viz.render import render_to_png
    from rspc_tpu.cloud import Cloud, OrganizedCloud

    from _viewer_common import fit_to_view, revalidate_finite

    cloud = load_pcd(path)
    if isinstance(cloud, OrganizedCloud):
        cloud = Cloud(
            cloud.xyz.reshape(-1, 3),
            cloud.rgb.reshape(-1, 3),
            cloud.valid.reshape(-1),
        )
    # PCLVisualizer semantics: all finite points count (the z==0-invalid
    # rule is the APP viewer's convention — see _viewer_common)
    cloud = revalidate_finite(cloud)

    # reference parity: two NormalEstimation passes, radii 0.05 / 0.1,
    # results unused (pcdVisualization.cpp:51-60)
    n1, ok1 = estimate_normals_radius(cloud, radius=0.05)
    n2, ok2 = estimate_normals_radius(cloud, radius=0.1)
    print(
        f"normals: {int(ok1.sum())} valid @ r=0.05, "
        f"{int(ok2.sum())} valid @ r=0.1 (of {int(cloud.count())} points)"
    )

    # write next to the CWD, never beside a (possibly read-only) input
    out = os.path.basename(path) + ".view.png"
    render_to_png(out, fit_to_view(cloud))
    print(f"rendered {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
