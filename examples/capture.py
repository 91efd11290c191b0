#!/usr/bin/env python
"""Standalone capture example.

Mirror of the reference's examples/capture/capture.cpp: configure a
source, warm up, grab ONE frameset, convert to a full-resolution colored
cloud, and save it as ascii PCD under samples/ (the reference saves to
``../samples/<name>`` with savePCDFileASCII, capture.cpp:120).

Usage: python examples/capture.py OUT_NAME [SOURCE.npz]
(SOURCE defaults to the synthetic room scene — no camera on a TPU host.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    out_name = sys.argv[1]
    source = sys.argv[2] if len(sys.argv) > 2 else None

    from rspc_tpu.capture.replay import ReplaySource, get_clouds
    from rspc_tpu.config import CaptureConfig
    from rspc_tpu.io.pcd import save_pcd

    if source is None:
        from rspc_tpu.capture.synthetic import SyntheticSequence
        from rspc_tpu.ops.deproject import Intrinsics

        # the reference example uses 640x480 streams (capture.cpp:90-92)
        seq = SyntheticSequence(n_frames=1, intr=Intrinsics.simple(640, 480))
        depth, color = next(seq.frames())
        stream, snap = seq.imu_stream()
        src = ReplaySource(
            {
                "depth": np.asarray(depth)[None],
                "color": np.asarray(color)[None],
                "ts": np.asarray(stream.ts)[snap][:1],
                "gyro": np.asarray(stream.data)[snap - 1][:1],
                "accel": np.asarray(stream.data)[snap][:1],
                "intr": np.asarray(
                    [seq.intr.width, seq.intr.height, seq.intr.fx,
                     seq.intr.fy, seq.intr.ppx, seq.intr.ppy],
                    np.float32,
                ),
            }
        )
    else:
        src = ReplaySource(source)

    clouds, _ = get_clouds(
        src, 1, CaptureConfig(center_crop=False, bgr_color=False)
    )
    os.makedirs("samples", exist_ok=True)
    out = os.path.join("samples", out_name)
    save_pcd(out, clouds[0], mode="ascii")
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
