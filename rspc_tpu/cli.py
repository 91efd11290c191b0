"""Command-line surface mirroring the reference's ``rs-pcl`` binary.

Option grammar, positional-argument counts, and dataset-directory behavior
replicate src/main.cpp:185-237 exactly, including:
  * ``--registration PREFIX N`` (4 args) -> NDT scheme with the default
    -30 deg accumulated guess; ``--registration PREFIX DEG N`` (5 args)
    converts degrees via (deg/180)*pi (main.cpp:204-221);
  * ``--edges FILE`` loads ``dataset/FILE`` (the filename includes .pcd in
    the reference's usage) (main.cpp:58-74);
  * ``--view NAME`` loads ``dataset/NAME.pcd`` (main.cpp:101-115);
  * the registration output path has no ``.pcd`` extension (main.cpp:87);
  * no arguments or unknown options print help and exit 1.

Divergences, by necessity of hardware: capture paths accept an optional
trailing SOURCE argument (a replay ``.npz`` or the literal ``synthetic``)
since no RealSense camera attaches to a TPU host; the GLFW render loop is
replaced by a headless render to ``<output>.png`` using the same camera
model (viz/render.py).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

import numpy as np

from rspc_tpu.config import PipelineConfig

DATASET = "dataset"


def _source(arg: Optional[str], frames: int):
    """Build a capture source: replay npz path or synthetic scene."""
    from rspc_tpu.capture.replay import ReplaySource

    if arg is None or arg == "synthetic":
        from rspc_tpu.capture.synthetic import SyntheticSequence
        from rspc_tpu.ops.deproject import Intrinsics

        seq = SyntheticSequence(
            n_frames=frames, yaw_step=-0.15, intr=Intrinsics.simple(640, 480)
        )
        depths, colors = [], []
        for d, c in seq.frames():
            depths.append(np.asarray(d))
            colors.append(np.asarray(c))
        stream, snap = seq.imu_stream()
        ts = np.asarray(stream.ts)[snap]
        gyro = np.asarray(stream.data)[snap - 1]
        accel = np.asarray(stream.data)[snap]
        return ReplaySource(
            {
                "depth": np.stack(depths),
                "color": np.stack(colors),
                "ts": ts,
                "gyro": gyro,
                "accel": accel,
                "intr": np.asarray(
                    [seq.intr.width, seq.intr.height, seq.intr.fx, seq.intr.fy,
                     seq.intr.ppx, seq.intr.ppy],
                    np.float32,
                ),
            }
        )
    return ReplaySource(arg)


def capture(prefix: str, frames: int, source_arg: Optional[str] = None) -> None:
    """``--capture``: the reference's v2 capture path (main.cpp:37-56 ->
    get_clouds_new, capture_opencv.hpp:239-358): full-resolution clouds
    AND the SIFT visual odometry — keypoints, 2-NN ratio-0.3 matching,
    RANSAC homography computed-and-unused, grid-search translation +
    theta pose per pair — whose transforms the caller then DISCARDS
    (main.cpp:44-53); only the clouds are saved to
    dataset/{prefix}-{i}.pcd.

    Flags (beyond-reference, VERDICT r4 #5): ``RSPC_CAPTURE_NO_ODOMETRY=1``
    skips the odometry for speed-sensitive runs (saved clouds are
    identical either way — the odometry never touches them);
    ``RSPC_CAPTURE_MATCH_DIR=DIR`` dumps per-pair match visualizations
    (``matches-{i}.png``, the reference's drawMatches -> matches.jpg,
    capture_opencv.hpp:74-79)."""
    from rspc_tpu.config import CaptureConfig
    from rspc_tpu.io.dataset import save_dataset_clouds

    src = _source(source_arg, frames)
    cfg = CaptureConfig(center_crop=False, bgr_color=False)  # v2: full res
    if os.environ.get("RSPC_CAPTURE_NO_ODOMETRY"):
        from rspc_tpu.capture.replay import get_clouds

        clouds, _thetas = get_clouds(src, frames, cfg)
    else:
        from rspc_tpu.capture.odometry import get_clouds_new

        pairs = get_clouds_new(
            src, frames, config=cfg,
            debug_dir=os.environ.get("RSPC_CAPTURE_MATCH_DIR") or None,
        )
        # transforms computed then discarded, like the reference caller
        clouds = [c for c, _pose in pairs]
    if len(clouds) < frames:
        print(f"[RS]  only captured {len(clouds)}/{frames} frames", file=sys.stderr)
    save_dataset_clouds(prefix, clouds, DATASET)
    for i in range(len(clouds)):
        print(f"[RS]    Saved {DATASET}/{prefix}-{i}.pcd")


def _view_or_png(cloud, png_path: str, what: str) -> None:
    """End a workload in a render, matching the reference's live GL loop
    (``--edges`` main.cpp:70-73, ``--registration`` main.cpp:96-98): on
    a TTY run the interactive terminal viewer (same state machine as
    ``--view``); headless/CI stdin writes a PNG with the same camera."""
    if sys.stdin.isatty():
        from rspc_tpu.viz.interactive import interactive_view

        interactive_view(cloud, png_path=png_path)
    else:
        from rspc_tpu.viz.render import render_to_png

        render_to_png(png_path, cloud)
    print(f"[PCL] {what} saved to {png_path}")


def edges(filename: str) -> None:
    """``--edges``: extract RGB-edge features from dataset/FILE and end
    in the render loop (main.cpp:58-74)."""
    from rspc_tpu.cloud import OrganizedCloud
    from rspc_tpu.io.pcd import load_pcd
    from rspc_tpu.ops.edges import extract_edge_features

    cloud = load_pcd(os.path.join(DATASET, filename))
    if not isinstance(cloud, OrganizedCloud):
        print("error: edge extraction requires an organized cloud", file=sys.stderr)
        raise SystemExit(1)
    result = extract_edge_features(cloud)
    out = os.path.join(DATASET, filename + ".edges.png")
    _view_or_png(result, out, "Edge render")


class _AutoScheme:
    """Adapter exposing :func:`rspc_tpu.registration.auto.auto_register`
    behind the ``RegistrationScheme.registration(clouds)`` surface the
    CLI drivers expect (types.hpp:14-20 analog), so ``--preset auto``
    slots into the reference grammar without changing it."""

    def __init__(self, rads=None, thetas=None):
        self.rads, self.thetas = rads, thetas
        self.result = None

    def registration(self, clouds):
        from rspc_tpu.registration.auto import auto_register

        ar = auto_register(clouds, thetas=self.thetas, rads=self.rads)
        self.result = ar
        print(
            f"[PCL] auto preset: selected '{ar.selected}' "
            f"(closures={ar.closures}, texture={ar.texture:.4f})"
        )
        return ar.global_cloud


PRESETS = ("reference", "robust", "auto")


def _extract_preset(args: List[str]) -> tuple:
    """Strip an opt-in ``--preset NAME`` / ``--preset=NAME`` flag (or the
    ``RSPC_PRESET`` env var) BEFORE the argc-dependent dispatch, so the
    reference's exact positional grammar (main.cpp:185-237) is untouched
    when the flag is absent. This is the user-facing entry point for the
    beyond-reference capability stack (VERDICT r4 #3):

      reference — the scheme the reference binary hard-codes (default)
      robust    — robust_config(anchor_mode="map"): warm start + rescue
                  + progressive map anchoring (RESULTS.md robustness matrix)
      auto      — auto_register: measured trajectory-adaptive selection
    """
    preset = os.environ.get("RSPC_PRESET", "reference")
    out = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--preset":
            if i + 1 >= len(args):
                raise ValueError("--preset requires a value " + str(PRESETS))
            preset = args[i + 1]
            i += 2
            continue
        if a.startswith("--preset="):
            preset = a.split("=", 1)[1]
            i += 1
            continue
        out.append(a)
        i += 1
    if preset not in PRESETS:
        raise ValueError(f"unknown preset {preset!r}; choose from {PRESETS}")
    return out, preset


def _registration_scheme(preset: str, rads=None, thetas=None):
    """NDT-edge scheme for ``--registration`` under the given preset
    (reference default: main.cpp:208,218)."""
    from rspc_tpu.registration.schemes import NDTEdgeBasedRegistration

    kw = {}
    if thetas is not None:
        kw["thetas"] = thetas
    elif rads is not None:
        kw["rads"] = rads
    if preset == "reference":
        return NDTEdgeBasedRegistration(**kw)
    if preset == "robust":
        from rspc_tpu.presets import robust_config

        return NDTEdgeBasedRegistration(
            config=robust_config(anchor_mode="map"), **kw
        )
    return _AutoScheme(rads=rads, thetas=thetas)


def registration(prefix: str, scheme, frames: int) -> None:
    """``--registration`` driver (main.cpp:76-99): load
    dataset/{prefix}-{i}.pcd, run the scheme, save
    dataset/{prefix}-registration (no extension — reference quirk), render."""
    from rspc_tpu.io.dataset import load_dataset_clouds, registration_output_path
    from rspc_tpu.io.pcd import save_pcd

    clouds = load_dataset_clouds(prefix, frames, DATASET)
    result = scheme.registration(clouds)
    out = registration_output_path(prefix, DATASET)
    save_pcd(out, result, keep_invalid=False)
    print(f"[PCL] Saved {out}")
    _view_or_png(result, out + ".png", "Render")


def viewer(name: str) -> None:
    """``--view``: view dataset/{name}.pcd (main.cpp:101-115).

    On a TTY this runs the interactive terminal viewer (key-driven
    drag/zoom/reset over the reference's callback state,
    visualizer.hpp:24-53); headless/CI stdin renders one PNG."""
    import sys

    from rspc_tpu.io.pcd import load_pcd

    path = os.path.join(DATASET, name + ".pcd")
    cloud = load_pcd(path)
    out = path + ".png"
    if sys.stdin.isatty():
        from rspc_tpu.viz.interactive import interactive_view

        interactive_view(cloud, png_path=out)
    else:
        from rspc_tpu.viz.render import render_to_png

        render_to_png(out, cloud)
    print(f"Render saved to {out}")


def capture_and_registration(
    frames: int,
    icp_based_filename: str,
    source_arg: Optional[str] = None,
    preset: str = "reference",
) -> None:
    """``--all``: live capture + ICP-edge registration with IMU thetas
    (main.cpp:117-134). Under a non-reference ``--preset`` the ICP-edge
    scheme is replaced by the robust NDT stack / auto selection with the
    same IMU thetas (the beyond-reference surface, VERDICT r4 #3)."""
    from rspc_tpu.capture.replay import get_clouds
    from rspc_tpu.io.pcd import save_pcd
    from rspc_tpu.registration.schemes import ICPEdgeBasedRegistration

    src = _source(source_arg, frames)
    clouds, thetas = get_clouds(src, frames)
    if preset == "reference":
        scheme = ICPEdgeBasedRegistration(thetas=thetas, dataset_dir=DATASET)
    else:
        scheme = _registration_scheme(preset, thetas=thetas)
    result = scheme.registration(clouds)
    os.makedirs(DATASET, exist_ok=True)
    out = os.path.join(DATASET, icp_based_filename + ".pcd")
    save_pcd(out, result, keep_invalid=False)
    print(f"[PCL] Saved {out}")


HELP = """Usage: rspc [OPTION] NR_CLOUDS...
Capture, perform registration, or do both for NR_CLOUDS time.
Example: rspc --all 4

Options:
  --all NR_CLOUDS FILENAME [SOURCE]
      capture and perform registration for NR_CLOUDS time
      using dynamic rotation estimation from the (replayed) IMU.
  --capture FILENAME NR_CLOUDS [SOURCE]
      capture clouds for NR_CLOUDS time and save them to
      dataset/${FILENAME}-${CLOUD_IDX}.pcd
  --edges FILENAME
      extract edges from a pointcloud saved at dataset/${FILENAME}
  --registration FILENAME [ROTATION_DEG] NR_CLOUDS
      perform registration on files named dataset/${FILENAME}-${CLOUD_IDX}.pcd
      using estimated rotation degree of ROTATION_DEG as initial guesses.
      Default ROTATION_DEG: -30 degrees
  --view FILENAME
      render pointcloud saved at dataset/${FILENAME}.pcd
  --help
      print this help

SOURCE is an optional replay recording (.npz) or 'synthetic' (default) —
no camera attaches to a TPU host; see rspc_tpu.capture.replay for the
recording format.

Beyond-reference (opt-in; the default matches the reference binary):
  --preset {reference|robust|auto}   (or env RSPC_PRESET=...)
      registration stack for --registration / --all: 'robust' enables
      warm start + rescue + progressive map anchoring; 'auto' measures a
      candidate ladder on the trajectory and keeps the simplest winner
      (see RESULTS.md robustness matrix)."""


def _stoi(s: str) -> int:
    """C++ std::stoi semantics: parse the longest valid integer prefix
    ("-4.58" -> -4, "12abc" -> 12); raise only when no digits lead
    (matching the reference's argv parsing, src/main.cpp:196,215)."""
    import re

    m = re.match(r"[+-]?\d+", s.strip())
    if not m:
        raise ValueError(f"stoi: no conversion from {s!r}")
    return int(m.group(0))


def main(argv: Optional[List[str]] = None) -> int:
    """Top-level error handling mirrors the reference's two catch blocks
    (rs2::error / std::exception printing to stderr and returning
    EXIT_FAILURE, main.cpp:238-244)."""
    try:
        return _dispatch(argv)
    except KeyboardInterrupt:
        raise
    except Exception as e:  # noqa: BLE001 — the reference catches all
        print(f"{type(e).__name__}: {e}", file=sys.stderr)
        return 1


def _dispatch(argv: Optional[List[str]] = None) -> int:
    args = list(sys.argv if argv is None else argv)
    # --preset is stripped before argc-dependent dispatch so the
    # reference's positional grammar stays bit-exact without it
    args, preset = _extract_preset(args)
    argc = len(args)

    if argc == 1:
        print(HELP)
        return 1
    opt = args[1]

    if opt == "--capture" and argc in (4, 5):
        capture(args[2], _stoi(args[3]), args[4] if argc == 5 else None)
        return 0
    if opt == "--edges" and argc == 3:
        edges(args[2])
        return 0
    if opt == "--registration" and argc == 4:
        registration(args[2], _registration_scheme(preset), _stoi(args[3]))
        return 0
    if opt == "--registration" and argc == 5:
        rotation_deg = _stoi(args[3])
        rads = (rotation_deg / 180.0) * np.pi  # main.cpp:215
        registration(
            args[2], _registration_scheme(preset, rads=rads), _stoi(args[4])
        )
        return 0
    if opt == "--view" and argc == 3:
        viewer(args[2])
        return 0
    if opt == "--all" and argc in (4, 5):
        capture_and_registration(
            _stoi(args[2]), args[3], args[4] if argc == 5 else None,
            preset=preset,
        )
        return 0

    print(HELP)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
