"""X8 feature-quality thresholds (VERDICT r1 #9).

tools/feature_quality.py measures detector repeatability and match
inlier rate against known homographies (OpenCV SIFT as the third-party
yardstick — see RESULTS.md for the recorded table). These tests pin the
floor so regressions in ops/keypoints.py fail loudly:

* pure translation: near-perfect repeatability and a clean match set at
  the reference's ratio 0.3 (the odometry call pattern,
  /root/reference/src/capture_opencv.hpp:62-72);
* 8 deg rotation: the rotated descriptor grid must keep producing
  correct matches (the round-1 axis-aligned descriptor produced ZERO);
* scale: closed in r3 in three measured steps — sub-scale
  interpolation + scale-matched descriptor footprints with level-lerped
  gradients (0.302 -> ~0.58 inlier rate at 1.12x), the 2-octave
  pyramid (-> 0.73), and the level-lerped ORIENTATION histogram
  (-> 0.92, vs OpenCV's 0.97; n~26 so the rate carries ~0.05 sampling
  noise) — pinned at a floor so it cannot silently collapse.
"""

import cv2
import pytest

from tools.feature_quality import (
    homographies,
    measure_ours,
    test_images as _frames,
)


@pytest.fixture(scope="module")
def setup():
    grays = _frames()
    ga = grays[0]
    hs = homographies(ga.shape[1], ga.shape[0])
    warped = {
        name: cv2.warpPerspective(ga, h, (ga.shape[1], ga.shape[0]))
        for name, h in hs.items()
    }
    return ga, hs, warped


def test_translation_quality(setup):
    # r5 defaults (3 octaves, 3 orientations, mutual) measure 219/0.991
    ga, hs, warped = setup
    r = measure_ours(ga, warped["shift"], hs["shift"], ratio=0.3)
    assert r["repeatability"] >= 0.9, r
    assert r["n_matches"] >= 100, r
    assert r["inlier_rate"] >= 0.95, r


def test_rotation_quality(setup):
    # r5 measures 48/1.000 (OpenCV 53) with repeatability 0.83
    ga, hs, warped = setup
    r = measure_ours(ga, warped["rotate8"], hs["rotate8"], ratio=0.3)
    assert r["repeatability"] >= 0.65, r
    assert r["n_matches"] >= 30, r
    assert r["inlier_rate"] >= 0.9, r


def test_scale_floor(setup):
    # r5 measures 60/0.950 (OpenCV 39/0.974): the third octave removes
    # the top-of-range sigma clamp, the mutual cross-check kills the
    # same-scale wrong-position duplicates (VERDICT r4 #4 closed) —
    # floor at the done-bar 0.85 with ~0.1 margin under the measurement
    ga, hs, warped = setup
    r = measure_ours(ga, warped["scale1.12"], hs["scale1.12"], ratio=0.3)
    assert r["repeatability"] >= 0.7, r
    assert r["n_matches"] >= 35, r
    assert r["inlier_rate"] >= 0.85, r


def test_perspective_floor(setup):
    # r5 measures 49/1.000 (OpenCV 48)
    ga, hs, warped = setup
    r = measure_ours(ga, warped["perspective"], hs["perspective"], ratio=0.3)
    assert r["n_matches"] >= 30, r
    assert r["inlier_rate"] >= 0.9, r


def test_match_counts_within_2x_of_opencv(setup):
    """VERDICT r4 #4 done-bar: ratio-0.3 match counts within 2x of
    OpenCV SIFT on every warp (they currently EXCEED OpenCV on all but
    rotate8, which sits at 0.9x)."""
    from tools.feature_quality import measure_opencv

    ga, hs, warped = setup
    for name in hs:
        ours = measure_ours(ga, warped[name], hs[name], ratio=0.3)
        ref = measure_opencv(ga, warped[name], hs[name], ratio=0.3)
        assert ref is None or ours["n_matches"] >= 0.5 * ref["n_matches"], (
            name, ours, ref,
        )
