"""Scale-space keypoint detection + descriptors (SIFT-class), jittable.

TPU-native counterpart of the reference's OpenCV SIFT usage (SURVEY.md X8;
src/capture_opencv.hpp:30-48: ``cv::xfeatures2d::SiftFeatureDetector`` on
grayscale frames, followed by FLANN 2-NN matching with Lowe ratio 0.3).
The reference computes these features for visual odometry whose output the
caller then discards (main.cpp:44-53), so this is a capability-parity
component, engineered TPU-first rather than cycle-accurate to OpenCV:

  * difference-of-Gaussian pyramid with 3x3x3 local-extremum detection,
    contrast threshold and Harris-style edge rejection — the SIFT detector
    recipe, with fixed-capacity top-k keypoint selection instead of
    dynamic lists;
  * 128-d descriptors (4x4 spatial bins x 8 orientation bins, dominant-
    orientation normalized, trilinear-free binning) — SIFT layout;
  * matching is one [K,128]x[128,K] MXU matmul + 2-NN ratio test
    (ops/match below), not a kd-tree/FLANN approximation.

Documented divergences from OpenCV SIFT: a fixed small number of
octaves above base (default 3, vs OpenCV's image-size-derived ~5; each
octave has fixed shapes so the whole pyramid stays jittable — the 48 px
floor statically drops octaves a small image can't fill. The 2->3
default change was measured, r5: at 2 octaves the sigma range tops out
at ~3.3, and top-of-range keypoints CLAMP under a zoom — the
corresponding keypoint's true sigma is unrepresentable, its descriptor
samples the wrong world extent, and self-similar texture then wins the
ratio test at the wrong POSITION; the third octave lifted scale1.12
inliers 0.761 -> 0.849 and repeatability 0.52 -> 0.87, and rotate8
matches 36 -> 48 vs OpenCV's 53);
descriptors sample full-resolution Gaussian levels of the matching
absolute sigma (lerped) rather than per-octave subsampled grids. The
2x-upsampled base octave (OpenCV's octave -1, where most of its
keypoint density comes from) IS implemented (``first_octave=-1``, the
default — VERDICT r3 #5). Matching behavior downstream (ratio 0.3) is
preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rspc_tpu.ops.image import conv2d_same


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    radius = max(1, int(3 * sigma + 0.5))
    k = _gauss_kernel1d(sigma, radius)
    out = conv2d_same(img, k[None, :])
    return conv2d_same(out, k[:, None])


def _detect_octave(
    img: jnp.ndarray,
    max_keypoints: int,
    num_scales: int,
    contrast_threshold: float,
    edge_ratio: float,
    base_blur: float,
):
    """DoG extrema on ONE octave of the (already [0,1]-scaled) image.

    ``base_blur`` is the blur the base image ALREADY carries in this
    octave's own pixel units: 0.0 for a raw full-resolution base (treated
    as blur-free, matching the single-octave behavior this helper was
    refactored from), ~1.0 for a 2x-upsampled base (bilinear upsampling
    of a raw image behaves like a ~0.5 px blur at source resolution =
    1.0 px in upsampled units — OpenCV SIFT's assumed camera blur), and
    1.6 for a chained base (the sigma-3.2 level of the previous octave
    subsampled 2x). Each pyramid level blurs only by the increment
    sqrt(s^2 - base_blur^2).

    Returns (xy, score, valid, sigma) in THIS octave's pixel/sigma units
    plus the next octave's base image.
    """
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [1.6 * (k**i) for i in range(num_scales + 3)]
    if base_blur >= sigmas[0]:
        gauss = [img] + [
            _blur(
                img,
                float(np.sqrt(max(s * s - base_blur * base_blur, 1e-6))),
            )
            for s in sigmas[1:]
        ]
    else:
        gauss = [
            _blur(
                img,
                float(np.sqrt(max(s * s - base_blur * base_blur, 1e-6))),
            )
            for s in sigmas
        ]
    dogs = [gauss[i + 1] - gauss[i] for i in range(len(gauss) - 1)]
    dog = jnp.stack(dogs, axis=0)  # [S+2, H, W]
    next_base = gauss[num_scales][::2, ::2]

    h, w = img.shape
    mid = dog[1:-1]  # candidate scales [S, H, W]

    # 3x3x3 neighborhood max/min via shifts
    def nbr_max_min(vol):
        vmax = jnp.full_like(vol[1:-1], -jnp.inf)
        vmin = jnp.full_like(vol[1:-1], jnp.inf)
        for ds in (-1, 0, 1):
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if ds == 0 and dr == 0 and dc == 0:
                        continue
                    shifted = jnp.roll(dog, (-ds, -dr, -dc), axis=(0, 1, 2))
                    vmax = jnp.maximum(vmax, shifted[1:-1])
                    vmin = jnp.minimum(vmin, shifted[1:-1])
        return vmax, vmin

    nmax, nmin = nbr_max_min(dog)
    is_ext = (mid > nmax) | (mid < nmin)
    strong = jnp.abs(mid) > contrast_threshold

    # Edge rejection: 2x2 Hessian of the DoG at each pixel/scale
    dxx = jnp.roll(mid, -1, 2) + jnp.roll(mid, 1, 2) - 2 * mid
    dyy = jnp.roll(mid, -1, 1) + jnp.roll(mid, 1, 1) - 2 * mid
    dxy = 0.25 * (
        jnp.roll(mid, (-1, -1), (1, 2))
        + jnp.roll(mid, (1, 1), (1, 2))
        - jnp.roll(mid, (-1, 1), (1, 2))
        - jnp.roll(mid, (1, -1), (1, 2))
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    not_edge = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det * r)

    # keep away from borders
    row = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, mid.shape, 2)
    margin = 8
    interior = (
        (row >= margin) & (row < h - margin) & (col >= margin) & (col < w - margin)
    )

    score = jnp.where(is_ext & strong & not_edge & interior, jnp.abs(mid), 0.0)
    flat = score.max(axis=0).reshape(-1)  # collapse scales
    s_best = jnp.argmax(score, axis=0).reshape(-1)  # winning scale / pixel
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    valid = top_scores > 0

    # Sub-pixel refinement (quadratic fit of the DoG surface): offset =
    # -H^-1 g in x/y at the winning scale, clamped to +-0.5 px. Without
    # it keypoint positions quantize to the pixel grid, which collapses
    # repeated-texture corners into EXACT descriptor duplicates (same
    # sampling phase) — measured as a 2x inlier-rate loss on pure
    # translations (tools/feature_quality.py).
    dx_m = 0.5 * (jnp.roll(mid, -1, 2) - jnp.roll(mid, 1, 2))
    dy_m = 0.5 * (jnp.roll(mid, -1, 1) - jnp.roll(mid, 1, 1))

    def gather_sp(vol):
        v = vol.reshape(vol.shape[0], -1)  # [S, H*W]
        return v[s_best[top_idx], top_idx]

    gx_k = gather_sp(dx_m)
    gy_k = gather_sp(dy_m)
    axx = gather_sp(dxx)
    ayy = gather_sp(dyy)
    axy = gather_sp(dxy)
    det2 = axx * ayy - axy * axy
    safe = jnp.abs(det2) > 1e-12
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det2, 1.0), 0.0)
    off_x = -(ayy * gx_k - axy * gy_k) * inv_det
    off_y = -(axx * gy_k - axy * gx_k) * inv_det
    ok_off = safe & (jnp.abs(off_x) < 0.75) & (jnp.abs(off_y) < 0.75)
    xs = xs + jnp.clip(jnp.where(ok_off, off_x, 0.0), -0.5, 0.5)
    ys = ys + jnp.clip(jnp.where(ok_off, off_y, 0.0), -0.5, 0.5)

    # Sub-SCALE interpolation (the standard SIFT step; VERDICT r2 #7):
    # quadratic fit of the DoG along the scale axis at the extremum,
    # offset = -d/dd clamped to +-0.5 levels. Without it the keypoint
    # scale quantizes to the discrete DoG levels, and under even a 1.12x
    # image rescale corresponding keypoints land on DIFFERENT quantized
    # scales — their descriptor footprints then sample different world
    # extents and the inlier rate collapses (measured 0.302 vs OpenCV's
    # 0.974, RESULTS.md r2).
    up, down = dog[2:], dog[:-2]
    ds_m = 0.5 * (up - down)     # d(dog)/ds at the mid levels
    dss_m = up + down - 2 * mid  # d2(dog)/ds2
    gs_k = gather_sp(ds_m)
    gss_k = gather_sp(dss_m)
    safe_s = jnp.abs(gss_k) > 1e-12
    off_s = jnp.where(
        safe_s, -gs_k / jnp.where(safe_s, gss_k, 1.0), 0.0
    )
    off_s = jnp.clip(off_s, -0.5, 0.5)
    # mid[i] lives at sigma = 1.6 * k^(i+1)
    lvl = s_best[top_idx].astype(jnp.float32) + 1.0 + off_s
    sigma = 1.6 * jnp.power(k, lvl)
    return jnp.stack([xs, ys], axis=-1), top_scores, valid, sigma, next_base


@partial(
    jax.jit,
    static_argnames=(
        "max_keypoints", "num_scales", "num_octaves", "first_octave"
    ),
)
def detect_keypoints(
    gray: jnp.ndarray,
    max_keypoints: int = 512,
    num_scales: int = 3,
    contrast_threshold: float = 0.02,
    edge_ratio: float = 10.0,
    num_octaves: int = 3,
    first_octave: int = -1,
):
    """DoG extrema over octaves ``first_octave .. num_octaves-1``.

    Returns (xy f32[K,2] base-image pixel coords, score f32[K], valid
    bool[K], sigma f32[K] interpolated keypoint scale in base-image
    units). Fixed capacity K = max_keypoints via top-k |DoG| response
    across ALL octaves (each octave contributes up to K candidates; DoG
    magnitudes are approximately scale-invariant, so one top-k is a fair
    merge). Octaves above the first whose image would fall below 48 px
    on a side are statically skipped; the first octave always runs (a
    tiny image yields an all-invalid result, not an error).

    ``first_octave=-1`` (default) prepends OpenCV SIFT's 2x-upsampled
    base octave — where most of OpenCV's keypoint density comes from
    (the measured 2-3x match-count gap, RESULTS.md / VERDICT r3 #5);
    its keypoints report half-unit coords/sigmas in base-image units.
    Multi-octave closes the measured X8 scale gap (RESULTS.md): with one
    octave the detector covers only sigma in [2.0, 3.2], so a keypoint
    near the range edge in frame A has no detectable partner in a
    rescaled frame B; OpenCV covers ~5 octaves. Reference path:
    /root/reference/src/capture_opencv.hpp:30-48 (cv::SIFT defaults).
    """
    assert first_octave in (-1, 0), first_octave
    img = gray.astype(jnp.float32) / 255.0
    per = []
    base = img
    if first_octave < 0:
        h0, w0 = img.shape
        base = jax.image.resize(img, (2 * h0, 2 * w0), method="linear")
    for o in range(first_octave, num_octaves):
        h, w = base.shape
        # the 48 px floor only gates later octaves: the first always runs
        # so tiny inputs return an (all-invalid) result instead of
        # crashing on an empty concatenate
        if o > first_octave and min(h, w) < 48:
            break
        if o == first_octave:
            base_blur = 1.0 if first_octave < 0 else 0.0
        else:
            base_blur = 1.6
        xy, sc, valid, sig, next_base = _detect_octave(
            base, max_keypoints, num_scales, contrast_threshold,
            edge_ratio, base_blur=base_blur,
        )
        f = float(2.0**o)
        per.append((xy * f, sc, valid, sig * f))
        base = next_base
    if len(per) == 1:
        return per[0]
    xy = jnp.concatenate([p[0] for p in per], axis=0)
    sc = jnp.concatenate([p[1] for p in per], axis=0)
    valid = jnp.concatenate([p[2] for p in per], axis=0)
    sig = jnp.concatenate([p[3] for p in per], axis=0)
    top, idx = jax.lax.top_k(jnp.where(valid, sc, 0.0), max_keypoints)
    return xy[idx], top, valid[idx] & (top > 0), sig[idx]


@partial(
    jax.jit,
    static_argnames=(
        "num_scales", "num_octaves", "first_octave", "num_orientations"
    ),
)
def compute_descriptors(
    gray: jnp.ndarray,
    xy: jnp.ndarray,
    valid: jnp.ndarray,
    sigma: jnp.ndarray | None = None,
    num_scales: int = 3,
    num_octaves: int = 3,
    first_octave: int = -1,
    num_orientations: int = 1,
):
    """128-d SIFT-layout descriptors (4x4 spatial x 8 orientation bins).

    Follows the SIFT recipe where it matters for match quality (measured
    by tools/feature_quality.py against OpenCV SIFT on known-homography
    warps — the round-1 hard-binned, axis-aligned version lost half its
    matches on a pure translation and all of them under an 8 deg
    rotation):

      * the 16x16 sample grid is ROTATED to the dominant gradient
        orientation (round 1 rotated only the angles, so the spatial
        footprint was not rotation invariant);
      * with ``sigma`` (from detect_keypoints' sub-scale interpolation)
        the grid is also SCALED by sigma/1.6 and gradients come from the
        Gaussian levels bracketing the keypoint scale, LERPED —
        corresponding keypoints across a zoom then sample the same WORLD
        extent, which is what OpenCV's per-octave sampling buys (the
        round-2 version's fixed footprint lost 2/3 of its inliers under
        a 1.12x rescale). ``sigma`` is an absolute blur scale, so it
        maps validly onto THIS function's own pyramid even if the
        detector ran with a different num_scales (matching them merely
        aligns the level grids); sigmas beyond the top level clamp;
      * gradients are sampled sub-pixel (bilinear on gx/gy — not on the
        wrapped angle) so +-0.5 px keypoint jitter does not reshuffle
        bin contents;
      * contributions are soft-binned trilinearly (2x2 spatial x 2
        orientation) with a Gaussian spatial window — hard binning
        aliases a 1 px shift into ~25% descriptor churn;
      * L2-normalize, clamp 0.2, renormalize (SIFT).

    ``num_orientations=N`` (N > 1) additionally emits descriptors at up
    to N-1 further orientation-histogram peaks that reach 0.8x the
    dominant one — Lowe's multiple-orientation rule, which OpenCV
    implements by duplicating the keypoint for EVERY such peak. Under
    rotation the dominant peak of corresponding patches can flip between
    near-equal peaks; the duplicate is what survives the 0.3 ratio test
    then (measured: the rotate8 match count was the one cell at less
    than half of OpenCV's). Returns ``(desc f32[N*K,128], valid
    bool[N*K])`` with rows N*i .. N*i+N-1 belonging to keypoint i
    (callers expand xy/sigma with ``jnp.repeat(x, N, axis=0)``,
    mirroring OpenCV's duplicated-keypoint list); with the default 1,
    returns ``desc f32[K,128]`` as before.
    """
    img = gray.astype(jnp.float32) / 255.0
    kk = 2.0 ** (1.0 / num_scales)
    # enough full-resolution blur levels to bracket every sigma the
    # multi-octave detector can report (max ~1.6 * 2^num_octaves * k^0.5;
    # with the upsampled base octave also DOWN to 1.6 * 2^first_octave =
    # 0.8); sampling gradients from a blur of the SAME absolute sigma is
    # equivalent to OpenCV's per-octave subsampled grid up to the
    # aliasing the subsample introduces.
    lo = num_scales if first_octave < 0 else 0
    n_lvl = num_scales * num_octaves + 3 + lo
    levels = [_blur(img, 1.6 * (kk ** (i - lo))) for i in range(n_lvl)]

    def grad(f):
        gx = 0.5 * (jnp.roll(f, -1, 1) - jnp.roll(f, 1, 1))
        gy = 0.5 * (jnp.roll(f, -1, 0) - jnp.roll(f, 1, 0))
        return gx, gy

    gs = [grad(f) for f in levels]
    gx_st = jnp.stack([g[0] for g in gs])  # [L,H,W]
    gy_st = jnp.stack([g[1] for g in gs])
    h, w = img.shape
    # Sub-1.6-sigma keypoints (the upsampled base octave's) sample a
    # SECOND gradient stack living on the 2x-upsampled image — OpenCV's
    # per-octave grids, per octave: a full-resolution stack cannot
    # represent sub-pixel-scale structure faithfully (measured 0.40
    # inliers on the 1.12x-zoom warp for the sigma < 1.3 band, matched
    # to the wrong repeated-texture corners entirely), while moving the
    # WHOLE stack to the upsampled grid regressed the coarser bands the
    # other way (perspective 1.00 -> 0.49). Only levels 0..lo can be
    # addressed by scale < 1 keypoints, so the stack stays short.
    if first_octave < 0:
        h0, w0 = img.shape
        ups = jax.image.resize(img, (2 * h0, 2 * w0), method="linear")
        n_ups = lo + 2
        gs_u = [
            grad(_blur(ups, 2.0 * 1.6 * (kk ** (i - lo))))
            for i in range(n_ups)
        ]
        gxu_st = jnp.stack([g[0] for g in gs_u])
        gyu_st = jnp.stack([g[1] for g in gs_u])
        hu, wu = ups.shape
    else:
        n_ups = 0
    if sigma is None:
        sigma = jnp.full((xy.shape[0],), 1.6, jnp.float32)

    offs = jnp.arange(-8, 8, dtype=jnp.float32) + 0.5  # 16 samples
    ou, ov = jnp.meshgrid(offs, offs, indexing="xy")  # [16,16] du, dv
    gauss_w = jnp.exp(-(ou * ou + ov * ov) / (2.0 * 8.0 * 8.0))

    def bilinear(st, lvl, xs, ys):
        """Sample stack level ``lvl`` (i32 scalar) at sub-pixel (xs, ys)
        with the stack's own bounds; the level rides inside the gather,
        so no [H,W] slice per keypoint materializes under vmap."""
        h, w = st.shape[1], st.shape[2]
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
        fx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)
        fy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)
        f00 = st[lvl, y0, x0]
        f01 = st[lvl, y0, x0 + 1]
        f10 = st[lvl, y0 + 1, x0]
        f11 = st[lvl, y0 + 1, x0 + 1]
        return (
            f00 * (1 - fy) * (1 - fx)
            + f01 * (1 - fy) * fx
            + f10 * fy * (1 - fx)
            + f11 * fy * fx
        )

    def per_kp(p, sig):
        cx, cy = p[0], p[1]
        scale = sig / 1.6
        fine = scale < 1.0  # upsampled-base-octave keypoint
        # continuous level: gradients LERP between the two adjacent
        # Gaussian levels. Rounding to the nearest level is unstable —
        # corresponding keypoints whose interpolated scales straddle a
        # bin boundary sample different blur levels and their
        # descriptors diverge (measured: nearest-level descriptors
        # REGRESSED the perspective warp 0.556 -> 0.250 inlier rate
        # while fixing scale; the lerp keeps both).
        lf = jnp.clip(
            jnp.log(jnp.maximum(scale, 1e-6)) / jnp.log(kk) + float(lo),
            0.0,
            float(n_lvl - 1),
        )
        lvl = jnp.floor(lf).astype(jnp.int32)
        lvl1 = jnp.minimum(lvl + 1, n_lvl - 1)
        lfrac = lf - lvl.astype(jnp.float32)

        def grad_at(xs, ys):
            """Level-lerped (gx, gy) at base-image coords, from the
            stack matching this keypoint's octave: the 2x-upsampled
            stack for sub-1.6-sigma keypoints, the full-resolution one
            otherwise. Gradients are per-stack-pixel, but each keypoint
            commits to ONE stack, so the uniform magnitude factor
            normalizes away."""
            gxf = (1.0 - lfrac) * bilinear(gx_st, lvl, xs, ys) \
                + lfrac * bilinear(gx_st, lvl1, xs, ys)
            gyf = (1.0 - lfrac) * bilinear(gy_st, lvl, xs, ys) \
                + lfrac * bilinear(gy_st, lvl1, xs, ys)
            if n_ups == 0:
                return gxf, gyf
            lvu = jnp.minimum(lvl, n_ups - 1)
            lvu1 = jnp.minimum(lvl1, n_ups - 1)
            gxu = (1.0 - lfrac) * bilinear(gxu_st, lvu, 2 * xs, 2 * ys) \
                + lfrac * bilinear(gxu_st, lvu1, 2 * xs, 2 * ys)
            gyu = (1.0 - lfrac) * bilinear(gyu_st, lvu, 2 * xs, 2 * ys) \
                + lfrac * bilinear(gyu_st, lvu1, 2 * xs, 2 * ys)
            return (
                jnp.where(fine, gxu, gxf),
                jnp.where(fine, gyu, gyf),
            )

        # dominant orientation from the axis-aligned patch: 36-bin
        # Gaussian-weighted histogram, circularly smoothed (SIFT), peak
        rx0 = cx + ou * scale
        ry0 = cy + ov * scale
        # orientation histogram from the SAME level-lerped gradient
        # fields the descriptor samples (gx/gy are linear fields, so the
        # lerp is sound; the wrapped ANGLE is computed after). (Dual-
        # level histogram ACCUMULATION and parabolic peak interpolation
        # were tried and measured NET-NEGATIVE on the warp suite — with
        # ~200 keypoints the peak shifts they induce between
        # corresponding patches outweigh the quantization they remove.)
        # Sampling is sub-pixel bilinear like the descriptor grid:
        # integer rounding was measured fine at scale >= 1 but at the
        # upsampled base octave's sub-unit scales the 16x16 patch spans
        # < 10 px and the rounding jitter flips the dominant-orientation
        # peak between corresponding keypoints (VERDICT r3 #5 follow-up).
        gx0, gy0 = grad_at(rx0, ry0)
        m0 = jnp.sqrt(gx0 * gx0 + gy0 * gy0) * gauss_w
        a0 = jnp.arctan2(gy0, gx0)
        bins36 = (
            jnp.floor((a0 + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32)
            % 36
        )
        hist36 = jax.ops.segment_sum(m0.reshape(-1), bins36.reshape(-1), 36)
        for _ in range(2):  # circular [1,1,1]/3 smoothing
            hist36 = (
                hist36 + jnp.roll(hist36, 1) + jnp.roll(hist36, -1)
            ) / 3.0
        peak1 = jnp.argmax(hist36)

        def desc_for(main):
            cosm, sinm = jnp.cos(main), jnp.sin(main)

            # rotated, scale-matched sample grid + sub-pixel gradients,
            # lerped across the two adjacent blur levels (gx/gy are
            # linear fields — unlike the wrapped angle — so the lerp is
            # sound)
            rx = cx + (cosm * ou - sinm * ov) * scale
            ry = cy + (sinm * ou + cosm * ov) * scale
            gxs, gys = grad_at(rx, ry)
            m = jnp.sqrt(gxs * gxs + gys * gys) * gauss_w
            a_rel = jnp.mod(
                jnp.arctan2(gys, gxs) - main + 2 * jnp.pi, 2 * jnp.pi
            )

            # trilinear soft binning: spatial cell coords in [-0.5, 3.5]
            cu = (ou + 8.0) / 4.0 - 0.5
            cv = (ov + 8.0) / 4.0 - 0.5
            co = a_rel / (2 * jnp.pi) * 8.0 - 0.5
            u0 = jnp.floor(cu).astype(jnp.int32)
            v0 = jnp.floor(cv).astype(jnp.int32)
            o0 = jnp.floor(co).astype(jnp.int32)
            fu = cu - u0.astype(jnp.float32)
            fv = cv - v0.astype(jnp.float32)
            fo = co - o0.astype(jnp.float32)

            contribs = []
            cells = []
            for du in (0, 1):
                wu = jnp.where(du == 0, 1 - fu, fu)
                uu = u0 + du
                u_ok = (uu >= 0) & (uu < 4)
                for dv in (0, 1):
                    wv = jnp.where(dv == 0, 1 - fv, fv)
                    vv = v0 + dv
                    v_ok = (vv >= 0) & (vv < 4)
                    for do in (0, 1):
                        wo = jnp.where(do == 0, 1 - fo, fo)
                        oo = jnp.mod(o0 + do, 8)
                        wgt = m * wu * wv * wo * u_ok * v_ok
                        cell = (
                            jnp.clip(vv, 0, 3) * 4 + jnp.clip(uu, 0, 3)
                        ) * 8 + oo
                        contribs.append(wgt.reshape(-1))
                        cells.append(cell.reshape(-1))
            desc = jax.ops.segment_sum(
                jnp.concatenate(contribs), jnp.concatenate(cells), 128
            )
            desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)
            desc = jnp.minimum(desc, 0.2)
            return desc / jnp.maximum(jnp.linalg.norm(desc), 1e-12)

        def angle_of(bin_i):
            return (
                (bin_i.astype(jnp.float32) + 0.5) / 36 * 2 * jnp.pi - jnp.pi
            )

        d1 = desc_for(angle_of(peak1))
        if num_orientations == 1:
            return d1
        # additional peaks: iteratively the best bin at a circular
        # distance >= 3 from every previously chosen peak (a smoothed
        # peak spans ~3 bins), each emitted only at Lowe's 0.8x-of-max
        # threshold. OpenCV emits EVERY such peak, not just a second one
        # (VERDICT r4 #4 generalized the fixed second peak to N).
        idx36 = jnp.arange(36)
        masked = hist36
        descs = [d1]
        oks = []
        prev = peak1
        for _ in range(num_orientations - 1):
            dist = jnp.minimum((idx36 - prev) % 36, (prev - idx36) % 36)
            masked = jnp.where(dist >= 3, masked, -jnp.inf)
            p = jnp.argmax(masked)
            oks.append(
                jnp.isfinite(masked[p]) & (hist36[p] >= 0.8 * hist36[peak1])
            )
            descs.append(desc_for(angle_of(p)))
            prev = p
        return jnp.stack(descs), jnp.stack(oks)

    if num_orientations == 1:
        descs = jax.vmap(per_kp)(xy, sigma)
        return jnp.where(valid[:, None], descs, 0.0)
    descs, ok_x = jax.vmap(per_kp)(xy, sigma)  # [K,N,128], [K,N-1]
    k = xy.shape[0]
    n = num_orientations
    valid_n = jnp.concatenate(
        [valid[:, None], valid[:, None] & ok_x], axis=1
    ).reshape(n * k)
    flat = descs.reshape(n * k, 128)
    return jnp.where(valid_n[:, None], flat, 0.0), valid_n


@partial(jax.jit, static_argnames=("scale_gate", "mutual_group"))
def match_descriptors(
    desc_a: jnp.ndarray,
    valid_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_b: jnp.ndarray,
    ratio: float = 0.3,
    sigma_a: jnp.ndarray | None = None,
    sigma_b: jnp.ndarray | None = None,
    scale_gate: float = 0.0,
    mutual_group: int = 0,
):
    """2-NN matching with Lowe's ratio test (reference ratio 0.3,
    capture_opencv.hpp:66): for each A descriptor the two nearest B
    descriptors by L2; keep if d1 < ratio * d2. One MXU matmul.

    An absolute ambiguity guard backs the ratio: when BOTH neighbors are
    near-zero distance (exact-duplicate descriptors from repeated
    texture), d1 < ratio * d2 degenerates to comparing float noise and
    accepts an arbitrary duplicate — the guard requires the 2-NN gap to
    be resolvable (sqrt(d2nd) - sqrt(d1) > 0.01 on unit-norm
    descriptors) before a match counts as unambiguous.

    Scale-consistency gate (VERDICT r4 #4; opt-in via ``scale_gate`` > 1
    with both ``sigma_a``/``sigma_b`` given, expanded like xy when
    multi-orientation descriptors are matched): the surviving matches
    vote a GLOBAL scale hypothesis (median log sigma ratio — the two
    frames of a rigid scene are related by one camera motion, so
    corresponding keypoints share one sigma ratio up to estimation
    jitter), and matches whose own ratio deviates from it by more than a
    factor of ``scale_gate`` are rejected. This kills the wrong-scale
    duplicate confusions self-similar texture produces (a corner's
    partner at the WRONG pyramid level has a near-identical descriptor;
    geometry can't tell them apart but the sigma ratio — off by >= one
    level, 1.26x+ — can). Measured caveat (r5): on the synthetic warp
    suite the surviving confusions turned out to be same-scale
    wrong-POSITION duplicates (outlier log sigma-ratios ~0), so the gate
    is a no-op there — the mutual cross-check below is what kills them;
    the gate stays as an opt-in defense for genuinely multi-scale
    confusion regimes.

    Mutual cross-check (``mutual_group`` = the descriptor-row group
    size, i.e. ``num_orientations``; 0 = off): a match also requires
    B's chosen row's own nearest A row to map back to the SAME A
    keypoint (any orientation row of it — hence the group size). One
    extra argmin over the already-computed distance matrix. Measured
    (r5, 3-octave defaults): scale1.12 inliers 0.849 -> 0.950, shift
    0.957 -> 0.991, rotate8/perspective unchanged at 1.000, match
    counts stay within 2x of OpenCV on every warp.

    Returns (idx_b i32[K], good bool[K])."""
    # L2^2 = ||a||^2 + ||b||^2 - 2ab ; descriptors are unit norm -> 2 - 2ab
    sim = jnp.matmul(
        desc_a, desc_b.T, precision=jax.lax.Precision.HIGHEST
    )
    d2 = 2.0 - 2.0 * sim
    d2 = jnp.where(valid_b[None, :], d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, 2)
    d1, d2nd = -neg_top[:, 0], -neg_top[:, 1]
    r1 = jnp.sqrt(jnp.maximum(d1, 0.0))
    r2 = jnp.sqrt(jnp.maximum(d2nd, 1e-20))
    good = (
        valid_a
        & jnp.isfinite(d1)
        & jnp.isfinite(d2nd)
        & (r1 < ratio * r2)
        & (r2 - r1 > 0.01)
    )
    if scale_gate > 1.0 and sigma_a is not None and sigma_b is not None:
        lr = jnp.log(
            jnp.maximum(jnp.take(sigma_b, idx[:, 0]), 1e-6)
            / jnp.maximum(sigma_a, 1e-6)
        )
        med_raw = jnp.nanmedian(jnp.where(good, lr, jnp.nan))
        # with zero surviving matches the hypothesis is undefined — gate off
        no_hyp = jnp.isnan(med_raw)
        med = jnp.where(no_hyp, 0.0, med_raw)
        good = good & (
            no_hyp | (jnp.abs(lr - med) <= float(np.log(scale_gate)))
        )
    if mutual_group:
        # B row -> its nearest VALID A row, from the same distance
        # matrix (masked along A); match keeps only if that round trip
        # lands on the same A keypoint (row // group)
        d2_back = jnp.where(valid_a[:, None], 2.0 - 2.0 * sim, jnp.inf)
        best_a = jnp.argmin(d2_back, axis=0)  # [Kb]
        back = jnp.take(best_a, idx[:, 0])
        ka = jnp.arange(desc_a.shape[0], dtype=back.dtype)
        good = good & (back // mutual_group == ka // mutual_group)
    return idx[:, 0], good
