"""Stereo feature depth: rectified row-band descriptor match + SAD refine.

TPU-native rebuild of Frame::ComputeStereoMatches (reference:
src/Frame.cc:501-675). The reference loops left keypoints over a per-row
candidate table; here the whole association is one masked dense Hamming
matrix (row-band, octave-band and disparity-range masks), followed by a
vectorized subpixel correlation sweep (11x11 SAD over +-5 shifts with
parabola refinement, reference Frame.cc:586-643) and the median-distance
outlier sweep (reference Frame.cc:661-674).

All shapes are static: N_left x N_right distance matrix, per-level blocks
of keypoints (the extractor lays keypoints out level-contiguously with
static budgets), fixed 11x21 right-image strips.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import hamming, image

W = 5            # SAD half-window (reference: const int w = 5, Frame.cc:593)
L = 5            # shift search range (reference: const int L = 5, Frame.cc:600)
TH_ORB = 75.0    # (TH_HIGH + TH_LOW)/2 (reference: Frame.cc:540)


class StereoDepth(NamedTuple):
    u_right: jax.Array  # [N] float32 refined right u, -1 if no match
    depth: jax.Array    # [N] float32 depth from disparity, -1 if no match


def _sad_refine_block(pyr_l: jax.Array, pyr_r: jax.Array, inv_scale: float,
                      xy_l: jax.Array, u_r0: jax.Array):
    """Subpixel correlation for one pyramid level's keypoint block.

    Returns (inc_plus_delta, best_sad, ok): the refined shift (in level
    pixels, relative to round(u_r0 * inv_scale)), the best SAD score used by
    the outlier sweep, and the validity mask (shift not at the search edge,
    |delta| <= 1; reference Frame.cc:611-636).
    """
    h, w = pyr_l.shape
    xl = xy_l[:, 0] * inv_scale
    yl = xy_l[:, 1] * inv_scale
    ur0 = jnp.round(u_r0 * inv_scale)

    def one(xl_i, yl_i, ur0_i):
        yi = jnp.clip(jnp.round(yl_i).astype(jnp.int32) - W, 0, h - (2 * W + 1))
        xi = jnp.clip(jnp.round(xl_i).astype(jnp.int32) - W, 0, w - (2 * W + 1))
        patch_l = jax.lax.dynamic_slice(pyr_l, (yi, xi), (2 * W + 1, 2 * W + 1))
        patch_l = patch_l - patch_l[W, W]
        # strip wide enough for shifts -L..L around the scaled right u
        x0 = ur0_i.astype(jnp.int32) - W - L
        inb = (x0 >= 0) & (x0 + 2 * W + 2 * L + 1 <= w)
        x0c = jnp.clip(x0, 0, w - (2 * W + 2 * L + 1))
        strip = jax.lax.dynamic_slice(
            pyr_r, (yi, x0c), (2 * W + 1, 2 * W + 2 * L + 1))
        sads = []
        for o in range(2 * L + 1):
            win = jax.lax.slice_in_dim(strip, o, o + 2 * W + 1, axis=1)
            win = win - win[W, W]
            sads.append(jnp.sum(jnp.abs(patch_l - win)))
        sad = jnp.stack(sads)                          # [2L+1]
        best = jnp.argmin(sad)
        edge = (best == 0) | (best == 2 * L)
        b = jnp.clip(best, 1, 2 * L - 1)
        d1, d2, d3 = sad[b - 1], sad[b], sad[b + 1]
        denom = d1 + d3 - 2.0 * d2
        delta = jnp.where(denom > 0, (d1 - d3) / (2.0 * jnp.clip(denom, 1e-9, None)), 2.0)
        ok = inb & ~edge & (jnp.abs(delta) <= 1.0)
        return (b.astype(jnp.float32) - L) + delta, sad[best], ok

    inc, best_sad, ok = jax.vmap(one)(xl, yl, ur0)
    return ur0 + inc, best_sad, ok


def match_stereo(feats_l, feats_r, pyr_l, pyr_r, budgets,
                 bf: jax.Array, fx: float) -> StereoDepth:
    """Row-band Hamming association + subpixel refine + outlier sweep.

    feats_l/feats_r: FrameFeatures (level-contiguous layout per ``budgets``).
    pyr_l/pyr_r: blurred pyramid levels (lists of 2D arrays).
    Returns per-left-feature refined right coordinate and depth.
    """
    scales = image.level_scales(len(pyr_l))
    dist = hamming.distance_matrix(feats_l.desc, feats_r.desc).astype(jnp.float32)
    ul = feats_l.xy[:, 0][:, None]
    vl = feats_l.xy[:, 1][:, None]
    ur = feats_r.xy[None, :, 0]
    vr = feats_r.xy[None, :, 1]
    oct_l = feats_l.octave[:, None]
    oct_r = feats_r.octave[None, :]
    # row band: r = 2 * scaleFactor[right octave] (reference Frame.cc:519)
    sc = jnp.asarray(scales, jnp.float32)
    r_band = 2.0 * sc[feats_r.octave][None, :]
    min_d = 0.0
    max_d = fx  # bf / b = fx (reference Frame.cc:530-533)
    mask = (
        feats_l.valid[:, None] & feats_r.valid[None, :]
        & (jnp.abs(vr - vl) <= r_band)
        & (oct_r >= oct_l - 1) & (oct_r <= oct_l + 1)
        & (ur >= ul - max_d) & (ur <= ul - min_d)
    )
    big = jnp.float32(1e9)
    dm = jnp.where(mask, dist, big)
    best_j = jnp.argmin(dm, axis=1)
    best_d = jnp.take_along_axis(dm, best_j[:, None], axis=1)[:, 0]
    matched = best_d < TH_ORB
    u_r0 = feats_r.xy[best_j, 0]

    # per-level subpixel refinement over static keypoint blocks
    n = feats_l.xy.shape[0]
    u_right = jnp.full(n, -1.0, jnp.float32)
    sad_best = jnp.full(n, jnp.inf, jnp.float32)
    ok_all = jnp.zeros(n, bool)
    off = 0
    for lvl, budget in enumerate(budgets):
        if budget <= 0:
            continue
        sl = slice(off, off + budget)
        ur_lvl, sad, ok = _sad_refine_block(
            pyr_l[lvl], pyr_r[lvl], 1.0 / scales[lvl],
            feats_l.xy[sl], u_r0[sl])
        u_right = u_right.at[sl].set(ur_lvl * scales[lvl])
        sad_best = sad_best.at[sl].set(sad)
        ok_all = ok_all.at[sl].set(ok)
        off += budget

    good = matched & ok_all
    disparity = feats_l.xy[:, 0] - u_right
    # disparity <= 0 is clamped to a tiny positive value (reference :650-653)
    tiny = disparity <= 0
    disparity = jnp.where(tiny, 0.01, disparity)
    u_right = jnp.where(tiny, feats_l.xy[:, 0] - 0.01, u_right)
    good &= disparity < max_d

    # median-distance outlier sweep (reference Frame.cc:661-674):
    # thDist = 1.5 * 1.4 * median(SAD best)
    sad_sorted = jnp.sort(jnp.where(good, sad_best, jnp.inf))
    n_good = jnp.sum(good)
    med = sad_sorted[jnp.clip(n_good // 2, 0, n - 1)]
    th = 1.5 * 1.4 * med
    good &= sad_best <= th

    depth = jnp.where(good, bf / disparity, -1.0)
    u_out = jnp.where(good, u_right, -1.0)
    return StereoDepth(u_out, depth)
