"""Jitted device steps for the tracking / mapping pipeline.

Each function is a pure MapState -> MapState (or measurement) transform with
static shapes, jitted once per capacity configuration. The host state
machine (pipeline.tracking) sequences them — the TPU-native replacement for
the reference's three pthreads + mutexes (SURVEY.md §2.5).

Reference call sites are noted per function.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..mapstate.map import MapState, add_observation, landmark_obs_count
from ..matching import search as msearch
from ..matching.search import FeatureSet, LandmarkSet
from ..optim import ba, pose_opt
from ..optim.residuals import CamParams

N_LEVELS = 8
SCALE = 1.2
SCALE_FACTORS = msearch.SCALE_FACTORS
INV_SIGMA2 = msearch.INV_SIGMA2


class FrameObs(NamedTuple):
    """Per-frame observation bundle used by tracking steps."""
    feats: FeatureSet  # undistorted coords
    depth: jax.Array  # [N] depth (RGB-D/stereo) or -1
    lm: jax.Array  # [N] int32 matched landmark or -1


def landmark_set(m: MapState) -> LandmarkSet:
    return LandmarkSet(m.lm_pw, m.lm_normal, m.lm_dmin, m.lm_dmax,
                       m.lm_desc, m.lm_valid)


@jax.jit
def make_feature_uvr(u: jax.Array, depth: jax.Array, bf) -> jax.Array:
    """mvuRight from depth (reference: Frame::ComputeStereoFromRGBD,
    Frame.cc:678-699): ur = u - bf/d for d>0 else -1."""
    return jnp.where(depth > 0, u - bf / jnp.clip(depth, 1e-6, None), -1.0)


# ---------------------------------------------------------------------------
# keyframe insertion
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_new",), donate_argnums=0)
def insert_keyframe(
    m: MapState,
    cam: CamParams,
    obs: FrameObs,
    R, t,
    frame_id,
    th_depth: jax.Array,
    max_new: int = 1000,
) -> MapState:
    """Insert the current frame as a keyframe.

    Combines the reference's CreateNewKeyFrame (Tracking.cc:1251-1336:
    existing matches become observations; close depth points become new
    landmarks — all closer than ThDepth*b, else the 100 closest) with
    KeyFrame construction. New-landmark scale bands follow
    MapPoint::UpdateNormalAndDepth (MapPoint.cc:339-390).
    """
    k = m.n_kf
    f = obs.feats
    N = f.xy.shape[0]
    m = m._replace(
        kf_R=m.kf_R.at[k].set(R),
        kf_t=m.kf_t.at[k].set(t),
        kf_valid=m.kf_valid.at[k].set(True),
        kf_frame_id=m.kf_frame_id.at[k].set(frame_id),
        kf_xy=m.kf_xy.at[k].set(f.xy),
        kf_ur=m.kf_ur.at[k].set(f.ur),
        kf_depth=m.kf_depth.at[k].set(obs.depth),
        kf_octave=m.kf_octave.at[k].set(f.octave),
        kf_angle=m.kf_angle.at[k].set(f.angle),
        kf_desc=m.kf_desc.at[k].set(f.desc),
        kf_feat_valid=m.kf_feat_valid.at[k].set(f.valid),
        n_kf=m.n_kf + 1,
    )
    feat_ids = jnp.arange(N, dtype=jnp.int32)
    # 1) existing landmark matches -> observations
    has_lm = (obs.lm >= 0) & f.valid
    m = add_observation(m, jnp.clip(obs.lm, 0), jnp.full(N, k, jnp.int32),
                        feat_ids, has_lm)
    # 2) new landmarks from depth: close points, or the 100 closest
    depth_ok = (obs.depth > 0) & f.valid & ~has_lm
    is_close = depth_ok & (obs.depth < th_depth)
    rank = jnp.argsort(jnp.argsort(jnp.where(depth_ok, obs.depth, 1e9)))
    create = jnp.where(jnp.sum(is_close) >= 100, is_close, depth_ok & (rank < 100))
    # cap at capacity
    slot_off = jnp.cumsum(create.astype(jnp.int32)) - 1
    L = m.lm_pw.shape[0]
    slots = m.n_lm + slot_off
    create &= slots < L
    safe_slots = jnp.where(create, slots, L - 1)
    # unproject
    z = obs.depth
    x = (f.xy[:, 0] - cam.cx) / cam.fx * z
    y = (f.xy[:, 1] - cam.cy) / cam.fy * z
    Xc = jnp.stack([x, y, z], axis=-1)
    Rcw_T = R.T
    Ow = -Rcw_T @ t
    pw = Xc @ R + Ow  # (R^T Xc + Ow)
    dist = jnp.linalg.norm(pw - Ow, axis=-1)
    normal = (pw - Ow) / jnp.clip(dist, 1e-9, None)[:, None]
    dmax = dist * SCALE_FACTORS[f.octave]
    dmin = dmax / SCALE_FACTORS[N_LEVELS - 1]
    sel = create
    m = m._replace(
        lm_pw=m.lm_pw.at[safe_slots].set(jnp.where(sel[:, None], pw, m.lm_pw[safe_slots])),
        lm_valid=m.lm_valid.at[safe_slots].set(jnp.where(sel, True, m.lm_valid[safe_slots])),
        lm_desc=m.lm_desc.at[safe_slots].set(
            jnp.where(sel[:, None], f.desc, m.lm_desc[safe_slots])),
        lm_normal=m.lm_normal.at[safe_slots].set(
            jnp.where(sel[:, None], normal, m.lm_normal[safe_slots])),
        lm_dmin=m.lm_dmin.at[safe_slots].set(jnp.where(sel, dmin, m.lm_dmin[safe_slots])),
        lm_dmax=m.lm_dmax.at[safe_slots].set(jnp.where(sel, dmax, m.lm_dmax[safe_slots])),
        lm_first_kf=m.lm_first_kf.at[safe_slots].set(
            jnp.where(sel, k, m.lm_first_kf[safe_slots])),
        lm_ref_kf=m.lm_ref_kf.at[safe_slots].set(
            jnp.where(sel, k, m.lm_ref_kf[safe_slots])),
        lm_visible=m.lm_visible.at[safe_slots].set(jnp.where(sel, 1, m.lm_visible[safe_slots])),
        lm_found=m.lm_found.at[safe_slots].set(jnp.where(sel, 1, m.lm_found[safe_slots])),
        n_lm=m.n_lm + jnp.sum(create.astype(jnp.int32)),
    )
    m = add_observation(m, safe_slots, jnp.full(N, k, jnp.int32), feat_ids, sel)
    # frame landmark assignment for the caller
    new_lm = jnp.where(sel, safe_slots, obs.lm)
    return m, new_lm


# ---------------------------------------------------------------------------
# tracking steps
# ---------------------------------------------------------------------------

class TrackResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    lm: jax.Array  # [N] per-feature landmark idx (-1 none), post-opt inliers
    n_matches: jax.Array  # matches fed to the optimizer
    n_inliers: jax.Array  # map-observed inliers after optimization


def _pose_optimize_from_matches(cam, m, feats, frame_lm, R0, t0):
    """Pose-only optimization over current frame<->landmark matches."""
    has = frame_lm >= 0
    Xw = m.lm_pw[jnp.clip(frame_lm, 0)]
    obs_uvr = jnp.concatenate([feats.xy, feats.ur[:, None]], axis=-1)
    inv_s2 = INV_SIGMA2[feats.octave]
    res = pose_opt.optimize_pose(cam, R0, t0, Xw, obs_uvr, inv_s2, has & feats.valid)
    lm_out = jnp.where(res.inliers, frame_lm, -1)
    return TrackResult(res.R, res.t, lm_out,
                       jnp.sum((has & feats.valid).astype(jnp.int32)), res.n_inliers)


@jax.jit
def track_motion_model(
    cam, m: MapState, prev: FrameObs, prev_R, prev_t,
    feats: FeatureSet, R_pred, t_pred, th, width, height,
) -> TrackResult:
    """TrackWithMotionModel (reference: Tracking.cc:997-1063): project last
    frame's landmarks with the constant-velocity pose prediction, windowed
    match (ORBmatcher.cc:1540+), then pose-only BA."""
    prev_has = (prev.lm >= 0) & prev.feats.valid
    pw = m.lm_pw[jnp.clip(prev.lm, 0)]
    ok_lm = m.lm_valid[jnp.clip(prev.lm, 0)] & prev_has
    idx, dist, matched = msearch.search_by_projection_frame(
        cam, R_pred, t_pred, pw, prev.feats, ok_lm, feats,
        th, width, height, forward=False, backward=False)
    # frame_lm: scatter prev landmark ids onto matched current features
    N = feats.xy.shape[0]
    frame_lm = jnp.full(N, -1, jnp.int32)
    safe_idx = jnp.where(matched, idx, 0)
    frame_lm = frame_lm.at[safe_idx].set(
        jnp.where(matched, prev.lm, frame_lm[safe_idx]))
    return _pose_optimize_from_matches(cam, m, feats, frame_lm, R_pred, t_pred)


@jax.jit
def track_reference_keyframe(
    cam, m: MapState, ref_kf, feats: FeatureSet, R0, t0,
) -> TrackResult:
    """TrackReferenceKeyFrame (reference: Tracking.cc:871-917): match the
    frame against the reference keyframe's landmarks (SearchByBoW with
    ratio 0.7 — here a full masked Hamming sweep), then pose-only BA from
    the last frame's pose."""
    kf_desc = m.kf_desc[ref_kf]
    kf_lm = m.kf_lm[ref_kf]
    kf_has = (kf_lm >= 0) & m.kf_feat_valid[ref_kf] & m.lm_valid[jnp.clip(kf_lm, 0)]
    idx, dist, matched = msearch.search_brute(
        kf_desc, feats.desc, kf_has, feats.valid, ratio=0.7,
        angle_q=m.kf_angle[ref_kf], angle_t=feats.angle)
    N = feats.xy.shape[0]
    frame_lm = jnp.full(N, -1, jnp.int32)
    safe_idx = jnp.where(matched, idx, 0)
    frame_lm = frame_lm.at[safe_idx].set(
        jnp.where(matched, kf_lm, frame_lm[safe_idx]))
    return _pose_optimize_from_matches(cam, m, feats, frame_lm, R0, t0)


@partial(jax.jit, static_argnames=("width", "height"))
def track_local_map(
    cam, m: MapState, feats: FeatureSet, frame_lm, R, t,
    local_lm_mask, th, width: int, height: int,
) -> tuple[TrackResult, MapState]:
    """TrackLocalMap (reference: Tracking.cc:1075-1127 + SearchLocalPoints
    1345-1403): project unmatched local landmarks, add matches, re-optimize,
    and update per-landmark visible/found statistics."""
    lmset = landmark_set(m)._replace(valid=m.lm_valid & local_lm_mask)
    fr = msearch.frustum_check(cam, R, t, lmset, width, height)
    # exclude landmarks already matched in this frame and features already used
    L = m.lm_pw.shape[0]
    already_lm = jnp.zeros(L, bool).at[jnp.clip(frame_lm, 0)].set(frame_lm >= 0)
    fr = fr._replace(visible=fr.visible & ~already_lm)
    feat_used = frame_lm >= 0
    idx, dist, matched = msearch.search_local_points(
        cam, R, t, lmset, fr, feats, th=th, already_matched=feat_used)
    safe_idx = jnp.where(matched, idx, 0)
    lm_ids = jnp.arange(L, dtype=jnp.int32)
    frame_lm = frame_lm.at[safe_idx].set(
        jnp.where(matched, lm_ids, frame_lm[safe_idx]))
    result = _pose_optimize_from_matches(cam, m, feats, frame_lm, R, t)
    # statistics: visible++ for frustum-visible, found++ for inlier matches
    vis_inc = (fr.visible | already_lm).astype(jnp.int32)
    found_mask = jnp.zeros(L, bool).at[jnp.clip(result.lm, 0)].set(result.lm >= 0)
    m = m._replace(
        lm_visible=m.lm_visible + vis_inc,
        lm_found=m.lm_found + found_mask.astype(jnp.int32),
    )
    return result, m


@jax.jit
def local_landmark_mask(m: MapState, ref_kf) -> jax.Array:
    """Local-map landmark selection: landmarks observed by keyframes
    covisible with ref_kf (reference: UpdateLocalKeyFrames/Points,
    Tracking.cc:1421-1570)."""
    K = m.kf_R.shape[0]
    from ..mapstate.map import covisibility_weights
    w = covisibility_weights(m, ref_kf)  # [K]
    local_kf = (w > 0) | (jnp.arange(K) == ref_kf)
    obs_in_local = jnp.any(
        local_kf[jnp.clip(m.lm_obs_kf, 0)] & (m.lm_obs_kf >= 0), axis=1)
    return obs_in_local & m.lm_valid


# ---------------------------------------------------------------------------
# local bundle adjustment + culling
# ---------------------------------------------------------------------------

@partial(jax.jit, donate_argnums=0)
def local_bundle_adjustment(m: MapState, cam, cur_kf, iters_a: int = 5) -> MapState:
    """LocalBundleAdjustment (reference: Optimizer.cc:483-808): free poses =
    current KF + its covisible neighbors, fixed = every other KF observing a
    local landmark; landmarks of free KFs optimized; outlier observations
    (chi2 > 5.991/7.815 at the optimum) erased from the map."""
    from ..mapstate.map import covisibility_weights
    K, N = m.kf_lm.shape
    w = covisibility_weights(m, cur_kf)
    free = ((w > 0) | (jnp.arange(K) == cur_kf)) & m.kf_valid
    # keyframe 0 always fixed (gauge; reference Optimizer.cc:559)
    free = free.at[0].set(False)
    obs_valid = m.lm_obs_kf >= 0
    lm_local = jnp.any(free[jnp.clip(m.lm_obs_kf, 0)] & obs_valid, axis=1) & m.lm_valid
    # observation table -> BAProblem arrays
    kf_idx = jnp.clip(m.lm_obs_kf, 0)
    feat_idx = m.lm_obs_feat
    uv = m.kf_xy[kf_idx, feat_idx]  # [L, D, 2]
    ur = m.kf_ur[kf_idx, feat_idx]
    uvr = jnp.concatenate([uv, ur[..., None]], axis=-1)
    octv = m.kf_octave[kf_idx, feat_idx]
    wgt = jnp.where(obs_valid & lm_local[:, None], INV_SIGMA2[octv], 0.0)
    prob = ba.BAProblem(
        R=m.kf_R, t=m.kf_t, X=m.lm_pw,
        obs_pose=kf_idx, obs_uvr=uvr, obs_w=wgt,
        pose_fixed=~free, point_valid=lm_local,
    )
    res = ba.ba_solve(cam, prob, iters=iters_a, robust=True)
    # second stage without robust kernel on inliers only (reference: 5 iters
    # robust, outlier pass, 10 more): here one fused pass — erase outliers.
    is_stereo = uvr[..., 2] >= 0
    chi_th = jnp.where(is_stereo, 7.815, 5.991)
    outlier = (res.obs_chi2 > chi_th) & (wgt > 0)
    # erase outlier observations from the table + keyframe back-refs
    new_obs_kf = jnp.where(outlier, -1, m.lm_obs_kf)
    lm_ids = jnp.arange(m.lm_pw.shape[0], dtype=jnp.int32)
    back_ok = m.kf_lm[jnp.clip(m.lm_obs_kf, 0), feat_idx] == lm_ids[:, None]
    clear = outlier & back_ok
    kf_lm = m.kf_lm.at[jnp.clip(m.lm_obs_kf, 0), feat_idx].set(
        jnp.where(clear, -1, m.kf_lm[jnp.clip(m.lm_obs_kf, 0), feat_idx]))
    m = m._replace(
        kf_R=res.R, kf_t=res.t, lm_pw=res.X,
        lm_obs_kf=new_obs_kf, kf_lm=kf_lm,
    )
    return m


@partial(jax.jit, donate_argnums=0)
def cull_landmarks(m: MapState, cur_kf) -> MapState:
    """MapPointCulling (reference: LocalMapping.cc:219-263), applied to
    recent landmarks only (the reference's mlpRecentAddedMapPoints window):
    drop when found/visible < 0.25, or when age >= 2 keyframes with too few
    observers. The reference's obs <= 3 counts stereo observations double
    (MapPoint.cc:105-108), so in keyframe-slot units the threshold is <= 1.
    Landmarks older than 3 keyframes graduate untouched."""
    nobs = landmark_obs_count(m)
    age = cur_kf - m.lm_first_kf
    ratio_bad = (m.lm_found.astype(jnp.float32) /
                 jnp.clip(m.lm_visible.astype(jnp.float32), 1.0, None)) < 0.25
    young_weak = (age >= 2) & (nobs <= 1)
    orphan = nobs == 0
    bad = m.lm_valid & ((age <= 3) & (ratio_bad | young_weak) | orphan)
    return m._replace(lm_valid=m.lm_valid & ~bad)
