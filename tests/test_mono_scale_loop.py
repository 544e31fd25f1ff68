"""Monocular (scale-free) loop closure at dataset scale (VERDICT r4 #1/#5).

The reference's Sim3 machinery exists for exactly one reason: monocular
scale drift (LoopClosing.cc:291-487 with mbFixScale=false from
System.cc:100; scale solve Sim3Solver.cc:306-325; SE3 recovery `/s` in
Optimizer.cc:1061-1080). These tests run the s != 1 correction on data:

1. ``corrected_scale_run``: a 300-keyframe survey circle whose map
   carries smoothly ACCUMULATING SCALE drift (1.0 -> ~1.12x, the classic
   mono failure mode), corrected through auto_loop._correct with
   fix_scale=False — the 7-dof essential graph must distribute the scale
   error around the loop and the landmark re-anchoring must divide depth
   by the optimized per-vertex scale.

2. ``detected_scale_run``: the SAME map driven through the PRODUCTION
   path — close_loop_step: BoW detection (sparse tf-idf rows from the
   packaged vocabulary) -> covisibility-consistency over 3 consecutive
   keyframes -> Sim3 RANSAC on plausible descriptors (physical wall
   points re-observed across the loop with independent bit noise) ->
   gate40 -> correction. Nothing is injected; the loop must be FOUND and
   SOLVED at K=300 through the same gates production uses
   (LoopClosing.cc:105-264 detection, :291-487 ComputeSim3).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_with_comment_tpu.geometry import sim3
from orb_slam2_with_comment_tpu.mapstate.map import MapConfig, empty_map
from orb_slam2_with_comment_tpu.optim.residuals import CamParams
from orb_slam2_with_comment_tpu.pipeline import auto_loop
from orb_slam2_with_comment_tpu.place import vocabulary as V

K = 300
N = 256
L = 50_000
D = 6
OBS_PER_LM = 4
WIDTH, HEIGHT = 640, 480
S_MAX = 1.12  # accumulated monocular scale drift at the loop keyframe
RADIUS = 5.0
N_LAST = 6    # revisit keyframes anchoring duplicate landmarks

FX = FY = 500.0
CX, CY = 320.0, 240.0


def _look_out_poses(n, radius=RADIUS):
    Rs, Cs = [], []
    for k in range(n):
        th = 2 * np.pi * k / n
        out = np.array([np.cos(th), 0.0, np.sin(th)])
        C = radius * out
        z = out
        y = np.array([0.0, 1.0, 0.0])
        x = np.cross(y, z)
        x /= np.linalg.norm(x)
        y2 = np.cross(z, x)
        Rcw = np.stack([x, y2, z], axis=1).T
        Rs.append(Rcw)
        Cs.append(C)
    return np.asarray(Rs, np.float32), np.asarray(Cs, np.float32)


def _scale_profile():
    """Smooth accumulated scale drift: 1 at keyframe 0, S_MAX at K-1."""
    return (1.0 + (S_MAX - 1.0)
            * (np.arange(K, dtype=np.float32) / (K - 1)))


def _flip_bits(rng, desc, n_bits):
    """XOR ``n_bits`` random bits into each packed 8xuint32 descriptor."""
    out = desc.copy()
    for i in range(len(out)):
        pos = rng.choice(256, size=n_bits, replace=False)
        for p in pos:
            out[i, p // 32] ^= np.uint32(1) << np.uint32(p % 32)
    return out


def _build_scale_drift_map(with_descriptors):
    """Circle survey with pure scale drift about the world origin:
    drifted centers C' = s(k) C, landmarks anchored X' = s(ref) X_true,
    observations rendered from the DRIFTED geometry (the drifted state is
    in local equilibrium, exactly what slow scale drift produces).

    with_descriptors: give every landmark the descriptor of a PHYSICAL
    wall point (revisit keyframes anchor duplicate instances of the
    start's physical points, with independent bit noise) so BoW
    detection and Hamming matching behave like a real revisit.
    """
    rng = np.random.default_rng(23)
    R_true, C_true = _look_out_poses(K)
    s_prof = _scale_profile()
    C_drift = s_prof[:, None] * C_true
    t_drift = -np.einsum("kij,kj->ki", R_true, C_drift)

    # physical wall points around the circle
    N_PHYS = 2600
    th = 2 * np.pi * np.arange(N_PHYS) / N_PHYS \
        + rng.normal(0, 0.004, N_PHYS)
    wall_r = 8.0 + rng.uniform(-0.5, 0.5, N_PHYS)
    X_phys = np.stack([wall_r * np.cos(th),
                       rng.uniform(-1.0, 1.0, N_PHYS),
                       wall_r * np.sin(th)], axis=1).astype(np.float32)
    desc_phys = rng.integers(0, 2 ** 32, (N_PHYS, 8),
                             dtype=np.uint32)
    # first-lap anchor: the keyframe whose bearing covers the point
    ref1 = ((th % (2 * np.pi)) / (2 * np.pi) * K).astype(np.int64)
    ref1 = np.clip(ref1, 0, K - 1 - N_LAST)  # first lap only

    # landmark instances: one per physical point (first lap) + duplicate
    # instances for points revisited by the last N_LAST keyframes
    lm_phys = list(range(N_PHYS))
    lm_ref = list(ref1)
    revisit_kf = np.arange(K - N_LAST, K)
    for j in range(N_PHYS):
        # bearing of the last keyframes spans ~the first few keyframes'
        # bearings; duplicate points whose first-lap anchor was early
        if ref1[j] <= 10:
            # anchor the duplicate at the revisit keyframe nearest in
            # bearing (the circle closes: bearing(K-1) ~ bearing(0))
            k_near = int(revisit_kf[
                np.argmin(np.abs(((th[j] - 2 * np.pi * revisit_kf / K)
                                  + np.pi) % (2 * np.pi) - np.pi))])
            lm_phys.append(j)
            lm_ref.append(k_near)
    lm_phys = np.asarray(lm_phys)
    lm_ref = np.asarray(lm_ref)
    n_lm = len(lm_phys)
    assert n_lm < L

    X_true_lm = X_phys[lm_phys]
    X_drift_lm = s_prof[lm_ref][:, None] * X_true_lm

    # observations: instance i seen by keyframes ref..ref+OBS_PER_LM-1
    # (revisit instances: ref-OBS_PER_LM+1..ref so they stay in range)
    lm_obs_kf = np.full((L, D), -1, np.int32)
    lm_obs_feat = np.zeros((L, D), np.int32)
    kf_lm = np.full((K, N), -1, np.int32)
    kf_xy = np.zeros((K, N, 2), np.float32)
    kf_feat_valid = np.zeros((K, N), bool)
    kf_desc = np.zeros((K, N, 8), np.uint32)
    slot_used = np.zeros(K, np.int32)
    late = lm_ref >= K - N_LAST
    base = np.where(late, lm_ref - OBS_PER_LM + 1, lm_ref)
    for i in range(n_lm):
        for j in range(OBS_PER_LM):
            k = int(base[i]) + j
            if not (0 <= k < K):
                continue
            # first-lap instances must not be observed by revisit
            # keyframes (shared observations would make the loop
            # candidate covisible with the current keyframe and the
            # detector correctly skips covisible candidates)
            if not late[i] and k >= K - N_LAST:
                continue
            f = int(slot_used[k])
            if f >= N:
                continue
            Xc = R_true[k] @ (X_drift_lm[i] - C_drift[k])
            if Xc[2] <= 0.2:
                continue
            u = FX * Xc[0] / Xc[2] + CX
            v = FY * Xc[1] / Xc[2] + CY
            if not (0 <= u < WIDTH and 0 <= v < HEIGHT):
                continue
            slot_used[k] = f + 1
            lm_obs_kf[i, j] = k
            lm_obs_feat[i, j] = f
            kf_lm[k, f] = i
            kf_xy[k, f] = (u, v)
            kf_feat_valid[k, f] = True
            if with_descriptors:
                kf_desc[k, f] = _flip_bits(
                    rng, desc_phys[lm_phys[i]][None], 6)[0]

    if with_descriptors:
        lm_desc = _flip_bits(rng, desc_phys[lm_phys], 6)
        lm_desc = np.concatenate(
            [lm_desc, np.zeros((L - n_lm, 8), np.uint32)])
    else:
        kf_desc = rng.integers(0, 2 ** 32, (K, N, 8), dtype=np.uint32)
        lm_desc = rng.integers(0, 2 ** 32, (L, 8), dtype=np.uint32)

    d_anchor = np.linalg.norm(X_drift_lm - C_drift[lm_ref], axis=1)
    m = empty_map(MapConfig(k_max=K, n_feat=N, l_max=L, d_max=D))
    m = m._replace(
        kf_R=jnp.asarray(R_true), kf_t=jnp.asarray(t_drift),
        kf_valid=jnp.ones(K, bool),
        kf_frame_id=jnp.arange(K, dtype=jnp.int32),
        kf_xy=jnp.asarray(kf_xy),
        kf_desc=jnp.asarray(kf_desc),
        kf_feat_valid=jnp.asarray(kf_feat_valid),
        kf_lm=jnp.asarray(kf_lm),
        lm_pw=jnp.asarray(np.concatenate(
            [X_drift_lm, np.zeros((L - n_lm, 3), np.float32)])),
        lm_valid=jnp.arange(L) < n_lm,
        lm_desc=jnp.asarray(lm_desc),
        # scale-invariance band around the anchor distance, like
        # MapPoint::UpdateNormalAndDepth for an octave-0 observation
        # (dmax=100 would put predict_scale at level 7 and the projection
        # searches' level gate would reject every octave-0 feature)
        lm_dmin=jnp.asarray(np.concatenate(
            [(0.4 * d_anchor), np.full(L - n_lm, 0.1)]).astype(np.float32)),
        lm_dmax=jnp.asarray(np.concatenate(
            [(1.2 * d_anchor), np.full(L - n_lm, 100.0)]).astype(
                np.float32)),
        # mean viewing direction (camera->point): the projection searches
        # (SearchByProjection/Fuse) gate on it — zero normals reject
        # every projection and gate40 can never pass
        lm_normal=jnp.asarray(np.concatenate([
            (X_drift_lm - C_drift[lm_ref])
            / np.clip(np.linalg.norm(X_drift_lm - C_drift[lm_ref],
                                     axis=1, keepdims=True), 1e-9, None),
            np.zeros((L - n_lm, 3), np.float32)]).astype(np.float32)),
        lm_first_kf=jnp.asarray(np.pad(
            lm_ref, (0, L - n_lm)).astype(np.int32)),
        lm_ref_kf=jnp.asarray(np.pad(
            lm_ref, (0, L - n_lm)).astype(np.int32)),
        lm_obs_kf=jnp.asarray(lm_obs_kf),
        lm_obs_feat=jnp.asarray(lm_obs_feat),
        n_kf=jnp.int32(K), n_lm=jnp.int32(n_lm),
    )
    return m, R_true, C_true, C_drift, s_prof


def _center_errors(m, R_true, C_true):
    R = np.asarray(m.kf_R)
    t = np.asarray(m.kf_t)
    C = np.stack([-(Rk.T @ tk) for Rk, tk in zip(R, t)])
    return np.linalg.norm(C - C_true, axis=1), C


@pytest.fixture(scope="module")
def corrected_scale_run():
    cam = CamParams(*[jnp.float32(v) for v in (FX, FY, CX, CY, 40.0)])
    m, R_true, C_true, C_drift, s_prof = _build_scale_drift_map(
        with_descriptors=False)
    kf, cand = K - 1, 3
    # ground-truth loop Sim3 (what Sim3Solver recovers from the 3D-3D
    # pairs): the current keyframe's observations live in its DRIFTED
    # depth metric, so the corrected current pose is the Sim3
    # S_cur_corr = (R_true, s_d * t_true, s_d) with
    # s_d = s(kf)/s(cand) ~ S_MAX — then S12 = S_cur_corr o
    # (T_cand_drift_w)^-1, whose scale is s_d
    s_d = jnp.float32(_scale_profile()[kf] / _scale_profile()[cand])
    R_cur = jnp.asarray(R_true[kf])
    t_cur = jnp.asarray(-R_true[kf] @ C_true[kf])
    Rc_i, tc_i, sc_i = sim3.inverse(
        jnp.asarray(R_true[cand]),
        jnp.asarray(-R_true[cand] @ C_drift[cand]), jnp.ones(()))
    R12, t12, s12 = sim3.compose(
        R_cur, s_d * t_cur, s_d, Rc_i, tc_i, sc_i)
    no_pairs = jnp.zeros(N, bool)
    corr = jax.jit(lambda mm: auto_loop._correct(
        mm, cam, jnp.int32(kf), jnp.int32(cand), R12, t12, s12,
        False,  # fix_scale=False: the monocular 7-dof path
        jnp.full(N, -1, jnp.int32), jnp.full(N, -1, jnp.int32),
        no_pairs, jnp.zeros((K, K), bool), WIDTH, HEIGHT))
    m_out = jax.block_until_ready(corr(m))
    return m, m_out, R_true, C_true, C_drift, float(s12)


def test_injected_sim3_has_scale(corrected_scale_run):
    *_, s12 = corrected_scale_run
    assert 1.05 < s12 < 1.25  # the loop constraint really is scale-free


def test_scale_correction_collapses_drift(corrected_scale_run):
    m0, m_out, R_true, C_true, C_drift, s12 = corrected_scale_run
    err_before = np.linalg.norm(C_drift - C_true, axis=1)
    err_after, _ = _center_errors(m_out, R_true, C_true)
    assert err_before[-1] > 0.4  # ~ (S_MAX-1) * RADIUS
    assert err_after[-1] < 0.25 * err_before[-1], (
        err_before[-1], err_after[-1])
    half = slice(K // 2, K)
    assert (np.mean(err_after[half])
            < 0.35 * np.mean(err_before[half])), (
        np.mean(err_before[half]), np.mean(err_after[half]))


def test_scale_correction_recovers_metric_scale(corrected_scale_run):
    """The defining mono assertion: per-keyframe RADIUS returns to the
    true metric over the drifted half of the trajectory (the scale was
    up to 12% off before), and the landmark cloud follows."""
    m0, m_out, R_true, C_true, C_drift, s12 = corrected_scale_run
    _, C_after = _center_errors(m_out, R_true, C_true)
    r_true = np.linalg.norm(C_true, axis=1)
    ratio_before = np.linalg.norm(C_drift, axis=1) / r_true
    ratio_after = np.linalg.norm(C_after, axis=1) / r_true
    worst = slice(3 * K // 4, K)
    assert np.median(ratio_before[worst]) > 1.06
    assert abs(np.median(ratio_after[worst]) - 1.0) < 0.03, (
        np.median(ratio_before[worst]), np.median(ratio_after[worst]))
    # landmarks: wall radius back near 8 m for late-anchored points
    lm_ref = np.asarray(m_out.lm_ref_kf)
    lm_valid = np.asarray(m_out.lm_valid)
    late = lm_valid & (lm_ref >= 3 * K // 4)
    r_lm = np.linalg.norm(np.asarray(m_out.lm_pw)[late], axis=1)
    assert np.isfinite(r_lm).all()
    assert abs(np.median(r_lm) / 8.0 - 1.0) < 0.05, np.median(r_lm)


@pytest.fixture(scope="module")
def detected_scale_run():
    cam = CamParams(*[jnp.float32(v) for v in (FX, FY, CX, CY, 40.0)])
    m, R_true, C_true, C_drift, s_prof = _build_scale_drift_map(
        with_descriptors=True)
    voc = V.load_default_vocabulary(as_numpy=True)
    loop = auto_loop.empty_loop_carry(K, N)

    # BoW rows for every keyframe up front (production adds them at
    # insertion; add_keyframe_bow one-at-a-time would re-trace K times)
    def _row(desc, valid):
        words = V.transform(voc, desc, valid)
        return V.bow_sparse(voc, words, valid, N)

    idx, w = jax.jit(jax.vmap(_row))(m.kf_desc, m.kf_feat_valid)
    loop = loop._replace(bow_idx=idx, bow_w=w)

    step = jax.jit(lambda lp, mm, kk: auto_loop.close_loop_step(
        lp, mm, cam, kk, voc, fix_scale=False, add_bow=False))

    fired_at = None
    # drive the production pass over the revisit keyframes: detection
    # needs 3 consecutive keyframes with consistent candidate groups
    for k in range(K - N_LAST, K):
        m, loop = step(loop, m, jnp.int32(k))
        if fired_at is None and int(loop.n_loops) > 0:
            fired_at = k
    return m, loop, R_true, C_true, C_drift, fired_at


def test_loop_found_through_production_gates(detected_scale_run):
    m, loop, R_true, C_true, C_drift, fired_at = detected_scale_run
    assert int(loop.n_loops) >= 1, (
        "detection->Sim3->gate40 never fired on a genuine revisit at "
        "K=300")
    # consistency needs >= 3 consecutive detections: cannot fire before
    # the third revisit keyframe
    assert fired_at >= K - N_LAST + 2


def test_detected_correction_collapses_scale(detected_scale_run):
    m, loop, R_true, C_true, C_drift, fired_at = detected_scale_run
    err_before = np.linalg.norm(C_drift - C_true, axis=1)
    err_after, C_after = _center_errors(m, R_true, C_true)
    worst = slice(3 * K // 4, K)
    assert (np.mean(err_after[worst])
            < 0.5 * np.mean(err_before[worst])), (
        np.mean(err_before[worst]), np.mean(err_after[worst]))
    r_true = np.linalg.norm(C_true, axis=1)
    ratio_after = np.median(
        np.linalg.norm(C_after, axis=1)[worst] / r_true[worst])
    assert abs(ratio_after - 1.0) < 0.05, ratio_after
    assert np.isfinite(np.asarray(m.lm_pw)).all()
