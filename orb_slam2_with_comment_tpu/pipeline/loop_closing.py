"""Loop detection, Sim3 computation, and loop correction.

TPU-native rebuild of the reference's LoopClosing thread (reference:
src/LoopClosing.cc): BoW candidate retrieval with covisibility-consistency
confirmation across consecutive keyframes (DetectLoop :105-264,
mnCovisibilityConsistencyTh=3), Sim3 RANSAC + refinement with inlier gates
(ComputeSim3 :291-487: >=20 BoW matches, >=20 Sim3 inliers, >=40 total),
and loop correction (CorrectLoop :509-719): Sim3 pose propagation over the
current covisibility group, landmark correction via reference keyframes,
duplicate fusion, essential-graph optimization, and a bounded global BA
(the reference's asynchronous GBA thread becomes a bounded-iteration call —
SURVEY §2.5 P3/P6).

Runs synchronously after keyframe insertion, as a host sequencer over
jitted steps.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import se3, sim3
from ..mapstate.map import (MapState, covisibility_matrix,
                             covisibility_weights, rebuild_observations)
from ..matching import search as msearch
from ..optim import ba, pose_graph, sim3_opt
from ..optim.residuals import CamParams
from ..place.database import KeyFrameDatabase
from ..solvers import sim3solver


class LoopCloser:
    def __init__(self, cam: CamParams, db: KeyFrameDatabase,
                 fix_scale: bool = True, covis_consistency: int = 3,
                 min_gap: int = 10):
        self.cam = cam
        self.db = db
        self.fix_scale = fix_scale
        self.consistency_th = covis_consistency
        self.min_gap = min_gap  # >=10 keyframes since last loop (ref :116)
        self.last_loop_kf = -self.min_gap
        self.prev_groups: list[tuple[set[int], int]] = []
        self.key = jax.random.PRNGKey(7)
        self.n_loops_closed = 0
        # ONE device program for the whole detection pass (covisibility
        # matrix + BoW scores); separate eager calls each paid a tunnel
        # round trip (~23 ms) per keyframe
        from ..place import vocabulary as V

        def _detect_dev(m: MapState, bow, kf):
            s = jnp.where(m.kf_valid, V.score_l1(bow[kf], bow), -1.0)
            return covisibility_matrix(m), s

        self._detect_dev = jax.jit(_detect_dev)

    # -- detection ------------------------------------------------------
    def _covis_group(self, m: MapState, kf: int) -> set[int]:
        w = np.asarray(covisibility_weights(m, jnp.int32(kf)))
        return {int(j) for j in np.where(w > 0)[0]} | {kf}

    def detect(self, m: MapState, kf: int) -> int | None:
        """Returns a consistent loop-candidate keyframe id, or None."""
        if kf - self.last_loop_kf < self.min_gap:
            self.prev_groups = []
            return None
        # one batched covisibility matrix + one score sweep for the whole
        # detection pass (was one device round trip per keyframe row)
        W_dev, s_dev = self._detect_dev(m, self.db.bow, jnp.int32(kf))
        W = np.asarray(W_dev)
        s_all = np.asarray(s_dev)
        covis = np.where(W[kf] > 0)[0]
        min_score = float(min([s_all[int(j)] for j in covis], default=0.5))
        min_score = max(min_score, 0.0)
        candidates = self.db.detect_loop_candidates(m, kf, min_score,
                                                    covis=W, scores=s_all)
        return self._consistency(W, candidates)

    # -- Sim3 -----------------------------------------------------------
    def compute_sim3(self, m: MapState, kf: int, cand: int):
        """Match landmarks of the two keyframes, RANSAC+refine S_cur_cand.

        Returns (R12, t12, s12, n_inliers) with convention: maps candidate-
        camera coordinates into current-camera coordinates, or None.
        """
        cam = self.cam
        lm1 = m.kf_lm[kf]
        lm2 = m.kf_lm[cand]
        has1 = (lm1 >= 0) & m.kf_feat_valid[kf] & m.lm_valid[jnp.clip(lm1, 0)]
        has2 = (lm2 >= 0) & m.kf_feat_valid[cand] & m.lm_valid[jnp.clip(lm2, 0)]
        idx, dist, matched = msearch.search_brute(
            m.kf_desc[kf], m.kf_desc[cand], has1, has2, ratio=0.75,
            angle_q=m.kf_angle[kf], angle_t=m.kf_angle[cand])
        n_matches = int(jnp.sum(matched))
        if n_matches < 20:  # reference :333
            return None
        # camera-frame coordinates of the matched landmark pairs
        safe_idx = jnp.where(matched, idx, 0)
        l1 = jnp.clip(lm1, 0)
        l2 = jnp.clip(m.kf_lm[cand][safe_idx], 0)
        X1c = se3.transform(m.kf_R[kf], m.kf_t[kf], m.lm_pw[l1])
        X2c = se3.transform(m.kf_R[cand], m.kf_t[cand], m.lm_pw[l2])
        uv1 = m.kf_xy[kf]
        uv2 = m.kf_xy[cand][safe_idx]
        s2_1 = msearch.sigma2_at(m.kf_octave[kf])
        s2_2 = msearch.sigma2_at(m.kf_octave[cand][safe_idx])
        valid = matched & has1
        K = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
        self.key, sub = jax.random.split(self.key)
        res = sim3solver.solve_ransac(
            sub, K, K, X1c, X2c, uv1, uv2, s2_1, s2_2, valid,
            max_iters=300, min_inliers=20, fix_scale=self.fix_scale)
        if int(res.n_inliers) < 20:  # reference :408
            return None
        ref = sim3_opt.optimize_sim3(
            K, K, res.R, res.t, res.s, X1c, X2c, uv1, uv2,
            1.0 / s2_1, 1.0 / s2_2, res.inliers,
            iters=10, fix_scale=self.fix_scale)
        if int(ref.n_inliers) < 20:
            return None
        return ref.R, ref.t, ref.s, int(ref.n_inliers)

    # -- correction -----------------------------------------------------
    def correct(self, m: MapState, kf: int, cand: int, S12) -> MapState:
        """Loop correction: Sim3-consistent pose update of the current
        covisibility group, landmark correction via reference keyframes,
        essential-graph optimization, bounded global BA."""
        R12, t12, s12, _ = S12
        K = m.kf_R.shape[0]
        # corrected current pose: T_cur<-w = S12 * T_cand<-w  (cand frame
        # mapped into cur camera), i.e. S_cur_w_corr = S12 o T_cand_w
        Rc, tc, sc = sim3.compose(
            R12, t12, jnp.asarray(s12),
            m.kf_R[cand], m.kf_t[cand], jnp.ones(()))
        # correction transform in world: G = S_cur_w_corr^-1 o T_cur_w
        # applied to the current covisibility group's poses/landmarks
        Rg, tg, sg = sim3.compose(
            *sim3.inverse(Rc, tc, sc), m.kf_R[kf], m.kf_t[kf], jnp.ones(()))
        # G maps old-world -> corrected-world?  S_kf_w_corr = S_kf_w o G^-1
        Rgi, tgi, sgi = sim3.inverse(Rg, tg, sg)
        w = np.asarray(covisibility_weights(m, jnp.int32(kf)))
        group = [int(j) for j in np.where(w > 0)[0]] + [kf]
        group_mask = np.zeros(K, bool)
        group_mask[group] = True
        gm = jnp.asarray(group_mask)
        # corrected poses: T_i_w o G^-1 (as Sim3, scale folded into t)
        Ri, ti, si = sim3.compose(
            m.kf_R, m.kf_t, jnp.ones(K), *(jnp.broadcast_to(Rgi, (K, 3, 3)),
                                           jnp.broadcast_to(tgi, (K, 3)),
                                           jnp.broadcast_to(sgi, (K,))))
        # convert Sim3 poses (R, t, s) back to SE3 with scale absorbed:
        # x_cam = s R x + t  ->  SE3 with R, t/s is the reference's recovery
        kf_R = jnp.where(gm[:, None, None], Ri, m.kf_R)
        kf_t = jnp.where(gm[:, None], ti / jnp.clip(si, 1e-9, None)[:, None], m.kf_t)
        # landmarks observed by the group: correct via old->new world map G
        lm_ref_in_group = gm[jnp.clip(m.lm_ref_kf, 0, K - 1)] & m.lm_valid
        pw_corr = sim3.transform(Rg, tg, sg, m.lm_pw)
        lm_pw = jnp.where(lm_ref_in_group[:, None], pw_corr, m.lm_pw)
        m = m._replace(kf_R=kf_R, kf_t=kf_t, lm_pw=lm_pw)

        # --- essential-graph optimization over all keyframes ---
        valid_kf = np.asarray(m.kf_valid)
        n_valid = int(valid_kf.sum())
        if n_valid >= 4:
            m = self._essential_graph(m, kf, cand)
        # --- bounded global BA (reference: GBA 10 iters) ---
        m = self._global_ba(m)
        m = rebuild_observations(m)
        self.last_loop_kf = kf
        self.n_loops_closed += 1
        return m

    def _essential_graph(self, m: MapState, kf: int, cand: int) -> MapState:
        K = m.kf_R.shape[0]
        # edges: covisibility pairs with weight >= 15 + the loop edge; all
        # measured from current (post-propagation) relative poses
        W = np.array(covisibility_matrix(m))  # writable copy
        W[~np.asarray(m.kf_valid)] = 0
        pairs = [(i, j) for i in range(K) for j in range(i + 1, K)
                 if W[i, j] >= 15]
        if (kf, cand) not in pairs and (cand, kf) not in pairs:
            pairs.append((min(kf, cand), max(kf, cand)))
        e_i = jnp.asarray([p[0] for p in pairs], jnp.int32)
        e_j = jnp.asarray([p[1] for p in pairs], jnp.int32)
        Ri, ti = m.kf_R[e_i], m.kf_t[e_i]
        Rj, tj = m.kf_R[e_j], m.kf_t[e_j]
        iRi, iti = se3.inverse(Ri, ti)
        mR, mt = se3.compose(Rj, tj, iRi, iti)
        ms = jnp.ones(len(pairs))
        fixed = np.zeros(K, bool)
        fixed[cand] = True  # reference fixes the loop keyframe (:891)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            m.kf_R, m.kf_t, jnp.ones(K), e_i, e_j, mR, mt, ms,
            jnp.ones(len(pairs), bool), jnp.asarray(fixed))
        res = pose_graph.optimize_pose_graph(
            prob, iters=20, fix_scale=self.fix_scale)
        # re-map landmarks through their reference keyframe's correction
        ref = jnp.clip(m.lm_ref_kf, 0, K - 1)
        R_old, t_old = m.kf_R[ref], m.kf_t[ref]
        R_new = res.R[ref]
        t_new = res.t[ref] / jnp.clip(res.s[ref], 1e-9, None)[:, None]
        Xc = se3.transform(R_old, t_old, m.lm_pw)
        iRn, itn = se3.inverse(R_new, t_new)
        pw = se3.transform(iRn, itn, Xc)
        lm_pw = jnp.where(m.lm_valid[:, None], pw, m.lm_pw)
        kf_t_new = res.t / jnp.clip(res.s, 1e-9, None)[:, None]
        return m._replace(kf_R=res.R, kf_t=kf_t_new, lm_pw=lm_pw)

    def _global_ba(self, m: MapState, iters: int = 10) -> MapState:
        from ..matching.search import INV_SIGMA2
        obs_valid = m.lm_obs_kf >= 0
        kf_idx = jnp.clip(m.lm_obs_kf, 0)
        feat_idx = m.lm_obs_feat
        uv = m.kf_xy[kf_idx, feat_idx]
        ur = m.kf_ur[kf_idx, feat_idx]
        uvr = jnp.concatenate([uv, ur[..., None]], axis=-1)
        octv = m.kf_octave[kf_idx, feat_idx]
        wgt = jnp.where(obs_valid & m.lm_valid[:, None], msearch.inv_sigma2_at(octv), 0.0)
        fixed = jnp.zeros(m.kf_R.shape[0], bool).at[0].set(True)
        fixed = fixed | ~m.kf_valid
        prob = ba.BAProblem(m.kf_R, m.kf_t, m.lm_pw, kf_idx, uvr, wgt,
                            fixed, m.lm_valid)
        res = ba.ba_solve(self.cam, prob, iters=iters, robust=True)
        return m._replace(kf_R=res.R, kf_t=res.t, lm_pw=res.X)

    # -- entry ----------------------------------------------------------
    def process(self, m: MapState, kf: int) -> MapState:
        """Run detection -> Sim3 -> correction for a new keyframe."""
        cand = self.detect(m, kf)
        if cand is None:
            return m
        S12 = self.compute_sim3(m, kf, cand)
        if S12 is None:
            return m
        return self.correct(m, kf, cand, S12)

    # -- split entry: device submit now, host gating later ---------------
    def begin(self, m: MapState, kf: int):
        """Submit the detection device program and start the async
        device->host copy; returns an opaque handle for finish().

        Forcing detection results synchronously at keyframe insertion
        stalled the host on the whole device queue (keyframe maintenance
        ~100 ms was just enqueued); the reference's LoopClosing thread is
        likewise asynchronous to Tracking (LoopClosing.cc:57-90)."""
        if kf - self.last_loop_kf < self.min_gap:
            self.prev_groups = []
            return None
        W_dev, s_dev = self._detect_dev(m, self.db.bow, jnp.int32(kf))
        try:
            W_dev.copy_to_host_async()
            s_dev.copy_to_host_async()
        except Exception:
            pass
        return (kf, W_dev, s_dev)

    def finish(self, m: MapState, handle) -> MapState | None:
        """Complete a begin(): host-side gating + consistency; on a
        confirmed candidate runs Sim3 + correction. Returns the corrected
        map, or None when no loop closed."""
        if handle is None:
            return None
        kf, W_dev, s_dev = handle
        W = np.asarray(W_dev)
        s_all = np.asarray(s_dev)
        covis = np.where(W[kf] > 0)[0]
        min_score = max(float(min([s_all[int(j)] for j in covis],
                                  default=0.5)), 0.0)
        candidates = self.db.detect_loop_candidates(
            m, kf, min_score, covis=W, scores=s_all)
        cand = self._consistency(W, candidates)
        if cand is None:
            return None
        S12 = self.compute_sim3(m, kf, cand)
        if S12 is None:
            return None
        return self.correct(m, kf, cand, S12)

    def _consistency(self, W: np.ndarray, candidates: list[int]) -> int | None:
        """Covisibility-consistency over consecutive keyframes
        (reference: LoopClosing.cc:164-244, mnCovisibilityConsistencyTh=3)."""
        if not candidates:
            self.prev_groups = []
            return None
        new_groups: list[tuple[set[int], int]] = []
        enough: list[int] = []
        for c in candidates:
            group = {int(j) for j in np.where(W[c] > 0)[0]} | {c}
            count = 0
            for prev_set, prev_count in self.prev_groups:
                if group & prev_set:
                    count = max(count, prev_count + 1)
            new_groups.append((group, count))
            if count + 1 >= self.consistency_th:
                enough.append(c)
        self.prev_groups = new_groups
        return enough[0] if enough else None
