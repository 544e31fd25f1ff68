"""Batched Levenberg-Marquardt bundle adjustment with Schur complement.

TPU-native replacement for the reference's g2o-based local/global BA
(reference: Optimizer.cc:56-255 BundleAdjustment, Optimizer.cc:483-808
LocalBundleAdjustment; solver internals: Thirdparty/g2o block_solver.h —
landmark marginalization via setMarginalized(true) + reduced camera system).

Design (SURVEY.md §7.4): one batched LM engine over a fixed-shape,
landmark-major observation table:

  poses      R [P,3,3], t [P,3]   world->camera
  landmarks  X [L,3]
  obs        pose_idx [L,D] int32, uvr [L,D,3], w [L,D] (invSigma2; 0=absent)

Each LM iteration is one XLA program: residuals/Jacobians batched over the
[L,D] table, H_ll inverted as [L] 3x3 blocks, the reduced camera system
S = H_pp - H_pl H_ll^-1 H_lp assembled densely by segment-sum of [6,6]
blocks (pose-pair coupling through shared landmarks is a (d,d') outer loop
over the D observation slots), and solved with a dense Cholesky — the MXU
path. Fixed poses (gauge / frontier keyframes, reference: Optimizer.cc:89,
519-534) get identity rows in S. Huber IRLS weights implement the robust
kernel (reference: g2o robust_kernel_impl + Optimizer.cc:95-96).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from .residuals import (
    CHI2_MONO,
    CHI2_STEREO,
    CamParams,
    HUBER_MONO,
    HUBER_STEREO,
    huber_weight,
    reproj_jacobians,
    reproj_residual,
)


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. P poses, L landmarks, D observation slots."""

    R: jax.Array  # [P, 3, 3]
    t: jax.Array  # [P, 3]
    X: jax.Array  # [L, 3]
    obs_pose: jax.Array  # [L, D] int32, pose index (0 where invalid)
    obs_uvr: jax.Array  # [L, D, 3]; uvr[...,2] < 0 => mono observation
    obs_w: jax.Array  # [L, D] invSigma2 information scale; 0 => absent
    pose_fixed: jax.Array  # [P] bool
    point_valid: jax.Array  # [L] bool


class BAResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    X: jax.Array
    chi2: jax.Array  # final total weighted chi2
    obs_chi2: jax.Array  # [L, D] per-observation chi2 (for outlier culling)


def _inv3x3(M: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (adjugate / det) — elementwise VPU
    work instead of the batched-LU custom call."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    Dd = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    Ii = a * e - b * d
    det = a * A + b * Dd + c * G
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([Dd, E, F], axis=-1),
        jnp.stack([G, H, Ii], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def _eval_chi2(cam, prob: BAProblem, R, t, X):
    hi = jax.lax.Precision.HIGHEST
    P = R.shape[0]
    G = (prob.obs_pose[:, :, None]
         == jnp.arange(P, dtype=jnp.int32)[None, None, :]).astype(jnp.float32)
    Rp = jnp.einsum("ldp,pij->ldij", G, R, precision=hi)
    tp = jnp.einsum("ldp,pi->ldi", G, t, precision=hi)
    e, _, _ = reproj_residual(cam, Rp, tp, X[:, None, :], prob.obs_uvr)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    active = (prob.obs_w > 0) & prob.point_valid[:, None]
    return jnp.where(active, chi2, 0.0)


def ba_solve(
    cam: CamParams,
    prob: BAProblem,
    iters: int = 10,
    robust: bool = True,
    init_lambda: float = 1e-4,
) -> BAResult:
    """Run `iters` bounded LM iterations (reference interruption semantics —
    mbAbortBA — become 'call with fewer iters per chunk', SURVEY §2.5 P6)."""
    P = prob.R.shape[0]
    L, D = prob.obs_w.shape
    is_stereo = prob.obs_uvr[..., 2] >= 0
    delta_h = jnp.where(is_stereo, HUBER_STEREO, HUBER_MONO)
    active = (prob.obs_w > 0) & prob.point_valid[:, None]
    free_pose = ~prob.pose_fixed
    hi = jax.lax.Precision.HIGHEST
    # One-hot observation->pose assignment [L, D, P]: every gather/scatter
    # over the pose axis becomes a matmul (TPU has no hardware gather; XLA
    # scatter lowering serializes — both were the dominant cost here).
    G = (prob.obs_pose[:, :, None]
         == jnp.arange(P, dtype=jnp.int32)[None, None, :]).astype(jnp.float32)
    eyeP = jnp.eye(P, dtype=jnp.float32)

    def iteration(carry, _):
        R, t, X, lam = carry
        Rp = jnp.einsum("ldp,pij->ldij", G, R, precision=hi)  # [L,D,3,3]
        tp = jnp.einsum("ldp,pi->ldi", G, t, precision=hi)
        e, Jp, Jl = reproj_jacobians(cam, Rp, tp, X[:, None, :], prob.obs_uvr)
        chi2_i = jnp.sum(e * e, axis=-1) * prob.obs_w
        w_rob = huber_weight(chi2_i, delta_h) if robust else jnp.ones_like(chi2_i)
        w = jnp.where(active, prob.obs_w * w_rob, 0.0)  # [L, D]
        # Zero pose-Jacobians of fixed poses (their twists never move).
        free_obs = jnp.einsum("ldp,p->ld", G, free_pose.astype(jnp.float32),
                              precision=hi)
        Jp = Jp * free_obs[..., None, None]

        # --- Hessian blocks ---
        wJp = w[..., None, None] * Jp  # weight folded once
        Hll = jnp.einsum("ldri,ldrj->lij", w[..., None, None] * Jl, Jl,
                         precision=hi)  # [L,3,3]
        bl = jnp.einsum("ldri,ldr->li", w[..., None, None] * Jl, e,
                        precision=hi)  # [L,3]
        Y = jnp.einsum("ldri,ldrj->ldij", wJp, Jl, precision=hi)  # [L,D,6,3]
        Hpp_blocks = jnp.einsum("ldri,ldrj->ldij", wJp, Jp, precision=hi)
        Hpp = jnp.einsum("ldp,ldij->pij", G, Hpp_blocks, precision=hi)
        bp = jnp.einsum("ldp,ldri,ldr->pi", G, wJp, e, precision=hi)

        # --- damping (multiplicative on the diagonal, floors for rank safety) ---
        def damp(Hblk, eps):
            diag = jnp.clip(jnp.diagonal(Hblk, axis1=-2, axis2=-1), eps, None)
            return Hblk + lam * jax.vmap(jnp.diag)(diag.reshape(-1, diag.shape[-1])).reshape(Hblk.shape)

        Hll_d = damp(Hll, 1e-6)
        # Invalid landmarks: identity block so the solve stays well-posed.
        eye3 = jnp.eye(3, dtype=Hll.dtype)
        Hll_d = jnp.where(prob.point_valid[:, None, None], Hll_d, eye3)
        Hll_inv = _inv3x3(Hll_d)  # [L,3,3] closed-form batched inverse

        # --- Schur complement ---
        # S[p,q] -= sum_l sum_{d,d'} Y[l,d] Hll_inv[l] Y[l,d']^T. The pair
        # sum FACTORIZES through the one-hot G: with A[l,p] = sum_d
        # G[l,d,p] YHinv[l,d] and B[l,q] = sum_c G[l,c,q] Y[l,c],
        # S_off = sum_l A[l,p] B[l,q]^T — three GEMMs instead of a
        # [L*D*D] block scatter.
        YHinv = jnp.einsum("ldij,ljk->ldik", Y, Hll_inv, precision=hi)
        A = jnp.einsum("ldp,ldik->lpik", G, YHinv, precision=hi)  # [L,P,6,3]
        B = jnp.einsum("ldp,ldjk->lpjk", G, Y, precision=hi)      # [L,P,6,3]
        S_off = jnp.einsum("lpik,lqjk->pqij", A, B, precision=hi)
        Hpp_d = damp(Hpp, 1e-6)
        S = -S_off + jnp.einsum("pq,pij->pqij", eyeP, Hpp_d, precision=hi)
        b_corr = jnp.einsum("ldp,ldik,lk->pi", G, YHinv, bl, precision=hi)
        b_s = bp - b_corr

        # Fixed poses: identity row/col, zero rhs.
        fixed = prob.pose_fixed
        eye6 = jnp.eye(6, dtype=S.dtype)
        keep = (free_pose[:, None] & free_pose[None, :]).astype(S.dtype)[..., None, None]
        S = S * keep
        S = S + jnp.einsum("pq,pij->pqij", eyeP,
                           jnp.where(fixed[:, None, None], eye6,
                                     jnp.zeros_like(eye6)), precision=hi)
        b_s = jnp.where(fixed[:, None], 0.0, b_s)

        # --- dense reduced solve (MXU) ---
        S_mat = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        dxi = -jnp.linalg.solve(S_mat, b_s.reshape(P * 6)).reshape(P, 6)

        # --- back-substitute landmarks ---
        # Hll dXl = -(bl + sum_d Y^T dxi_pose)
        dxi_obs = jnp.einsum("ldp,pi->ldi", G, dxi, precision=hi)
        Yt_dxi = jnp.einsum("ldij,ldi->lj", Y, dxi_obs, precision=hi)
        dX = -jnp.einsum("lij,lj->li", Hll_inv, bl + Yt_dxi, precision=hi)
        dX = jnp.where(prob.point_valid[:, None], dX, 0.0)

        # --- candidate + accept/reject ---
        R_new, t_new = se3.retract(R, t, dxi)
        X_new = X + dX
        chi2_old = jnp.sum(jnp.where(active, chi2_i, 0.0))
        chi2_new = jnp.sum(_eval_chi2(cam, prob, R_new, t_new, X_new))
        finite = jnp.all(jnp.isfinite(dxi)) & jnp.all(jnp.isfinite(dX))
        ok = (chi2_new < chi2_old) & finite
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        X = jnp.where(ok, X_new, X)
        lam = jnp.where(ok, lam * 0.5, lam * 5.0).clip(1e-9, 1e8)
        return (R, t, X, lam), chi2_old

    (R, t, X, _), chi2_hist = jax.lax.scan(
        iteration, (prob.R, prob.t, prob.X, jnp.float32(init_lambda)), None, length=iters
    )
    R = se3.orthonormalize(R)  # keyframe poses re-enter tracking chains
    obs_chi2 = _eval_chi2(cam, prob, R, t, X)
    return BAResult(R, t, X, jnp.sum(obs_chi2), obs_chi2)
