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


def _eval_chi2(cam, prob: BAProblem, R, t, X):
    Rp = R[prob.obs_pose]
    tp = t[prob.obs_pose]
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

    def iteration(carry, _):
        R, t, X, lam = carry
        Rp = R[prob.obs_pose]  # [L, D, 3, 3]
        tp = t[prob.obs_pose]
        e, Jp, Jl = reproj_jacobians(cam, Rp, tp, X[:, None, :], prob.obs_uvr)
        chi2_i = jnp.sum(e * e, axis=-1) * prob.obs_w
        w_rob = huber_weight(chi2_i, delta_h) if robust else jnp.ones_like(chi2_i)
        w = jnp.where(active, prob.obs_w * w_rob, 0.0)  # [L, D]
        # Zero pose-Jacobians of fixed poses (their twists never move).
        Jp = Jp * free_pose[prob.obs_pose].astype(Jp.dtype)[..., None, None]

        # --- Hessian blocks ---
        wJp = w[..., None, None] * Jp  # weight folded once
        Hll = jnp.einsum("ldri,ldrj->lij", w[..., None, None] * Jl, Jl)  # [L,3,3]
        bl = jnp.einsum("ldri,ldr->li", w[..., None, None] * Jl, e)  # [L,3]
        Y = jnp.einsum("ldri,ldrj->ldij", wJp, Jl)  # [L,D,6,3] = Hpl blocks
        flat_pose = prob.obs_pose.reshape(-1)
        Hpp_blocks = jnp.einsum("ldri,ldrj->ldij", wJp, Jp).reshape(-1, 6, 6)
        Hpp = jax.ops.segment_sum(Hpp_blocks, flat_pose, num_segments=P)
        bp_blocks = jnp.einsum("ldri,ldr->ldi", wJp, e).reshape(-1, 6)
        bp = jax.ops.segment_sum(bp_blocks, flat_pose, num_segments=P)

        # --- damping (multiplicative on the diagonal, floors for rank safety) ---
        def damp(Hblk, eps):
            diag = jnp.clip(jnp.diagonal(Hblk, axis1=-2, axis2=-1), eps, None)
            return Hblk + lam * jax.vmap(jnp.diag)(diag.reshape(-1, diag.shape[-1])).reshape(Hblk.shape)

        Hll_d = damp(Hll, 1e-6)
        # Invalid landmarks: identity block so the solve stays well-posed.
        eye3 = jnp.eye(3, dtype=Hll.dtype)
        Hll_d = jnp.where(prob.point_valid[:, None, None], Hll_d, eye3)
        Hll_inv = jnp.linalg.inv(Hll_d)  # [L,3,3] batched

        # --- Schur complement ---
        # S[p,q] -= sum_l sum_{d,d'} Y[l,d] Hll_inv[l] Y[l,d']^T
        YHinv = jnp.einsum("ldij,ljk->ldik", Y, Hll_inv)  # [L,D,6,3]
        pair_blocks = jnp.einsum("ldik,lcjk->ldcij", YHinv, Y)  # [L,D,D,6,6]
        pair_idx = (prob.obs_pose[:, :, None] * P + prob.obs_pose[:, None, :]).reshape(-1)
        S_off = jax.ops.segment_sum(
            pair_blocks.reshape(-1, 6, 6), pair_idx, num_segments=P * P
        ).reshape(P, P, 6, 6)
        Hpp_d = damp(Hpp, 1e-6)
        S = -S_off
        S = S.at[jnp.arange(P), jnp.arange(P)].add(Hpp_d)
        b_corr = jax.ops.segment_sum(
            jnp.einsum("ldik,lk->ldi", YHinv, bl).reshape(-1, 6), flat_pose, num_segments=P
        )
        b_s = bp - b_corr

        # Fixed poses: identity row/col, zero rhs.
        fixed = prob.pose_fixed
        eye6 = jnp.eye(6, dtype=S.dtype)
        keep = (free_pose[:, None] & free_pose[None, :]).astype(S.dtype)[..., None, None]
        S = S * keep
        S = S.at[jnp.arange(P), jnp.arange(P)].set(
            jnp.where(fixed[:, None, None], eye6, S[jnp.arange(P), jnp.arange(P)])
        )
        b_s = jnp.where(fixed[:, None], 0.0, b_s)

        # --- dense reduced solve (MXU) ---
        S_mat = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        dxi = -jnp.linalg.solve(S_mat, b_s.reshape(P * 6)).reshape(P, 6)

        # --- back-substitute landmarks ---
        # Hll dXl = -(bl + sum_d Y^T dxi_pose)
        Yt_dxi = jnp.einsum("ldij,ldi->lj", Y, dxi[prob.obs_pose])
        dX = -jnp.einsum("lij,lj->li", Hll_inv, bl + Yt_dxi)
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
    obs_chi2 = _eval_chi2(cam, prob, R, t, X)
    return BAResult(R, t, X, jnp.sum(obs_chi2), obs_chi2)
