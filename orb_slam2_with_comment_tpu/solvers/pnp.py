"""EPnP + RANSAC pose solver for relocalization.

TPU-native rebuild of the reference's PnPsolver (reference:
PnPsolver.cc:67-352 — EPnP control points + adaptive RANSAC with per-level
chi2 gating). Hypotheses are vmapped: each RANSAC sample solves EPnP on its
minimal set in one batched pipeline (control points -> barycentric ->
M-matrix null space -> scale -> Horn alignment), and all hypotheses are
scored against all correspondences at once. The winner's inliers feed the
pose-only optimizer (as the reference feeds PoseOptimization after
relocalization, Tracking.cc:1676).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import horn

CHI2_PNP = 5.991


class PnPResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inliers: jax.Array  # [N]
    n_inliers: jax.Array


def _epnp_minimal(Xw: jax.Array, uv: jax.Array, K) -> tuple[jax.Array, jax.Array]:
    """EPnP (single-beta case) on one sample set [M, 3] / [M, 2].

    Control points: centroid + PCA axes (reference: choose_control_points,
    PnPsolver.cc:388). The camera-frame control points come from the right
    null vector of the 2M x 12 M-matrix; the sign/scale ambiguity resolves
    via inter-control-point distances + positive depth; the final pose by
    Horn alignment of world/camera control points (compute_R_and_t).
    """
    fx, fy, cx, cy = K
    M_pts = Xw.shape[0]
    c0 = jnp.mean(Xw, axis=0)
    Xc0 = Xw - c0
    cov = Xc0.T @ Xc0 / M_pts
    evals, evecs = jnp.linalg.eigh(cov)
    # control points: centroid +- principal axes scaled by sqrt(eigenvalue)
    axes = evecs.T * jnp.sqrt(jnp.clip(evals, 1e-9, None))[:, None]  # [3,3]
    ctrl_w = jnp.concatenate([c0[None], c0[None] + axes], axis=0)  # [4, 3]
    # barycentric coordinates: Xw = sum_j alpha_j ctrl_w[j], sum alpha = 1
    Cmat = jnp.concatenate([ctrl_w.T, jnp.ones((1, 4))], axis=0)  # [4,4]
    Xh = jnp.concatenate([Xw.T, jnp.ones((1, M_pts))], axis=0)  # [4,M]
    alpha = jnp.linalg.solve(Cmat, Xh).T  # [M, 4]
    # M matrix (2M x 12)
    u = uv[:, 0]
    v = uv[:, 1]
    rows = []
    zeros = jnp.zeros_like(alpha)
    row_u = jnp.concatenate(
        [alpha * fx, zeros, alpha * (cx - u)[:, None]], axis=1)  # [M, 12]
    row_v = jnp.concatenate(
        [zeros, alpha * fy, alpha * (cy - v)[:, None]], axis=1)
    Mm = jnp.concatenate([row_u, row_v], axis=0)  # [2M, 12]
    # column layout: [a_j*fx -> x_j], [a_j*fy -> y_j], [a_j*(c-u) -> z_j]
    # reorder to per-control-point (x_j, y_j, z_j):
    perm = jnp.asarray([0, 4, 8, 1, 5, 9, 2, 6, 10, 3, 7, 11])
    Mm = Mm[:, perm]
    MtM = Mm.T @ Mm
    _, V = jnp.linalg.eigh(MtM)
    vnull = V[:, 0].reshape(4, 3)  # camera-frame control points up to scale
    # scale from distance ratios world vs camera
    dw = jnp.linalg.norm(ctrl_w[1:] - ctrl_w[0], axis=1)
    dc = jnp.linalg.norm(vnull[1:] - vnull[0], axis=1)
    beta = jnp.sum(dw * dc) / jnp.clip(jnp.sum(dc * dc), 1e-12, None)
    ctrl_c = beta * vnull
    # positive depth: points should have z > 0
    Xc_est = alpha @ ctrl_c
    flip = jnp.sum(Xc_est[:, 2]) < 0
    ctrl_c = jnp.where(flip, -ctrl_c, ctrl_c)
    # pose from control-point alignment (rigid, no scale)
    R, t, _ = horn.solve(ctrl_c[None], ctrl_w[None], with_scale=False)
    return R[0], t[0]


def solve_ransac(
    key: jax.Array,
    K,
    Xw: jax.Array,  # [N, 3] world landmarks
    uv: jax.Array,  # [N, 2] observations
    sigma2: jax.Array,  # [N] level sigma^2
    valid: jax.Array,
    max_iters: int = 300,
    sample_size: int = 6,
    min_inliers: int = 10,
) -> PnPResult:
    """Batched EPnP RANSAC (reference SetRansacParameters defaults:
    P=0.99, minInliers=10, maxIts=300; PnPsolver.cc:121-157)."""
    N = Xw.shape[0]
    fx, fy, cx, cy = K
    nv = jnp.sum(valid.astype(jnp.int32))
    probs = valid.astype(jnp.float32) / jnp.clip(nv, 1, None)
    idx = jax.random.categorical(
        key, jnp.log(jnp.clip(probs, 1e-12, None))[None, :]
        .repeat(max_iters * sample_size, 0)).reshape(max_iters, sample_size)

    def one(sample_idx):
        return _epnp_minimal(Xw[sample_idx], uv[sample_idx], K)

    R, t = jax.vmap(one)(idx)  # [T,3,3], [T,3]
    Xc = jnp.einsum("tij,nj->tni", R, Xw) + t[:, None, :]
    z = jnp.clip(Xc[..., 2], 1e-6, None)
    pu = fx * Xc[..., 0] / z + cx
    pv = fy * Xc[..., 1] / z + cy
    e2 = (pu - uv[None, :, 0]) ** 2 + (pv - uv[None, :, 1]) ** 2
    chi2 = e2 / jnp.clip(sigma2, 1e-9, None)[None]
    inlier = (chi2 < CHI2_PNP) & (Xc[..., 2] > 0) & valid[None]
    counts = jnp.sum(inlier.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts)
    ok = counts[best] >= min_inliers
    return PnPResult(R[best], t[best], inlier[best] & ok,
                     jnp.where(ok, counts[best], 0))
