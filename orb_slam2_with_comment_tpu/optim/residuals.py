"""Reprojection residuals + analytic Jacobians, shared by all optimizers.

Unified mono/stereo observation format: every observation is a triplet
``(u, v, u_r)``; ``u_r < 0`` marks a mono observation (third residual row
masked out). This mirrors the reference's per-feature mono/stereo edge
distinction (reference: Optimizer.cc:130,306,624 — mvuRight[i] < 0 means a
2D mono edge even in stereo mode) while keeping one static shape for vmap.

Pose update convention: left-multiplicative se(3)/sim(3) exp, matching
geometry.se3.retract — Jacobians below are with respect to that update,
the same structure as the reference's analytic g2o Jacobians
(reference: Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp).

Residual sign: e = observation - projection (as g2o edges compute it).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3

# Huber deltas: sqrt of the chi2 95% quantiles used everywhere in the
# reference (Optimizer.cc:95-96): 2-dof for mono, 3-dof for stereo edges.
CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = CHI2_MONO ** 0.5
HUBER_STEREO = CHI2_STEREO ** 0.5


class CamParams(NamedTuple):
    """Static per-problem camera intrinsics (fx, fy, cx, cy, bf)."""
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    bf: jax.Array


def project_uvr(cam: CamParams, Xc: jax.Array) -> jax.Array:
    """Camera-frame point [..., 3] -> (u, v, u_r) [..., 3]."""
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] * inv_z + cam.cx
    v = cam.fy * Xc[..., 1] * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    return jnp.stack([u, v, ur], axis=-1)


def residual_weight_rows(obs_uvr: jax.Array) -> jax.Array:
    """Per-row residual mask [..., 3]: (1, 1, 1) stereo, (1, 1, 0) mono."""
    is_stereo = obs_uvr[..., 2] >= 0
    ones = jnp.ones_like(obs_uvr[..., 0])
    return jnp.stack([ones, ones, is_stereo.astype(obs_uvr.dtype)], axis=-1)


def reproj_residual(cam: CamParams, R, t, Xw, obs_uvr):
    """e = obs - proj(R Xw + t), mono rows masked. Broadcasts over batch.

    Returns (residual [...,3], Xc [...,3], row_mask [...,3]).
    """
    Xc = jnp.einsum("...ij,...j->...i", R, Xw) + t
    pred = project_uvr(cam, Xc)
    rows = residual_weight_rows(obs_uvr)
    e = (obs_uvr - pred) * rows
    return e, Xc, rows


def dproj_dXc(cam: CamParams, Xc: jax.Array) -> jax.Array:
    """Jacobian of (u, v, u_r) wrt the camera-frame point [..., 3, 3]."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    row_ur = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2 + cam.bf * iz2], axis=-1)
    return jnp.stack([row_u, row_v, row_ur], axis=-2)


def reproj_jacobians(cam: CamParams, R, t, Xw, obs_uvr):
    """Residual + analytic Jacobians wrt pose twist (left-mult) and point.

    Returns (e [...,3], J_pose [...,3,6], J_point [...,3,3]).
    J rows for mono observations are masked to zero.
    d e / d xi = -dproj/dXc @ [I | -hat(Xc)];  d e / d Xw = -dproj/dXc @ R.
    """
    e, Xc, rows = reproj_residual(cam, R, t, Xw, obs_uvr)
    Jproj = dproj_dXc(cam, Xc)  # [..., 3, 3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Jproj.shape)
    dXc_dxi = jnp.concatenate([eye, -se3.hat(Xc)], axis=-1)  # [..., 3, 6]
    J_pose = -(Jproj @ dXc_dxi) * rows[..., None]
    J_point = -(Jproj @ R) * rows[..., None]
    return e, J_pose, J_point


def huber_weight(chi2: jax.Array, delta: jax.Array) -> jax.Array:
    """IRLS weight for the Huber kernel: 1 inside, delta/|e| outside.

    chi2 here is the weighted squared error (e^T Omega e), delta the kernel
    width in the same units (reference: g2o robust_kernel_impl Huber).
    """
    abs_e = jnp.sqrt(jnp.clip(chi2, 1e-12, None))
    return jnp.where(abs_e <= delta, 1.0, delta / abs_e)
