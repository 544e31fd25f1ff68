"""Sim(3) operations for loop closing / essential-graph optimization.

A Sim3 element is (R [...,3,3], t [...,3], s [...]): x -> s * R x + t.
Exp-map update convention matches the SE3 module (left multiplication),
mirroring the semantics of the reference's 7-DoF loop-closure vertices
(reference: g2o VertexSim3Expmap / sim3.h, used by Optimizer.cc:829-1118).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def identity(batch_shape=(), dtype=jnp.float32):
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype)
    s = jnp.ones(batch_shape, dtype)
    return R, t, s


def transform(R, t, s, X):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


def compose(Ra, ta, sa, Rb, tb, sb):
    """(a * b): apply b first then a. s = sa sb, R = Ra Rb, t = sa Ra tb + ta."""
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    s = sa * sb
    return R, t, s


def inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    return Rt, t_inv, s_inv


def exp(xi: jax.Array):
    """sim(3) exp: xi = [rho(3), phi(3), sigma(1)] [..., 7] -> (R, t, s).

    Uses the closed-form W matrix (generalization of the SO3 left Jacobian
    with scale); Taylor-guarded for small angle/scale.
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = se3.exp_so3(phi)
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-16)
    W = _sim3_W(phi, sigma, s, theta)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return R, t, s


def _sim3_W(phi, sigma, s, theta):
    """W matrix st. t = W rho (Strasdat's thesis, eq. for sim3 exp)."""
    dtype = phi.dtype
    Phi = se3.hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    sigma2 = sigma * sigma
    theta2 = theta * theta
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    # A = (s sin th ... ) coefficients, with the four-way small-value guards.
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    # Coefficient C = (s - 1)/sigma, -> 1 as sigma -> 0
    C = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))
    denom = sigma2 + theta2
    denom = jnp.where(denom < 1e-12, 1.0, denom)
    # Generic A, B (sigma != 0, theta != 0):
    A_gen = (s * sin_t * sigma + (1.0 - s * cos_t) * theta) / (denom * theta.clip(1e-12))
    B_gen = (C - ((s * cos_t - 1.0) * sigma + s * sin_t * theta) / denom) / theta2.clip(1e-12)
    # sigma -> 0 limits:
    A_s0 = (1.0 - cos_t) / theta2.clip(1e-12)
    B_s0 = (theta - sin_t) / (theta2 * theta).clip(1e-12)
    # theta -> 0 limits (sigma != 0):
    A_t0 = jnp.where(
        small_sigma, 0.5, ((sigma - 1.0) * s + 1.0) / jnp.where(small_sigma, 1.0, sigma2)
    )
    B_t0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s * (0.5 * sigma2 - sigma + 1.0) - 1.0) / jnp.where(small_sigma, 1.0, sigma2 * sigma),
    )
    A = jnp.where(small_theta, A_t0, jnp.where(small_sigma, A_s0, A_gen))
    B = jnp.where(small_theta, B_t0, jnp.where(small_sigma, B_s0, B_gen))
    return C[..., None, None] * eye + A[..., None, None] * Phi + B[..., None, None] * Phi2


def log(R, t, s):
    """Inverse of exp: (R, t, s) -> [..., 7]."""
    phi = se3.log_so3(R)
    sigma = jnp.log(s)
    theta = jnp.linalg.norm(phi, axis=-1)
    W = _sim3_W(phi, sigma, s, theta)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def retract(R, t, s, xi):
    """Left-multiplicative update exp(xi) * (R, t, s)."""
    dR, dt, ds = exp(xi)
    return compose(dR, dt, ds, R, t, s)
