"""Camera projection models (pinhole mono + stereo-with-baseline).

Replaces the reference's scattered fx/fy/cx/cy/bf member usage
(reference: Frame.cc:274-342 isInFrustum, Frame.cc:701-715 UnprojectStereo,
Optimizer.cc projection edges) with one typed model usable inside jit.

Stereo observations are (uL, vL, uR) triplets exactly as the reference's
3D stereo edges: uR = uL - bf / depth (reference: Frame.cc:655,
types_six_dof_expmap stereo projection).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # radial-tangential distortion (k1, k2, p1, p2, k3); zeros = none
    dist: jax.Array
    width: int
    height: int

    @staticmethod
    def create(fx, fy, cx, cy, dist=None, width=640, height=480):
        dist = jnp.zeros(5, jnp.float32) if dist is None else jnp.asarray(dist, jnp.float32)
        if dist.shape[0] < 5:
            dist = jnp.concatenate([dist, jnp.zeros(5 - dist.shape[0], jnp.float32)])
        return PinholeCamera(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy),
            dist, int(width), int(height),
        )

    @property
    def K(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]], jnp.float32
        )

    def project(self, Xc: jax.Array) -> jax.Array:
        """Camera-frame points [..., 3] -> pixel coords [..., 2] (no distortion:
        feature pipelines undistort keypoints once instead, as the reference
        does in Frame::UndistortKeyPoints)."""
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = self.fx * Xc[..., 0] * inv_z + self.cx
        v = self.fy * Xc[..., 1] * inv_z + self.cy
        return jnp.stack([u, v], axis=-1)

    def backproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        """Pixels [..., 2] + depth [...] -> camera-frame points [..., 3]."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x * depth, y * depth, depth], axis=-1)

    def distort_normalized(self, xy: jax.Array) -> jax.Array:
        """Apply radtan distortion to normalized coords [..., 2]."""
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], axis=-1)

    def undistort_points(self, uv: jax.Array, iters: int = 8) -> jax.Array:
        """Iterative undistortion of pixel coords (OpenCV-undistortPoints-style
        fixed-point iteration; reference behavior: Frame.cc:434-469). Returns
        undistorted pixel coords under the same K."""
        x0 = (uv[..., 0] - self.cx) / self.fx
        y0 = (uv[..., 1] - self.cy) / self.fy
        xy0 = jnp.stack([x0, y0], axis=-1)

        def body(_, xy):
            d = self.distort_normalized(xy) - xy
            return xy0 - d

        xy = jax.lax.fori_loop(0, iters, body, xy0)
        u = xy[..., 0] * self.fx + self.cx
        v = xy[..., 1] * self.fy + self.cy
        return jnp.stack([u, v], axis=-1)


class StereoCamera(NamedTuple):
    cam: PinholeCamera
    bf: jax.Array  # baseline * fx, as in the reference's Camera.bf

    @staticmethod
    def create(cam: PinholeCamera, bf) -> "StereoCamera":
        return StereoCamera(cam, jnp.float32(bf))

    @property
    def baseline(self) -> jax.Array:
        return self.bf / self.cam.fx

    def project_stereo(self, Xc: jax.Array) -> jax.Array:
        """Camera-frame points [..., 3] -> (uL, vL, uR) [..., 3]."""
        uv = self.cam.project(Xc)
        z = Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ur = uv[..., 0] - self.bf * inv_z
        return jnp.concatenate([uv, ur[..., None]], axis=-1)

    def depth_from_disparity(self, disparity: jax.Array) -> jax.Array:
        return self.bf / jnp.where(jnp.abs(disparity) < 1e-9, 1e-9, disparity)
