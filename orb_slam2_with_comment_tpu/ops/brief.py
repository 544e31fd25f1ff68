"""Rotated-BRIEF descriptor sampling, batched over keypoints.

TPU-native rebuild of the reference's computeOrbDescriptor (reference:
ORBextractor.cc:108-147): 256 intensity comparisons on the 7x7-Gaussian-
blurred image, sampling offsets rotated by the keypoint's IC angle with
rounded (nearest-pixel) coordinates, exactly the reference's
  row = round(px * sin + py * cos), col = round(px * cos - py * sin).
All 512 samples x N keypoints collapse into one flat gather. Descriptors
are packed 256 bits -> uint32[8]; bit k of word w is comparison 32*w + k,
set when I(p_a) < I(p_b).

The sampling pattern is the standard OpenCV ORB learned pattern, shipped as
data (frontend/data/brief_pattern.npy; reference: ORBextractor.cc:150-408).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

_PATTERN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "frontend", "data", "brief_pattern.npy",
)
# [256, 4] int8: (ax, ay, bx, by) per comparison
PATTERN = np.load(_PATTERN_PATH).astype(np.float32)
_PAT_AX = jnp.asarray(PATTERN[:, 0])
_PAT_AY = jnp.asarray(PATTERN[:, 1])
_PAT_BX = jnp.asarray(PATTERN[:, 2])
_PAT_BY = jnp.asarray(PATTERN[:, 3])


@jax.jit
def descriptors(blurred: jax.Array, yx: jax.Array, angle: jax.Array) -> jax.Array:
    """Compute ORB descriptors.

    Args:
      blurred: [H, W] Gaussian-blurred level image.
      yx: [N, 2] int keypoint coords (row, col) in level pixels.
      angle: [N] orientation in radians.
    Returns: [N, 8] uint32 packed descriptors.
    """
    h, w = blurred.shape
    ca = jnp.cos(angle)[:, None]  # [N, 1]
    sa = jnp.sin(angle)[:, None]

    def rot_rc(px, py):
        # reference: row offset = round(x sin + y cos), col = round(x cos - y sin)
        r = jnp.round(px[None, :] * sa + py[None, :] * ca)
        c = jnp.round(px[None, :] * ca - py[None, :] * sa)
        return r.astype(jnp.int32), c.astype(jnp.int32)

    ra, ca_ = rot_rc(_PAT_AX, _PAT_AY)  # [N, 256]
    rb, cb = rot_rc(_PAT_BX, _PAT_BY)
    y0 = yx[:, 0:1]
    x0 = yx[:, 1:2]
    ya = jnp.clip(y0 + ra, 0, h - 1)
    xa = jnp.clip(x0 + ca_, 0, w - 1)
    yb = jnp.clip(y0 + rb, 0, h - 1)
    xb = jnp.clip(x0 + cb, 0, w - 1)
    flat = blurred.reshape(-1)
    va = flat[(ya * w + xa).reshape(-1)].reshape(ya.shape)
    vb = flat[(yb * w + xb).reshape(-1)].reshape(yb.shape)
    bits = (va < vb).astype(jnp.uint32)  # [N, 256]
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
