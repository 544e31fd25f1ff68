"""Batched 256-bit Hamming distance (XOR + popcount).

TPU-native rebuild of the reference's DescriptorDistance (reference:
ORBmatcher.cc:1901-1917, the Stanford bit-twiddling popcount) generalized
from a scalar pair to full distance matrices: descriptors are uint32[...,8],
distances come from lax.population_count on the XOR — the building block for
every matcher search mode and for BoW scoring.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hamming_pair(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise Hamming distance; a, b broadcastable [..., 8] uint32."""
    x = jax.lax.population_count(jnp.bitwise_xor(a, b))
    return jnp.sum(x, axis=-1).astype(jnp.int32)


@jax.jit
def _distance_matrix_xla(d1: jax.Array, d2: jax.Array) -> jax.Array:
    return hamming_pair(d1[:, None, :], d2[None, :, :])


def distance_matrix(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """[N1, 8] x [N2, 8] uint32 -> [N1, N2] int32 Hamming distances.

    On TPU this lowers to the tiled Pallas kernel (ops.hamming_pallas);
    elsewhere (CPU tests, interpret-mode debugging) the XLA broadcast
    path is used. Backend choice is made at trace time.
    """
    if jax.default_backend() == "tpu":
        from .hamming_pallas import distance_matrix_pallas
        return distance_matrix_pallas(d1, d2)
    return _distance_matrix_xla(d1, d2)


def best_two(dist: jax.Array, valid: jax.Array | None = None, big: int = 10_000):
    """Per-row best and second-best over the last axis.

    Args:
      dist: [..., M] int32 distances.
      valid: optional [..., M] bool mask of admissible candidates.
    Returns (best_dist, best_idx, second_dist) with invalid entries = big.
    """
    if valid is not None:
        dist = jnp.where(valid, dist, big)
    neg, idx = jax.lax.top_k(-dist, 2)
    return -neg[..., 0], idx[..., 0], -neg[..., 1]
