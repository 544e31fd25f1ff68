"""Pallas TPU kernel: tiled 256-bit Hamming distance matrix.

The distance matrix [N1, N2] over uint32[.,8] descriptors is the
workhorse of every matcher search mode (reference: ORBmatcher.cc's
per-candidate DescriptorDistance loops, :1901-1917, called from all 7
Search* modes) and of BoW scoring. The XLA path broadcasts
[N1,1,8]^[1,N2,8] and reduces; this kernel instead keeps a 128x128
output tile resident in VMEM and accumulates the 8 XOR+popcount terms
per tile with explicit (sublane x lane) layouts:

  d1 tile [128, 8]  -> word k is a column  a[:, k:k+1]  (128, 1)
  d2 tile [8, 128]  -> word k is a row     b[k:k+1, :]  (1, 128)
  acc += popcount(a_col ^ b_row)           (128, 128) VPU ops

so no [N1, N2, 8] intermediate ever exists and each output tile is
written once (one HBM store per element, the bandwidth floor).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
WORDS = 8  # 256-bit descriptors as 8 x uint32


def _kernel(d1_ref, d2t_ref, out_ref):
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for k in range(WORDS):
        a_col = d1_ref[:, k:k + 1]   # [TILE, 1] uint32
        b_row = d2t_ref[k:k + 1, :]  # [1, TILE] uint32
        x = jnp.bitwise_xor(a_col, b_row)  # [TILE, TILE]
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


def _pad_to(x: jax.Array, n: int, axis: int) -> jax.Array:
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


@partial(jax.jit, static_argnames=("interpret",))
def distance_matrix_pallas(d1: jax.Array, d2: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """[N1, 8] x [N2, 8] uint32 -> [N1, N2] int32 Hamming distances."""
    n1, n2 = d1.shape[0], d2.shape[0]
    n1p = pl.cdiv(n1, TILE) * TILE
    n2p = pl.cdiv(n2, TILE) * TILE
    d1p = _pad_to(d1.astype(jnp.uint32), n1p, 0)
    d2tp = _pad_to(d2.astype(jnp.uint32), n2p, 0).T  # [8, N2p]
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.int32),
        grid=(n1p // TILE, n2p // TILE),
        in_specs=[
            pl.BlockSpec((TILE, WORDS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((WORDS, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=3 * WORDS * n1p * n2p,
            bytes_accessed=4 * (n1p * WORDS + n2p * WORDS + n1p * n2p),
            transcendentals=0,
        ),
        interpret=interpret,
    )(d1p, d2tp)
    return out[:n1, :n2]
