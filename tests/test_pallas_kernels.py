"""Pallas kernels vs their XLA reference implementations (interpret mode
on CPU; on TPU the same kernels compile natively)."""
import numpy as np
import jax.numpy as jnp

from orb_slam2_with_comment_tpu.ops import hamming
from orb_slam2_with_comment_tpu.ops.hamming_pallas import distance_matrix_pallas


class TestHammingPallas:
    def test_matches_xla_random(self):
        rng = np.random.RandomState(0)
        d1 = jnp.asarray(rng.randint(0, 2**32, (300, 8), dtype=np.uint64)
                         .astype(np.uint32))
        d2 = jnp.asarray(rng.randint(0, 2**32, (257, 8), dtype=np.uint64)
                         .astype(np.uint32))
        ref = hamming._distance_matrix_xla(d1, d2)
        out = distance_matrix_pallas(d1, d2, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_identity_zero(self):
        rng = np.random.RandomState(1)
        d = jnp.asarray(rng.randint(0, 2**32, (64, 8), dtype=np.uint64)
                        .astype(np.uint32))
        out = np.asarray(distance_matrix_pallas(d, d, interpret=True))
        assert (np.diag(out) == 0).all()
        assert out.max() <= 256

    def test_single_bit(self):
        d1 = jnp.zeros((1, 8), jnp.uint32)
        d2 = jnp.zeros((1, 8), jnp.uint32).at[0, 3].set(1 << 17)
        out = distance_matrix_pallas(d1, d2, interpret=True)
        assert int(out[0, 0]) == 1


class TestHammingGemm:
    """The TPU-path distance matrix is an exact +-1 bit-GEMM
    (hamming = (256 - a.b)/2, f32 accumulation of +-1 products). Pinned
    bit-exact against the XOR+popcount reference on every backend."""

    def test_gemm_equals_popcount(self):
        from orb_slam2_with_comment_tpu.ops import hamming
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.integers(0, 2**32, (157, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (203, 8), dtype=np.uint32))
        ref = np.asarray(hamming._distance_matrix_xla(a, b))
        gem = np.asarray(hamming._distance_matrix_gemm(a, b))
        np.testing.assert_array_equal(ref, gem)

    def test_gemm_extremes(self):
        from orb_slam2_with_comment_tpu.ops import hamming
        zeros = jnp.zeros((1, 8), jnp.uint32)
        ones = jnp.full((1, 8), 0xFFFFFFFF, jnp.uint32)
        d = np.asarray(hamming._distance_matrix_gemm(
            jnp.concatenate([zeros, ones]), jnp.concatenate([zeros, ones])))
        np.testing.assert_array_equal(d, [[0, 256], [256, 0]])
