"""Batched Hamming distance between packed 256-bit ORB descriptors.

Replaces the reference's scalar XOR+SWAR-popcount loop,
ORBmatcher::DescriptorDistance (ORB_SLAM2/src/ORBmatcher.cc:1647-1663), with
two whole-matrix formulations:

  * `pairwise_hamming`      — SWAR popcount of XOR over all (N, M) pairs on
                              the VPU (exact, integer).
  * `pairwise_hamming_mxu`  — the "Hamming matmul": unpack each descriptor to
                              a ±1 vector; then  ham = (256 - A B^T) / 2.
                              A 256-deep int/bf16 contraction that rides the
                              MXU; bit-exact (values are small integers).

Descriptors are uint32 (N, 8) = 256 bits; invalid rows must be masked by the
caller (a zero descriptor has distance 0 to another zero descriptor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x55555555)
_M2 = np.uint32(0x33333333)
_M4 = np.uint32(0x0F0F0F0F)
_H01 = np.uint32(0x01010101)


def popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR population count of a uint32 array (any shape)."""
    x = x - ((x >> 1) & _M1)
    x = (x & _M2) + ((x >> 2) & _M2)
    x = (x + (x >> 4)) & _M4
    return ((x * _H01) >> 24).astype(jnp.int32)


def pairwise_hamming(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances (VPU path)."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]
    return popcount_u32(x).sum(axis=-1)


def unpack_pm1(desc: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint32 (N, 8) -> (N, 256) in {-1, +1} (bit=1 -> +1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return (bits.reshape(desc.shape[0], -1).astype(jnp.int8) * 2 - 1).astype(dtype)


def pairwise_hamming_mxu(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 via MXU dot product.

    ham = (256 - <a_pm1, b_pm1>) / 2.  Products are exactly representable in
    bf16 and the f32 accumulation of 256 +/-1 terms is exact, so the result
    is bit-identical to `pairwise_hamming`.
    """
    a = unpack_pm1(desc_a)
    b = unpack_pm1(desc_b)
    dot = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # +/-1 products are exact in
    #                                           bf16; opt out of the global
    #                                           f32-HIGHEST default (6x)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)
