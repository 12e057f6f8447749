"""Sub-byte bit packing/unpacking along the channel dimension.

Reference semantics: the Triton kernels in ``xfuser/compact/
compress_quantize.py`` — ``_quantize_1bit_kernel`` packs 8 sign bits per uint8
along C (bit i of byte j is channel ``8*j + i``); int2 packs 4 two-bit codes
per byte; int4 packs 2 codes per byte.

This module is the portable ``jnp`` implementation (XLA fuses it fine); the
Pallas fastpath in ``compactfusion_tpu/ops/quant_pallas.py`` does the same
packing fused with the delta/quant/error-feedback math.  TPU-wise the packed
arrays are uint8 with C/8 (or C/4, C/2) lanes — keep C a multiple of 256 so
the packed last dim stays lane-aligned (C=3072 for FLUX -> 384 packed lanes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIT_WEIGHTS = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack a (N, C) array of {0,1} into (N, C//8) uint8, bit i = channel 8j+i."""
    n, c = bits.shape
    assert c % 8 == 0, f"C={c} must be divisible by 8"
    b = bits.astype(jnp.uint8).reshape(n, c // 8, 8)
    return jnp.sum(b * _BIT_WEIGHTS[None, None, :], axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_bits` -> (N, C) uint8 in {0,1}."""
    n, c8 = packed.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts[None, None, :]) & jnp.uint8(1)
    return bits.reshape(n, c8 * 8)


def pack_2bit(codes: jax.Array) -> jax.Array:
    """Pack (N, C) codes in [0,3] into (N, C//4) uint8 (code i at bits 2i)."""
    n, c = codes.shape
    assert c % 4 == 0, f"C={c} must be divisible by 4"
    q = codes.astype(jnp.uint8).reshape(n, c // 4, 4)
    shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
    return jnp.sum(
        (q << shifts[None, None, :]).astype(jnp.uint8), axis=-1, dtype=jnp.uint8
    )


def unpack_2bit(packed: jax.Array) -> jax.Array:
    n, c4 = packed.shape
    shifts = jnp.asarray([0, 2, 4, 6], dtype=jnp.uint8)
    codes = (packed[..., None] >> shifts[None, None, :]) & jnp.uint8(3)
    return codes.reshape(n, c4 * 4)


def pack_4bit(codes: jax.Array) -> jax.Array:
    """Pack (N, C) codes in [0,15] into (N, C//2) uint8 (low nibble first)."""
    n, c = codes.shape
    assert c % 2 == 0, f"C={c} must be divisible by 2"
    q = codes.astype(jnp.uint8).reshape(n, c // 2, 2)
    return (q[..., 0] | (q[..., 1] << jnp.uint8(4))).astype(jnp.uint8)


def unpack_4bit(packed: jax.Array) -> jax.Array:
    n, c2 = packed.shape
    lo = packed & jnp.uint8(15)
    hi = packed >> jnp.uint8(4)
    return jnp.stack([lo, hi], axis=-1).reshape(n, c2 * 2)
