"""Sub-byte bit packing/unpacking along the channel dimension.

Reference semantics: the Triton kernels in ``xfuser/compact/
compress_quantize.py`` — ``_quantize_1bit_kernel`` packs 8 sign bits per
uint8, int2 packs 4 codes per byte, int4 packs 2.

Wire-format note (deliberate TPU-first difference): the reference interleaves
bits of *adjacent* channels into one byte, which needs a stride-8 gather.  We
define a **grouped layout** instead: the C channels are split into 8 (or 4/2)
contiguous groups of C/8 lanes, and byte j carries bit i from channel
``i*(C/8)+j``.  Packing is then 8 shifted adds over contiguous lane slices —
native VPU ops with no relayout, both here (jnp) and in the fused Pallas
kernels (``ops/quant_pallas.py``), which share this exact format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_bits(bits: jax.Array) -> jax.Array:
    """Pack (N, C) {0,1} into (N, C//8) uint8, grouped layout (see module doc)."""
    n, c = bits.shape
    assert c % 8 == 0, f"C={c} must be divisible by 8"
    g = c // 8
    b = bits.astype(jnp.uint8)
    out = b[:, :g]
    for i in range(1, 8):
        out = out | (b[:, i * g : (i + 1) * g] << jnp.uint8(i))
    return out


def unpack_bits(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_bits` -> (N, C) uint8 in {0,1}."""
    parts = [(packed >> jnp.uint8(i)) & jnp.uint8(1) for i in range(8)]
    return jnp.concatenate(parts, axis=1)


def pack_2bit(codes: jax.Array) -> jax.Array:
    """Pack (N, C) codes in [0,3] into (N, C//4) uint8, grouped layout."""
    n, c = codes.shape
    assert c % 4 == 0, f"C={c} must be divisible by 4"
    g = c // 4
    q = codes.astype(jnp.uint8)
    out = q[:, :g]
    for i in range(1, 4):
        out = out | (q[:, i * g : (i + 1) * g] << jnp.uint8(2 * i))
    return out


def unpack_2bit(packed: jax.Array) -> jax.Array:
    parts = [(packed >> jnp.uint8(2 * i)) & jnp.uint8(3) for i in range(4)]
    return jnp.concatenate(parts, axis=1)


def pack_4bit(codes: jax.Array) -> jax.Array:
    """Pack (N, C) codes in [0,15] into (N, C//2) uint8, grouped layout."""
    n, c = codes.shape
    assert c % 2 == 0, f"C={c} must be divisible by 2"
    g = c // 2
    q = codes.astype(jnp.uint8)
    return (q[:, :g] | (q[:, g:] << jnp.uint8(4))).astype(jnp.uint8)


def unpack_4bit(packed: jax.Array) -> jax.Array:
    lo = packed & jnp.uint8(15)
    hi = packed >> jnp.uint8(4)
    return jnp.concatenate([lo, hi], axis=1)
