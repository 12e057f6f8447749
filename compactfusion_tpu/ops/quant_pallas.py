"""Fused Pallas quantization kernels — the CompactFusion "fastpath".

Reference semantics: ``xfuser/compact/fastpath.py`` (Triton):
``binary_quant_fastpath`` fuses delta-compute + 1-bit sign quantization +
bit-packing + **in-kernel dequantize-and-update-base** (error feedback without
a second pass over HBM); ``binary_dequant_fastpath`` fuses unpack + dequant +
base-add; ``int2_*`` likewise for the 4-level codec.

Layout: one grid dimension over token blocks; each block loads x/base rows
(N_blk, C), the per-token scale factor U rows and the full V factor, computes
the scale on the MXU, and writes the packed words + updated base in a single
pass.  The packed wire format is the grouped layout of
``compactfusion_tpu.compact.packing`` (bit i of byte j = channel i*(C/8)+j),
so payloads interoperate with the jnp codecs bit-for-bit.

The scale model (mean or rank-k subspace iteration over |delta|) runs outside
the kernel, like the reference wrapper (``fastpath.py:123-228``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


# TPU cores have ~16 MB of VMEM; the quant kernels hold roughly four fp32
# (block_n, C) buffers at once (x, base, new_base + an intermediate), so cap
# the row-block to stay well inside the scoped-vmem limit at any C.  At
# C=3072 (FLUX K/V slabs) this picks 128 rows; small C keeps 256.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _auto_block_n(c: int, requested: int) -> int:
    rows = _VMEM_BUDGET_BYTES // (16 * max(c, 1))
    rows = max(8, (rows // 8) * 8)
    return min(requested, rows)


# ---------------------------------------------------------------------------
# BINARY (1-bit) fastpath
# ---------------------------------------------------------------------------


def _binary_quant_kernel(x_ref, base_ref, u_ref, v_ref, packed_ref, nb_ref):
    x = x_ref[:].astype(jnp.float32)
    base = base_ref[:].astype(jnp.float32)
    delta = x - base
    scale = jax.lax.dot_general(
        u_ref[:].astype(jnp.float32),
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nb, C)
    pos = delta >= 0
    # grouped bit packing: 8 shifted adds over contiguous lane groups.
    # Mosaic cannot vectorize uint8 shifts -> compute in int32, store uint8.
    c = delta.shape[1]
    g = c // 8
    bits = pos.astype(jnp.int32)
    packed = bits[:, :g]
    for i in range(1, 8):
        packed = packed | (bits[:, i * g : (i + 1) * g] << i)
    packed_ref[:] = packed.astype(jnp.uint8)
    # in-kernel error-feedback base update: base + sign * scale
    sign = jnp.where(pos, 1.0, -1.0)
    nb_ref[:] = (base + sign * scale).astype(nb_ref.dtype)


def _binary_dequant_kernel(packed_ref, base_ref, u_ref, v_ref, out_ref):
    packed = packed_ref[:].astype(jnp.int32)
    parts = [(packed >> i) & 1 for i in range(8)]
    bits = jnp.concatenate(parts, axis=1)
    sign = bits.astype(jnp.float32) * 2.0 - 1.0
    scale = jax.lax.dot_general(
        u_ref[:].astype(jnp.float32),
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (base_ref[:].astype(jnp.float32) + sign * scale).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def binary_quant_fastpath(
    x: jax.Array,
    base: jax.Array,
    u: jax.Array,
    v: jax.Array,
    block_n: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused sign-quant + pack + EF base update.

    x, base: (N, C); u: (N, K); v: (K, C) scale factors of |x - base|.
    Returns (packed (N, C//8) uint8, new_base (N, C) in base.dtype).
    """
    n, c = x.shape
    k = u.shape[1]
    assert c % 8 == 0, f"binary pack needs C % 8 == 0, got C={c}"
    block_n = _auto_block_n(c, min(block_n, _round_up(n, 8)))
    n_p = _round_up(n, block_n)
    if n_p != n:
        x = jnp.pad(x, ((0, n_p - n), (0, 0)))
        base = jnp.pad(base, ((0, n_p - n), (0, 0)))
        u = jnp.pad(u, ((0, n_p - n), (0, 0)))
    grid = (n_p // block_n,)
    packed, new_base = pl.pallas_call(
        _binary_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, k), lambda i: (i, 0)),
            pl.BlockSpec((k, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, c // 8), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, c // 8), jnp.uint8),
            jax.ShapeDtypeStruct((n_p, c), base.dtype),
        ],
        interpret=interpret,
    )(x, base, u, v)
    return packed[:n], new_base[:n]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def binary_dequant_fastpath(
    packed: jax.Array,
    base: jax.Array,
    u: jax.Array,
    v: jax.Array,
    block_n: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused unpack + dequant + base add -> reconstructed (N, C) = new base."""
    n, c8 = packed.shape
    c = c8 * 8
    k = u.shape[1]
    block_n = _auto_block_n(c, min(block_n, _round_up(n, 8)))
    n_p = _round_up(n, block_n)
    if n_p != n:
        packed = jnp.pad(packed, ((0, n_p - n), (0, 0)))
        base = jnp.pad(base, ((0, n_p - n), (0, 0)))
        u = jnp.pad(u, ((0, n_p - n), (0, 0)))
    out = pl.pallas_call(
        _binary_dequant_kernel,
        grid=(n_p // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c8), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, k), lambda i: (i, 0)),
            pl.BlockSpec((k, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, c), base.dtype),
        interpret=interpret,
    )(packed, base, u, v)
    return out[:n]


# ---------------------------------------------------------------------------
# INT2 fastpath (sign + magnitude levels +-0.5s / +-2s)
# ---------------------------------------------------------------------------


def _int2_quant_kernel(x_ref, base_ref, u_ref, v_ref, packed_ref, nb_ref):
    x = x_ref[:].astype(jnp.float32)
    base = base_ref[:].astype(jnp.float32)
    delta = x - base
    s = jax.lax.dot_general(
        u_ref[:].astype(jnp.float32),
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pos = delta >= 0
    # equivalent to where(pos, delta > s, delta < -s) since s >= 0 (mean of
    # abs values); Mosaic cannot select between two bool vectors.
    mag = (delta > s) | (delta < -s)
    codes = 2 * pos.astype(jnp.int32) + mag.astype(jnp.int32)
    c = delta.shape[1]
    g = c // 4
    packed = codes[:, :g]
    for i in range(1, 4):
        packed = packed | (codes[:, i * g : (i + 1) * g] << (2 * i))
    packed_ref[:] = packed.astype(jnp.uint8)
    sign = jnp.where(pos, 1.0, -1.0)
    level = jnp.where(mag, 2.0, 0.5)
    nb_ref[:] = (base + sign * level * s).astype(nb_ref.dtype)


def _int2_dequant_kernel(packed_ref, base_ref, u_ref, v_ref, out_ref):
    packed = packed_ref[:].astype(jnp.int32)
    parts = [(packed >> (2 * i)) & 3 for i in range(4)]
    codes = jnp.concatenate(parts, axis=1)
    s = jax.lax.dot_general(
        u_ref[:].astype(jnp.float32),
        v_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sign = jnp.where(codes >= 2, 1.0, -1.0)
    level = jnp.where((codes & jnp.uint8(1)).astype(bool), 2.0, 0.5)
    out_ref[:] = (base_ref[:].astype(jnp.float32) + sign * level * s).astype(
        out_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int2_quant_fastpath(
    x, base, u, v, block_n: int = 256, interpret: bool = False
):
    n, c = x.shape
    k = u.shape[1]
    # without this, C % 4 trailing channels silently never pack (data loss
    # with a confusing shape mismatch at dequant instead of a clear error)
    assert c % 4 == 0, f"int2 pack needs C % 4 == 0, got C={c}"
    block_n = _auto_block_n(c, min(block_n, _round_up(n, 8)))
    n_p = _round_up(n, block_n)
    if n_p != n:
        x = jnp.pad(x, ((0, n_p - n), (0, 0)))
        base = jnp.pad(base, ((0, n_p - n), (0, 0)))
        u = jnp.pad(u, ((0, n_p - n), (0, 0)))
    packed, new_base = pl.pallas_call(
        _int2_quant_kernel,
        grid=(n_p // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, k), lambda i: (i, 0)),
            pl.BlockSpec((k, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_n, c // 4), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_p, c // 4), jnp.uint8),
            jax.ShapeDtypeStruct((n_p, c), base.dtype),
        ],
        interpret=interpret,
    )(x, base, u, v)
    return packed[:n], new_base[:n]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int2_dequant_fastpath(
    packed, base, u, v, block_n: int = 256, interpret: bool = False
):
    n, c4 = packed.shape
    c = c4 * 4
    k = u.shape[1]
    block_n = _auto_block_n(c, min(block_n, _round_up(n, 8)))
    n_p = _round_up(n, block_n)
    if n_p != n:
        packed = jnp.pad(packed, ((0, n_p - n), (0, 0)))
        base = jnp.pad(base, ((0, n_p - n), (0, 0)))
        u = jnp.pad(u, ((0, n_p - n), (0, 0)))
    out = pl.pallas_call(
        _int2_dequant_kernel,
        grid=(n_p // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, c4), lambda i: (i, 0)),
            pl.BlockSpec((block_n, c), lambda i: (i, 0)),
            pl.BlockSpec((block_n, k), lambda i: (i, 0)),
            pl.BlockSpec((k, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_p, c), base.dtype),
        interpret=interpret,
    )(packed, base, u, v)
    return out[:n]
