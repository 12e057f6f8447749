"""Pure-functional compression codecs.

Reference semantics: ``xfuser/compact/slowpath.py`` (slowpath_compress /
slowpath_decompress / sim_compress) and ``xfuser/compact/compress_quantize.py``
(quantize_1bit / sim_binary / sim_int2 / sim_int2_minmax / sim_int4 /
quantize_int4 / quantize_int8) and ``compress_topk.py`` (1:M sparsity).

Design differences from the reference (deliberate, TPU-first):
  * A payload is a **pytree of static-shape arrays** (packed uint8 words +
    scale factors), not a single flattened fp16 buffer — ``lax.ppermute`` and
    ``all_gather`` take pytrees natively, so the cat/split marshalling of the
    reference (``slowpath.py:108-135``) disappears.
  * Scales are bfloat16 (TPU-native) instead of fp16; all quantization math
    runs in fp32 and error feedback absorbs the residual difference.
  * Every codec is a pure function usable under ``jit``/``shard_map``/scan.

Each packed codec has a ``sim_*`` twin (compress→decompress without packing)
used both for ``CompactConfig.simulate`` mode and as the test oracle — the
same kernel-vs-sim strategy as the reference test suite
(``tests/compact/compress_fastpath_test.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from compactfusion_tpu.config import CompressType
from compactfusion_tpu.compact.lowrank import subspace_iter
from compactfusion_tpu.compact.packing import (
    pack_2bit,
    pack_4bit,
    pack_bits,
    unpack_2bit,
    unpack_4bit,
    unpack_bits,
)

SCALE_DTYPE = jnp.bfloat16
_EPS = 1e-6


def _wire(x: jax.Array) -> jax.Array:
    """Round to the wire dtype AND force the rounding to happen.

    Within a single XLA program (ring_size==1 rings, ``simulate`` mode, every
    single-program test) the algebraic simplifier elides f32→bf16→f32
    convert pairs, silently handing decoders fp32-precision scales that a
    real inter-chip payload would never carry.  The optimization barrier
    pins payload fields to true wire precision so local and multi-chip runs
    quantize identically (measured: the elision shifts EF bases by ~2e-3
    rel on v5e — the bf16 ulp of the scale product).
    """
    return jax.lax.optimization_barrier(x.astype(SCALE_DTYPE))


class BinaryPayload(NamedTuple):
    """1-bit signs packed along C + rank-k scale factors U (N,k), V (k,C)."""

    packed: jax.Array  # (N, C//8) uint8
    scale_u: jax.Array  # (N, k) bf16
    scale_v: jax.Array  # (k, C) bf16


class Int2Payload(NamedTuple):
    """2-bit sign+magnitude codes + mean-based scale factors."""

    packed: jax.Array  # (N, C//4) uint8
    scale_u: jax.Array  # (N, 1) bf16
    scale_v: jax.Array  # (1, C) bf16


class MinMaxPayload(NamedTuple):
    """Affine codes (2- or 4-bit packed) + per-channel scale/min."""

    packed: jax.Array  # (N, C//4) or (N, C//2) uint8
    scale: jax.Array  # (1, C) bf16
    minv: jax.Array  # (1, C) bf16


class Int8Payload(NamedTuple):
    q: jax.Array  # (N, C) uint8 codes
    scale: jax.Array  # (1, C) bf16
    minv: jax.Array  # (1, C) bf16


class LowRankPayload(NamedTuple):
    u: jax.Array  # (N, k) bf16
    v: jax.Array  # (k, C) bf16


class LowRankQPayload(NamedTuple):
    u: MinMaxPayload  # int4-quantized U (N, k)
    v: MinMaxPayload  # int4-quantized Vᵀ (C, k)


class SparsePayload(NamedTuple):
    """1:M structured sparsity: one surviving value per group of M channels."""

    values: jax.Array  # (N, C//m) bf16
    indices: jax.Array  # (N, C//m) uint8  (index within the group)


Payload = Union[
    BinaryPayload,
    Int2Payload,
    MinMaxPayload,
    Int8Payload,
    LowRankPayload,
    LowRankQPayload,
    SparsePayload,
    jax.Array,  # IDENTITY / WARMUP / simulate mode
]


def payload_nbytes(payload) -> int:
    """Bytes on the wire for a payload pytree (static)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(payload))


# ---------------------------------------------------------------------------
# shared scale models
# ---------------------------------------------------------------------------


def _mean_scale_uv(x32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean-based rank-1 scale: U = normalized per-token mean, V = channel mean.

    Matches reference ``quantize_1bit`` rank=-1 / ``sim_binary`` rank=-1
    (``compress_quantize.py:37-50,300-338``).
    """
    a = jnp.abs(x32)
    chan = jnp.mean(a, axis=0, keepdims=True)  # (1, C)
    tok = jnp.mean(a, axis=1, keepdims=True)  # (N, 1)
    tok = tok / (jnp.mean(tok) + _EPS)
    return tok, chan


def _scale_uv(
    x32: jax.Array, rank: int, init_q: Optional[jax.Array] = None
) -> Tuple[jax.Array, jax.Array]:
    if rank == -1:
        return _mean_scale_uv(x32)
    u, v, _ = subspace_iter(jnp.abs(x32), rank, num_iters=2, init_q=init_q)
    return u, v


# ---------------------------------------------------------------------------
# BINARY — 1-bit sign quantization with rank-k scale
# ---------------------------------------------------------------------------


def encode_binary(x: jax.Array, rank: int = -1) -> BinaryPayload:
    x32 = x.astype(jnp.float32)
    u, v = _scale_uv(x32, rank)
    packed = pack_bits((x32 >= 0).astype(jnp.uint8))
    return BinaryPayload(packed, _wire(u), _wire(v))


def decode_binary(p: BinaryPayload, dtype=jnp.float32) -> jax.Array:
    sign = unpack_bits(p.packed).astype(jnp.float32) * 2.0 - 1.0
    scale = p.scale_u.astype(jnp.float32) @ p.scale_v.astype(jnp.float32)
    return (sign * scale).astype(dtype)


def sim_binary(x: jax.Array, rank: int = -1) -> jax.Array:
    """Compress→decompress without packing (reference ``sim_binary``).

    Scales round through the wire dtype so simulate-mode error matches what
    a receiver of the real payload reconstructs."""
    x32 = x.astype(jnp.float32)
    u, v = _scale_uv(x32, rank)
    scale = _wire(u).astype(jnp.float32) @ _wire(v).astype(jnp.float32)
    sign = jnp.where(x32 >= 0, 1.0, -1.0)
    return (sign * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# INT2 — sign+magnitude 4-level quantization with mean scale
# ---------------------------------------------------------------------------
# Levels (reference ``sim_int2``, ``compress_quantize.py:341-384``):
#   x < -s  -> -2s ;  -s <= x < 0 -> -0.5s ;  0 <= x <= s -> +0.5s ;  x > s -> +2s
# code = 2*(x >= 0) + (|x| beyond threshold), giving codes {0,1,2,3}.


def _int2_codes(x32: jax.Array, s: jax.Array) -> jax.Array:
    pos = x32 >= 0
    mag = jnp.where(pos, x32 > s, x32 < -s)
    return (2 * pos.astype(jnp.uint8) + mag.astype(jnp.uint8)).astype(jnp.uint8)


def _int2_values(codes: jax.Array, s: jax.Array) -> jax.Array:
    sign = jnp.where(codes >= 2, 1.0, -1.0)
    mag = jnp.where((codes & 1).astype(bool), 2.0, 0.5)
    return sign * mag * s


def encode_int2(x: jax.Array) -> Int2Payload:
    x32 = x.astype(jnp.float32)
    u, v = _mean_scale_uv(x32)
    s = (u * v).astype(jnp.float32)
    packed = pack_2bit(_int2_codes(x32, s))
    return Int2Payload(packed, _wire(u), _wire(v))


def decode_int2(p: Int2Payload, dtype=jnp.float32) -> jax.Array:
    s = p.scale_u.astype(jnp.float32) @ p.scale_v.astype(jnp.float32)
    return _int2_values(unpack_2bit(p.packed), s).astype(dtype)


def sim_int2(x: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    u, v = _mean_scale_uv(x32)
    s = u * v  # codes threshold on the fp32 scale, like encode_int2
    s_wire = _wire(u).astype(jnp.float32) * _wire(v).astype(jnp.float32)
    return _int2_values(_int2_codes(x32, s), s_wire).astype(x.dtype)


# ---------------------------------------------------------------------------
# INT2_MINMAX / INT4 — per-channel affine quantization
# ---------------------------------------------------------------------------


def _minmax_scale(x32: jax.Array, qmax: int, axis: int) -> Tuple[jax.Array, jax.Array]:
    mn = jnp.min(x32, axis=axis, keepdims=True)
    mx = jnp.max(x32, axis=axis, keepdims=True)
    # eps belongs on the RANGE, not the denominator: (mx-mn)/(qmax+eps)
    # yields scale == 0 for a constant channel, and the encode divides by
    # it — NaN codes (the reference's quantize_int8 carries that bug,
    # compress_quantize.py:455-461; constant channels include the all-zeros
    # initial cache).  A floored scale instead makes codes 0 and decodes
    # the channel exactly to mn.
    scale = (mx - mn + _EPS) / qmax
    return scale, mn


def _affine_encode(x32, qmax: int, axis: int):
    scale, mn = _minmax_scale(x32, qmax, axis)
    codes = jnp.clip(jnp.round((x32 - mn) / scale), 0, qmax).astype(jnp.uint8)
    return codes, scale, mn


def encode_int2_minmax(x: jax.Array) -> MinMaxPayload:
    codes, scale, mn = _affine_encode(x.astype(jnp.float32), 3, axis=0)
    return MinMaxPayload(pack_2bit(codes), _wire(scale), _wire(mn))


def decode_int2_minmax(p: MinMaxPayload, dtype=jnp.float32) -> jax.Array:
    codes = unpack_2bit(p.packed).astype(jnp.float32)
    out = codes * p.scale.astype(jnp.float32) + p.minv.astype(jnp.float32)
    return out.astype(dtype)


def sim_int2_minmax(x: jax.Array) -> jax.Array:
    codes, scale, mn = _affine_encode(x.astype(jnp.float32), 3, axis=0)
    scale = _wire(scale).astype(jnp.float32)
    mn = _wire(mn).astype(jnp.float32)
    return (codes.astype(jnp.float32) * scale + mn).astype(x.dtype)


def encode_int4(x: jax.Array, axis: int = 0) -> MinMaxPayload:
    codes, scale, mn = _affine_encode(x.astype(jnp.float32), 15, axis=axis)
    return MinMaxPayload(pack_4bit(codes), _wire(scale), _wire(mn))


def decode_int4(p: MinMaxPayload, dtype=jnp.float32) -> jax.Array:
    codes = unpack_4bit(p.packed).astype(jnp.float32)
    out = codes * p.scale.astype(jnp.float32) + p.minv.astype(jnp.float32)
    return out.astype(dtype)


def sim_int4(x: jax.Array, axis: int = 0) -> jax.Array:
    codes, scale, mn = _affine_encode(x.astype(jnp.float32), 15, axis=axis)
    scale = _wire(scale).astype(jnp.float32)
    mn = _wire(mn).astype(jnp.float32)
    return (codes.astype(jnp.float32) * scale + mn).astype(x.dtype)


# ---------------------------------------------------------------------------
# INT8 — affine, used for quantized base caches (reference quantize_int8)
# ---------------------------------------------------------------------------


def encode_int8(x: jax.Array) -> Int8Payload:
    """Per-channel 8-bit min-max quantization (the INT8 wire codec and the
    quantized base cache).

    Deliberate deviation from the reference's ``quantize_int8``
    (``compress_quantize.py:428-484``): that stores an int16 zero point
    ``qmin - mn/scale``, which divides by a vanishing scale on constant
    channels (NaN codes on the all-zeros initial cache) and clips to
    garbage whenever a channel's offset is large relative to its range —
    silently decoding such channels to ~0.  Storing the channel minimum
    directly (same 2 bytes/channel) decodes constant channels exactly and
    never divides by a near-zero scale.
    """
    codes, scale, mn = _affine_encode(x.astype(jnp.float32), 255, axis=0)
    return Int8Payload(codes, _wire(scale), _wire(mn))


def decode_int8(p: Int8Payload, dtype=jnp.float32) -> jax.Array:
    out = p.q.astype(jnp.float32) * p.scale.astype(jnp.float32) + p.minv.astype(
        jnp.float32
    )
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# LOW_RANK / LOW_RANK_Q
# ---------------------------------------------------------------------------


def encode_low_rank(x: jax.Array, rank: int) -> LowRankPayload:
    u, v, _ = subspace_iter(x.astype(jnp.float32), rank, num_iters=2)
    return LowRankPayload(_wire(u), _wire(v))


def decode_low_rank(p: LowRankPayload, dtype=jnp.float32) -> jax.Array:
    return (p.u.astype(jnp.float32) @ p.v.astype(jnp.float32)).astype(dtype)


def sim_low_rank(x: jax.Array, rank: int) -> jax.Array:
    u, v, _ = subspace_iter(x.astype(jnp.float32), rank, num_iters=2)
    u = _wire(u).astype(jnp.float32)
    v = _wire(v).astype(jnp.float32)
    return (u @ v).astype(x.dtype)


def awl_row_scale(v_nc: jax.Array) -> jax.Array:
    """V-norm key-importance weights for attention-aware low-rank (AWL).

    Reference ``compact_update_awl_scale`` (``xfuser/compact/ring.py:86-103``):
    per-token weight ``mean(||v_row||) / ||v_row||`` — keys whose V rows have
    small norm typically carry large attention scores, so they get larger
    weight in the weighted subspace fit.  ``v_nc``: the (N, C) view of the
    LOCAL (uncompressed) V tensor of the rank whose K is being compressed.
    """
    norm = jnp.linalg.norm(v_nc.astype(jnp.float32), axis=-1)
    return jnp.mean(norm) / (norm + _EPS)


def encode_low_rank_awl(
    x: jax.Array, rank: int, row_scale: Optional[jax.Array] = None
) -> LowRankPayload:
    """Row-weighted rank-k fit (reference ``sim_compress`` LOW_RANK_AWL,
    ``slowpath.py:218-237``): fit ``diag(s) @ x`` and unscale U afterwards,
    so important rows dominate the subspace.  The payload is wire-identical
    to plain LOW_RANK — the receiver needs no knowledge of the scale."""
    if row_scale is None:
        return encode_low_rank(x, rank)
    s = row_scale.astype(jnp.float32)[:, None]
    u, v, _ = subspace_iter(x.astype(jnp.float32) * s, rank, num_iters=2)
    return LowRankPayload(_wire(u / s), _wire(v))


def sim_low_rank_awl(
    x: jax.Array, rank: int, row_scale: Optional[jax.Array] = None
) -> jax.Array:
    if row_scale is None:
        return sim_low_rank(x, rank)
    s = row_scale.astype(jnp.float32)[:, None]
    u, v, _ = subspace_iter(x.astype(jnp.float32) * s, rank, num_iters=2)
    uw = _wire(u / s).astype(jnp.float32)
    vw = _wire(v).astype(jnp.float32)
    return (uw @ vw).astype(x.dtype)


def encode_low_rank_q(x: jax.Array, rank: int) -> LowRankQPayload:
    u, v, _ = subspace_iter(x.astype(jnp.float32), rank, num_iters=2)
    return LowRankQPayload(encode_int4(u, axis=0), encode_int4(v.T, axis=0))


def decode_low_rank_q(p: LowRankQPayload, dtype=jnp.float32) -> jax.Array:
    u = decode_int4(p.u)
    vt = decode_int4(p.v)
    return (u @ vt.T).astype(dtype)


def sim_low_rank_q(x: jax.Array, rank: int) -> jax.Array:
    u, v, _ = subspace_iter(x.astype(jnp.float32), rank, num_iters=2)
    u = sim_int4(u, axis=0)
    v = sim_int4(v, axis=1)
    return (u @ v).astype(x.dtype)


# ---------------------------------------------------------------------------
# SPARSE — 1:M structured sparsity (reference compress_topk, marked obsolete)
# ---------------------------------------------------------------------------


def encode_sparse(x: jax.Array, m: int) -> SparsePayload:
    n, c = x.shape
    assert c % m == 0
    x32 = x.astype(jnp.float32).reshape(n, c // m, m)
    idx = jnp.argmax(jnp.abs(x32), axis=-1)
    vals = jnp.take_along_axis(x32, idx[..., None], axis=-1)[..., 0]
    return SparsePayload(_wire(vals), idx.astype(jnp.uint8))


def decode_sparse(p: SparsePayload, m: int, dtype=jnp.float32) -> jax.Array:
    n, g = p.values.shape
    onehot = jax.nn.one_hot(p.indices, m, dtype=jnp.float32)
    out = onehot * p.values.astype(jnp.float32)[..., None]
    return out.reshape(n, g * m).astype(dtype)


def sim_sparse(x: jax.Array, m: int) -> jax.Array:
    return decode_sparse(encode_sparse(x, m), m, dtype=x.dtype)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def encode(
    x: jax.Array,
    method: CompressType,
    *,
    rank: int = -1,
    sparse_ratio: int = 8,
    awl_scale: Optional[jax.Array] = None,
) -> Payload:
    """Compress an (N, C) tensor into a static-shape packed payload."""
    if method in (CompressType.IDENTITY, CompressType.WARMUP):
        return x
    if method == CompressType.BINARY:
        return encode_binary(x, rank)
    if method == CompressType.INT2:
        return encode_int2(x)
    if method == CompressType.INT2_MINMAX:
        return encode_int2_minmax(x)
    if method == CompressType.INT4:
        return encode_int4(x, axis=0)
    if method == CompressType.INT8:
        return encode_int8(x)
    if method == CompressType.LOW_RANK:
        return encode_low_rank(x, rank)
    if method == CompressType.LOW_RANK_AWL:
        return encode_low_rank_awl(x, rank, awl_scale)
    if method == CompressType.LOW_RANK_Q:
        return encode_low_rank_q(x, rank)
    if method == CompressType.SPARSE:
        return encode_sparse(x, sparse_ratio)
    raise ValueError(f"unsupported compress type {method}")


def decode(
    payload: Payload,
    method: CompressType,
    *,
    dtype=jnp.float32,
    sparse_ratio: int = 8,
) -> jax.Array:
    """Inverse of :func:`encode` (shape is implied by the payload)."""
    if method in (CompressType.IDENTITY, CompressType.WARMUP):
        return payload.astype(dtype)
    if method == CompressType.BINARY:
        return decode_binary(payload, dtype)
    if method == CompressType.INT2:
        return decode_int2(payload, dtype)
    if method == CompressType.INT2_MINMAX:
        return decode_int2_minmax(payload, dtype)
    if method == CompressType.INT4:
        return decode_int4(payload, dtype)
    if method == CompressType.INT8:
        return decode_int8(payload, dtype)
    if method in (CompressType.LOW_RANK, CompressType.LOW_RANK_AWL):
        return decode_low_rank(payload, dtype)
    if method == CompressType.LOW_RANK_Q:
        return decode_low_rank_q(payload, dtype)
    if method == CompressType.SPARSE:
        return decode_sparse(payload, sparse_ratio, dtype)
    raise ValueError(f"unsupported compress type {method}")


def sim_roundtrip(
    x: jax.Array,
    method: CompressType,
    *,
    rank: int = -1,
    sparse_ratio: int = 8,
    awl_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Compress→decompress locally without packing (reference ``sim_compress``)."""
    if method in (CompressType.IDENTITY, CompressType.WARMUP):
        return x
    if method == CompressType.BINARY:
        return sim_binary(x, rank)
    if method == CompressType.INT2:
        return sim_int2(x)
    if method == CompressType.INT2_MINMAX:
        return sim_int2_minmax(x)
    if method == CompressType.INT4:
        return sim_int4(x, axis=0)
    if method == CompressType.INT8:
        return decode_int8(encode_int8(x), x.dtype)
    if method == CompressType.LOW_RANK:
        return sim_low_rank(x, rank)
    if method == CompressType.LOW_RANK_AWL:
        return sim_low_rank_awl(x, rank, awl_scale)
    if method == CompressType.LOW_RANK_Q:
        return sim_low_rank_q(x, rank)
    if method == CompressType.SPARSE:
        return sim_sparse(x, sparse_ratio)
    raise ValueError(f"unsupported compress type {method}")
