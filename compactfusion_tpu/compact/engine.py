"""Residual / error-feedback compression engine as pure state transitions.

Reference semantics: ``compact_compress`` / ``compact_decompress``
(``xfuser/compact/main.py:168-388``) — the CompactFusion algorithm:

  1. delta = x - base               (residual order 1; order 2 uses
                                     delta_delta = x - base - delta_base)
  2. payload = quantize(delta)
  3. receiver: x_hat = base + dequant(payload)
  4. BOTH sender and receiver set base <- x_hat (error feedback), so the two
     caches stay bit-identical and quantization error is compensated at the
     next step instead of accumulating.

The reference implements this against a process-global mutable ``CompactCache``
keyed by ``f"{layer}-{rank}-{k|v}"``; here the cache is an explicit
:class:`EFState` pytree that the caller threads through ``lax.scan`` —
this is what makes error feedback jit-compatible on TPU.

Sender-side ``ef_compress`` and receiver-side ``ef_decompress`` compute the
*same* new base from the *same* payload; :func:`tests.compact.test_engine`
asserts this equivalence (the reference's ``CompactCache.check_consistency``
oracle, ``compact/utils.py:164-196``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.compact import codecs


class EFState(NamedTuple):
    """Per-tensor compression state (the reference's base / delta_base pair)."""

    base: jax.Array  # (N, C)
    delta_base: Optional[jax.Array]  # (N, C) when residual == 2, else None


def init_ef_state(
    shape: Tuple[int, int],
    dtype=jnp.bfloat16,
    residual: int = 2,
    quantized: bool = False,
) -> EFState:
    z = jnp.zeros(shape, dtype)
    if quantized:
        # BOTH entries quantize (the reference CompactCache.put quantizes
        # whatever it stores) — and a scan carry must keep one stable
        # structure/dtype, which a mixed int8-base / raw-delta_base state
        # would break after the first requant
        return EFState(
            base=_quant_base(z),
            delta_base=_quant_base(z) if residual == 2 else None,
        )
    return EFState(base=z, delta_base=z if residual == 2 else None)


def _quant_base(x):
    """int8-quantize a base cache entry (reference ``quantized_cache``,
    ``compact/utils.py:123-140`` — halves EF cache memory; quantization is
    deterministic so sender/receiver caches stay identical)."""
    from compactfusion_tpu.compact import codecs

    return codecs.encode_int8(x)


def _dequant_state(state: EFState, dtype) -> EFState:
    from compactfusion_tpu.compact import codecs

    return EFState(
        base=codecs.decode_int8(state.base, dtype),
        delta_base=(
            None
            if state.delta_base is None
            else codecs.decode_int8(state.delta_base, dtype)
        ),
    )


def _requant_state(state: EFState) -> EFState:
    return EFState(
        base=_quant_base(state.base),
        delta_base=(
            None if state.delta_base is None else _quant_base(state.delta_base)
        ),
    )


def _use_fastpath(cfg: CompactConfig, method: CompressType) -> bool:
    """Fused Pallas quant kernels (reference fastpath.py preconditions:
    residual==1 + error feedback + no simulate, utils.py:83-106)."""
    if not cfg.fastpath or cfg.simulate:
        return False
    if cfg.residual != 1 or not cfg.error_feedback:
        return False
    if method not in (CompressType.BINARY, CompressType.INT2):
        return False
    return jax.default_backend() == "tpu"


def _fastpath_compress(x, state: EFState, cfg: CompactConfig, method, update_cache):
    from compactfusion_tpu.compact import codecs
    from compactfusion_tpu.ops import quant_pallas as qp

    delta32 = x.astype(jnp.float32) - state.base.astype(jnp.float32)
    # scales must cross the _wire() optimization barrier, not a bare astype:
    # the Pallas operand pins the KERNEL side to bf16, but the same u/v feed
    # jnp consumers in the same program (payload decode at ring_size==1,
    # parity tests, stats probes) where XLA elides the f32->bf16->f32
    # convert pair — handing them scales real inter-chip payloads never carry
    if method == CompressType.BINARY:
        u, v = codecs._scale_uv(delta32, cfg.comp_rank)
        u, v = codecs._wire(u), codecs._wire(v)
        packed, new_base = qp.binary_quant_fastpath(x, state.base, u, v)
        payload = codecs.BinaryPayload(packed, u, v)
    else:
        u, v = codecs._mean_scale_uv(delta32)
        u, v = codecs._wire(u), codecs._wire(v)
        packed, new_base = qp.int2_quant_fastpath(x, state.base, u, v)
        payload = codecs.Int2Payload(packed, u, v)
    if update_cache:
        state = EFState(base=new_base, delta_base=state.delta_base)
    return payload, state


def _fastpath_decompress(payload, state: EFState, cfg: CompactConfig, method, update_cache):
    from compactfusion_tpu.ops import quant_pallas as qp

    if method == CompressType.BINARY:
        x_hat = qp.binary_dequant_fastpath(
            payload.packed, state.base, payload.scale_u, payload.scale_v
        )
    else:
        x_hat = qp.int2_dequant_fastpath(
            payload.packed, state.base, payload.scale_u, payload.scale_v
        )
    if update_cache:
        state = EFState(base=x_hat, delta_base=state.delta_base)
    return x_hat, state


def _encode(x, cfg: CompactConfig, method: CompressType, awl_scale=None):
    if cfg.simulate:
        # simulate mode sends the dense roundtripped tensor (main.py:117-121)
        return codecs.sim_roundtrip(
            x, method, rank=cfg.comp_rank, sparse_ratio=cfg.sparse_ratio,
            awl_scale=awl_scale,
        )
    return codecs.encode(
        x, method, rank=cfg.comp_rank, sparse_ratio=cfg.sparse_ratio,
        awl_scale=awl_scale,
    )


def _decode(payload, cfg: CompactConfig, method: CompressType, dtype):
    if cfg.simulate:
        return payload.astype(dtype)
    return codecs.decode(payload, method, dtype=dtype, sparse_ratio=cfg.sparse_ratio)


def ef_compress(
    x: jax.Array,
    state: EFState,
    cfg: CompactConfig,
    method: CompressType,
    update_cache: bool = True,
    awl_scale: Optional[jax.Array] = None,
):
    """Sender side: compress ``x`` against ``state``.

    With ``cfg.quantized_cache`` the base lives int8-quantized in the carry
    (dequantize on entry, requantize on exit — the reference CompactCache
    quantize/put semantics).  ``awl_scale``: optional (N,) row-importance
    weights for :data:`CompressType.LOW_RANK_AWL` (sender-only; the EF base
    update uses the decoded payload, so receiver caches stay identical)."""
    if cfg.quantized_cache:
        # dequantize to fp32 on BOTH sender and receiver so the EF math (and
        # hence the requantized caches) stay bit-identical across ranks
        orig = state
        payload, new_state = _ef_compress_raw(
            x, _dequant_state(state, jnp.float32), cfg, method, update_cache,
            awl_scale,
        )
        return payload, (_requant_state(new_state) if update_cache else orig)
    return _ef_compress_raw(x, state, cfg, method, update_cache, awl_scale)


def _ef_compress_raw(
    x: jax.Array,
    state: EFState,
    cfg: CompactConfig,
    method: CompressType,
    update_cache: bool = True,
    awl_scale: Optional[jax.Array] = None,
):
    """Sender side: compress ``x`` against ``state``.

    Returns ``(payload, new_state)``.  ``payload`` shape depends only on the
    *static* ``method``; for ``WARMUP``/``IDENTITY`` it is the raw tensor.

    Mirrors ``compact_compress`` (``main.py:168-270``).
    """
    dtype = state.base.dtype
    x = x.astype(dtype)

    if method == CompressType.WARMUP:
        # Warmup steps send the raw activation and prime the caches.  With
        # residual=2 the reference sets delta_base = x - previous_base once a
        # base exists (main.py:180-192); our state starts at base=0, so the
        # first warmup step writes delta_base = x, which the second warmup
        # step overwrites — published configs always use >= 2 warmup steps.
        if update_cache:
            delta_base = x - state.base if cfg.residual == 2 else state.delta_base
            state = EFState(base=x, delta_base=delta_base)
        return x, state

    if method == CompressType.IDENTITY or not cfg.enabled:
        return x, state

    if cfg.residual == 0:
        payload = _encode(x, cfg, method, awl_scale)
        return payload, state

    if cfg.residual == 1:
        if _use_fastpath(cfg, method):
            return _fastpath_compress(x, state, cfg, method, update_cache)
        delta = x - state.base
        payload = _encode(delta, cfg, method, awl_scale)
        recv_delta = _decode(payload, cfg, method, dtype)
        reconstructed = state.base + recv_delta
        if update_cache:
            new_base = reconstructed if cfg.error_feedback else x
            state = EFState(base=new_base, delta_base=state.delta_base)
        return payload, state

    # residual == 2: second-order delta with decay (main.py:244-266)
    delta_delta = x - state.base - state.delta_base
    payload = _encode(delta_delta, cfg, method, awl_scale)
    rdd = _decode(payload, cfg, method, dtype)
    new_base = state.base + state.delta_base + rdd
    new_delta_base = (state.delta_base + rdd) * jnp.asarray(
        cfg.delta_decay_factor, dtype
    )
    if update_cache:
        state = EFState(base=new_base, delta_base=new_delta_base)
    return payload, state


def ef_decompress(
    payload,
    state: EFState,
    cfg: CompactConfig,
    method: CompressType,
    update_cache: bool = True,
):
    """Receiver side with optional int8-quantized cache (see ef_compress)."""
    if cfg.quantized_cache:
        orig = state
        x_hat, new_state = _ef_decompress_raw(
            payload, _dequant_state(state, jnp.float32), cfg, method, update_cache
        )
        return x_hat, (_requant_state(new_state) if update_cache else orig)
    return _ef_decompress_raw(payload, state, cfg, method, update_cache)


def _ef_decompress_raw(
    payload,
    state: EFState,
    cfg: CompactConfig,
    method: CompressType,
    update_cache: bool = True,
):
    """Receiver side: reconstruct the activation from ``payload``.

    Returns ``(x_hat, new_state)`` with ``new_state`` identical to the
    sender's (error-feedback consistency invariant).

    Mirrors ``compact_decompress`` (``main.py:321-388``).
    """
    dtype = state.base.dtype

    if method == CompressType.WARMUP:
        x = payload.astype(dtype)
        if update_cache:
            delta_base = x - state.base if cfg.residual == 2 else state.delta_base
            state = EFState(base=x, delta_base=delta_base)
        return x, state

    if method == CompressType.IDENTITY or not cfg.enabled:
        return payload.astype(dtype), state

    if cfg.residual == 0:
        return _decode(payload, cfg, method, dtype), state

    if cfg.residual == 1:
        if _use_fastpath(cfg, method):
            return _fastpath_decompress(payload, state, cfg, method, update_cache)
        recv_delta = _decode(payload, cfg, method, dtype)
        reconstructed = state.base + recv_delta
        if update_cache:
            state = EFState(base=reconstructed, delta_base=state.delta_base)
        return reconstructed, state

    rdd = _decode(payload, cfg, method, dtype)
    reconstructed = state.base + state.delta_base + rdd
    new_delta_base = (state.delta_base + rdd) * jnp.asarray(
        cfg.delta_decay_factor, dtype
    )
    if update_cache:
        state = EFState(base=reconstructed, delta_base=new_delta_base)
    return reconstructed, state


def check_consistency(state: EFState, axis_name: str, atol: float = 1e-2):
    """Distributed invariant oracle (reference ``CompactCache.check_consistency``).

    Inside ``shard_map``: all-reduce-mean every cache entry over ``axis_name``
    and return the max abs deviation of the local copy from the mean.  The
    caller asserts it is < ``atol``.  Catches sender/receiver error-feedback
    divergence — the algorithm's main correctness hazard.
    """
    n = jax.lax.psum(1, axis_name)

    def dev(x):
        x32 = x.astype(jnp.float32)
        mean = jax.lax.psum(x32, axis_name) / n
        return jnp.max(jnp.abs(x32 - mean))

    devs = [dev(x) for x in jax.tree_util.tree_leaves(state)]
    return jnp.max(jnp.stack(devs))
