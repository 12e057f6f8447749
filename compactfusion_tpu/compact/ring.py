"""Compressed ring attention: the CompactFusion hot path.

Reference semantics: ``_compact_ring_fwd`` (``xfuser/compact/ring.py:119-275``):
each rank compresses its own K/V once (updating its base cache), the
*compressed payload* circulates around the ring, and every hop decompresses
against a per-(layer, source-rank) base cache — so each device keeps R base
pairs per layer, all bit-identical across devices (the error-feedback
consistency invariant).

TPU-native re-design:
  * yunchang RingComm send/recv of a flat fp16 buffer -> ``lax.ppermute`` of a
    static-shape payload *pytree* (packed uint8 words + bf16 scales).  On the
    wire this is exactly the compressed byte volume; XLA overlaps the permute
    with the flash-attention partial of the current block.
  * the ``CompactCache`` dict keyed ``f"{layer}-{rank}-{k|v}"`` becomes a
    :class:`CompactRingState` pytree with a leading ring-slot axis, threaded
    through the denoise scan by the caller.
  * ``compress_func(layer, step)`` is resolved to a static method per denoise
    step (warmup steps compile as a separate loop segment with raw payloads).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.compact.engine import (
    EFState,
    ef_compress,
    ef_decompress,
)
from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.ops.merge import merge_out_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES
from compactfusion_tpu.parallel.ring import _shift_perm, _with_joint


class CompactRingState(NamedTuple):
    """Per-layer EF caches for every ring source (leading axis = ring slot)."""

    k: EFState  # leaves (R, N, C)
    v: EFState  # leaves (R, N, C)


def init_ring_state(
    ring_size: int,
    tokens: int,
    channels: int,
    dtype=jnp.bfloat16,
    residual: int = 1,
    quantized: bool = False,
) -> CompactRingState:
    from compactfusion_tpu.compact.engine import init_ef_state

    # one slot via the engine initializer (it owns the quantized-cache
    # layout), stacked over the ring axis
    one = init_ef_state((tokens, channels), dtype, residual, quantized)
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (ring_size,) + a.shape), one
    )
    return CompactRingState(k=stacked, v=stacked)


def _slot(state: EFState, i) -> EFState:
    """Dynamic-index ring slot i out of the stacked EF state."""
    return jax.tree_util.tree_map(
        lambda a: lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False), state
    )


def _set_slot(state: EFState, i, new: EFState) -> EFState:
    return jax.tree_util.tree_map(
        lambda a, n: lax.dynamic_update_index_in_dim(a, n.astype(a.dtype), i, axis=0),
        state,
        new,
    )


def _as_nc(x: jax.Array) -> jax.Array:
    """(B, S, H, D) -> (B*S, H*D) — the (token, channel) codec layout
    (reference ``compact_compress`` reshape, ``main.py:176-183``)."""
    b, s, h, d = x.shape
    return x.reshape(b * s, h * d)


def _fused_compact_ring(
    q, k, v, state, cfg, axis_name, ring_size, scale,
    joint_k, joint_v, joint_strategy, interpret, codec="binary", awl=False,
):
    """Route through the single-kernel compressed ring
    (``ops/ring_flash_pallas.compact_binary_ring_flash``): packed payloads
    rotate by in-kernel RDMA with dequant + EF base update fused before each
    flash partial; the replicated joint block merges after (same math —
    online-softmax merging is order-independent)."""
    from jax.experimental.pallas import tpu as pltpu

    from compactfusion_tpu.compact.engine import EFState
    from compactfusion_tpu.ops.ring_flash_pallas import (
        compact_binary_ring_flash,
    )
    from compactfusion_tpu.parallel.mesh import ambient_mesh_axes

    axes = ambient_mesh_axes(axis_name, ring_size)

    awl_k = None
    if awl:
        # AWL: V-norm key-importance weights for the K fit, from the LOCAL
        # uncompressed V (reference compact_update_awl_scale, ring.py:86-103)
        from compactfusion_tpu.compact import codecs

        awl_k = codecs.awl_row_scale(_as_nc(v))
    out, lse, kb, vb = compact_binary_ring_flash(
        q, k, v, state.k.base, state.v.base,
        axis_name=axis_name,
        ring_size=ring_size,
        mesh_axes=axes,
        comp_rank=cfg.comp_rank,
        scale=scale,
        codec=codec,
        awl_k=awl_k,
        quantized=cfg.quantized_cache,
        interpret=(
            pltpu.InterpretParams(dma_execution_mode=interpret)
            if interpret
            else False
        ),
    )
    if joint_k is not None and joint_strategy != "none":
        j_out, j_lse = attn_with_lse(q, joint_k, joint_v, scale=scale)
        out, lse = merge_out_lse(out, lse, j_out, j_lse)
    if cfg.quantized_cache:
        # kb/vb are Int8Payload triplets already in the cache dtypes
        new_state = CompactRingState(
            k=EFState(base=kb, delta_base=None),
            v=EFState(base=vb, delta_base=None),
        )
    else:
        new_state = CompactRingState(
            k=EFState(base=kb.astype(state.k.base.dtype), delta_base=None),
            v=EFState(base=vb.astype(state.v.base.dtype), delta_base=None),
        )
    return out.astype(q.dtype), new_state


def compact_ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    state: CompactRingState,
    *,
    cfg: CompactConfig,
    method: CompressType,
    axis_name: str = AXIS_RING,
    ring_size: int,
    scale: Optional[float] = None,
    joint_k: Optional[jax.Array] = None,
    joint_v: Optional[jax.Array] = None,
    joint_strategy: str = "none",
    fused=False,
) -> Tuple[jax.Array, CompactRingState]:
    """Ring attention exchanging compressed K/V deltas.

    Per-device views inside shard_map; q/k/v (B, S_local, H, D).  ``method``
    is the static codec for this denoise step (WARMUP -> raw payload).
    ``fused``: opt-in single-kernel compressed ring for the 1-bit / int2 +
    residual-1 + EF configurations (TPU, or ``"interpret"`` in tests);
    everything else takes the ppermute path.

    Returns (out, new_state); out in q.dtype, state updated in every slot
    (own slot at compress time, each source slot at decompress time) exactly
    like the reference cache (``ring.py:184-206``).
    """
    from compactfusion_tpu.utils import collector

    b, s, h, d = k.shape
    kv_shape = (b, s, h, d)

    _FUSED_CODECS = {
        CompressType.BINARY: "binary",
        CompressType.INT2: "int2",
        CompressType.LOW_RANK: "lowrank",
        CompressType.LOW_RANK_AWL: "lowrank",
    }
    if (
        fused
        and ring_size > 1
        and method in _FUSED_CODECS
        and (cfg.comp_rank >= 1 or method in
             (CompressType.BINARY, CompressType.INT2))
        and cfg.residual == 1
        and cfg.error_feedback
        and not cfg.simulate
        # int8 EF caches ride the kernel at B == 1 (the kernel requantizes
        # per (head, channel) over its token rows, which matches the jnp
        # path's per-channel-over-N stats only for one batch row; CFG/dp
        # parallel always present B == 1 per device)
        and (not cfg.quantized_cache or b == 1)
        and not cfg.log_stats
        # the fused kernel has no collector taps — fall through to the
        # ppermute path so offline-analysis dumps stay complete
        and not collector.enabled()
        # kernel shape preconditions (compact_binary_ring_flash asserts
        # them): q may carry prepended joint text rows of arbitrary length
        # (e.g. CogVideoX S_txt=226), which the ppermute path handles fine
        and q.shape[1] % 8 == 0
        and d % 8 == 0
        and state.k.delta_base is None
    ):
        # "interpret" -> eager-DMA emulation; "interpret:on_wait" -> the
        # ordering-hostile schedule (every DMA deferred to its wait point) —
        # the only available stress for the RDMA/barrier logic without
        # multi-chip hardware
        interp = (
            fused.split(":", 1)[1] if isinstance(fused, str) and ":" in fused
            else ("eager" if fused == "interpret" else None)
        )
        if interp or jax.default_backend() == "tpu":
            out, state = _fused_compact_ring(
                q, k, v, state, cfg, axis_name, ring_size, scale,
                joint_k, joint_v, joint_strategy, interp,
                codec=_FUSED_CODECS[method],
                awl=method == CompressType.LOW_RANK_AWL,
            )
            if cfg.check_consistency:
                _consistency_assert(state, axis_name)
            return out, state

    my = lax.axis_index(axis_name)

    if collector.enabled():
        # offline-analysis taps (reference hybrid/attn_layer.py:181-188)
        collector.collect(q, "q", rank=my)
        collector.collect(k, "k", rank=my)
        collector.collect(v, "v", rank=my)

    # --- sender: compress own K/V against own base slot (update_cache=True)
    k_own, v_own = _slot(state.k, my), _slot(state.v, my)
    awl = None
    if method == CompressType.LOW_RANK_AWL:
        # attention-aware weighting: key importance from the LOCAL V rows
        # (reference compact_update_awl_scale, ring.py:86-103 — K gets the
        # V-norm scale, V itself is fit unweighted: scale_v stays None)
        from compactfusion_tpu.compact import codecs

        awl = codecs.awl_row_scale(_as_nc(v))
    if cfg.log_stats and not cfg.quantized_cache and method not in (
        CompressType.WARMUP, CompressType.IDENTITY
    ):
        # analysis mode (reference StatsLogger.log + eigenvalue profiling,
        # stats.py:683-762): ordered callbacks arrive layer-major per step,
        # so the host can reshape by depth.  Sender-side ground truth: the
        # reconstruction every receiver will hold equals our post-EF base.
        from compactfusion_tpu.compact import stats

        k_nc = _as_nc(k).astype(jnp.float32)
        delta = k_nc - k_own.base.astype(jnp.float32)
        stats.log_spectrum_inside_jit("k-activation", k_nc, rank=my)
        stats.log_spectrum_inside_jit("k-delta", delta, rank=my)

    payload_k, k_own = ef_compress(_as_nc(k), k_own, cfg, method, awl_scale=awl)
    payload_v, v_own = ef_compress(_as_nc(v), v_own, cfg, method)

    if cfg.log_stats and not cfg.quantized_cache and method not in (
        CompressType.WARMUP, CompressType.IDENTITY
    ) and cfg.residual == 1 and cfg.error_feedback:
        from compactfusion_tpu.compact import stats

        stats.log_inside_jit(
            "k", -1,
            stats.compression_metrics(_as_nc(k), k_own.base),
            ordered=True, rank=my,
        )
        stats.log_inside_jit(
            "v", -1,
            stats.compression_metrics(_as_nc(v), v_own.base),
            ordered=True, rank=my,
        )
    if collector.enabled():
        # post-EF base caches (reference compact/utils.py:140-143 tap)
        collector.collect(k_own.base, "kbase", rank=my)
        collector.collect(v_own.base, "vbase", rank=my)
    state = CompactRingState(
        k=_set_slot(state.k, my, k_own), v=_set_slot(state.v, my, v_own)
    )

    if ring_size == 1:
        kk, vv = _with_joint(k, v, joint_k, joint_v, joint_strategy, 0, 1)
        out, _ = attn_with_lse(q, kk, vv, scale=scale)
        return out.astype(q.dtype), state

    perm = _shift_perm(ring_size)
    out = lse = None
    payload = (payload_k, payload_v)
    for step in range(ring_size):
        if step > 0:
            payload = lax.ppermute(payload, axis_name, perm)
            src = (my - step) % ring_size
            k_src, v_src = _slot(state.k, src), _slot(state.v, src)
            x_k, k_src = ef_decompress(payload[0], k_src, cfg, method)
            x_v, v_src = ef_decompress(payload[1], v_src, cfg, method)
            state = CompactRingState(
                k=_set_slot(state.k, src, k_src), v=_set_slot(state.v, src, v_src)
            )
            blk_k = x_k.reshape(kv_shape).astype(k.dtype)
            blk_v = x_v.reshape(kv_shape).astype(v.dtype)
        else:
            # step 0 attends over the local *exact* K/V (reference ring.py:207)
            blk_k, blk_v = k, v

        kk, vv = _with_joint(
            blk_k, blk_v, joint_k, joint_v, joint_strategy, step, ring_size
        )
        block_out, block_lse = attn_with_lse(q, kk, vv, scale=scale)
        out, lse = merge_out_lse(out, lse, block_out, block_lse)

    if cfg.check_consistency:
        _consistency_assert(state, axis_name)

    return out.astype(q.dtype), state


def _consistency_assert(state: CompactRingState, axis_name: str):
    """Distributed invariant oracle (reference ring.py:273-274 ->
    CompactCache.check_consistency): every cache slot must be identical
    across ring ranks after the exchange."""
    from compactfusion_tpu.compact.engine import check_consistency

    dev_k = check_consistency(state.k, axis_name)
    dev_v = check_consistency(state.v, axis_name)

    def _assert(dk, dv):
        assert dk < 1e-2 and dv < 1e-2, (
            f"EF cache divergence across ring ranks: k={dk} v={dv}"
        )

    jax.debug.callback(_assert, dev_k, dev_v)


def compact_usp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    state: CompactRingState,
    *,
    cfg: CompactConfig,
    method: CompressType,
    ulysses_size: int,
    ring_size: int,
    ulysses_axis: str = AXIS_ULYSSES,
    ring_axis: str = AXIS_RING,
    scale: Optional[float] = None,
    joint_q: Optional[jax.Array] = None,
    joint_k: Optional[jax.Array] = None,
    joint_v: Optional[jax.Array] = None,
    joint_strategy: str = "none",
    fused=False,
) -> Tuple[jax.Array, CompactRingState]:
    """USP (ulysses x ring) with the compressed ring inner loop.

    Mirrors ``xFuserLongContextAttention.forward`` with compact enabled
    (``hybrid/attn_layer.py:59-64,190-210``).  The joint/ulysses handling is
    the shared :func:`compactfusion_tpu.parallel.usp.usp_wrap` (one wrapper
    for the plain and the compressed path, so they cannot diverge); only the
    inner ring differs.
    """
    from compactfusion_tpu.parallel.usp import usp_wrap

    def inner(q, k, v, joint_k, joint_v):
        return compact_ring_attention(
            q,
            k,
            v,
            state,
            cfg=cfg,
            method=method,
            axis_name=ring_axis,
            ring_size=ring_size,
            scale=scale,
            joint_k=joint_k,
            joint_v=joint_v,
            joint_strategy=joint_strategy,
            fused=fused,
        )

    return usp_wrap(
        inner, q, k, v,
        ulysses_size=ulysses_size,
        ulysses_axis=ulysses_axis,
        joint_q=joint_q,
        joint_k=joint_k,
        joint_v=joint_v,
        joint_strategy=joint_strategy,
    )
