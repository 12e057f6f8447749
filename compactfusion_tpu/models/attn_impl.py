"""Pluggable self-attention strategies for DiT backbones.

The reference routes attention through per-model ``AttnProcessor`` subclasses
that consult global parallel state (``xfuser/model_executor/layers/
attention_processor.py:181-391``); here the strategy is an explicit static
object passed to the model forward.  Every strategy has the same call shape

    out, new_state = impl(q, k, v, state_slice)

so backbones can ``lax.scan`` over layers with the (possibly empty) per-layer
compression state threaded as scan xs/ys.  State pytrees are empty tuples for
stateless strategies — they contribute no arrays to the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.compact.ring import (
    compact_usp_attention,
    init_ring_state,
)
from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.ops.attention import sdpa
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES
from compactfusion_tpu.parallel.usp import usp_attention


@dataclasses.dataclass(frozen=True)
class SingleDeviceAttn:
    """Plain attention — the no-parallelism baseline."""

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        del n_layers, batch, seq_local, heads, head_dim, dtype
        return ()

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        if joint_q is not None:
            assert joint_strategy == "front"
            q = jnp.concatenate([joint_q, q], axis=1)
            k = jnp.concatenate([joint_k, k], axis=1)
            v = jnp.concatenate([joint_v, v], axis=1)
        return sdpa(q, k, v), state


@dataclasses.dataclass(frozen=True)
class USPAttn:
    """Uncompressed hybrid ulysses x ring sequence parallelism."""

    ulysses_size: int = 1
    ring_size: int = 1
    ulysses_axis: str = AXIS_ULYSSES
    ring_axis: str = AXIS_RING
    #: route the ring through the fused RDMA+flash Pallas kernel (TPU only)
    fused_ring: bool = False

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        del n_layers, batch, seq_local, heads, head_dim, dtype
        return ()

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        out = usp_attention(
            q,
            k,
            v,
            ulysses_size=self.ulysses_size,
            ring_size=self.ring_size,
            ulysses_axis=self.ulysses_axis,
            ring_axis=self.ring_axis,
            joint_q=joint_q,
            joint_k=joint_k,
            joint_v=joint_v,
            joint_strategy=joint_strategy if joint_q is not None else "none",
            fused_ring=self.fused_ring,
        )
        return out, state


@dataclasses.dataclass(frozen=True)
class PatchKVAttn:
    """PipeFusion patched attention: fresh Q/K/V for the current patch, stale
    full-sequence K/V cache for the rest.

    Reference semantics: ``CacheManager._naive_cache_update``
    (``xfuser/core/cache_manager/cache_manager.py:105``) — slice-update the
    full-sequence KV by the patch's token range, then attend the patch
    queries against the whole (partially stale) sequence.

    State (stacked per layer): k_cache/v_cache (L, B, S_total, H, D) and
    offset (L,) int32 — the pipeline writes the current patch's token offset
    into every layer's slot each micro-round.
    """

    def init_state(self, n_layers, batch, seq_total, heads, head_dim, dtype):
        z = jnp.zeros((n_layers, batch, seq_total, heads, head_dim), dtype)
        return {
            "k_cache": z,
            "v_cache": z,
            "offset": jnp.zeros((n_layers,), jnp.int32),
        }

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        off = state["offset"]
        kc = jax.lax.dynamic_update_slice(
            state["k_cache"], k.astype(state["k_cache"].dtype), (0, off, 0, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            state["v_cache"], v.astype(state["v_cache"].dtype), (0, off, 0, 0)
        )
        k_full = kc.astype(q.dtype)
        v_full = vc.astype(q.dtype)
        if joint_q is not None:
            # joint (text) tokens are NOT cached: fresh every patch forward
            # (reference patched FLUX/SD3 attention — only image K/V ages)
            assert joint_strategy == "front", joint_strategy
            q = jnp.concatenate([joint_q, q], axis=1)
            k_full = jnp.concatenate([joint_k, k_full], axis=1)
            v_full = jnp.concatenate([joint_v, v_full], axis=1)
        out = sdpa(q, k_full, v_full)
        return out, {"k_cache": kc, "v_cache": vc, "offset": off}


@dataclasses.dataclass(frozen=True)
class PatchKVUlyssesAttn:
    """PipeFusion patched attention UNDER Ulysses sequence parallelism.

    Reference semantics: ``CacheManager._sequence_parallel_cache_update``
    (``cache_manager.py:140``) — the stale full-sequence K/V cache lives
    sharded by HEADS (each ulysses rank holds H/U heads of ALL tokens);
    the fresh patch K/V arrives token-sharded, the ulysses all-to-all swaps
    it to head sharding, the cache is slice-updated at the patch offset,
    patch queries attend the full (partially stale) sequence, and the
    inverse all-to-all restores token sharding.
    """

    ulysses_size: int
    ulysses_axis: str = AXIS_ULYSSES

    def init_state(self, n_layers, batch, seq_total, heads, head_dim, dtype):
        z = jnp.zeros(
            (n_layers, batch, seq_total, heads // self.ulysses_size, head_dim),
            dtype,
        )
        return {
            "k_cache": z,
            "v_cache": z,
            "offset": jnp.zeros((n_layers,), jnp.int32),
        }

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        from compactfusion_tpu.parallel.ulysses import (
            scatter_heads_gather_seq,
            scatter_seq_gather_heads,
            slice_joint_heads,
        )

        ax = self.ulysses_axis
        q = scatter_heads_gather_seq(q, ax)  # (B, s_patch, H/U, D)
        k = scatter_heads_gather_seq(k, ax)
        v = scatter_heads_gather_seq(v, ax)
        off = state["offset"]
        kc = jax.lax.dynamic_update_slice(
            state["k_cache"], k.astype(state["k_cache"].dtype), (0, off, 0, 0)
        )
        vc = jax.lax.dynamic_update_slice(
            state["v_cache"], v.astype(state["v_cache"].dtype), (0, off, 0, 0)
        )
        k_full = kc.astype(q.dtype)
        v_full = vc.astype(q.dtype)
        if joint_q is not None:
            assert joint_strategy == "front", joint_strategy
            # joint (text) tensors are replicated: take this rank's heads
            jq = slice_joint_heads(joint_q, ax, self.ulysses_size)
            jk = slice_joint_heads(joint_k, ax, self.ulysses_size)
            jv = slice_joint_heads(joint_v, ax, self.ulysses_size)
            q = jnp.concatenate([jq, q], axis=1)
            k_full = jnp.concatenate([jk, k_full], axis=1)
            v_full = jnp.concatenate([jv, v_full], axis=1)
        out = sdpa(q, k_full, v_full)
        if joint_q is not None:
            s_j = joint_q.shape[1]
            # joint rows were computed head-sharded on every rank; gather
            # their heads (they are replicated row-wise) and re-shard the
            # patch rows by tokens, then return ONE [joint; patch] array —
            # the uniform strategy contract every model forward slices
            # (e.g. flux.py `o[:, :s_txt]`)
            out_j = jax.lax.all_gather(
                out[:, :s_j], ax, axis=2, tiled=True
            )
            out_p = scatter_seq_gather_heads(out[:, s_j:], ax)
            out = jnp.concatenate([out_j, out_p], axis=1)
            return out, {"k_cache": kc, "v_cache": vc, "offset": off}
        out = scatter_seq_gather_heads(out, ax)
        return out, {"k_cache": kc, "v_cache": vc, "offset": off}


@dataclasses.dataclass(frozen=True)
class SimRingAttn:
    """Single-device emulation of the compressed ring, at topology fidelity.

    Reproduces what a ``ring_size=R`` compressed run computes, on ONE device
    (the real-scale quality study on the one real chip — reference
    ``simulate`` semantics ``xfuser/compact/main.py:117-121``, upgraded from
    codec-error injection to full ring-topology fidelity): the sequence is
    split into R chunks; each chunk's K/V runs the same EF state machine as
    a ring rank's own block (``engine.ef_compress``); query chunk i attends
    its own chunk EXACT (ring step 0 reads the local shard uncompressed,
    ``compact/ring.py:142-144``) and the other R-1 chunks RECONSTRUCTED —
    exactly the K/V mix device i sees in a real ring.  Joint (text) K/V is
    appended exact once per query chunk, like ``_with_joint`` does at its
    designated ring step.
    """

    cfg: CompactConfig
    method: CompressType
    ring_size: int

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        assert seq_local % self.ring_size == 0
        n = batch * (seq_local // self.ring_size)
        c = heads * head_dim
        one = init_ring_state(
            self.ring_size, n, c, dtype, self.cfg.residual,
            quantized=self.cfg.quantized_cache,
        )
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n_layers,) + a.shape), one
        )

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        from compactfusion_tpu.compact import codecs
        from compactfusion_tpu.compact.engine import ef_compress, ef_decompress
        from compactfusion_tpu.compact.ring import _set_slot, _slot

        assert joint_q is None, "joint queries are not emulated"
        b, s, h, d = k.shape
        R = self.ring_size
        sc = s // R

        def as_nc(x):
            return x.reshape(b * sc, h * d)

        k_chunks = jnp.split(k, R, axis=1)
        v_chunks = jnp.split(v, R, axis=1)
        recon_k, recon_v = [], []
        for j in range(R):
            k_st, v_st = _slot(state.k, j), _slot(state.v, j)
            if (
                self.cfg.log_stats
                and not self.cfg.quantized_cache
                and self.method != CompressType.WARMUP
                and self.cfg.residual >= 1
            ):
                # same taps as the real ring (compact/ring.py) so the
                # single-device emulation feeds the spectrum tooling;
                # IDENTITY is included here (unlike the wire path) because
                # identity+EF makes "k-delta" the TRUE step delta — the
                # codec-independent spectrum the coherence study needs
                from compactfusion_tpu.compact import stats

                k_nc_f = as_nc(k_chunks[j]).astype(jnp.float32)
                stats.log_spectrum_inside_jit("k-activation", k_nc_f, rank=j)
                stats.log_spectrum_inside_jit(
                    "k-delta", k_nc_f - k_st.base.astype(jnp.float32), rank=j
                )
            awl = None
            if self.method == CompressType.LOW_RANK_AWL:
                awl = codecs.awl_row_scale(as_nc(v_chunks[j]))
            pk, k_new = ef_compress(
                as_nc(k_chunks[j]), k_st, self.cfg, self.method, awl_scale=awl
            )
            pv, v_new = ef_compress(
                as_nc(v_chunks[j]), v_st, self.cfg, self.method
            )
            # receiver view from the PRE-compress state — identical to the
            # sender's new base (the EF consistency invariant)
            rk, _ = ef_decompress(pk, k_st, self.cfg, self.method, update_cache=False)
            rv, _ = ef_decompress(pv, v_st, self.cfg, self.method, update_cache=False)
            recon_k.append(rk.reshape(b, sc, h, d).astype(k.dtype))
            recon_v.append(rv.reshape(b, sc, h, d).astype(v.dtype))
            if (
                self.cfg.log_stats
                and not self.cfg.quantized_cache
                and self.method
                not in (CompressType.WARMUP, CompressType.IDENTITY)
                and self.cfg.residual == 1
                and self.cfg.error_feedback
            ):
                # per-step codec error vs the post-EF base — same tap and
                # keys as the wire ring (compact/ring.py), so
                # dump_err_vs_steps works on the single-device emulation
                from compactfusion_tpu.compact import stats

                stats.log_inside_jit(
                    "k", -1,
                    stats.compression_metrics(as_nc(k_chunks[j]), k_new.base),
                    ordered=True, rank=j,
                )
                stats.log_inside_jit(
                    "v", -1,
                    stats.compression_metrics(as_nc(v_chunks[j]), v_new.base),
                    ordered=True, rank=j,
                )
            state = type(state)(
                k=_set_slot(state.k, j, k_new), v=_set_slot(state.v, j, v_new)
            )

        q_chunks = jnp.split(q, R, axis=1)
        outs = []
        for i in range(R):
            kk = [k_chunks[j] if j == i else recon_k[j] for j in range(R)]
            vv = [v_chunks[j] if j == i else recon_v[j] for j in range(R)]
            if joint_k is not None:
                if joint_strategy == "front":
                    kk = [joint_k] + kk
                    vv = [joint_v] + vv
                else:
                    kk = kk + [joint_k]
                    vv = vv + [joint_v]
            outs.append(
                sdpa(q_chunks[i], jnp.concatenate(kk, 1), jnp.concatenate(vv, 1))
            )
        return jnp.concatenate(outs, axis=1), state


@dataclasses.dataclass(frozen=True)
class CompactUSPAttn:
    """CompactFusion: USP with the compressed ring and EF state threading.

    ``method`` is the static codec for the current denoise step; the pipeline
    rebuilds the step function when the schedule switches segment (warmup ->
    compressed), exactly once per segment.
    """

    cfg: CompactConfig
    method: CompressType
    ulysses_size: int = 1
    ring_size: int = 1
    ulysses_axis: str = AXIS_ULYSSES
    ring_axis: str = AXIS_RING
    #: route the 1-bit+EF configuration through the fused compressed ring
    #: kernel (``ops/ring_flash_pallas.compact_binary_ring_flash``); TPU
    #: only, "interpret" for tests, other codecs fall back to ppermute
    fused_ring: bool = False

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        """Stacked per-layer ring caches: leaves (L, R, N, C).

        ``seq_local``/``heads`` are the PER-DEVICE values seen by the ring
        loop (after the ulysses all-to-all): N = batch * seq_local * ulysses,
        C = heads * head_dim / ulysses.
        """
        n = batch * seq_local * self.ulysses_size
        c = (heads // self.ulysses_size) * head_dim
        one = init_ring_state(
            self.ring_size, n, c, dtype, self.cfg.residual,
            quantized=self.cfg.quantized_cache,
        )
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n_layers,) + a.shape), one
        )

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        return compact_usp_attention(
            q,
            k,
            v,
            state,
            cfg=self.cfg,
            method=self.method,
            ulysses_size=self.ulysses_size,
            ring_size=self.ring_size,
            ulysses_axis=self.ulysses_axis,
            ring_axis=self.ring_axis,
            joint_q=joint_q,
            joint_k=joint_k,
            joint_v=joint_v,
            joint_strategy=joint_strategy if joint_q is not None else "none",
            fused=self.fused_ring,
        )
