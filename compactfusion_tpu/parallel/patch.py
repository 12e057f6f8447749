"""Patch parallelism: full-KV all-gather attention + DistriFusion staleness.

Reference semantics: ``patch_gather_fwd`` (``xfuser/compact/patchpara/
fwd.py:20-236``) — the alternative to ring attention when CompactFusion runs
in patch-parallel mode (``CompactConfig.override_with_patch_gather_fwd``):

  * sync: all-gather the full K/V every step, full flash attention locally;
  * compact: the all-gather carries compressed deltas with error feedback
    (``compact_all_gather``);
  * async (DistriFusion): attend against LAST step's gathered K/V with this
    step's fresh local slice swapped in, then gather this step's K/V for the
    next step (``fwd.py:113-172``, ``AllGatherCache``).  On TPU the overlap
    the reference builds with async NCCL handles comes from XLA's latency
    hiding scheduler — the gather for step t+1 is issued before the attention
    of step t consumes anything that depends on it.

State (per layer) is carried through the denoise scan like the ring caches.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.compact.allgather import compact_all_gather
from compactfusion_tpu.compact.engine import EFState
from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING


class PatchKVCache(NamedTuple):
    """DistriFusion stale K/V (gathered at the previous step)."""

    k: jax.Array  # (W, B, S_local, H, D)
    v: jax.Array


class PatchEFState(NamedTuple):
    """Compressed-all-gather EF caches for K and V."""

    k: EFState  # leaves (W, N, C)
    v: EFState


def _gather_seq(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, S_local, H, D) -> (B, S_full, H, D), source-rank order."""
    g = lax.all_gather(x, axis_name)  # (W, B, S_local, H, D)
    w, b, s, h, d = g.shape
    return jnp.transpose(g, (1, 0, 2, 3, 4)).reshape(b, w * s, h, d)


def _with_joint(k, v, joint_k, joint_v):
    if joint_k is None:
        return k, v
    return (
        jnp.concatenate([joint_k, k], axis=1),
        jnp.concatenate([joint_v, v], axis=1),
    )


@dataclasses.dataclass(frozen=True)
class PatchParallelAttn:
    """Patch-parallel attention strategy (see ``models/attn_impl.py`` contract).

    ``mode``: "sync" | "compact" | "async" (DistriFusion).
    ``method``: codec for compact mode (WARMUP during warmup steps; async mode
    also syncs during warmup, reference ``fwd.py:113-127``).
    """

    cfg: Optional[CompactConfig] = None
    method: Optional[CompressType] = None
    mode: str = "sync"
    axis: str = AXIS_RING
    world: int = 1

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        if self.mode == "sync" or self.world == 1:
            return ()
        if self.mode == "compact":
            from compactfusion_tpu.compact.engine import init_ef_state

            # delegate to the engine initializer — it owns the layout of
            # the quantized cache (a hand-rolled zeros EFState here is how
            # cfg.quantized_cache got silently ignored before)
            n, c = batch * seq_local, heads * head_dim
            one = init_ef_state(
                (n, c), dtype,
                residual=self.cfg.residual if self.cfg else 1,
                quantized=bool(self.cfg and self.cfg.quantized_cache),
            )
            stacked = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(
                    a[None, None], (n_layers, self.world) + a.shape
                ),
                one,
            )
            return PatchEFState(k=stacked, v=stacked)
        if self.mode == "async":
            z = jnp.zeros(
                (n_layers, self.world, batch, seq_local, heads, head_dim), dtype
            )
            return PatchKVCache(k=z, v=z)
        raise ValueError(self.mode)

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        if joint_q is not None:
            assert joint_strategy == "front"
            q = jnp.concatenate([joint_q, q], axis=1)

        if self.world == 1:
            kk, vv = _with_joint(k, v, joint_k, joint_v)
            out, _ = attn_with_lse(q, kk, vv)
            return out, state

        if self.mode == "sync":
            kk, vv = _with_joint(
                _gather_seq(k, self.axis), _gather_seq(v, self.axis),
                joint_k, joint_v,
            )
            out, _ = attn_with_lse(q, kk, vv)
            return out, state

        if self.mode == "compact":
            b, s, h, d = k.shape
            nc = lambda x: x.reshape(b * s, h * d)
            gk, ks = compact_all_gather(
                nc(k), state.k, cfg=self.cfg, method=self.method, axis_name=self.axis
            )
            gv, vs = compact_all_gather(
                nc(v), state.v, cfg=self.cfg, method=self.method, axis_name=self.axis
            )
            full = lambda g: g.reshape(self.world, b, s, h, d).transpose(
                1, 0, 2, 3, 4
            ).reshape(b, self.world * s, h, d).astype(k.dtype)
            kk, vv = _with_joint(full(gk), full(gv), joint_k, joint_v)
            out, _ = attn_with_lse(q, kk, vv)
            return out, PatchEFState(k=ks, v=vs)

        if self.mode == "async":
            # DistriFusion: stale remote KV + fresh local slice
            my = lax.axis_index(self.axis)
            cache_dt = state.k.dtype
            if self.method == CompressType.WARMUP:
                gk = lax.all_gather(k, self.axis).astype(cache_dt)
                gv = lax.all_gather(v, self.axis).astype(cache_dt)
                mixed_k, mixed_v = gk, gv
                new_state = PatchKVCache(k=gk, v=gv)
            else:
                mixed_k = lax.dynamic_update_index_in_dim(
                    state.k, k.astype(state.k.dtype), my, axis=0
                )
                mixed_v = lax.dynamic_update_index_in_dim(
                    state.v, v.astype(state.v.dtype), my, axis=0
                )
                # gather fresh KV for the NEXT step; XLA overlaps this with
                # the attention below (no data dependency)
                new_state = PatchKVCache(
                    k=lax.all_gather(k, self.axis).astype(cache_dt),
                    v=lax.all_gather(v, self.axis).astype(cache_dt),
                )
            w, b, s, h, d = mixed_k.shape
            flat = lambda g: jnp.transpose(g, (1, 0, 2, 3, 4)).reshape(
                b, w * s, h, d
            ).astype(k.dtype)
            kk, vv = _with_joint(flat(mixed_k), flat(mixed_v), joint_k, joint_v)
            out, _ = attn_with_lse(q, kk, vv)
            return out, new_state

        raise ValueError(self.mode)
