"""Ring attention over ``lax.ppermute``.

Reference semantics: ``xdit_ring_flash_attn_forward``
(``xfuser/core/long_ctx_attention/ring/ring_flash_attn.py:16-137``): K/V
blocks circulate around the ring group; each device computes a flash-attention
partial against every block and merges them with the online-softmax rule.
Joint (text) K/V replicated across ranks are appended to the *front* of the
block at ring step 0 or the *rear* at the last step
(``ring_flash_attn.py:73-84``).

TPU-native differences:
  * yunchang's ``RingComm`` (NCCL isend/irecv + commit/wait) becomes a single
    ``lax.ppermute`` per step — XLA overlaps the permute with the attention
    compute of the current block (the same comm/compute overlap the reference
    builds by hand).
  * The loop is unrolled over the (static) ring size so steps with joint
    tensors may have different K lengths without dynamic shapes.
  * Everything runs inside an enclosing ``shard_map``; ``axis_name`` must be
    a mesh axis with the sequence dimension sharded over it.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.ops.merge import merge_out_lse


def _shift_perm(ring_size: int):
    # send to next rank; after s hops device d holds the block of (d - s) % R
    return [(i, (i + 1) % ring_size) for i in range(ring_size)]


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    ring_size: int,
    scale: Optional[float] = None,
    causal: bool = False,
    joint_k: Optional[jax.Array] = None,
    joint_v: Optional[jax.Array] = None,
    joint_strategy: str = "none",
    fused=False,
) -> jax.Array:
    """Exact attention over the ring-sharded K/V sequence.

    Args (per-device views inside shard_map):
      q: (B, Sq_local, H, D)
      k, v: (B, Sk_local, H, D) — the local K/V shard.
      joint_k/joint_v: (B, Sj, H, D) replicated tensors appended per
        ``joint_strategy`` ("front": at ring step 0, "rear": at last step).
      fused: route the ring part through the single-kernel RDMA+flash
        implementation (``ops/ring_flash_pallas``) — structural comm/compute
        overlap instead of relying on the XLA scheduler.  TPU only (silently
        falls back elsewhere); ``"interpret"`` runs the kernel on the
        multi-device interpreter (tests).

    Returns:
      out: (B, Sq_local, H, D) in q.dtype.
    """
    # validate BEFORE the ring_size==1 early return: a typo'd strategy
    # would otherwise silently drop the joint K/V (_with_joint matches
    # neither "front" nor "rear" and returns k, v unchanged)
    assert joint_strategy in ("none", "front", "rear"), joint_strategy
    # the causal keep-gate below zeroes whole step blocks; the replicated
    # joint text appended at a given step is position-independent and must
    # stay visible to every rank — the combination is unused (diffusion
    # runs causal=False; causal exists for parity tests only)
    assert not (causal and joint_k is not None), (
        "causal ring does not support joint tensors"
    )
    if ring_size == 1:
        kk, vv = _with_joint(k, v, joint_k, joint_v, joint_strategy, 0, 1)
        out, _ = attn_with_lse(q, kk, vv, scale=scale, causal=causal)
        return out

    if fused and not causal:
        # "interpret" -> eager-DMA emulation; "interpret:on_wait" -> the
        # ordering-hostile deferred-DMA schedule (see compact/ring.py)
        interp = (
            fused.split(":", 1)[1] if isinstance(fused, str) and ":" in fused
            else ("eager" if fused == "interpret" else None)
        )
        if interp or jax.default_backend() == "tpu":
            return _fused_ring(
                q, k, v, axis_name, ring_size, scale,
                joint_k, joint_v, joint_strategy, interp,
            )
    perm = _shift_perm(ring_size)
    my = lax.axis_index(axis_name)

    out = lse = None
    for step in range(ring_size):
        if step > 0:
            k, v = lax.ppermute((k, v), axis_name, perm)
        kk, vv = _with_joint(k, v, joint_k, joint_v, joint_strategy, step, ring_size)
        # reference computes causal masking only for the own (step 0) block and
        # skips blocks from later ranks; we compute every block and gate the
        # merge — branchless SPMD (diffusion always runs causal=False anyway).
        block_out, block_lse = attn_with_lse(
            q, kk, vv, scale=scale, causal=causal and step == 0
        )
        if causal and step > 0:
            keep = (step <= my)[None, None]
            block_lse = jnp.where(keep, block_lse, -jnp.inf)
            block_out = jnp.where(keep[..., None, None], block_out, 0.0)
        out, lse = merge_out_lse(out, lse, block_out, block_lse)

    return out.astype(q.dtype)


def _fused_ring(
    q, k, v, axis_name, ring_size, scale, joint_k, joint_v, joint_strategy,
    interpret,
):
    """Ring part in one Pallas kernel; replicated joint block merged after."""
    from jax.experimental.pallas import tpu as pltpu

    from compactfusion_tpu.ops.ring_flash_pallas import ring_flash_attn_with_lse
    from compactfusion_tpu.parallel.mesh import ambient_mesh_axes

    out, lse = ring_flash_attn_with_lse(
        q, k, v,
        axis_name=axis_name,
        ring_size=ring_size,
        mesh_axes=ambient_mesh_axes(axis_name, ring_size),
        scale=scale,
        interpret=(
            pltpu.InterpretParams(dma_execution_mode=interpret)
            if interpret
            else False
        ),
    )
    if joint_k is not None and joint_strategy != "none":
        j_out, j_lse = attn_with_lse(q, joint_k, joint_v, scale=scale)
        out, lse = merge_out_lse(out, lse, j_out, j_lse)
    return out.astype(q.dtype)


def _with_joint(
    k: jax.Array,
    v: jax.Array,
    joint_k: Optional[jax.Array],
    joint_v: Optional[jax.Array],
    joint_strategy: str,
    step: int,
    ring_size: int,
) -> Tuple[jax.Array, jax.Array]:
    if joint_k is None or joint_strategy == "none":
        return k, v
    if joint_strategy == "front" and step == 0:
        return (
            jnp.concatenate([joint_k, k], axis=1),
            jnp.concatenate([joint_v, v], axis=1),
        )
    if joint_strategy == "rear" and step == ring_size - 1:
        return (
            jnp.concatenate([k, joint_k], axis=1),
            jnp.concatenate([v, joint_v], axis=1),
        )
    return k, v
