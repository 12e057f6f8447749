"""USP: hybrid Ulysses x Ring sequence-parallel attention.

Reference semantics: ``xFuserLongContextAttention.forward``
(``xfuser/core/long_ctx_attention/hybrid/attn_layer.py:67-243``):

  1. optionally concat the replicated joint (text) query to the local query;
  2. ulysses all-to-all: scatter heads, gather sequence;
  3. slice the replicated joint K/V to this ulysses rank's head block;
  4. ring attention over the ring axis (joint K/V front/rear);
  5. inverse all-to-all.

``sp_degree = ulysses_degree * ring_degree`` (``config/config.py:111-134``).
When CompactFusion compression is on, step 4 is replaced by the compressed
ring (``compactfusion_tpu.compact.ring``) — same call shape, plus an explicit
error-feedback state carry.

Must run inside ``shard_map`` over a mesh containing the ulysses/ring axes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from compactfusion_tpu.parallel import ulysses as uly
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES
from compactfusion_tpu.parallel.ring import ring_attention


def usp_wrap(
    inner,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    ulysses_size: int,
    ulysses_axis: str = AXIS_ULYSSES,
    joint_q: Optional[jax.Array] = None,
    joint_k: Optional[jax.Array] = None,
    joint_v: Optional[jax.Array] = None,
    joint_strategy: str = "none",
):
    """Shared USP wrapper: joint-q concat -> ulysses all-to-all (scatter
    heads, gather seq; slice the replicated joint K/V to this rank's head
    block) -> ``inner(q, k, v, joint_k, joint_v) -> (out, aux)`` -> inverse
    all-to-all on out.

    Both the plain and the COMPRESSED USP attention
    (``compact.ring.compact_usp_attention``) route through this one wrapper
    so their joint/ulysses handling cannot diverge.
    """
    if joint_q is not None:
        if joint_strategy == "front":
            q = jnp.concatenate([joint_q, q], axis=1)
        elif joint_strategy == "rear":
            q = jnp.concatenate([q, joint_q], axis=1)
        else:
            raise ValueError(f"joint_strategy {joint_strategy!r} with joint_q")

    if ulysses_size > 1:
        q = uly.scatter_heads_gather_seq(q, ulysses_axis)
        k = uly.scatter_heads_gather_seq(k, ulysses_axis)
        v = uly.scatter_heads_gather_seq(v, ulysses_axis)
        if joint_k is not None:
            joint_k = uly.slice_joint_heads(joint_k, ulysses_axis, ulysses_size)
            joint_v = uly.slice_joint_heads(joint_v, ulysses_axis, ulysses_size)

    out, aux = inner(q, k, v, joint_k, joint_v)

    if ulysses_size > 1:
        out = uly.scatter_seq_gather_heads(out, ulysses_axis)
    return out, aux


def usp_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    ulysses_size: int,
    ring_size: int,
    ulysses_axis: str = AXIS_ULYSSES,
    ring_axis: str = AXIS_RING,
    scale: Optional[float] = None,
    causal: bool = False,
    joint_q: Optional[jax.Array] = None,
    joint_k: Optional[jax.Array] = None,
    joint_v: Optional[jax.Array] = None,
    joint_strategy: str = "none",
    fused_ring=False,
) -> jax.Array:
    """Hybrid sequence-parallel attention on per-device shards.

    Args:
      q/k/v: (B, S_local, H, D) with S sharded over (ring, ulysses) and H full.
      joint_q/k/v: (B, Sj, H, D) replicated joint (text) tensors; joint_q is
        concatenated to q per ``joint_strategy`` and the caller must strip the
        corresponding output rows (reference appends text to every SP rank).

    Returns:
      (B, S_local(+Sj), H, D) attention output, same sharding as q.
    """

    def inner(q, k, v, joint_k, joint_v):
        out = ring_attention(
            q,
            k,
            v,
            axis_name=ring_axis,
            ring_size=ring_size,
            scale=scale,
            causal=causal,
            joint_k=joint_k,
            joint_v=joint_v,
            joint_strategy=joint_strategy,
            fused=fused_ring,
        )
        return out, None

    out, _ = usp_wrap(
        inner, q, k, v,
        ulysses_size=ulysses_size,
        ulysses_axis=ulysses_axis,
        joint_q=joint_q,
        joint_k=joint_k,
        joint_v=joint_v,
        joint_strategy=joint_strategy,
    )
    return out
