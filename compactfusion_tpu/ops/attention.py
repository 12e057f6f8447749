"""Attention with log-sum-exp output.

The building block that replaces flash-attn's ``_flash_attn_forward`` in the
reference ring loops (``xfuser/compact/ring.py:236-262``): computes exact
attention AND the per-query log-sum-exp so partial results can be merged
across ring steps with :func:`compactfusion_tpu.ops.merge.merge_out_lse`.

This module holds the portable XLA implementation (softmax math in fp32, the
two matmuls hit the MXU and XLA fuses the rest); a Pallas flash kernel with
identical signature lives in ``compactfusion_tpu.ops.flash_pallas`` and is
selected automatically on TPU for long sequences.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _flash_eligible(q, k, causal, mask) -> bool:
    """Use the Pallas flash kernel: TPU backend, no arbitrary masking (per-
    batch KV prefix lengths ARE supported), big enough that materialising
    scores would hurt, and a lane-aligned head dim."""
    if causal or mask is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    b, sq, h, d = q.shape
    sk = k.shape[1]
    # d is the full last dim of the kernel block, so any sublane-aligned head
    # dim lowers (non-128 dims pad lanes; still beats materialised scores).
    # Small-Sk (cross-attention to text) stays on the batched-einsum XLA
    # path: measured SLOWER via the kernel (B*H tiny grid cells cannot fill
    # the MXU; bench 0.448 -> 0.499 s/image when routed through flash)
    return d % 8 == 0 and sq * sk >= 256 * 256 and sk >= 512


def attn_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
    impl: str = "auto",
    kv_lens: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Scaled dot-product attention returning (out, lse).

    Args:
      q: (B, Sq, H, D)
      k, v: (B, Sk, H, D)
      scale: softmax scale; defaults to 1/sqrt(D).
      causal: apply a causal mask (diffusion uses False; parity only).
      mask: optional (Sq, Sk) boolean mask (True = attend).
      impl: "auto" | "flash" (Pallas TPU kernel) | "xla".
      kv_lens: optional (B,) int32 per-batch valid KV prefix length (the
        contiguous text-padding masks); flash-compatible, unlike ``mask``.

    Returns:
      out: (B, Sq, H, D) in q.dtype
      lse: (B, H, Sq) fp32
    """
    if impl == "auto" and _flash_eligible(q, k, causal, mask):
        impl = "flash"
    if impl == "flash":
        # the kernel has no causal/mask parameters — silently dropping them
        # would return unmasked attention (the auto path guards via
        # _flash_eligible; the explicit path must fail loudly)
        assert not causal and mask is None, (
            "impl='flash' supports kv_lens only; causal/mask need impl='xla'"
        )
        from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

        return flash_attn_with_lse(q, k, v, scale=scale, kv_lens=kv_lens)

    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5

    # matmuls in the input dtype with fp32 accumulation: bf16 inputs hit the
    # MXU at full rate (products of bf16 values are exact in fp32, so this
    # only changes accumulation order); scale applied to fp32 scores
    scores = (
        jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    if causal:
        causal_mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        scores = jnp.where(causal_mask[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    if kv_lens is not None:
        col = jnp.arange(sk)[None, None, None, :]
        scores = jnp.where(col < kv_lens[:, None, None, None], scores, NEG_INF)

    lse = jax.nn.logsumexp(scores, axis=-1)  # (B, H, Sq)
    p = jnp.exp(scores - lse[..., None])
    if mask is not None or kv_lens is not None:
        # a FULLY masked row has every score at the finite NEG_INF, so
        # softmax degenerates to uniform and the row would return mean(v);
        # zero it instead (and pin its lse to -inf so ring merges ignore it)
        dead = jnp.max(scores, axis=-1, keepdims=True) <= NEG_INF / 2
        p = jnp.where(dead, 0.0, p)
        lse = jnp.where(dead[..., 0], -jnp.inf, lse)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype), lse


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
    kv_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain attention (no lse) for single-device paths."""
    out, _ = attn_with_lse(
        q, k, v, scale=scale, causal=causal, mask=mask, kv_lens=kv_lens
    )
    return out
