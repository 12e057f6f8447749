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


def _xla_attn_nolse(q, k, v, scale, kv_lens):
    """Bandwidth-lean attention for the materialised-scores path when the
    caller discards the LSE (cross-attention to short text is the hot case:
    PixArt/HunyuanDiT/Latte Sk≈120-256, flash-ineligible, HBM-bound).

    Two passes over the (B,H,Sq,Sk) scores instead of four:

    * the softmax max is replaced by the per-row Cauchy-Schwarz bound
      ``m_ub = scale·‖q_row‖·max_k‖k_row‖`` computed from the q/k norms
      (Sk/Sq-times smaller than scores), so ``exp(s−m_ub) ∈ (0,1]`` can
      never overflow and the max-reduce pass over scores disappears.  The
      slack only scales every exp by the same ``e^{-Δ}``, which the final
      division removes exactly (floating point keeps relative precision
      under uniform scaling).  The one failure mode — slack so large that
      exp drifts toward the fp32 underflow cliff (Δ≳87, adversarial norm
      blow-ups far beyond DiT activation ranges) — is detected by the row
      normaliser on a valid row falling below ``e^{-45}`` (a decade-wide
      safety margin above the precision cliff), and a ``lax.cond`` reruns
      the max-shifted reference path; the guard costs one scalar reduce in
      the common case.
    * the row normaliser rides the AV matmul on free output lanes (one
      ones-column appended to v — the XLA-path analog of the flash
      kernel's ``fuse_sum``; free whenever d%128≠0), and the division
      happens after the matmul in fp32 — also where fully-masked rows
      (kv_lens=0) are zeroed, matching :func:`attn_with_lse`.

    Chip-measured A/B on the PixArt-512 block: see docs/PERF.md.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5

    # grad-safe norms: d‖x‖/dx is NaN at x=0 and all-zero rows are ROUTINE
    # here (zero text embeddings are the standard CFG null conditioning);
    # the epsilon only raises the upper bound m_ub, which stays valid, and
    # the uniform per-row exp scaling it induces divides out exactly
    def _norm(x):
        x = x.astype(jnp.float32)
        return jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-30)

    qn = _norm(q)  # (B, Sq, H)
    kn = _norm(k)  # (B, Sk, H)
    if kv_lens is not None:
        valid = jnp.arange(sk)[None, :, None] < kv_lens[:, None, None]
        kn = jnp.where(valid, kn, 0.0)
    # (B, H, Sq); the bound holds per VALID key row, which is all p uses
    m_ub = scale * jnp.transpose(qn, (0, 2, 1)) * jnp.max(kn, axis=1)[..., None]

    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    p = jnp.exp(scores * scale - m_ub[..., None])
    if kv_lens is not None:
        col = jnp.arange(sk)[None, None, None, :]
        p = jnp.where(col < kv_lens[:, None, None, None], p, 0.0)
    p = p.astype(v.dtype)

    if d % 128 != 0:
        # rowsum(p) on the MXU via a ones-column in v (free lanes)
        v_aug = jnp.concatenate([v, jnp.ones((b, sk, h, 1), v.dtype)], axis=-1)
        out_plus = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_aug, preferred_element_type=jnp.float32
        )
        out, r = out_plus[..., :d], out_plus[..., d:]
    else:
        # d fills the lanes exactly: fused VPU reduction instead
        r = jnp.transpose(
            jnp.sum(p.astype(jnp.float32), axis=-1), (0, 2, 1)
        )[..., None]
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
        )
    fast = jnp.where(r > 0, out / r, 0.0).astype(q.dtype)

    # a tiny r on a row that has at least one valid key means the bound's
    # slack pushed exp toward the underflow cliff (r >= e^-Δ, so r < e^-45
    # implies Δ > 45; full precision holds until Δ ~ 87) — rerun the exact
    # max-shifted path then
    row_valid = (
        jnp.ones((b, 1, 1, 1), bool)
        if kv_lens is None
        else (kv_lens > 0)[:, None, None, None]
    )
    underflowed = jnp.any((r < 2.9e-20) & row_valid)

    def _exact(_):
        o, _lse = attn_with_lse(
            q, k, v, scale=scale, kv_lens=kv_lens, impl="xla"
        )
        return o.astype(q.dtype)

    return jax.lax.cond(underflowed, _exact, lambda _: fast, None)


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
    kv_lens: Optional[jax.Array] = None,
    impl: str = "auto",
) -> jax.Array:
    """Plain attention (no lse) for single-device paths."""
    if impl == "auto" and not causal and mask is None:
        if _flash_eligible(q, k, causal, mask):
            from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

            out, _ = flash_attn_with_lse(q, k, v, scale=scale, kv_lens=kv_lens)
            return out
        return _xla_attn_nolse(q, k, v, scale, kv_lens)
    out, _ = attn_with_lse(
        q, k, v, scale=scale, causal=causal, mask=mask, kv_lens=kv_lens,
        impl=impl,
    )
    return out
