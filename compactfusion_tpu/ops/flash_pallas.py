"""Pallas TPU flash attention with log-sum-exp output.

Replaces flash-attn's CUDA kernels in the reference hot path
(``xfuser/compact/ring.py:236-262``).  Online-softmax attention tiled for the
MXU: grid (batch, heads, q_blocks, kv_blocks) with the kv dimension innermost
("arbitrary" semantics) accumulating into fp32 VMEM scratch; the (out, lse)
pair feeds the ring merge (``ops/merge.py``), same contract as
:func:`compactfusion_tpu.ops.attention.attn_with_lse`.

Memory: never materialises the (Sq, Sk) score matrix — the XLA fallback needs
O(B*H*Sq*Sk) HBM (2 GB/layer for FLUX 1024px), this kernel O(block_q*block_k)
VMEM.

TPU layout notes: kernels run on (B, H, S, D) — the wrapper transposes from
the framework-wide (B, S, H, D) (XLA usually fuses the transpose into the
producing matmul).  The lse output carries a trailing 8-lane axis because a
TPU block's last dim must equal the array dim or be lane-divisible; the
wrapper strips it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _band_lo(qi, *, block_q, block_k, window, kv_blocks, band_nb):
    """First KV block of q-block ``qi``'s band |i-j| <= window.

    Clamped so the visited range is always ``band_nb`` contiguous DISTINCT
    blocks (edge q-blocks visit a few fully-masked extras instead of
    duplicating in-band blocks, which would double-count keys)."""
    lo = jax.lax.div(qi * block_q - window, block_k)  # floor for qi*bq>=window
    lo = jnp.where(qi * block_q < window, 0, lo)
    return jnp.clip(lo, 0, kv_blocks - band_nb)


def _flash_kernel(
    lens_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    kv_blocks: int,
    valid_k: int,
    block_q: int,
    block_k: int,
    use_lens: bool,
    exp_bf16: bool,
    fuse_sum: bool = False,
    window: Optional[int] = None,
    band_nb: int = 0,
    score_bf16: bool = False,
    single_block: bool = False,
):
    ki = pl.program_id(3)  # kv block index; band-relative when window is set

    if not single_block:

        @pl.when(ki == 0)
        def _():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0, :, :]  # (Bq, D)
    k = k_ref[0, 0, :, :]  # (Bk, D)
    v = v_ref[0, 0, :, :]

    # the S^2-sized elementwise chain (scale, max, sub, exp, astype) is the
    # kernel's VPU bottleneck at small head dims (d=72: the MXU matmuls are
    # tiny relative to the score block).  score_bf16 computes the whole chain
    # in bf16 — logits carry 8 mantissa bits, same order as the bf16 matmul
    # noise the model already has; lse/l stay fp32 (l comes from the fp32
    # AV accumulation, m is re-widened) so the ring merge keeps fp32 quality.
    score_t = jnp.bfloat16 if score_bf16 else jnp.float32
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,  # Mosaic matmul acc must be 32-bit
    )  # (Bq, Bk)
    if scale != 1.0:  # scale == 1.0 when the wrapper folded it into q
        s = s * scale
    s = s.astype(score_t)  # one narrowing pass buys bf16 max/sub/exp below

    if window is not None:
        qi = pl.program_id(2)
        k_block = _band_lo(
            qi, block_q=block_q, block_k=block_k, window=window,
            kv_blocks=kv_blocks, band_nb=band_nb,
        ) + ki
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = k_block * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(
            (jnp.abs(row - col) <= window) & (col < valid_k), s, NEG_INF
        )
        last_block = band_nb - 1
    else:
        if use_lens:
            # per-batch valid KV length (contiguous-prefix text masks)
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            s = jnp.where(col < lens_ref[pl.program_id(0)], s, NEG_INF)
        elif valid_k % block_k != 0:
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            s = jnp.where(col < valid_k, s, NEG_INF)
        last_block = kv_blocks - 1

    d = v.shape[1]
    if single_block:
        # one KV block covers the whole (unwindowed) sequence — e.g. PixArt
        # S=1024 at block_k=1024: plain softmax with no online-rescale
        # machinery, no scratch init/read/accumulate passes at all
        m_new = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_new)
        if fuse_sum:
            ones = jnp.ones((v.shape[0], 8), v.dtype)
            pv = jax.lax.dot_general(
                p.astype(v.dtype),
                jnp.concatenate([v, ones], axis=1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_new = pv[:, d : d + 1]
            acc = pv[:, :d]
        else:
            l_new = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            acc = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        l_safe = jnp.where(l_new == 0.0, 1.0, l_new)
        o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, :, :] = jnp.broadcast_to(
            m_new.astype(jnp.float32) + jnp.log(l_safe), lse_ref.shape[2:]
        )
        return

    m_prev = m_scr[:, :1]  # (Bq, 1) fp32
    m_new = jnp.maximum(
        m_prev, jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
    )
    alpha = jnp.exp(m_prev - m_new)
    if score_bf16:
        p = jnp.exp(s - m_new.astype(jnp.bfloat16))
    elif exp_bf16:
        # the S^2 exp is the kernel's VPU bottleneck at small head dims;
        # bf16 exp halves it (s - m <= 0 so exp is in [0, 1], bf16 rel err
        # ~0.4% - below the bf16 matmul noise the model already carries)
        p = jnp.exp((s - m_new).astype(jnp.bfloat16))
    else:
        p = jnp.exp(s - m_new)

    if fuse_sum:
        # ride the AV matmul's free lane padding (d rounds up to 128 on the
        # MXU anyway): append 8 ones-columns to v so column d of the product
        # IS rowsum(p), computed on the MXU — removing the S^2-sized VPU
        # sum-reduce pass and the separate l scratch.  Masked columns have
        # p == 0 and contribute nothing, exactly like the unfused path.
        ones = jnp.ones((v.shape[0], 8), v.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            jnp.concatenate([v, ones], axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        l_new = acc_scr[:, d : d + 1]
    else:
        l_prev = l_scr[:, :1]
        if exp_bf16:
            l_new = alpha * l_prev + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
        else:
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        l_scr[:, :1] = l_new
    m_scr[:, :1] = m_new

    @pl.when(ki == last_block)
    def _():
        # fully-masked rows (q padding beyond the band) have l == 0; guard
        # the division - those rows are sliced off by the wrapper
        l_safe = jnp.where(l_new == 0.0, 1.0, l_new)
        o_ref[0, 0, :, :] = (acc_scr[:, :d] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, :, :] = jnp.broadcast_to(
            m_new + jnp.log(l_safe), lse_ref.shape[2:]
        )




def _flash_kernel_heads(
    lens_ref,
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    kv_blocks: int,
    valid_k: int,
    block_k: int,
    use_lens: bool,
    exp_bf16: bool,
    heads_per: int,
):
    """Head-batched variant: each program computes ``heads_per`` heads,
    amortising per-program fixed costs (scratch init, DMA ramp, grid
    bookkeeping) over more MXU work.  Same math as :func:`_flash_kernel`
    with a static head unroll and per-head scratch rows.

    Measured NEUTRAL on v5e at PixArt shapes (B2 H16 S1024 d72: 19.40 ms/fwd
    either way; hp=2/4 with default blocks slightly worse) — per-program
    overhead is not the kernel's bottleneck there.  Kept as a tuning axis
    for other shapes/generations; default heads_per=1 keeps the proven
    single-head path."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    for j in range(heads_per):
        q = q_ref[0, j, :, :]  # (Bq, D)
        k = k_ref[0, j, :, :]  # (Bk, D)
        v = v_ref[0, j, :, :]

        s = (
            jax.lax.dot_general(
                q,
                k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # (Bq, Bk) fp32

        if use_lens:
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            s = jnp.where(col < lens_ref[pl.program_id(0)], s, NEG_INF)
        elif valid_k % block_k != 0:
            col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=1
            )
            s = jnp.where(col < valid_k, s, NEG_INF)

        m_prev = m_scr[j, :, :1]
        l_prev = l_scr[j, :, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        if exp_bf16:
            p = jnp.exp((s - m_new).astype(jnp.bfloat16))
            l_new = alpha * l_prev + jnp.sum(
                p, axis=-1, keepdims=True, dtype=jnp.float32
            )
        else:
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[j] = acc_scr[j] * alpha + pv
        m_scr[j, :, :1] = m_new
        l_scr[j, :, :1] = l_new

        @pl.when(ki == kv_blocks - 1)
        def _(j=j, m_new=m_new, l_new=l_new):
            o_ref[0, j, :, :] = (acc_scr[j] / l_new).astype(o_ref.dtype)
            lse_ref[0, j, :, :] = jnp.broadcast_to(
                m_new + jnp.log(l_new), lse_ref.shape[2:]
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "block_q", "block_k", "interpret", "exp_bf16", "heads_per",
        "window", "fuse_sum", "fold_scale", "score_bf16", "single_block",
        "bhsd_io",
    ),
)
def flash_attn_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: int = 1024,
    interpret: bool = False,
    kv_lens: Optional[jax.Array] = None,
    exp_bf16: bool = False,
    heads_per: int = 1,
    window: Optional[int] = None,
    fuse_sum: Optional[bool] = None,
    fold_scale: bool = False,
    score_bf16: bool = False,
    single_block: Optional[bool] = None,
    bhsd_io: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Flash attention.  Same contract as ``attn_with_lse`` (non-causal).

    q: (B, Sq, H, D); k, v: (B, Sk, H, D) -> out (B, Sq, H, D), lse (B, H, Sq).
    Sq/Sk are padded to the block sizes internally (padded keys masked out).
    kv_lens: optional (B,) int32 — per-batch valid KV prefix length (the
    contiguous text-padding masks of the cross-attention layers); keys at or
    beyond the length are masked.  Scalar-prefetched, so masking costs one
    iota+where in-kernel instead of a materialised fp32 score mask.
    window: optional banded-attention half-width (|i - j| <= window; the
    reference's ``flash_attn_func(..., window_size=...)`` used by
    DiTFastAttn, ``fast_attention/attn_layer.py:175-186``).  Off-band KV
    blocks are SKIPPED, not masked — each q block visits only the constant
    number of KV blocks its band overlaps, so FLOPs scale with S*window
    instead of S^2.  Requires Sq == Sk and excludes kv_lens.

    fuse_sum (default: auto-on where free): compute rowsum(p) on the MXU by
    appending 8 ones-columns to the v block — the columns ride the AV
    matmul's lane padding (any d with d % 128 <= 120, e.g. the 72 of PixArt
    heads, pads to the same 128-lane multiple), so the S^2-sized VPU
    sum-reduce pass disappears for free.  Honoured only when the padding is
    free and heads_per == 1.  In-model silicon A/B (v5e, 28-block PixArt
    stack, B2 S1024): 19.395 -> 18.832 ms/fwd (-2.9%).  l then sums the
    SAME bf16-rounded p the AV matmul consumes — self-consistent
    normalisation, within bf16 noise of the unfused path.

    fold_scale: multiply q by ``scale`` in the wrapper (one S*d pass) instead
    of scaling the (Sq, Sk) score block in-kernel (an S^2 VPU pass).  One
    extra bf16 rounding on q; opt-in pending quality checks at each call
    site.

    score_bf16: compute the whole S^2 elementwise softmax chain (QK^T
    accumulation target, mask, max, subtract, exp) in bf16 — at small head
    dims (d=72) the VPU chain, not the MXU, bounds the kernel, and bf16
    halves every pass.  l and lse stay fp32 (l accumulates in the fp32 AV
    matmul; m is re-widened), so ring merges keep fp32 quality.  Strictly
    stronger than exp_bf16 (which only narrows the exp input).

    single_block (auto when one KV block covers the sequence and no window):
    plain-softmax specialization — drops the scratch init/read/rescale
    passes of online softmax.  Numerically identical to the general path
    (m_prev = -inf makes alpha = 0 exactly), hence safe to auto-enable.

    block_q=None picks a measured-on-v5e default: kv blocks of 1024 (the
    fp32 score block stays ~1-4 MB in VMEM); block_q 1024 for short
    sequences and 512 for long ones.  Isolated micro-benches prefer
    block_q 256 at S=1024, but IN-MODEL (inside the scanned DiT block)
    that is ~2% slower end to end — fewer q-grid cells win once the kernel
    competes with neighbouring fusions for VMEM/DMA; at B1·H24·S4608·d128
    512/1024 is 9% faster than 1024/1024 both isolated and in-model.
    """
    if bhsd_io:
        # caller supplies/consumes the KERNEL layout (B, H, S, D) directly —
        # lets XLA fuse the relayout into the producing/consuming matmuls
        # instead of paying explicit copy passes around the pallas call
        b, h, sq, d = q.shape
        sk = k.shape[2]
    else:
        b, sq, h, d = q.shape
        sk = k.shape[1]
    if scale is None:
        scale = d**-0.5
    if block_q is None:
        block_q = 1024 if sq <= 2048 else 512
    if fuse_sum is None:
        # auto-on where the ones-columns are free: in-model silicon A/B
        # (2026-08-18, _prof2_dbg self_fuseoff/self_fuseon) measured
        # 19.395 -> 18.832 ms/fwd (-2.9%) on the 28-block PixArt stack
        fuse_sum = True
    # the fusion is only free when d + 8 ones-columns round up to the same
    # 128-lane multiple as d (d=72 -> 80 -> 128: free; d=128 -> 136 -> 256:
    # would double AV cost), and the head-batched kernel has no fused path
    fuse_sum = (
        fuse_sum
        and heads_per <= 1
        and _round_up(d + 8, 128) == _round_up(d, 128)
    )

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 128))

    # clamp to the ~16 MB VMEM scoped limit: fp32 score block + fp32 out
    # accumulator + bf16 q/k/v blocks, with ~2x headroom for Mosaic's
    # double-buffered pipelining (measured: a 10 MB estimate allocates ~18 MB)
    d_acc = d + 8 if fuse_sum else d

    def _vmem_bytes(bq, bk):
        return 4 * bq * bk + 4 * bq * d_acc + 2 * (bq + 2 * bk) * d

    while _vmem_bytes(block_q, block_k) > 6 * 1024 * 1024:
        if block_q >= block_k and block_q > 8:
            block_q = max(8, block_q // 2)
        elif block_k > 128:
            block_k = max(128, block_k // 2)
        else:
            break
    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    # (B, S, H, D) -> (B, H, S, D) kernel layout
    if bhsd_io:
        qt, kt, vt = q, k, v
    else:
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
    if fold_scale and scale != 1.0:
        qt = (qt * scale).astype(qt.dtype)
        scale = 1.0
    if sq_p != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    kv_blocks = sk_p // block_k
    if single_block is None:
        single_block = True
    single_block = single_block and kv_blocks == 1 and window is None

    use_lens = kv_lens is not None
    if use_lens:
        lens = jnp.minimum(kv_lens.astype(jnp.int32), sk)
    else:
        lens = jnp.full((b,), sk, jnp.int32)

    if window is not None:
        assert sq == sk, "windowed attention is for self-attention (Sq == Sk)"
        assert not use_lens, "window excludes kv_lens masking"
        # number of KV blocks a q block's band can overlap (constant)
        band_nb = min(kv_blocks, (block_q + 2 * window - 1) // block_k + 2)
        bq, bk, w, nkv, nb = block_q, block_k, window, kv_blocks, band_nb

        def _k_index(bi, hi, qi, ki, L):
            return (
                bi, hi,
                _band_lo(qi, block_q=bq, block_k=bk, window=w,
                         kv_blocks=nkv, band_nb=nb) + ki,
                0,
            )

        kernel = functools.partial(
            _flash_kernel,
            scale=scale,
            kv_blocks=kv_blocks,
            valid_k=sk,
            block_q=block_q,
            block_k=block_k,
            use_lens=False,
            exp_bf16=exp_bf16,
            fuse_sum=fuse_sum,
            window=window,
            band_nb=band_nb,
            score_bf16=score_bf16,
        )
        grid = (b, h, sq_p // block_q, band_nb)
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), _k_index),
            pl.BlockSpec((1, 1, block_k, d), _k_index),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, qi, ki, L: (b, h, qi, 0)),
        ]
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((8, 128) if fuse_sum else (block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_acc), jnp.float32),
        ]
        out, lse8 = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=[
                jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, sq_p, 8), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary"
                ),
            ),
            interpret=interpret,
        )(lens, qt, kt, vt)
        out = out[:, :, :sq, :]
        if not bhsd_io:
            out = jnp.transpose(out, (0, 2, 1, 3))
        lse = lse8[:, :, :sq, 0]
        return out, lse

    hp = heads_per if h % max(heads_per, 1) == 0 else 1
    if score_bf16:
        hp = 1  # head-batched kernel keeps the proven fp32-score path
    if hp > 1:
        kernel = functools.partial(
            _flash_kernel_heads,
            scale=scale,
            kv_blocks=kv_blocks,
            valid_k=sk,
            block_k=block_k,
            use_lens=use_lens,
            exp_bf16=exp_bf16,
            heads_per=hp,
        )
        grid = (b, h // hp, sq_p // block_q, kv_blocks)
        in_specs = [
            pl.BlockSpec((1, hp, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, hp, block_k, d), lambda b, h, qi, ki, L: (b, h, ki, 0)),
            pl.BlockSpec((1, hp, block_k, d), lambda b, h, qi, ki, L: (b, h, ki, 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, hp, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, hp, block_q, 8), lambda b, h, qi, ki, L: (b, h, qi, 0)),
        ]
        scratch = [
            pltpu.VMEM((hp, block_q, 128), jnp.float32),
            pltpu.VMEM((hp, block_q, 128), jnp.float32),
            pltpu.VMEM((hp, block_q, d), jnp.float32),
        ]
    else:
        kernel = functools.partial(
            _flash_kernel,
            scale=scale,
            kv_blocks=kv_blocks,
            valid_k=sk,
            block_q=block_q,
            block_k=block_k,
            use_lens=use_lens,
            exp_bf16=exp_bf16,
            fuse_sum=fuse_sum,
            score_bf16=score_bf16,
            single_block=single_block,
        )
        grid = (b, h, sq_p // block_q, kv_blocks)
        in_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, qi, ki, L: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, qi, ki, L: (b, h, ki, 0)),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, block_q, d), lambda b, h, qi, ki, L: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8), lambda b, h, qi, ki, L: (b, h, qi, 0)),
        ]
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((8, 128) if fuse_sum else (block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_acc), jnp.float32),
        ]

    out, lse8 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lens, qt, kt, vt)

    out = out[:, :, :sq, :]
    if not bhsd_io:
        out = jnp.transpose(out, (0, 2, 1, 3))
    lse = lse8[:, :, :sq, 0]
    return out, lse


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
