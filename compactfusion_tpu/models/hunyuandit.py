"""HunyuanDiT backbone (cross-attention DiT with long skip connections).

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/hunyuan_transformer_2d.py``
(a diffusers ``HunyuanDiT2DModel`` wrapper): U-ViT topology — the second half
of the blocks concatenates the mirror block's activations (long skip) through
a projection; each block = AdaLN-shift self-attention with 2D RoPE and QK
norm, cross-attention to the CLIP+T5 text states, FFN.

Scan structure: a "down" scan over the first half collecting per-layer skip
activations as scan ys, then an "up" scan consuming them reversed as xs —
this is what the reference's PP "skip channel" ships between mirror stages
(``pipeline_hunyuandit.py:552-825``).  Under pipeline parallelism
(``pp_stages > 1``) the down/up chunks are pp-sharded and each stage's skip
stack hops to its MIRROR stage with one ``ppermute`` after the down pipeline
— the skip-channel send/recv of the reference, without buffers or
handshakes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn
from compactfusion_tpu.models.pixart import _cross_attn


@dataclasses.dataclass(frozen=True)
class HunyuanDiTConfig:
    dim: int = 1408
    depth: int = 40  # must be even: depth/2 down + depth/2 up (with skips)
    heads: int = 16
    patch: int = 2
    in_channels: int = 4
    out_channels: int = 8
    text_dim: int = 1024  # CLIP (Chinese BERT) states / projected T5 width
    #: raw mT5 state width (projected to text_dim by text_embedder)
    t5_dim: int = 2048
    #: CLIP / T5 token counts (the 77+256=333 joint context)
    text_len: int = 77
    text_len_t5: int = 256
    #: FFN hidden width — the real checkpoint uses mlp_ratio 4.3637 -> 6144
    ffn_hidden: int = 6144
    rope_axes: Tuple[int, ...] = (44, 44)  # head_dim 88 split over (w, h)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.heads


def hunyuandit_v12() -> HunyuanDiTConfig:
    return HunyuanDiTConfig()


def hunyuandit_positions(hp: int, wp: int) -> jnp.ndarray:
    """(hp*wp, 2) rope ids in raster order, COLUMN coordinate first.

    diffusers ``get_2d_rotary_pos_embed`` builds its grid with
    ``np.meshgrid(w, h)`` so the first half of the rope dims embeds the
    column (w) coordinate — same convention as the 2D sincos tables."""
    pos = cm.patch_positions_2d(hp, wp)  # (S, 2) = (row, col)
    return pos[:, ::-1]


def hunyuandit_tiny() -> HunyuanDiTConfig:
    return HunyuanDiTConfig(
        dim=64, depth=4, heads=4, text_dim=32, t5_dim=48, text_len=6,
        text_len_t5=8, ffn_hidden=128, rope_axes=(8, 8),
    )


def _init_block(key, cfg: HunyuanDiTConfig, with_skip: bool):
    d, dt, hd = cfg.dim, cfg.dtype, cfg.head_dim
    ks = jax.random.split(key, 8)
    p = {
        # AdaLayerNormShift: AFFINE LayerNorm + shift from linear(silu(temb))
        "mod_shift": cm.init_linear(ks[0], d, d, dtype=dt),
        "norm1": cm.init_layernorm(d, dtype=dt),
        "attn_qkv": cm.init_linear(ks[1], d, 3 * d, dtype=dt),
        # qk norms are per-head AFFINE LayerNorms (qk_norm="layer_norm")
        "q_norm": cm.init_layernorm(hd, dtype=dt),
        "k_norm": cm.init_layernorm(hd, dtype=dt),
        "attn_out": cm.init_linear(ks[2], d, d, dtype=dt),
        "norm2": cm.init_layernorm(d, dtype=dt),
        "cross_q": cm.init_linear(ks[3], d, d, dtype=dt),
        "cross_kv": cm.init_linear(ks[4], cfg.text_dim, 2 * d, dtype=dt),
        "cross_q_norm": cm.init_layernorm(hd, dtype=dt),
        "cross_k_norm": cm.init_layernorm(hd, dtype=dt),
        "cross_out": cm.init_linear(ks[5], d, d, dtype=dt),
        "norm3": cm.init_layernorm(d, dtype=dt),
        "ffn": cm.init_ffn(ks[6], d, cfg.ffn_hidden, dtype=dt),
    }
    if with_skip:
        p["skip_norm"] = cm.init_layernorm(2 * d, dtype=dt)
        p["skip_proj"] = cm.init_linear(ks[7], 2 * d, d, dtype=dt)
    return p


def init_hunyuandit(key, cfg: HunyuanDiTConfig):
    assert cfg.depth % 2 == 0
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 16)
    half = cfg.depth // 2
    down = [
        _init_block(k, cfg, False) for k in jax.random.split(ks[0], half)
    ]
    up = [_init_block(k, cfg, True) for k in jax.random.split(ks[1], half)]
    return {
        "patch_embed": cm.init_linear(
            ks[2], cfg.patch**2 * cfg.in_channels, d, dtype=dt
        ),
        "t_embed": cm.init_timestep_embedder(ks[3], 256, d, dtype=dt),
        # text conditioning stack (HunyuanCombinedTimestepTextSizeStyle
        # embedding + T5 projection + learned padding, v1.2: no style/size)
        "text_embedder": {
            "fc1": cm.init_linear(ks[6], cfg.t5_dim, 4 * cfg.t5_dim, dtype=dt),
            "fc2": cm.init_linear(ks[7], 4 * cfg.t5_dim, cfg.text_dim, dtype=dt),
        },
        "text_pad": jnp.zeros(
            (cfg.text_len + cfg.text_len_t5, cfg.text_dim), dt
        ),
        "pooler": {
            "pos": jnp.zeros((cfg.text_len_t5 + 1, cfg.t5_dim), dt),
            "q": cm.init_linear(ks[8], cfg.t5_dim, cfg.t5_dim, dtype=dt),
            "k": cm.init_linear(ks[9], cfg.t5_dim, cfg.t5_dim, dtype=dt),
            "v": cm.init_linear(ks[10], cfg.t5_dim, cfg.t5_dim, dtype=dt),
            "out": cm.init_linear(ks[11], cfg.t5_dim, cfg.text_dim, dtype=dt),
        },
        "extra_embedder": {
            "fc1": cm.init_linear(ks[12], cfg.text_dim, 4 * d, dtype=dt),
            "fc2": cm.init_linear(ks[13], 4 * d, d, dtype=dt),
        },
        "down_blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *down),
        "up_blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *up),
        "norm_out_mod": cm.init_linear(ks[4], d, 2 * d, dtype=dt),
        "proj_out": cm.init_linear(
            ks[5], d, cfg.patch**2 * cfg.out_channels, dtype=dt
        ),
    }


def hunyuandit_condition(
    params,
    clip_text: jax.Array,
    t5_text: jax.Array,
    clip_mask: Optional[jax.Array],
    t5_mask: Optional[jax.Array],
    cfg: HunyuanDiTConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Build the joint text context + the extra timestep conditioning.

    diffusers HunyuanDiT2DModel.forward: T5 states project through
    ``text_embedder`` (silu MLP), concat after the CLIP states, masked
    positions replaced by the LEARNED ``text_embedding_padding`` rows (no
    attention mask afterwards); the extra temb is the attention-pooled T5
    states through ``extra_embedder``.

    Returns (text (B, 77+256, text_dim), temb_extra (B, dim)).
    """
    b = clip_text.shape[0]
    t5_proj = cm.linear(
        params["text_embedder"]["fc2"],
        cm.silu(cm.linear(params["text_embedder"]["fc1"], t5_text)),
    )
    text = jnp.concatenate([clip_text.astype(t5_proj.dtype), t5_proj], axis=1)
    if clip_mask is None:
        clip_mask = jnp.ones(clip_text.shape[:2], bool)
    if t5_mask is None:
        t5_mask = jnp.ones(t5_text.shape[:2], bool)
    mask = jnp.concatenate([clip_mask, t5_mask], axis=1)
    text = jnp.where(
        mask[..., None], text, params["text_pad"].astype(text.dtype)[None]
    )

    # HunyuanDiTAttentionPool over the T5 states
    pooled = _attention_pool(params["pooler"], t5_text.astype(text.dtype))
    extra = cm.linear(
        params["extra_embedder"]["fc2"],
        cm.silu(cm.linear(params["extra_embedder"]["fc1"], pooled)),
    )
    return text, extra


def _attention_pool(p, x: jax.Array) -> jax.Array:
    """CLIP-style attention pooling (HunyuanDiTAttentionPool): prepend the
    mean token, add a learned positional table, single multi-head attention
    with the mean token as the only query, project out."""
    b, s, c = x.shape
    mean = jnp.mean(x, axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1) + p["pos"].astype(x.dtype)[None]
    heads = 8
    hd = c // heads
    q = cm.linear(p["q"], x[:, :1]).reshape(b, 1, heads, hd)
    k = cm.linear(p["k"], x).reshape(b, s + 1, heads, hd)
    v = cm.linear(p["v"], x).reshape(b, s + 1, heads, hd)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q.astype(jnp.float32) * hd**-0.5,
        k.astype(jnp.float32),
    )
    w = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))
    return cm.linear(p["out"], o.reshape(b, 1, c).astype(x.dtype))[:, 0]


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _unheads(x):
    b, s, h, hd = x.shape
    return x.reshape(b, s, h * hd)


def _block_factory(temb, text, cfg, rope, attn, kv_lens, tp_axis):
    """One HunyuanDiT block body closure (shared by down/up scans)."""
    h = cfg.heads
    cos, sin = rope

    def block_body(p, x, state):
        # AdaLayerNormShift self attention with RoPE + affine LN QK norm
        shift = cm.linear(p["mod_shift"], cm.silu(temb))[:, None, :]
        xn = cm.layernorm(p["norm1"], x) + shift
        q, k, v = [
            _heads(y, h) for y in jnp.split(cm.linear(p["attn_qkv"], xn), 3, -1)
        ]
        q = cm.layernorm(p["q_norm"], q)
        k = cm.layernorm(p["k_norm"], k)
        q, k = cm.apply_rope(q, cos, sin), cm.apply_rope(k, cos, sin)
        o, state = attn(q, k, v, state)
        x = x + cm.linear(p["attn_out"], _unheads(o))

        # cross attention to text — QUERIES are rotary-embedded too
        # (diffusers HunyuanAttnProcessor2_0 applies rope to q always,
        # to k only when self-attention)
        xn = cm.layernorm(p["norm2"], x)
        q = _heads(cm.linear(p["cross_q"], xn), h)
        kt, vt = jnp.split(cm.linear(p["cross_kv"], text), 2, -1)
        q = cm.apply_rope(cm.layernorm(p["cross_q_norm"], q), cos, sin)
        kt = cm.layernorm(p["cross_k_norm"], _heads(kt, h))
        o = _cross_attn(q, kt, _heads(vt, h), None, kv_lens=kv_lens)
        x = x + cm.linear(p["cross_out"], _unheads(o))

        # ffn
        xn = cm.layernorm(p["norm3"], x)
        x = x + cm.ffn(p["ffn"], xn, tp_axis=tp_axis)
        return x, state

    return block_body


def _down_body(temb, text, cfg, rope, attn, kv_lens, tp_axis):
    """Scan body over down blocks; ys carry (state, skip activation).

    The ONE definition of the down-half step — the standalone scans, the
    main forward, and the patch-PP sampler all build from here, so skip
    handling cannot silently diverge between them."""
    body = _block_factory(temb, text, cfg, rope, attn, kv_lens, tp_axis)

    def down(carry, xs):
        p, state = xs
        x, state = body(p, carry, state)
        return x, (state, x)

    return down


def _up_body(temb, text, cfg, rope, attn, kv_lens, tp_axis):
    """Scan body over up blocks consuming skips (see :func:`_down_body`).

    xs carries a per-slot ``use_skip`` flag: the checkpoint has skip
    channels only for blocks ``layer > depth // 2`` — 19 of 40, NOT a
    symmetric half (diffusers HunyuanDiT2DModel; the reference's copy pops
    at ``hunyuan_transformer_2d.py:179`` and pushes at ``:195``).  Up slot 0
    (global block depth/2) is therefore a plain block whose skip params are
    dead zeros, and the LAST down block's activation is never consumed."""
    body = _block_factory(temb, text, cfg, rope, attn, kv_lens, tp_axis)

    def up(carry, xs):
        p, state, skip, use_skip = xs
        cat = jnp.concatenate([carry, skip], axis=-1)
        mixed = cm.linear(p["skip_proj"], cm.layernorm(p["skip_norm"], cat))
        x = jnp.where(use_skip, mixed, carry)
        x, state = body(p, x, state)
        return x, state

    return up


def up_skip_mask(n_local: int, offset=0) -> jnp.ndarray:
    """(n_local,) bool: which up slots consume a skip (global slot > 0).

    ``offset`` is the global up-slot index of local slot 0 (stage offset
    under PP sharding; may be a traced scalar)."""
    return (offset + jnp.arange(n_local)) > 0


def hunyuandit_down_scan(
    blocks, x, temb, text, cfg, *, rope, attn=SingleDeviceAttn(),
    attn_state=(), kv_lens=None, tp_axis=None,
):
    """Scan the (stacked) down blocks: -> (x, new_state, skip stack)."""
    down = _down_body(temb, text, cfg, rope, attn, kv_lens, tp_axis)
    x, (new_state, skips) = jax.lax.scan(down, x, (blocks, attn_state))
    return x, new_state, skips


def hunyuandit_up_scan(
    blocks, x, skips, temb, text, cfg, *, rope, attn=SingleDeviceAttn(),
    attn_state=(), kv_lens=None, tp_axis=None, skip_mask=None,
):
    """Scan the (stacked) up blocks consuming skips (already in consumption
    order): -> (x, new_state).  ``skip_mask`` defaults to the single-stage
    mask (slot 0 = the skip-less global block depth/2)."""
    up = _up_body(temb, text, cfg, rope, attn, kv_lens, tp_axis)
    if skip_mask is None:
        skip_mask = up_skip_mask(
            jax.tree_util.tree_leaves(blocks)[0].shape[0]
        )
    x, new_state = jax.lax.scan(up, x, (blocks, attn_state, skips, skip_mask))
    return x, new_state


def hunyuandit_head(params, x, temb, cfg: HunyuanDiTConfig):
    mod = cm.linear(params["norm_out_mod"], cm.silu(temb))
    scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
    x = cm.layernorm({}, x) * (1 + scale) + shift
    return cm.linear(params["proj_out"], x)


def hunyuandit_forward(
    params,
    x: jax.Array,
    t: jax.Array,
    text: jax.Array,
    cfg: HunyuanDiTConfig,
    *,
    rope: Tuple[jax.Array, jax.Array],
    attn=SingleDeviceAttn(),
    attn_state_down=(),
    attn_state_up=(),
    attn_up=None,
    text_mask: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
    temb_extra: Optional[jax.Array] = None,
):
    """HunyuanDiT denoiser on local token shards.

    x: (B, S_local, p*p*C); text: (B, S_txt, text_dim) replicated (use
    :func:`hunyuandit_condition` to build the joint 77+256 context and
    ``temb_extra`` from raw CLIP/T5 states — with it, pass
    ``text_mask=None`` since masked rows already carry the learned
    padding embeddings); rope: (cos, sin) for the local tokens.
    Returns (out, new_state_down, new_state_up).
    """
    x = cm.linear(params["patch_embed"], x)
    temb = cm.timestep_embedder(params["t_embed"], t, 256)
    if temb_extra is not None:
        temb = temb + temb_extra.astype(temb.dtype)
    # padding masks are contiguous prefixes -> flash-compatible lengths
    kv_lens = (
        jnp.sum(text_mask, axis=-1).astype(jnp.int32)
        if text_mask is not None else None
    )
    def make_down(a):
        return _down_body(temb, text, cfg, rope, a, kv_lens, tp_axis)

    def make_up(a):
        return _up_body(temb, text, cfg, rope, a, kv_lens, tp_axis)

    segmented = isinstance(attn, (tuple, list))
    if not segmented:
        down, up = make_down(attn), make_up(attn)

    if pp_stages > 1:
        assert not segmented, "per-layer plans are layer-uniform under pp>1"
        # PipeFusion with the long-skip channel: down/up block chunks are
        # pp-sharded; after the down pipeline each stage ships its skip stack
        # to the MIRROR stage (the reference's pipeline_send_skip/recv_skip,
        # pipeline_hunyuandit.py:552-825) since up chunk s consumes the skips
        # of down chunk (P-1-s) in reverse layer order.
        from compactfusion_tpu.parallel.mesh import AXIS_PP
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        l_loc = params["down_blocks"]["attn_qkv"]["w"].shape[0]
        skip_buf = jnp.zeros((l_loc,) + x.shape, x.dtype)

        def down_stage(h, st):
            attn_st, _ = st
            h2, (new_attn, skips) = jax.lax.scan(
                down, h, (params["down_blocks"], attn_st)
            )
            return h2, (new_attn, skips)

        x, (state_down, my_skips) = pipefusion_blocks(
            down_stage, x, (attn_state_down, skip_buf), pp_stages
        )
        mirror = [(s, pp_stages - 1 - s) for s in range(pp_stages)]
        skips_mirror = jnp.flip(
            jax.lax.ppermute(my_skips, AXIS_PP, mirror), axis=0
        )
        # stage s holds up slots [s*l_loc, (s+1)*l_loc) (layer-axis sharding
        # like down_blocks), so the skip-less global up slot 0 sits on
        # stage 0's chunk
        stage = jax.lax.axis_index(AXIS_PP)
        up_mask = up_skip_mask(l_loc, offset=stage * l_loc)

        def up_stage(h, st):
            attn_st, skips = st
            h2, new_attn = jax.lax.scan(
                up, h, (params["up_blocks"], attn_st, skips, up_mask)
            )
            return h2, (new_attn, skips)

        x, (state_up, _) = pipefusion_blocks(
            up_stage, x, (attn_state_up, skips_mirror), pp_stages
        )
    elif segmented:
        # per-layer compression plans (reference compress_func(layer, step)):
        # one scan per contiguous layer segment, per block half; the up half
        # consumes the reversed skip stack sliced to its segments
        a_up = attn_up
        assert a_up is not None, "segmented plans need explicit attn_up"
        states, skip_parts = [], []
        l0 = 0
        for (seg_a, n_l), seg_st in zip(attn, attn_state_down):
            seg_blocks = jax.tree_util.tree_map(
                lambda v, _l0=l0, _n=n_l: v[_l0 : _l0 + _n],
                params["down_blocks"],
            )
            x, (st, sk) = jax.lax.scan(
                make_down(seg_a), x, (seg_blocks, seg_st)
            )
            states.append(st)
            skip_parts.append(sk)
            l0 += n_l
        half = jax.tree_util.tree_leaves(params["down_blocks"])[0].shape[0]
        assert l0 == half, (
            f"down-half layer segments cover {l0} of {half} layers"
        )
        state_down = tuple(states)
        # mirror order: up block k consumes the skip of down block (half-1-k)
        skips_rev = jnp.flip(jnp.concatenate(skip_parts, axis=0), axis=0)
        states, l0 = [], 0
        for (seg_a, n_l), seg_st in zip(a_up, attn_state_up):
            seg_blocks = jax.tree_util.tree_map(
                lambda v, _l0=l0, _n=n_l: v[_l0 : _l0 + _n],
                params["up_blocks"],
            )
            x, st = jax.lax.scan(
                make_up(seg_a), x,
                (seg_blocks, seg_st,
                 jax.lax.slice_in_dim(skips_rev, l0, l0 + n_l),
                 up_skip_mask(n_l, offset=l0)),
            )
            states.append(st)
            l0 += n_l
        assert l0 == jax.tree_util.tree_leaves(params["up_blocks"])[0].shape[0], (
            "up-half layer segments must cover every up block"
        )
        state_up = tuple(states)
    else:
        x, (state_down, skips) = jax.lax.scan(
            down, x, (params["down_blocks"], attn_state_down)
        )
        # mirror order: up block k consumes the skip of down block (half-1-k)
        # (slot 0's "skip" — the LAST down block's activation — is masked
        # off: the real model never consumes it, see _up_body)
        skips_rev = jnp.flip(skips, axis=0)
        half_up = jax.tree_util.tree_leaves(params["up_blocks"])[0].shape[0]
        x, state_up = jax.lax.scan(
            up, x,
            (params["up_blocks"], attn_state_up, skips_rev,
             up_skip_mask(half_up)),
        )

    return hunyuandit_head(params, x, temb, cfg), state_down, state_up
