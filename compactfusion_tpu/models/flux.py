"""FLUX.1 transformer (flagship backbone).

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/transformer_flux.py:34-238``
(a diffusers ``FluxTransformer2DModel`` wrapper): 19 double (MMDiT) blocks
with separate image/text streams joined for attention, 38 single blocks on
the fused stream, multi-axis RoPE, AdaLN-Zero modulation from
timestep+guidance+pooled-CLIP embeddings, flow-matching velocity output.

SPMD layout (matches the reference's USP strategy): image tokens sharded over
(ring, ulysses); text tokens replicated on every SP rank and passed to the
ring as joint front tensors (``hybrid/attn_layer.py:128-147``) — each rank
computes the text stream redundantly (512 tokens), the image stream locally.
CompactFusion compression therefore applies to exactly the image K/V that
crosses chips, like the reference.

Both block families scan over stacked parameters with per-layer compression
state as scan xs/ys.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    dim: int = 3072
    double_layers: int = 19
    single_layers: int = 38
    heads: int = 24
    in_channels: int = 64  # 2x2-packed 16-channel latent
    text_dim: int = 4096  # T5-XXL
    pooled_dim: int = 768  # CLIP-L pooled
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    mlp_ratio: int = 4
    guidance_embeds: bool = True  # FLUX.1-dev (schnell: False)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.heads


def flux_dev() -> FluxConfig:
    return FluxConfig()


def flux_schnell() -> FluxConfig:
    return FluxConfig(guidance_embeds=False)


def flux_tiny() -> FluxConfig:
    """Scaled-down config for tests (head_dim 16 -> axes (4, 6, 6))."""
    return FluxConfig(
        dim=64,
        double_layers=2,
        single_layers=2,
        heads=4,
        in_channels=16,
        text_dim=32,
        pooled_dim=16,
        axes_dim=(4, 6, 6),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_double_block(key, cfg: FluxConfig):
    d, dt = cfg.dim, cfg.dtype
    hd = cfg.head_dim
    ks = jax.random.split(key, 10)
    return {
        "img_mod": cm.init_linear(ks[0], d, 6 * d, dtype=dt),
        "txt_mod": cm.init_linear(ks[1], d, 6 * d, dtype=dt),
        "img_qkv": cm.init_linear(ks[2], d, 3 * d, dtype=dt),
        "txt_qkv": cm.init_linear(ks[3], d, 3 * d, dtype=dt),
        "img_q_norm": cm.init_rmsnorm(hd, dt),
        "img_k_norm": cm.init_rmsnorm(hd, dt),
        "txt_q_norm": cm.init_rmsnorm(hd, dt),
        "txt_k_norm": cm.init_rmsnorm(hd, dt),
        "img_out": cm.init_linear(ks[4], d, d, dtype=dt),
        "txt_out": cm.init_linear(ks[5], d, d, dtype=dt),
        "img_ffn": cm.init_ffn(ks[6], d, cfg.mlp_ratio * d, dtype=dt),
        "txt_ffn": cm.init_ffn(ks[7], d, cfg.mlp_ratio * d, dtype=dt),
    }


def _init_single_block(key, cfg: FluxConfig):
    d, dt = cfg.dim, cfg.dtype
    hd = cfg.head_dim
    ks = jax.random.split(key, 5)
    return {
        "mod": cm.init_linear(ks[0], d, 3 * d, dtype=dt),
        "qkv": cm.init_linear(ks[1], d, 3 * d, dtype=dt),
        "q_norm": cm.init_rmsnorm(hd, dt),
        "k_norm": cm.init_rmsnorm(hd, dt),
        # the fused proj_out of the reference is stored split so the MLP half
        # can row-shard under TP while the attention half stays replicated
        "mlp": {
            "fc1": cm.init_linear(ks[2], d, cfg.mlp_ratio * d, dtype=dt),
            "fc2": cm.init_linear(ks[3], cfg.mlp_ratio * d, d, bias=False, dtype=dt),
        },
        "out_attn": cm.init_linear(ks[4], d, d, dtype=dt),
    }


def init_flux(key, cfg: FluxConfig):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 12)
    doubles = [
        _init_double_block(k, cfg)
        for k in jax.random.split(ks[0], cfg.double_layers)
    ]
    singles = [
        _init_single_block(k, cfg)
        for k in jax.random.split(ks[1], cfg.single_layers)
    ]
    p = {
        "x_embedder": cm.init_linear(ks[2], cfg.in_channels, d, dtype=dt),
        "context_embedder": cm.init_linear(ks[3], cfg.text_dim, d, dtype=dt),
        "t_embed": cm.init_timestep_embedder(ks[4], 256, d, dtype=dt),
        "pooled_embed": cm.init_timestep_embedder(ks[5], cfg.pooled_dim, d, dtype=dt),
        "double_blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *doubles),
        "single_blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *singles),
        "norm_out_mod": cm.init_linear(ks[6], d, 2 * d, dtype=dt),
        "proj_out": cm.init_linear(ks[7], d, cfg.in_channels, dtype=dt),
    }
    if cfg.guidance_embeds:
        p["guidance_embed"] = cm.init_timestep_embedder(ks[8], 256, d, dtype=dt)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _heads(x, h):
    b, s, dim = x.shape
    return x.reshape(b, s, h, dim // h)


def _unheads(x):
    b, s, h, hd = x.shape
    return x.reshape(b, s, h * hd)


def _qk_norm(p_q, p_k, q, k):
    return cm.rmsnorm(p_q, q), cm.rmsnorm(p_k, k)


def _mod(p, temb, n):
    out = cm.linear(p, cm.silu(temb))  # (B, n*d)
    return jnp.split(out[:, None, :], n, axis=-1)  # n x (B, 1, d)


def flux_image_positions(hp: int, wp: int) -> jax.Array:
    """(hp*wp, 3) FLUX image token ids (0, row, col)."""
    pos = cm.patch_positions_2d(hp, wp)
    return jnp.concatenate([jnp.zeros((hp * wp, 1), pos.dtype), pos], axis=-1)


def pad_flux_for_pp(params, cfg: FluxConfig, ps: int):
    """Pad the stacked block families with ZERO-INIT blocks so both counts
    divide ``ps`` (real FLUX has 19 double blocks — prime).

    Exact under AdaLN-Zero: a block whose modulation weights AND biases are
    zero produces shift = scale = gate = 0, so its attention/FFN outputs are
    gated off and the residual stream passes through unchanged.

    Returns (padded params, padded cfg).
    """
    import dataclasses

    def pad_stack(stacked, n_extra):
        return jax.tree_util.tree_map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((n_extra,) + a.shape[1:], a.dtype)], axis=0
            ),
            stacked,
        )

    d_extra = (-cfg.double_layers) % ps
    s_extra = (-cfg.single_layers) % ps
    if d_extra == 0 and s_extra == 0:
        return params, cfg
    params = dict(params)
    if d_extra:
        params["double_blocks"] = pad_stack(params["double_blocks"], d_extra)
    if s_extra:
        params["single_blocks"] = pad_stack(params["single_blocks"], s_extra)
    cfg = dataclasses.replace(
        cfg,
        double_layers=cfg.double_layers + d_extra,
        single_layers=cfg.single_layers + s_extra,
    )
    return params, cfg


def flux_time_embed(params, pooled, t, guidance, cfg: FluxConfig):
    """Combined timestep + pooled-CLIP (+ guidance) conditioning (B, d)."""
    temb = cm.timestep_embedder(params["t_embed"], t, 256)
    temb = temb + cm.mlp_embedder(
        params["pooled_embed"], pooled.astype(cfg.dtype)
    )
    if cfg.guidance_embeds:
        assert guidance is not None
        temb = temb + cm.timestep_embedder(params["guidance_embed"], guidance, 256)
    return temb


def flux_double_scan(
    blocks, img, txt, temb, cfg: FluxConfig, *, img_rope, txt_rope,
    attn=SingleDeviceAttn(), attn_state=(), tp_axis=None,
):
    """Scan the (stacked) MMDiT double blocks: -> (img, txt, new_state).

    ``attn`` may be a tuple of ``(strategy, n_layers)`` segments (per-layer
    compression plans, reference ``compress_func(layer, step)``); one scan is
    compiled per contiguous segment with its own state pytree.
    """
    h = cfg.heads
    # FLUX params live in the rotate-half rope layout (converters permute
    # the interleaved checkpoint Wq/Wk, models/common.apply_rope_half)
    cos_i, sin_i = cm.rope_half_tables(*img_rope)
    cos_t, sin_t = cm.rope_half_tables(*txt_rope)

    def make_block(attn):
      def double_block(carry, xs):
        img, txt = carry
        p, state = xs
        i_sh_a, i_sc_a, i_g_a, i_sh_m, i_sc_m, i_g_m = _mod(p["img_mod"], temb, 6)
        t_sh_a, t_sc_a, t_g_a, t_sh_m, t_sc_m, t_g_m = _mod(p["txt_mod"], temb, 6)

        img_n = cm.layernorm({}, img) * (1 + i_sc_a) + i_sh_a
        txt_n = cm.layernorm({}, txt) * (1 + t_sc_a) + t_sh_a

        iq, ik, iv = [_heads(x, h) for x in jnp.split(cm.linear(p["img_qkv"], img_n), 3, -1)]
        tq, tk, tv = [_heads(x, h) for x in jnp.split(cm.linear(p["txt_qkv"], txt_n), 3, -1)]
        iq, ik = _qk_norm(p["img_q_norm"], p["img_k_norm"], iq, ik)
        tq, tk = _qk_norm(p["txt_q_norm"], p["txt_k_norm"], tq, tk)
        iq, ik = cm.apply_rope_half(iq, cos_i, sin_i), cm.apply_rope_half(ik, cos_i, sin_i)
        tq, tk = cm.apply_rope_half(tq, cos_t, sin_t), cm.apply_rope_half(tk, cos_t, sin_t)

        o, state = attn(iq, ik, iv, state, joint_q=tq, joint_k=tk, joint_v=tv)
        s_txt = txt.shape[1]
        txt_o, img_o = o[:, :s_txt], o[:, s_txt:]

        img = img + i_g_a * cm.linear(p["img_out"], _unheads(img_o))
        txt = txt + t_g_a * cm.linear(p["txt_out"], _unheads(txt_o))

        img_n = cm.layernorm({}, img) * (1 + i_sc_m) + i_sh_m
        img = img + i_g_m * cm.ffn(p["img_ffn"], img_n, tp_axis=tp_axis)
        txt_n = cm.layernorm({}, txt) * (1 + t_sc_m) + t_sh_m
        txt = txt + t_g_m * cm.ffn(p["txt_ffn"], txt_n, tp_axis=tp_axis)
        return (img, txt), state

      return double_block

    return _scan_segments(make_block, (img, txt), blocks, attn, attn_state)


def flux_single_scan(
    blocks, img, txt, temb, cfg: FluxConfig, *, img_rope, txt_rope,
    attn=SingleDeviceAttn(), attn_state=(), tp_axis=None,
):
    """Scan the (stacked) single blocks on the fused stream:
    -> (img, txt, new_state)."""
    h = cfg.heads
    cos_i, sin_i = cm.rope_half_tables(*img_rope)
    cos_t, sin_t = cm.rope_half_tables(*txt_rope)
    s_txt = txt.shape[1]

    # Shared single-block math (ADVICE r4: keep the fused fastpath and the
    # generic strategy path on ONE implementation so a norm/proj tweak can't
    # silently drift them; test_flux_single_scan_fused_matches_generic pins
    # the equivalence).
    def qkv_and_norm(p, x):
        sh, sc, g = _mod(p["mod"], temb, 3)
        xn = cm.layernorm({}, x) * (1 + sc) + sh
        q, k, v = [
            _heads(y, h) for y in jnp.split(cm.linear(p["qkv"], xn), 3, -1)
        ]
        q, k = _qk_norm(p["q_norm"], p["k_norm"], q, k)
        return xn, q, k, v, g

    def out_proj(p, attn_out, xn, x, g):
        # y = [attn_out, gelu(mlp)] @ proj_out, with the mlp half running as
        # a TP-shardable GELU FFN and the attn half replicated
        y = cm.linear(p["out_attn"], attn_out) + cm.ffn(
            p["mlp"], xn, tp_axis=tp_axis
        )
        return x + g * y

    if type(attn) is SingleDeviceAttn and not jax.tree_util.tree_leaves(
        attn_state
    ):
        # Single-device fastpath: keep the (txt|img) stream CONCATENATED as
        # the scan carry (one concat before the scan, one split after)
        # instead of re-splitting and re-concatenating the full stream every
        # block just to fit the joint-tensor strategy call shape, and rotate
        # q/k with a fused rope table (rope is positionwise, so
        # concat∘rope == rope∘concat exactly).  Measured on v5e at FLUX-1024
        # shapes (_prof_flux.py s_full vs s_fused_carry).  Parallel
        # strategies keep the split path — the img/txt distinction is what
        # they shard/compress.
        cos_f = jnp.concatenate([cos_t, cos_i], axis=0)
        sin_f = jnp.concatenate([sin_t, sin_i], axis=0)

        def fused_block(x, p):
            xn, q, k, v, g = qkv_and_norm(p, x)
            q = cm.apply_rope_half(q, cos_f, sin_f)
            k = cm.apply_rope_half(k, cos_f, sin_f)
            o, _ = attn(q, k, v, ())
            return out_proj(p, _unheads(o), xn, x, g), None

        x = jnp.concatenate([txt, img], axis=1)
        x, _ = jax.lax.scan(fused_block, x, blocks)
        return x[:, s_txt:], x[:, :s_txt], attn_state

    def make_block(attn):
      def single_block(carry, xs):
        img, txt = carry
        p, state = xs
        x = jnp.concatenate([txt, img], axis=1)
        xn, q, k, v, g = qkv_and_norm(p, x)
        # joint (text) rows are the first s_txt tokens of the fused stream
        tq, iq = q[:, :s_txt], q[:, s_txt:]
        tk, ik = k[:, :s_txt], k[:, s_txt:]
        tv, iv = v[:, :s_txt], v[:, s_txt:]
        iq, ik = cm.apply_rope_half(iq, cos_i, sin_i), cm.apply_rope_half(ik, cos_i, sin_i)
        tq, tk = cm.apply_rope_half(tq, cos_t, sin_t), cm.apply_rope_half(tk, cos_t, sin_t)
        o, state = attn(iq, ik, iv, state, joint_q=tq, joint_k=tk, joint_v=tv)
        x = out_proj(p, _unheads(o), xn, x, g)
        return (x[:, s_txt:], x[:, :s_txt]), state

      return single_block

    return _scan_segments(make_block, (img, txt), blocks, attn, attn_state)


def _scan_segments(make_block, carry, blocks, attn, attn_state):
    (a, b), new_state = cm.scan_segments(
        make_block, carry, blocks, attn, attn_state
    )
    return a, b, new_state


def flux_head(params, img, temb, cfg: FluxConfig):
    """AdaLN-Continuous norm_out + proj_out -> velocity tokens."""
    mod = cm.linear(params["norm_out_mod"], cm.silu(temb))
    scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
    img = cm.layernorm({}, img) * (1 + scale) + shift
    return cm.linear(params["proj_out"], img)


def flux_forward(
    params,
    img: jax.Array,
    txt: jax.Array,
    pooled: jax.Array,
    t: jax.Array,
    guidance: Optional[jax.Array],
    cfg: FluxConfig,
    *,
    img_rope: Tuple[jax.Array, jax.Array],
    txt_rope: Tuple[jax.Array, jax.Array],
    attn=SingleDeviceAttn(),
    attn_state_double=(),
    attn_state_single=(),
    attn_single=None,
    tp_axis: Optional[str] = None,
    cache_cfg=None,
    cache_state=None,
    cache_force=None,
    pp_stages: int = 1,
):
    """FLUX denoiser on local image-token shards.

    ``attn_single`` overrides the strategy for the single-block family (per-
    layer plans give each family its own segment tuple); default = ``attn``.

    Args:
      img: (B, S_img_local, in_channels) packed latent tokens (local shard).
      txt: (B, S_txt, text_dim) T5 states, replicated over SP ranks.
      pooled: (B, pooled_dim) CLIP pooled embedding.
      t: (B,) timesteps in train units (sigma * 1000).
      guidance: (B,) guidance scale (dev only) or None.
      img_rope / txt_rope: (cos, sin) tables for the LOCAL image tokens and
        the replicated text tokens, from :func:`cm.rope_frequencies`.
      attn: self-attention strategy; the joint (text) tensors ride as ring
        joint front tensors, so only image K/V is ring-exchanged/compressed.

    Returns:
      (velocity, new_state_double, new_state_single):
        velocity (B, S_img_local, in_channels).
    """
    img = cm.linear(params["x_embedder"], img)
    txt = cm.linear(params["context_embedder"], txt)
    temb = flux_time_embed(params, pooled, t, guidance, cfg)

    if cache_cfg is not None and cache_cfg.mode != "none":
        # TeaCache / FBCache over the whole block stack (reference FLUX
        # adapter, cache/diffusers_adapters/flux.py:35-73): probe the first
        # double block, on skip replay the cached img residual to the end of
        # the single blocks.  Stateless attention required (see pixart).
        assert not (
            jax.tree_util.tree_leaves(attn_state_double)
            or jax.tree_util.tree_leaves(attn_state_single)
        ), "cache acceleration is incompatible with compact EF state"
        from compactfusion_tpu.cache.accel import (
            CacheAccelState,
            next_probe,
            should_skip,
        )

        p0 = jax.tree_util.tree_map(lambda a: a[0], params["double_blocks"])
        mod0 = cm.linear(p0["img_mod"], cm.silu(temb))
        sh0, sc0 = (
            mod0[:, None, : cfg.dim],
            mod0[:, None, cfg.dim : 2 * cfg.dim],
        )
        probe_in = cm.layernorm({}, img) * (1 + sc0) + sh0
        img1, txt1, _ = flux_double_scan(
            jax.tree_util.tree_map(lambda a: a[:1], params["double_blocks"]),
            img, txt, temb, cfg, img_rope=img_rope, txt_rope=txt_rope,
            attn=attn, attn_state=(), tp_axis=tp_axis,
        )
        # fbcache probes the first-block RESIDUAL (reference
        # get_modulated_inputs: block0(img) - img), not the raw block output
        probe = (img1 - img) if cache_cfg.mode == "fbcache" else probe_in
        skip, accum = should_skip(
            cache_cfg, cache_state, probe, force_compute=cache_force
        )

        p_rest = jax.tree_util.tree_map(lambda a: a[1:], params["double_blocks"])

        def run_rest(arg):
            img1, txt1 = arg
            img2, txt2, _ = flux_double_scan(
                p_rest, img1, txt1, temb, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
                attn=attn, attn_state=(), tp_axis=tp_axis,
            )
            img_f, _, _ = flux_single_scan(
                params["single_blocks"], img2, txt2, temb, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
                attn=attn, attn_state=(), tp_axis=tp_axis,
            )
            return img_f, (img_f - img1).astype(cache_state.residual.dtype)

        def replay(arg):
            img1, _ = arg
            return img1 + cache_state.residual.astype(img1.dtype), cache_state.residual

        img, residual = jax.lax.cond(skip, replay, run_rest, (img1, txt1))
        new_cache = CacheAccelState(
            prev_probe=next_probe(cache_cfg, cache_state, probe, skip),
            residual=residual,
            accum=accum,
            has_prev=jnp.ones((), jnp.int32),
            skips=cache_state.skips + skip.astype(jnp.int32),
        )
        out = flux_head(params, img, temb, cfg)
        return out, attn_state_double, attn_state_single, new_cache

    if pp_stages > 1:
        # sync PipeFusion over BOTH block families (stage-sharded stacks;
        # pad with models.flux.pad_flux_for_pp when depths don't divide)
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        assert (
            attn_single is None or attn_single is attn
        ) and not isinstance(attn, (tuple, list)), (
            "per-layer compression plans do not compose with pp"
        )

        def run_doubles(hh, st):
            i2, t2, st2 = flux_double_scan(
                params["double_blocks"], hh[0], hh[1], temb, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
                attn=attn, attn_state=st, tp_axis=tp_axis,
            )
            return (i2, t2), st2

        def run_singles(hh, st):
            i2, t2, st2 = flux_single_scan(
                params["single_blocks"], hh[0], hh[1], temb, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
                attn=attn, attn_state=st, tp_axis=tp_axis,
            )
            return (i2, t2), st2

        (img, txt), new_state_double = pipefusion_blocks(
            run_doubles, (img, txt), attn_state_double, pp_stages
        )
        (img, txt), new_state_single = pipefusion_blocks(
            run_singles, (img, txt), attn_state_single, pp_stages
        )
        return flux_head(params, img, temb, cfg), new_state_double, new_state_single

    img, txt, new_state_double = flux_double_scan(
        params["double_blocks"], img, txt, temb, cfg,
        img_rope=img_rope, txt_rope=txt_rope,
        attn=attn, attn_state=attn_state_double, tp_axis=tp_axis,
    )
    img, txt, new_state_single = flux_single_scan(
        params["single_blocks"], img, txt, temb, cfg,
        img_rope=img_rope, txt_rope=txt_rope,
        attn=attn if attn_single is None else attn_single,
        attn_state=attn_state_single, tp_axis=tp_axis,
    )
    return flux_head(params, img, temb, cfg), new_state_double, new_state_single
