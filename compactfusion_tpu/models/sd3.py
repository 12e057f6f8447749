"""Stable Diffusion 3 MMDiT backbone.

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/transformer_sd3.py`` (a diffusers
``SD3Transformer2DModel`` wrapper): joint transformer blocks with separate
image/text streams fused for attention (no RoPE — learned-free 2D sincos
positional embedding on the image tokens), AdaLN-Zero modulation from
timestep + pooled-CLIP embeddings, epsilon..velocity flow output.

Same SPMD layout as FLUX: image tokens sharded over (ring, ulysses), text
replicated as ring joint front tensors; scan over stacked block params with
per-layer compression state as scan xs/ys.

Note: the real SD3 checkpoint's final block is ``context_pre_only`` (no text
out-projection/FFN); we run symmetric blocks everywhere — the unused final
text-stream outputs are dead code XLA eliminates, and the weight converter
fills the missing tensors with zeros.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn


@dataclasses.dataclass(frozen=True)
class SD3Config:
    dim: int = 1536
    depth: int = 24
    heads: int = 24
    patch: int = 2
    in_channels: int = 16
    text_dim: int = 4096  # T5 + padded CLIP context
    pooled_dim: int = 2048  # CLIP-L + CLIP-G pooled
    mlp_ratio: int = 4
    pos_embed_max_size: int = 192
    #: diffusers PatchEmbed base grid (sample_size // patch); positions in
    #: the max-size table are scaled to this before center-cropping
    base_size: int = 64
    qk_norm: bool = False  # SD3.5 variants use per-head RMSNorm
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.heads


def sd3_medium() -> SD3Config:
    return SD3Config()


def sd3_tiny() -> SD3Config:
    return SD3Config(
        dim=64, depth=2, heads=4, in_channels=4, text_dim=32, pooled_dim=16,
        pos_embed_max_size=16, base_size=4, qk_norm=True,
    )


def _init_joint_block(key, cfg: SD3Config):
    d, dt, hd = cfg.dim, cfg.dtype, cfg.head_dim
    ks = jax.random.split(key, 10)
    p = {
        "img_mod": cm.init_linear(ks[0], d, 6 * d, dtype=dt),
        "txt_mod": cm.init_linear(ks[1], d, 6 * d, dtype=dt),
        "img_qkv": cm.init_linear(ks[2], d, 3 * d, dtype=dt),
        "txt_qkv": cm.init_linear(ks[3], d, 3 * d, dtype=dt),
        "img_out": cm.init_linear(ks[4], d, d, dtype=dt),
        "txt_out": cm.init_linear(ks[5], d, d, dtype=dt),
        "img_ffn": cm.init_ffn(ks[6], d, cfg.mlp_ratio * d, dtype=dt),
        "txt_ffn": cm.init_ffn(ks[7], d, cfg.mlp_ratio * d, dtype=dt),
    }
    if cfg.qk_norm:
        p["img_q_norm"] = cm.init_rmsnorm(hd, dt)
        p["img_k_norm"] = cm.init_rmsnorm(hd, dt)
        p["txt_q_norm"] = cm.init_rmsnorm(hd, dt)
        p["txt_k_norm"] = cm.init_rmsnorm(hd, dt)
    return p


def init_sd3(key, cfg: SD3Config):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 8)
    blocks = [_init_joint_block(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    return {
        "patch_embed": cm.init_linear(
            ks[1], cfg.patch * cfg.patch * cfg.in_channels, d, dtype=dt
        ),
        "context_embedder": cm.init_linear(ks[2], cfg.text_dim, d, dtype=dt),
        "t_embed": cm.init_timestep_embedder(ks[3], 256, d, dtype=dt),
        "pooled_embed": cm.init_timestep_embedder(ks[4], cfg.pooled_dim, d, dtype=dt),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "norm_out_mod": cm.init_linear(ks[5], d, 2 * d, dtype=dt),
        "proj_out": cm.init_linear(
            ks[6], d, cfg.patch * cfg.patch * cfg.in_channels, dtype=dt
        ),
    }


def _heads(x, h):
    b, s, dim = x.shape
    return x.reshape(b, s, h, dim // h)


def _unheads(x):
    b, s, h, hd = x.shape
    return x.reshape(b, s, h * hd)


def _mod(p, temb, n):
    out = cm.linear(p, cm.silu(temb))
    return jnp.split(out[:, None, :], n, axis=-1)


def sd3_time_embed(params, pooled, t, cfg: SD3Config):
    temb = cm.timestep_embedder(params["t_embed"], t, 256)
    return temb + cm.mlp_embedder(
        params["pooled_embed"], pooled.astype(cfg.dtype)
    )


def sd3_head(params, img, temb, cfg: SD3Config):
    mod = cm.linear(params["norm_out_mod"], cm.silu(temb))
    scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
    img = cm.layernorm({}, img) * (1 + scale) + shift
    return cm.linear(params["proj_out"], img)


def sd3_joint_scan(
    blocks, img, txt, temb, cfg: SD3Config, *, attn=SingleDeviceAttn(),
    attn_state=(), tp_axis=None,
):
    """Scan the (stacked) MMDiT joint blocks: -> (img, txt, new_state).

    ``attn`` may be a tuple of ``(strategy, n_layers)`` segments (per-layer
    compression plans, reference ``compress_func(layer, step)``); one scan is
    compiled per contiguous layer segment with its own state pytree.
    """
    h = cfg.heads

    def make_block(attn):
      def joint_block(carry, xs):
        img, txt = carry
        p, state = xs
        i_sh_a, i_sc_a, i_g_a, i_sh_m, i_sc_m, i_g_m = _mod(p["img_mod"], temb, 6)
        t_sh_a, t_sc_a, t_g_a, t_sh_m, t_sc_m, t_g_m = _mod(p["txt_mod"], temb, 6)

        img_n = cm.layernorm({}, img) * (1 + i_sc_a) + i_sh_a
        txt_n = cm.layernorm({}, txt) * (1 + t_sc_a) + t_sh_a
        iq, ik, iv = [
            _heads(x, h) for x in jnp.split(cm.linear(p["img_qkv"], img_n), 3, -1)
        ]
        tq, tk, tv = [
            _heads(x, h) for x in jnp.split(cm.linear(p["txt_qkv"], txt_n), 3, -1)
        ]
        if cfg.qk_norm:
            iq = cm.rmsnorm(p["img_q_norm"], iq)
            ik = cm.rmsnorm(p["img_k_norm"], ik)
            tq = cm.rmsnorm(p["txt_q_norm"], tq)
            tk = cm.rmsnorm(p["txt_k_norm"], tk)

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

      return joint_block

    (img, txt), new_state = cm.scan_segments(
        make_block, (img, txt), blocks, attn, attn_state
    )
    return img, txt, new_state


def sd3_forward(
    params,
    img: jax.Array,
    txt: jax.Array,
    pooled: jax.Array,
    t: jax.Array,
    cfg: SD3Config,
    *,
    pos_embed: jax.Array,
    attn=SingleDeviceAttn(),
    attn_state=(),
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
):
    """SD3 denoiser on local image-token shards.

    img: (B, S_img_local, p*p*C); txt: (B, S_txt, text_dim) replicated;
    pooled: (B, pooled_dim); t: (B,) in train units.
    pos_embed: (S_img_local, dim) sincos table for the local tokens.
    Returns (velocity, new_attn_state).
    """
    img = cm.linear(params["patch_embed"], img) + pos_embed.astype(cfg.dtype)[None]
    txt = cm.linear(params["context_embedder"], txt)
    temb = sd3_time_embed(params, pooled, t, cfg)
    if pp_stages > 1:
        # sync PipeFusion: the blocks stack is sharded over the pp axis
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        assert not isinstance(attn, (tuple, list)), (
            "per-layer compression plans do not compose with pp"
        )

        def run_blocks(hh, st):
            i2, t2, st2 = sd3_joint_scan(
                params["blocks"], hh[0], hh[1], temb, cfg,
                attn=attn, attn_state=st, tp_axis=tp_axis,
            )
            return (i2, t2), st2

        (img, txt), new_state = pipefusion_blocks(
            run_blocks, (img, txt), attn_state, pp_stages
        )
        return sd3_head(params, img, temb, cfg), new_state

    img, txt, new_state = sd3_joint_scan(
        params["blocks"], img, txt, temb, cfg,
        attn=attn, attn_state=attn_state, tp_axis=tp_axis,
    )
    return sd3_head(params, img, temb, cfg), new_state
