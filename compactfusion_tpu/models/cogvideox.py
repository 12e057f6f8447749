"""CogVideoX 3D video DiT backbone.

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/cogvideox_transformer_3d.py``
(a diffusers ``CogVideoXTransformer3DModel`` wrapper): joint text+video
blocks where ONE set of attention/FF weights serves both streams and only the
AdaLN modulations differ (CogVideoXLayerNormZero), 3D (t, h, w) rotary
embedding on the video tokens (1.5/5B family) or a learned positional table
(2B), v-prediction output.

SPMD layout: video tokens (frames x height x width patches, raster order)
sharded over (ring, ulysses); text replicated as ring joint front tensors —
identical to the image models, which is exactly why the reference reuses the
same USP machinery for CogVideoX (``attention_processor.py``,
``xFuserCogVideoXAttnProcessor2_0``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn


@dataclasses.dataclass(frozen=True)
class CogVideoXConfig:
    dim: int = 1920
    depth: int = 30
    heads: int = 30
    patch: int = 2
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    time_embed_dim: int = 512
    ffn_mult: int = 4
    use_rotary: bool = True  # 1.5/5B; 2B uses the learned pos table
    #: temporal patch size (CogVideoX 1.5 uses 2: latent frames are grouped
    #: in pairs per token; the reference pads latent frames to a multiple of
    #: patch_size_t and drops the padding after denoise,
    #: ``pipeline_cogvideox.py:227-233,262``)
    patch_t: int = 1
    #: rope head-dim split over (t, h, w)
    axes_dim: Tuple[int, ...] = (16, 24, 24)
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.heads

    @property
    def token_in(self) -> int:
        """Channels per patchified token: (p_t, p, p, C) packed."""
        return self.patch_t * self.patch * self.patch * self.in_channels

    @property
    def token_out(self) -> int:
        return self.patch_t * self.patch * self.patch * self.out_channels


def cogvideox_2b() -> CogVideoXConfig:
    return CogVideoXConfig(
        dim=1920, depth=30, heads=30, use_rotary=False
    )


def cogvideox_5b() -> CogVideoXConfig:
    return CogVideoXConfig(dim=3072, depth=42, heads=48, axes_dim=(16, 24, 24))


def cogvideox_1_5_5b() -> CogVideoXConfig:
    """CogVideoX1.5-5B (T2V): the 5B geometry plus temporal patching
    (``patch_size_t=2`` in the checkpoint config; the reference runs it via
    the p_t-aware patch geometry, ``pipeline_cogvideox.py:227-233,262``)."""
    return CogVideoXConfig(dim=3072, depth=42, heads=48, patch_t=2)


def cogvideox_tiny(patch_t: int = 1) -> CogVideoXConfig:
    return CogVideoXConfig(
        dim=64, depth=2, heads=4, text_dim=32, time_embed_dim=32,
        axes_dim=(8, 4, 4), patch_t=patch_t,
    )


def _init_block(key, cfg: CogVideoXConfig):
    d, dt, hd = cfg.dim, cfg.dtype, cfg.head_dim
    ks = jax.random.split(key, 6)
    return {
        # CogVideoXLayerNormZero: temb -> 6*dim = (shift, scale, gate) for the
        # video stream AND the text stream, twice (attn + ff); the norm
        # itself is an AFFINE LayerNorm (eps 1e-5) in the checkpoint
        "mod_attn": cm.init_linear(ks[0], cfg.time_embed_dim, 6 * d, dtype=dt),
        "norm1": cm.init_layernorm(d, dtype=dt),
        "mod_ff": cm.init_linear(ks[1], cfg.time_embed_dim, 6 * d, dtype=dt),
        "norm2": cm.init_layernorm(d, dtype=dt),
        "qkv": cm.init_linear(ks[2], d, 3 * d, dtype=dt),
        # qk norm is a per-head AFFINE LayerNorm (diffusers qk_norm
        # "layer_norm", eps 1e-6) — not RMSNorm
        "q_norm": cm.init_layernorm(hd, dtype=dt),
        "k_norm": cm.init_layernorm(hd, dtype=dt),
        "attn_out": cm.init_linear(ks[3], d, d, dtype=dt),
        "ffn": cm.init_ffn(ks[4], d, cfg.ffn_mult * d, dtype=dt),
    }


def init_cogvideox(key, cfg: CogVideoXConfig):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 8)
    blocks = [_init_block(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    return {
        "patch_embed": cm.init_linear(ks[1], cfg.token_in, d, dtype=dt),
        "text_proj": cm.init_linear(ks[2], cfg.text_dim, d, dtype=dt),
        # diffusers: Timesteps(inner_dim) -> TimestepEmbedding(inner_dim,
        # time_embed_dim) — the sinusoid is DIM-wide, not 256
        "t_embed": cm.init_timestep_embedder(
            ks[3], d, cfg.time_embed_dim, dtype=dt
        ),
        **(
            {
                # 1.5: ofs branch — Timesteps(512) -> TimestepEmbedding(512)
                "ofs_embed": cm.init_timestep_embedder(
                    ks[6], cfg.time_embed_dim, cfg.time_embed_dim, dtype=dt
                )
            }
            if cfg.patch_t > 1
            else {}
        ),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "norm_final": cm.init_layernorm(d, dtype=dt),
        "norm_out_mod": cm.init_linear(
            ks[4], cfg.time_embed_dim, 2 * d, dtype=dt
        ),
        "norm_out_norm": cm.init_layernorm(d, dtype=dt),
        "proj_out": cm.init_linear(ks[5], d, cfg.token_out, dtype=dt),
    }


def video_positions(frames: int, hp: int, wp: int) -> jax.Array:
    """(frames*hp*wp, 3) (t, row, col) ids, frame-major raster order."""
    t = jnp.repeat(jnp.arange(frames), hp * wp)
    rc = cm.patch_positions_2d(hp, wp)
    rc = jnp.tile(rc, (frames, 1))
    return jnp.concatenate([t[:, None], rc], axis=-1)


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _unheads(x):
    b, s, h, hd = x.shape
    return x.reshape(b, s, h * hd)


def cogvideox_forward(
    params,
    video: jax.Array,
    txt: jax.Array,
    t: jax.Array,
    cfg: CogVideoXConfig,
    *,
    video_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
    pos_embed: Optional[jax.Array] = None,
    attn=SingleDeviceAttn(),
    attn_state=(),
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
):
    """CogVideoX denoiser on local video-token shards.

    video: (B, S_local, p*p*C) patchified latent-video tokens (local shard);
    txt: (B, S_txt, text_dim) replicated; t: (B,) train-unit timesteps;
    video_rope: (cos, sin) for the LOCAL tokens (use_rotary models);
    pos_embed: (S_local, dim) learned/sincos table (2B).
    Returns (v_prediction, new_attn_state).
    """
    h = cfg.heads
    vid = cm.linear(params["patch_embed"], video)
    if pos_embed is not None:
        vid = vid + pos_embed.astype(cfg.dtype)[None]
    txt = cm.linear(params["text_proj"], txt)
    temb = cm.timestep_embedder(params["t_embed"], t, cfg.dim)
    if "ofs_embed" in params:
        # CogVideoX 1.5: the ofs conditioning branch (diffusers
        # CogVideoXTransformer3DModel ofs_proj/ofs_embedding; the T2V
        # pipeline feeds the constant 2.0 — pipeline_cogvideox.py ofs_emb
        # fill_value) adds a second timestep-style embedding to temb
        ofs = jnp.full(t.shape, 2.0, jnp.float32)
        temb = temb + cm.timestep_embedder(
            params["ofs_embed"], ofs, cfg.time_embed_dim
        )

    if video_rope is not None:
        # params are in the rotate-half rope layout (converter permutes the
        # interleaved checkpoint Wq/Wk; models/common.apply_rope_half)
        cos_v, sin_v = cm.rope_half_tables(*video_rope)

    def _mod6(p, temb):
        out = cm.linear(p, cm.silu(temb))
        return jnp.split(out[:, None, :], 6, axis=-1)

    def make_block(attn):
      def block(carry, xs):
        vid, txt = carry
        p, state = xs
        # CogVideoXLayerNormZero chunk order: (shift, scale, gate) for the
        # VIDEO stream first, then the text stream; affine LN eps 1e-5
        v_sh, v_sc, v_g, t_sh, t_sc, t_g = _mod6(p["mod_attn"], temb)
        vid_n = cm.layernorm(p["norm1"], vid, eps=1e-5) * (1 + v_sc) + v_sh
        txt_n = cm.layernorm(p["norm1"], txt, eps=1e-5) * (1 + t_sc) + t_sh

        # one projection serves both streams (CogVideoX weight sharing)
        vq, vk, vv = [
            _heads(x, h) for x in jnp.split(cm.linear(p["qkv"], vid_n), 3, -1)
        ]
        tq, tk, tv = [
            _heads(x, h) for x in jnp.split(cm.linear(p["qkv"], txt_n), 3, -1)
        ]
        qk_eps = 1e-6  # diffusers Attention(qk_norm="layer_norm", eps=1e-6)
        vq = cm.layernorm(p["q_norm"], vq, eps=qk_eps)
        vk = cm.layernorm(p["k_norm"], vk, eps=qk_eps)
        tq = cm.layernorm(p["q_norm"], tq, eps=qk_eps)
        tk = cm.layernorm(p["k_norm"], tk, eps=qk_eps)
        if video_rope is not None:
            vq = cm.apply_rope_half(vq, cos_v, sin_v)
            vk = cm.apply_rope_half(vk, cos_v, sin_v)

        o, state = attn(vq, vk, vv, state, joint_q=tq, joint_k=tk, joint_v=tv)
        s_txt = txt.shape[1]
        txt_o, vid_o = o[:, :s_txt], o[:, s_txt:]
        proj = cm.linear(p["attn_out"], _unheads(jnp.concatenate([txt_o, vid_o], 1)))
        txt = txt + t_g * proj[:, :s_txt]
        vid = vid + v_g * proj[:, s_txt:]

        v_sh, v_sc, v_g, t_sh, t_sc, t_g = _mod6(p["mod_ff"], temb)
        vid_n = cm.layernorm(p["norm2"], vid, eps=1e-5) * (1 + v_sc) + v_sh
        txt_n = cm.layernorm(p["norm2"], txt, eps=1e-5) * (1 + t_sc) + t_sh
        ff = cm.ffn(
            p["ffn"], jnp.concatenate([txt_n, vid_n], axis=1), tp_axis=tp_axis
        )
        txt = txt + t_g * ff[:, :s_txt]
        vid = vid + v_g * ff[:, s_txt:]
        return (vid, txt), state

      return block

    # ``attn`` may be a tuple of (strategy, n_layers) segments (per-layer
    # compression plans, reference compress_func(layer, step))
    if pp_stages > 1:
        # sync PipeFusion: the blocks stack is sharded over the pp axis
        # (model_param_specs(pp=True)); stages compose via masked rounds +
        # ppermute (reference _init_sync_pipeline under pp for CogVideoX)
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        assert not isinstance(attn, (tuple, list)), (
            "per-layer compression plans do not compose with pp"
        )
        block = make_block(attn)
        (vid, txt), new_state = pipefusion_blocks(
            lambda hh, st: jax.lax.scan(block, hh, (params["blocks"], st)),
            (vid, txt), attn_state, pp_stages,
        )
    else:
        (vid, txt), new_state = cm.scan_segments(
            make_block, (vid, txt), params["blocks"], attn, attn_state
        )

    # norm_final over the joint sequence (video part kept), then
    # AdaLayerNorm: SHIFT first, affine inner norm (diffusers AdaLayerNorm
    # with chunk_dim=1 + norm_elementwise_affine=True, eps 1e-5)
    joint = jnp.concatenate([txt, vid], axis=1)
    vid = cm.layernorm(params["norm_final"], joint, eps=1e-5)[:, txt.shape[1]:]
    mod = cm.linear(params["norm_out_mod"], cm.silu(temb))
    shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    vid = cm.layernorm(params["norm_out_norm"], vid, eps=1e-5) * (1 + scale) + shift
    return cm.linear(params["proj_out"], vid), new_state
