"""ConsisID backbone: CogVideoX + perceiver facial-identity injection.

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/consisid_transformer_3d.py``
(a diffusers ``ConsisIDTransformer3DModel`` wrapper): the CogVideoX-5B video
backbone plus identity conditioning — after every ``cross_attn_interval``-th
transformer block, a bias-free perceiver cross-attention
(``perceiver_cross_attention.{j}``: LayerNorm'd face tokens as K/V, the
LayerNorm'd video stream as queries) is added to the hidden states scaled by
``local_face_scale``.

The face feature extractor (``local_facial_extractor``: ArcFace global +
CLIP-visual local tokens through a perceiver resampler) runs outside the
denoise scan like all other encoders; pass its output as ``id_states``.
With ``id_states=None`` the model is exactly CogVideoX.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn
from compactfusion_tpu.models.cogvideox import (
    CogVideoXConfig,
    _init_block,
    video_positions,
)
from compactfusion_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class ConsisIDConfig(CogVideoXConfig):
    id_dim: int = 2048  # local_facial_extractor output width
    cross_attn_interval: int = 2
    local_face_scale: float = 1.0


def consisid_preview() -> ConsisIDConfig:
    return ConsisIDConfig(dim=3072, depth=42, heads=48, axes_dim=(16, 24, 24))


def consisid_tiny() -> ConsisIDConfig:
    return ConsisIDConfig(
        dim=64, depth=2, heads=4, text_dim=32, time_embed_dim=32,
        axes_dim=(8, 4, 4), id_dim=16, cross_attn_interval=2,
    )


def _init_perceiver(key, cfg: ConsisIDConfig):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 3)
    return {
        "norm1": cm.init_layernorm(cfg.id_dim, dtype=dt),
        "norm2": cm.init_layernorm(d, dtype=dt),
        "q": cm.init_linear(ks[0], d, d, bias=False, dtype=dt),
        "kv": cm.init_linear(ks[1], cfg.id_dim, 2 * d, bias=False, dtype=dt),
        "out": cm.init_linear(ks[2], d, d, bias=False, dtype=dt),
    }


def init_consisid(key, cfg: ConsisIDConfig):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 10)
    blocks = [_init_block(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    n_ca = (cfg.depth + cfg.cross_attn_interval - 1) // cfg.cross_attn_interval
    pers = [_init_perceiver(k, cfg) for k in jax.random.split(ks[1], n_ca)]
    return {
        "patch_embed": cm.init_linear(
            ks[2], cfg.patch * cfg.patch * cfg.in_channels, d, dtype=dt
        ),
        "text_proj": cm.init_linear(ks[3], cfg.text_dim, d, dtype=dt),
        "t_embed": cm.init_timestep_embedder(
            ks[4], cfg.dim, cfg.time_embed_dim, dtype=dt
        ),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "perceiver": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pers),
        "norm_final": cm.init_layernorm(d, dtype=dt),
        "norm_out_mod": cm.init_linear(ks[5], cfg.time_embed_dim, 2 * d, dtype=dt),
        "norm_out_norm": cm.init_layernorm(d, dtype=dt),
        "proj_out": cm.init_linear(
            ks[6], d, cfg.patch * cfg.patch * cfg.out_channels, dtype=dt
        ),
    }


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _unheads(x):
    b, s, h, hd = x.shape
    return x.reshape(b, s, h * hd)


def perceiver_ca(p, id_states: jax.Array, latents: jax.Array, heads: int):
    """PerceiverAttentionCA: LN'd face tokens -> K/V, LN'd video -> Q."""
    x = cm.layernorm(p["norm1"], id_states, eps=1e-5)
    lat = cm.layernorm(p["norm2"], latents, eps=1e-5)
    q = _heads(cm.linear(p["q"], lat), heads)
    k, v = jnp.split(cm.linear(p["kv"], x), 2, axis=-1)
    o = sdpa(q, _heads(k, heads), _heads(v, heads))
    return cm.linear(p["out"], _unheads(o))


def consisid_forward(
    params,
    video: jax.Array,
    txt: jax.Array,
    id_states: Optional[jax.Array],
    t: jax.Array,
    cfg: ConsisIDConfig,
    *,
    video_rope: Optional[Tuple[jax.Array, jax.Array]] = None,
    attn=SingleDeviceAttn(),
    attn_state=(),
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
):
    """ConsisID denoiser: CogVideoX blocks + interval perceiver injection.

    id_states: (B, S_id, id_dim) face tokens, replicated over SP ranks (or
    None for unconditioned generation — identical to CogVideoX).
    """
    h = cfg.heads
    vid = cm.linear(params["patch_embed"], video)
    txt = cm.linear(params["text_proj"], txt)
    temb = cm.timestep_embedder(params["t_embed"], t, cfg.dim)

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
            (p, pid, flag), state = xs
            v_sh, v_sc, v_g, t_sh, t_sc, t_g = _mod6(p["mod_attn"], temb)
            vid_n = cm.layernorm(p["norm1"], vid, eps=1e-5) * (1 + v_sc) + v_sh
            txt_n = cm.layernorm(p["norm1"], txt, eps=1e-5) * (1 + t_sc) + t_sh
            vq, vk, vv = [
                _heads(x, h) for x in jnp.split(cm.linear(p["qkv"], vid_n), 3, -1)
            ]
            tq, tk, tv = [
                _heads(x, h) for x in jnp.split(cm.linear(p["qkv"], txt_n), 3, -1)
            ]
            vq = cm.layernorm(p["q_norm"], vq, eps=1e-6)
            vk = cm.layernorm(p["k_norm"], vk, eps=1e-6)
            tq = cm.layernorm(p["q_norm"], tq, eps=1e-6)
            tk = cm.layernorm(p["k_norm"], tk, eps=1e-6)
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
            ff = cm.ffn(p["ffn"], jnp.concatenate([txt_n, vid_n], 1), tp_axis=tp_axis)
            txt = txt + t_g * ff[:, :s_txt]
            vid = vid + v_g * ff[:, s_txt:]

            # gated identity injection AFTER the block (reference: every
            # cross_attn_interval-th block adds local_face_scale * perceiver)
            if id_states is not None:
                vid = vid + flag * cfg.local_face_scale * perceiver_ca(
                    pid, id_states.astype(vid.dtype), vid, h
                )
            return (vid, txt), state

        return block

    interval = cfg.cross_attn_interval
    flags = (jnp.arange(cfg.depth) % interval == 0).astype(cfg.dtype)
    pc = jax.tree_util.tree_map(
        lambda a: jnp.repeat(a, interval, axis=0)[: cfg.depth],
        params["perceiver"],
    )
    if pp_stages > 1:
        # sync PipeFusion: params["blocks"] arrives STAGE-LOCAL (sharded by
        # model_param_specs(pp=True)); the perceiver stack stays replicated
        # (it is tiny), so slice its repeated-per-layer expansion and the
        # injection flags to this stage's depth/pp window
        from jax import lax

        from compactfusion_tpu.parallel.mesh import AXIS_PP
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        assert not isinstance(attn, (tuple, list)), (
            "per-layer compression plans do not compose with pp"
        )
        l_loc = cfg.depth // pp_stages
        my = lax.axis_index(AXIS_PP)
        pc = jax.tree_util.tree_map(
            lambda a: lax.dynamic_slice_in_dim(a, my * l_loc, l_loc, axis=0),
            pc,
        )
        flags_loc = lax.dynamic_slice_in_dim(flags, my * l_loc, l_loc, axis=0)
        block = make_block(attn)
        (vid, txt), new_state = pipefusion_blocks(
            lambda hh, st: jax.lax.scan(
                block, hh, ((params["blocks"], pc, flags_loc), st)
            ),
            (vid, txt), attn_state, pp_stages,
        )
    else:
        # per-layer compression plans: attn may be ((strategy, n_layers),
        # ...); the per-layer xs (block params, perceiver params, injection
        # flags) are bundled as the "blocks" pytree so scan_segments slices
        # them together
        (vid, txt), new_state = cm.scan_segments(
            make_block, (vid, txt), (params["blocks"], pc, flags), attn,
            attn_state,
        )

    joint = jnp.concatenate([txt, vid], axis=1)
    vid = cm.layernorm(params["norm_final"], joint, eps=1e-5)[:, txt.shape[1]:]
    mod = cm.linear(params["norm_out_mod"], cm.silu(temb))
    shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
    vid = cm.layernorm(params["norm_out_norm"], vid, eps=1e-5) * (1 + scale) + shift
    return cm.linear(params["proj_out"], vid), new_state
