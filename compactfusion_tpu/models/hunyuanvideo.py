"""HunyuanVideo backbone (dual-stream MMDiT + token refiner), functional JAX.

TPU-native re-implementation of the model behind the reference's
HunyuanVideo support (``xfuser/model_executor/layers/attention_processor.py``
HunyuanVideo processor wrapping diffusers ``HunyuanVideoTransformer3DModel``):

  * 20 dual-stream (FLUX-style MMDiT) blocks over [text, video] + 40
    single-stream blocks on the fused sequence — the block math is identical
    to FLUX, so the scans are shared with :mod:`models.flux`;
  * 3-axis RoPE over (t, h, w) with theta=256 (HunyuanVideo's value, vs
    FLUX's 10000);
  * a TOKEN REFINER producing the text stream from raw LLaMA hidden states:
    2 self-attention blocks gated by an AdaNorm of (timestep + masked-mean
    text) conditioning (diffusers ``HunyuanVideoTokenRefiner``);
  * CLIP pooled + guidance embedded into the timestep conditioning like
    FLUX.1-dev.

Weight layout follows the diffusers checkpoint naming via
``io/hf.py::convert_hunyuanvideo``; numerics are pinned by the torch
reference in ``tests/io/test_backbone_parity.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn
from compactfusion_tpu.models.flux import (
    FluxConfig,
    flux_double_scan,
    flux_head,
    flux_single_scan,
)
from compactfusion_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class HunyuanVideoConfig(FluxConfig):
    refiner_layers: int = 2
    rope_theta: float = 256.0


def hunyuanvideo_config() -> HunyuanVideoConfig:
    """HunyuanVideo-T2V 720p: 20 double + 40 single blocks, 24 heads x 128."""
    return HunyuanVideoConfig(
        dim=3072,
        double_layers=20,
        single_layers=40,
        heads=24,
        in_channels=64,  # 1x2x2-packed 16ch latent per frame
        text_dim=4096,  # LLaMA hidden states (pre-refiner)
        pooled_dim=768,  # CLIP-L pooled
        axes_dim=(16, 56, 56),
        guidance_embeds=True,
    )


def hunyuanvideo_tiny() -> HunyuanVideoConfig:
    return HunyuanVideoConfig(
        dim=64, double_layers=2, single_layers=2, heads=4, in_channels=16,
        text_dim=32, pooled_dim=16, axes_dim=(8, 4, 4), refiner_layers=2,
    )


def hunyuanvideo_positions(frames: int, hp: int, wp: int) -> jnp.ndarray:
    """(frames*hp*wp, 3) (t, row, col) ids for the video token grid."""
    t = jnp.repeat(jnp.arange(frames), hp * wp)
    rc = cm.patch_positions_2d(hp, wp)
    rc = jnp.tile(rc, (frames, 1))
    return jnp.concatenate([t[:, None], rc], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_refiner_block(key, cfg: HunyuanVideoConfig):
    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 6)
    return {
        "norm1": cm.init_layernorm(d, dtype=dt),
        "attn_qkv": cm.init_linear(ks[0], d, 3 * d, dtype=dt),
        "attn_out": cm.init_linear(ks[1], d, d, dtype=dt),
        "norm2": cm.init_layernorm(d, dtype=dt),
        # FeedForward(activation_fn="linear-silu"): fc1 -> silu -> fc2
        "ffn": cm.init_ffn(ks[2], d, cfg.mlp_ratio * d, dtype=dt),
        # HunyuanVideoAdaNorm: linear(silu(temb)) -> (gate_attn, gate_ff)
        "ada": cm.init_linear(ks[3], d, 2 * d, dtype=dt),
    }


def init_hunyuanvideo(key, cfg: HunyuanVideoConfig):
    from compactfusion_tpu.models.flux import init_flux

    d, dt = cfg.dim, cfg.dtype
    ks = jax.random.split(key, 8)
    p = init_flux(ks[0], cfg)
    # the FLUX context_embedder (text_dim -> d linear) is replaced by the
    # token refiner's own projection + blocks
    del p["context_embedder"]
    refiner = [
        _init_refiner_block(k, cfg)
        for k in jax.random.split(ks[1], cfg.refiner_layers)
    ]
    p["refiner"] = {
        "t_embed": cm.init_timestep_embedder(ks[2], 256, d, dtype=dt),
        "c_embed": {
            "fc1": cm.init_linear(ks[3], cfg.text_dim, d, dtype=dt),
            "fc2": cm.init_linear(ks[4], d, d, dtype=dt),
        },
        "proj_in": cm.init_linear(ks[5], cfg.text_dim, d, dtype=dt),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *refiner),
    }
    return p


# ---------------------------------------------------------------------------
# token refiner
# ---------------------------------------------------------------------------


def token_refiner(
    params, text: jax.Array, t: jax.Array, cfg: HunyuanVideoConfig,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Raw LLaMA hidden states (B, S, text_dim) -> refined (B, S, dim).

    diffusers ``HunyuanVideoTokenRefiner``: conditioning = timestep embed +
    silu-projected MASKED MEAN of the text states; each block gates its
    attention/FFN with an AdaNorm of that conditioning; the self-attention
    mask is the outer AND of the token mask (position 0 always attends).
    """
    h = cfg.heads
    b, s, _ = text.shape
    if mask is None:
        mask = jnp.ones((b, s), bool)
    m = mask.astype(jnp.float32)
    pooled = jnp.sum(text.astype(jnp.float32) * m[..., None], axis=1) / (
        jnp.sum(m, axis=1, keepdims=True) + 1e-6
    )
    temb = cm.timestep_embedder(params["t_embed"], t, 256)
    temb = temb + cm.linear(
        params["c_embed"]["fc2"],
        cm.silu(cm.linear(params["c_embed"]["fc1"], pooled.astype(cfg.dtype))),
    )
    x = cm.linear(params["proj_in"], text)

    attn_mask = mask[:, None, :, None] & mask[:, None, None, :]
    attn_mask = attn_mask.at[:, :, :, 0].set(True)

    def block(x, p):
        gates = cm.linear(p["ada"], cm.silu(temb))  # (B, 2d)
        g_attn, g_ff = jnp.split(gates[:, None, :], 2, axis=-1)
        xn = cm.layernorm(p["norm1"], x, eps=1e-6)
        q, k, v = [
            y.reshape(b, s, h, cfg.dim // h)
            for y in jnp.split(cm.linear(p["attn_qkv"], xn), 3, -1)
        ]
        o = _masked_sdpa(q, k, v, attn_mask)
        x = x + g_attn * cm.linear(p["attn_out"], o.reshape(b, s, cfg.dim))
        xn = cm.layernorm(p["norm2"], x, eps=1e-6)
        x = x + g_ff * cm.ffn(p["ffn"], xn, act=cm.silu)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return x


def _masked_sdpa(q, k, v, mask):
    """(B, S, H, D) attention with a (B, 1, Sq, Sk) bool mask."""
    b, s, h, d = q.shape
    scale = d**-0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def hunyuanvideo_forward(
    params,
    video: jax.Array,
    txt: jax.Array,
    pooled: jax.Array,
    t: jax.Array,
    guidance: Optional[jax.Array],
    cfg: HunyuanVideoConfig,
    *,
    video_rope: Tuple[jax.Array, jax.Array],
    txt_rope: Tuple[jax.Array, jax.Array],
    text_mask: Optional[jax.Array] = None,
    attn=SingleDeviceAttn(),
    attn_state_double=(),
    attn_state_single=(),
    attn_single=None,
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
):
    """HunyuanVideo denoiser on local video-token shards.

    ``attn_single`` overrides the strategy for the single-block family
    (per-layer plans give each family its own segment tuple); default =
    ``attn``.

    video: (B, S_local, 64) packed latent tokens; txt: (B, S_txt, text_dim)
    RAW LLaMA states (refined inside); pooled: (B, 768) CLIP pooled;
    t/guidance: (B,) train units.  Returns (velocity, state_d, state_s).
    """
    from compactfusion_tpu.models.flux import flux_time_embed

    img = cm.linear(params["x_embedder"], video)
    txt = token_refiner(params["refiner"], txt.astype(cfg.dtype), t, cfg,
                        mask=text_mask)
    temb = flux_time_embed(params, pooled, t, guidance, cfg)

    if pp_stages > 1:
        # sync PipeFusion over BOTH block families: each family's stack is
        # sharded over the pp axis (the token refiner and embedders stay
        # replicated); doubles compose across stages first, then singles
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        assert (
            attn_single is None or attn_single is attn
        ) and not isinstance(attn, (tuple, list)), (
            "per-layer compression plans do not compose with pp"
        )

        def run_doubles(hh, st):
            i2, t2, st2 = flux_double_scan(
                params["double_blocks"], hh[0], hh[1], temb, cfg,
                img_rope=video_rope, txt_rope=txt_rope,
                attn=attn, attn_state=st, tp_axis=tp_axis,
            )
            return (i2, t2), st2

        def run_singles(hh, st):
            i2, t2, st2 = flux_single_scan(
                params["single_blocks"], hh[0], hh[1], temb, cfg,
                img_rope=video_rope, txt_rope=txt_rope,
                attn=attn, attn_state=st, tp_axis=tp_axis,
            )
            return (i2, t2), st2

        (img, txt), sd = pipefusion_blocks(
            run_doubles, (img, txt), attn_state_double, pp_stages
        )
        (img, txt), ss = pipefusion_blocks(
            run_singles, (img, txt), attn_state_single, pp_stages
        )
        return flux_head(params, img, temb, cfg), sd, ss

    img, txt, sd = flux_double_scan(
        params["double_blocks"], img, txt, temb, cfg,
        img_rope=video_rope, txt_rope=txt_rope,
        attn=attn, attn_state=attn_state_double, tp_axis=tp_axis,
    )
    img, txt, ss = flux_single_scan(
        params["single_blocks"], img, txt, temb, cfg,
        img_rope=video_rope, txt_rope=txt_rope,
        attn=attn if attn_single is None else attn_single,
        attn_state=attn_state_single, tp_axis=tp_axis,
    )
    return flux_head(params, img, temb, cfg), sd, ss
