"""Text encoders: T5 encoder stack and CLIP text model, functional JAX.

The reference loads these via transformers inside diffusers pipelines
(T5-XXL for PixArt/FLUX/SD3/CogVideoX prompts, CLIP-L/G for FLUX/SD3 pooled
embeddings); here they are first-class functional models with parameters
loadable from HuggingFace safetensors (``compactfusion_tpu.io.hf``).

Prompts are encoded once per request outside the denoise scan (replicated
compute, exactly like the reference, ``pipeline_flux.py:246-259``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dtype: Any = jnp.bfloat16


def t5_xxl() -> T5Config:
    return T5Config()


def t5_tiny() -> T5Config:
    return T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
    )


def _init_t5_block(key, cfg: T5Config):
    d, dt = cfg.d_model, cfg.dtype
    inner = cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 8)
    lin = lambda k, i, o: cm.init_linear(k, i, o, bias=False, dtype=dt)
    return {
        "ln1": cm.init_rmsnorm(d, dt),
        "q": lin(ks[0], d, inner),
        "k": lin(ks[1], d, inner),
        "v": lin(ks[2], d, inner),
        "o": lin(ks[3], inner, d),
        "ln2": cm.init_rmsnorm(d, dt),
        "wi_0": lin(ks[4], d, cfg.d_ff),
        "wi_1": lin(ks[5], d, cfg.d_ff),
        "wo": lin(ks[6], cfg.d_ff, d),
    }


def init_t5(key, cfg: T5Config):
    ks = jax.random.split(key, 4)
    blocks = [
        _init_t5_block(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)
    ]
    emb = (
        jax.random.normal(ks[1], (cfg.vocab_size, cfg.d_model), jnp.float32) * 1.0
    ).astype(cfg.dtype)
    return {
        "embed": emb,
        "rel_bias": jnp.zeros((cfg.rel_buckets, cfg.num_heads), cfg.dtype),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "final_ln": cm.init_rmsnorm(cfg.d_model, cfg.dtype),
    }


def quantize_t5_int8(params):
    """Per-output-channel symmetric int8 weight quantization of every T5
    linear (and per-row for the embedding table).

    The reference gates ``--use_fp8_t5_encoder`` on an optimum-quanto CUDA
    capability probe (``xfuser/envs.py:52-120``, ``config/args.py``); v5e
    has no fp8, so the TPU-honest equivalent is int8: T5-XXL drops from
    ~9.1 GB bf16 to ~4.6 GB — over a quarter of a 16 GB chip back — and
    ``t5_encode`` dequantizes one layer at a time inside its scan, so peak
    HBM is int8-model + one bf16 block.  Compute stays bf16 on the MXU.
    Linears share :func:`cm.quantize_params_int8`; the embedding table gets
    a per-row scale here.
    """
    out = cm.quantize_params_int8(
        {k: v for k, v in params.items() if k != "embed"}
    )
    emb32 = jnp.asarray(params["embed"], jnp.float32)
    esc = jnp.max(jnp.abs(emb32), axis=1, keepdims=True) / 127.0
    esc = jnp.where(esc == 0.0, 1.0, esc)
    out["embed_q"] = jnp.clip(jnp.round(emb32 / esc), -127, 127).astype(jnp.int8)
    out["embed_scale"] = esc
    return out


def _lin_mq(p, x):
    """``cm.linear`` (which transparently dequantizes int8 weights)."""
    return cm.linear(p, x)


def _t5_rel_buckets(rel_pos, num_buckets, max_distance):
    """Bidirectional relative position bucketing (HF T5 semantics)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def t5_encode(
    params, token_ids: jax.Array, cfg: T5Config, mask: Optional[jax.Array] = None
) -> jax.Array:
    """(B, S) int32 -> (B, S, d_model) encoder states.

    Works on both plain and :func:`quantize_t5_int8` parameter trees (the
    latter dequantizes one layer at a time inside the scan)."""
    b, s = token_ids.shape
    h = cfg.num_heads
    if "embed_q" in params:
        x = (
            params["embed_q"][token_ids].astype(jnp.float32)
            * params["embed_scale"][token_ids]
        ).astype(cfg.dtype)
    else:
        x = params["embed"][token_ids]

    pos = jnp.arange(s)
    rel = pos[None, :] - pos[:, None]  # (S, S) key - query
    buckets = _t5_rel_buckets(rel, cfg.rel_buckets, cfg.rel_max_distance)
    bias = params["rel_bias"][buckets].astype(jnp.float32)  # (S, S, H)
    bias = bias.transpose(2, 0, 1)[None]  # (1, H, S, S)
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :], bias, -1e30)

    def block(x, p):
        xn = cm.rmsnorm(p["ln1"], x)
        q = _lin_mq(p["q"], xn).reshape(b, s, h, cfg.d_kv)
        k = _lin_mq(p["k"], xn).reshape(b, s, h, cfg.d_kv)
        v = _lin_mq(p["v"], xn).reshape(b, s, h, cfg.d_kv)
        # T5 uses unscaled dot product (scale folded into init)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) + bias
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        x = x + _lin_mq(p["o"], o.reshape(b, s, h * cfg.d_kv).astype(x.dtype))

        xn = cm.rmsnorm(p["ln2"], x)
        ff = cm.gelu(_lin_mq(p["wi_0"], xn)) * _lin_mq(p["wi_1"], xn)
        x = x + _lin_mq(p["wo"], ff)
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return cm.rmsnorm(params["final_ln"], x)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    d_model: int = 768  # CLIP-L; CLIP-G: 1280
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77
    #: "quick_gelu" (OpenAI CLIP-L) or "gelu" (OpenCLIP bigG / SD3's CLIP-G)
    hidden_act: str = "quick_gelu"
    #: CLIPTextModelWithProjection: project the pooled output to this dim
    #: (no bias); None = raw pooled hidden state (plain CLIPTextModel)
    projection_dim: Optional[int] = None
    dtype: Any = jnp.bfloat16


def clip_l() -> CLIPTextConfig:
    return CLIPTextConfig()


def clip_l_proj() -> CLIPTextConfig:
    """SD3's CLIP-L: CLIPTextModelWithProjection, 768 -> 768."""
    return CLIPTextConfig(projection_dim=768)


def clip_g() -> CLIPTextConfig:
    """SD3's CLIP-G (OpenCLIP bigG): exact-GELU MLP + 1280-dim projection."""
    return CLIPTextConfig(
        d_model=1280,
        num_layers=32,
        num_heads=20,
        hidden_act="gelu",
        projection_dim=1280,
    )


def clip_tiny() -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=128, d_model=64, num_layers=2, num_heads=4, max_len=16
    )


def _init_clip_block(key, cfg: CLIPTextConfig):
    d, dt = cfg.d_model, cfg.dtype
    ks = jax.random.split(key, 6)
    return {
        "ln1": cm.init_layernorm(d, dtype=dt),
        "q": cm.init_linear(ks[0], d, d, dtype=dt),
        "k": cm.init_linear(ks[1], d, d, dtype=dt),
        "v": cm.init_linear(ks[2], d, d, dtype=dt),
        "o": cm.init_linear(ks[3], d, d, dtype=dt),
        "ln2": cm.init_layernorm(d, dtype=dt),
        "fc1": cm.init_linear(ks[4], d, 4 * d, dtype=dt),
        "fc2": cm.init_linear(ks[5], 4 * d, d, dtype=dt),
    }


def init_clip(key, cfg: CLIPTextConfig):
    ks = jax.random.split(key, 4)
    blocks = [
        _init_clip_block(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)
    ]
    p = {
        "token_embed": (
            jax.random.normal(ks[1], (cfg.vocab_size, cfg.d_model)) * 0.02
        ).astype(cfg.dtype),
        "pos_embed": jnp.zeros((cfg.max_len, cfg.d_model), cfg.dtype),
        "blocks": jax.tree_util.tree_map(lambda *x: jnp.stack(x), *blocks),
        "final_ln": cm.init_layernorm(cfg.d_model, dtype=cfg.dtype),
    }
    if cfg.projection_dim is not None:
        p["text_proj"] = cm.init_linear(
            ks[2], cfg.d_model, cfg.projection_dim, bias=False, dtype=cfg.dtype
        )
    return p


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_encode(
    params, token_ids: jax.Array, cfg: CLIPTextConfig
) -> Tuple[jax.Array, jax.Array]:
    """(B, S) -> (hidden (B, S, D), pooled (B, D) at the EOS/argmax token)."""
    b, s = token_ids.shape
    h = cfg.num_heads
    hd = cfg.d_model // h
    x = params["token_embed"][token_ids] + params["pos_embed"][None, :s]
    causal = jnp.tril(jnp.ones((s, s), bool))
    act = (
        _quick_gelu
        if cfg.hidden_act == "quick_gelu"
        else lambda v: jax.nn.gelu(v, approximate=False)  # HF "gelu" = erf
    )

    def block(x, p):
        xn = cm.layernorm(p["ln1"], x, eps=1e-5)  # HF CLIP layer_norm_eps
        scale = hd**-0.5
        q = cm.linear(p["q"], xn).reshape(b, s, h, hd)
        k = cm.linear(p["k"], xn).reshape(b, s, h, hd)
        v = cm.linear(p["v"], xn).reshape(b, s, h, hd)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
        )
        scores = jnp.where(causal[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
        x = x + cm.linear(p["o"], o.reshape(b, s, cfg.d_model).astype(x.dtype))
        xn = cm.layernorm(p["ln2"], x, eps=1e-5)
        x = x + cm.linear(p["fc2"], act(cm.linear(p["fc1"], xn)))
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    x = cm.layernorm(params["final_ln"], x, eps=1e-5)
    eos = jnp.argmax(token_ids, axis=-1)  # highest id = EOS (CLIP convention)
    pooled = jnp.take_along_axis(x, eos[:, None, None], axis=1)[:, 0]
    if "text_proj" in params:
        pooled = cm.linear(params["text_proj"], pooled)
    return x, pooled
