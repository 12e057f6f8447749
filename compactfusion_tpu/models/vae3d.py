"""Causal 3D video VAE decoder (CogVideoX / HunyuanVideo family).

Decodes (B, T_latent, h, w, C) video latents to (B, T, H, W, 3) pixels:
causal 3D convolutions (temporal padding replicates the first frame, so frame
t never sees the future), spatially-conditioned group norms, spatial 2x
upsampling per up block and temporal 2x upsampling in the blocks that undo
the 4x temporal compression.

The reference delegates this to diffusers ``AutoencoderKLCogVideoX`` on the
VAE ranks (``base_pipeline.py:457-463``); here it is a first-class functional
decoder that also runs height-sharded via ``parallel/vae.py`` semantics
(halo exchange generalises directly; in-mesh replicated decode by default).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.models import common as cm


@dataclasses.dataclass(frozen=True)
class VAE3DConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512)
    layers_per_block: int = 3
    norm_num_groups: int = 32
    #: which up blocks (in decode order) also upsample time 2x
    temporal_up_blocks: Tuple[int, ...] = (0, 1)
    scaling_factor: float = 1.15258426  # CogVideoX
    dtype: Any = jnp.bfloat16


def cogvideox_vae() -> VAE3DConfig:
    return VAE3DConfig()


def tiny_vae3d() -> VAE3DConfig:
    return VAE3DConfig(
        latent_channels=4,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        temporal_up_blocks=(0,),
    )


def _init_conv3(key, c_in, c_out, k=(3, 3, 3), dtype=jnp.bfloat16):
    kt, kh, kw = k
    w = jax.random.truncated_normal(
        key, -2, 2, (kt, kh, kw, c_in, c_out), jnp.float32
    )
    fan_in = kt * kh * kw * c_in
    return {
        "w": (w * fan_in**-0.5).astype(dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def _init_norm(c, dtype):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _init_resnet(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(c_in, dtype),
        "conv1": _init_conv3(ks[0], c_in, c_out, dtype=dtype),
        "norm2": _init_norm(c_out, dtype),
        "conv2": _init_conv3(ks[1], c_out, c_out, dtype=dtype),
    }
    if c_in != c_out:
        p["shortcut"] = _init_conv3(ks[2], c_in, c_out, (1, 1, 1), dtype)
    return p


def init_vae3d_decoder(key, cfg: VAE3DConfig):
    dt = cfg.dtype
    chans = cfg.block_out_channels
    c0 = chans[-1]
    ks = iter(jax.random.split(key, 64))
    p = {
        "conv_in": _init_conv3(next(ks), cfg.latent_channels, c0, dtype=dt),
        "mid_res1": _init_resnet(next(ks), c0, c0, dt),
        "mid_res2": _init_resnet(next(ks), c0, c0, dt),
        "norm_out": _init_norm(chans[0], dt),
        "conv_out": _init_conv3(next(ks), chans[0], cfg.out_channels, dtype=dt),
    }
    up = []
    c_prev = c0
    for i, c in enumerate(reversed(chans)):
        blocks = []
        for _ in range(cfg.layers_per_block):
            blocks.append(_init_resnet(next(ks), c_prev, c, dt))
            c_prev = c
        blk = {"resnets": blocks}
        if i < len(chans) - 1:
            blk["upsample_conv"] = _init_conv3(next(ks), c, c, dtype=dt)
        up.append(blk)
    p["up"] = up
    return p


def _causal_conv3(p, x, stride=(1, 1, 1)):
    """(B, T, H, W, C) conv with causal temporal padding (first frame
    replicated so output frame t depends only on frames <= t)."""
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        stride,
        padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _groupnorm3(p, x, groups, eps=1e-6):
    # per-frame statistics (NOT over time) to preserve temporal causality —
    # torch GroupNorm would reduce over T, but the reference decoder only
    # ever normalises within short temporal tiles; per-frame is the strictly
    # causal equivalent
    b, t, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mu = jnp.mean(x32, axis=(2, 3, 5), keepdims=True)
    var = jnp.var(x32, axis=(2, 3, 5), keepdims=True)
    y = ((x32 - mu) * lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(
        x.dtype
    )


def _resnet3(p, x, groups):
    h = _causal_conv3(p["conv1"], cm.silu(_groupnorm3(p["norm1"], x, groups)))
    h = _causal_conv3(p["conv2"], cm.silu(_groupnorm3(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = _causal_conv3(p["shortcut"], x)
    return x + h


def _upsample3(p, x, temporal: bool):
    """Nearest 2x spatial (and optionally temporal) upsample + conv.

    Temporal rule matches CogVideoX (`CogVideoXUpsample3D`): the FIRST frame
    is never doubled — only frames 1..T-1 are nearest-doubled — so a T-frame
    clip becomes 2T-1 frames and the causal frame-count identity
    ``T_out = (T_lat - 1) * 2^k + 1`` holds without any output trimming.
    """
    b, t, h, w, c = x.shape
    if temporal and t > 1:
        first = jax.image.resize(
            x[:, :1], (b, 1, h * 2, w * 2, c), "nearest"
        )
        rest = jax.image.resize(
            x[:, 1:], (b, 2 * (t - 1), h * 2, w * 2, c), "nearest"
        )
        x = jnp.concatenate([first, rest], axis=1)
    else:
        x = jax.image.resize(x, (b, t, h * 2, w * 2, c), "nearest")
    return _causal_conv3(p, x)


def vae3d_decode(params, latents: jax.Array, cfg: VAE3DConfig) -> jax.Array:
    """(B, T_lat, h, w, C_lat) scaled latents -> (B, T, H, W, 3) in [-1, 1].

    T = (T_lat - 1) * 2**len(temporal_up_blocks) + 1 after trimming the
    causally-padded first-frame duplicates (CogVideoX frame count rule
    num_frames = (n - 1) * 4 + 1).
    """
    g = cfg.norm_num_groups
    x = latents / cfg.scaling_factor
    x = _causal_conv3(params["conv_in"], x)
    x = _resnet3(params["mid_res1"], x, g)
    x = _resnet3(params["mid_res2"], x, g)
    n_up = len(params["up"])
    for i, up in enumerate(params["up"]):
        for r in up["resnets"]:
            x = _resnet3(r, x, g)
        if "upsample_conv" in up:
            x = _upsample3(up["upsample_conv"], x, i in cfg.temporal_up_blocks)
    x = cm.silu(_groupnorm3(params["norm_out"], x, g))
    return _causal_conv3(params["conv_out"], x)
