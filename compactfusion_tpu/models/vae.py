"""AutoencoderKL decoder (SD/SDXL/FLUX VAE family), functional JAX.

Replaces the reference's diffusers VAE + ``distvae`` patch-parallel decoder
(``xfuser/model_executor/pipelines/base_pipeline.py:96-100,457-463``).  The
standard KL-VAE decoder: post_quant conv, mid block (resnet-attn-resnet),
len(block_out_channels) up blocks of resnets + nearest-neighbour upsample,
GroupNorm+SiLU head.

NHWC layout (TPU-native conv layout).  The parallel (height-sharded, halo
exchange) decode lives in ``compactfusion_tpu/parallel/vae.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0  # FLUX VAE uses 0.1159
    dtype: Any = jnp.bfloat16
    #: decode memory knobs (reference --enable_tiling / --enable_slicing,
    #: args.py:306-315 -> diffusers AutoencoderKL.enable_tiling/slicing):
    #: slicing decodes one batch element at a time (exact); tiling decodes
    #: overlapping spatial tiles blended with linear ramps (approximate at
    #: seams, caps peak activation memory for 2k+ px decodes)
    use_slicing: bool = False
    use_tiling: bool = False
    tile_latent_size: int = 64  # diffusers tile_latent_min_size (latent px)
    tile_overlap_factor: float = 0.25

    @property
    def upscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def sd_vae() -> VAEConfig:
    return VAEConfig()


def flux_vae() -> VAEConfig:
    return VAEConfig(latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159)


def sd3_vae() -> VAEConfig:
    """SD3's 16-channel AutoencoderKL (scaling/shift from the checkpoint
    config)."""
    return VAEConfig(
        latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609
    )


def tiny_vae() -> VAEConfig:
    return VAEConfig(block_out_channels=(8, 16), norm_num_groups=4, layers_per_block=1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_conv(key, c_in, c_out, k=3, dtype=jnp.bfloat16):
    w = jax.random.truncated_normal(key, -2, 2, (k, k, c_in, c_out), jnp.float32)
    fan_in = k * k * c_in
    return {
        "w": (w * (fan_in**-0.5)).astype(dtype),
        "b": jnp.zeros((c_out,), dtype),
    }


def _init_groupnorm(c, dtype=jnp.bfloat16):
    return {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _init_resnet(key, c_in, c_out, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_groupnorm(c_in, dtype),
        "conv1": _init_conv(ks[0], c_in, c_out, 3, dtype),
        "norm2": _init_groupnorm(c_out, dtype),
        "conv2": _init_conv(ks[1], c_out, c_out, 3, dtype),
    }
    if c_in != c_out:
        p["shortcut"] = _init_conv(ks[2], c_in, c_out, 1, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_groupnorm(c, dtype),
        "q": cm.init_linear(ks[0], c, c, dtype=dtype),
        "k": cm.init_linear(ks[1], c, c, dtype=dtype),
        "v": cm.init_linear(ks[2], c, c, dtype=dtype),
        "out": cm.init_linear(ks[3], c, c, dtype=dtype),
    }


def init_vae_decoder(key, cfg: VAEConfig):
    dt = cfg.dtype
    chans = cfg.block_out_channels
    ks = iter(jax.random.split(key, 64))
    c0 = chans[-1]
    p = {
        "post_quant_conv": _init_conv(next(ks), cfg.latent_channels, cfg.latent_channels, 1, dt),
        "conv_in": _init_conv(next(ks), cfg.latent_channels, c0, 3, dt),
        "mid_res1": _init_resnet(next(ks), c0, c0, dt),
        "mid_attn": _init_attn(next(ks), c0, dt),
        "mid_res2": _init_resnet(next(ks), c0, c0, dt),
        "norm_out": _init_groupnorm(chans[0], dt),
        "conv_out": _init_conv(next(ks), chans[0], cfg.out_channels, 3, dt),
    }
    up = []
    c_prev = c0
    for c in reversed(chans):
        blocks = []
        for _ in range(cfg.layers_per_block + 1):
            blocks.append(_init_resnet(next(ks), c_prev, c, dt))
            c_prev = c
        up.append({"resnets": blocks, "upsample_conv": _init_conv(next(ks), c, c, 3, dt)})
    # last up block has no upsample
    up[-1].pop("upsample_conv")
    p["up"] = up
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1):
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            (stride, stride),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"].astype(x.dtype)
    )


def _groupnorm(p, x, groups, eps=1e-6):
    # stats-only fp32 (E[x^2]-mu^2 form) so XLA fuses the normalise pass
    # without materialising an fp32 copy of the feature map — 33% faster
    # decode on v5e than the cast-everything formulation
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mu = jnp.mean(xg, axis=(1, 2, 4), keepdims=True, dtype=jnp.float32)
    var = (
        jnp.mean(
            jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 4), keepdims=True
        )
        - mu * mu
    )
    # E[x^2]-mu^2 can go (slightly) negative via catastrophic cancellation on
    # near-constant large-mean groups; clamp so rsqrt never sees var < -eps
    var = jnp.maximum(var, 0.0)
    y = ((xg.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + eps)).reshape(
        b, h, w, c
    )
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _resnet(p, x, groups):
    h = _conv(p["conv1"], cm.silu(_groupnorm(p["norm1"], x, groups)))
    h = _conv(p["conv2"], cm.silu(_groupnorm(p["norm2"], h, groups)))
    if "shortcut" in p:
        x = _conv(p["shortcut"], x)
    return x + h


def _mid_attn(p, x, groups):
    b, hh, ww, c = x.shape
    y = _groupnorm(p["norm"], x, groups).reshape(b, hh * ww, c)
    q, k, v = cm.linear(p["q"], y), cm.linear(p["k"], y), cm.linear(p["v"], y)
    from compactfusion_tpu.ops.attention import sdpa

    o = sdpa(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])[:, :, 0]
    return x + cm.linear(p["out"], o).reshape(b, hh, ww, c)


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
    return _conv(p, x)


def _vae_decode_dense(params, latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """The plain full-frame decoder (no tiling/slicing dispatch)."""
    g = cfg.norm_num_groups
    # compute in the config dtype (bf16): fp32 latents would otherwise drag
    # the whole conv stack to fp32 (2x HBM traffic + half MXU rate)
    x = (latents / cfg.scaling_factor + cfg.shift_factor).astype(cfg.dtype)
    x = _conv(params["post_quant_conv"], x)
    x = _conv(params["conv_in"], x)
    x = _resnet(params["mid_res1"], x, g)
    x = _mid_attn(params["mid_attn"], x, g)
    x = _resnet(params["mid_res2"], x, g)
    for up in params["up"]:
        for r in up["resnets"]:
            x = _resnet(r, x, g)
        if "upsample_conv" in up:
            x = _upsample(up["upsample_conv"], x)
    x = cm.silu(_groupnorm(params["norm_out"], x, g))
    return _conv(params["conv_out"], x)


def _blend_v(above: jax.Array, cur: jax.Array, extent: int) -> jax.Array:
    """Linearly blend ``cur``'s top rows into ``above``'s bottom rows
    (diffusers ``AutoencoderKL.blend_v``)."""
    n = min(above.shape[1], cur.shape[1], extent)
    w = (jnp.arange(n, dtype=jnp.float32) / n).astype(cur.dtype)
    mixed = above[:, -n:] * (1.0 - w)[None, :, None, None] + cur[:, :n] * w[
        None, :, None, None
    ]
    return jnp.concatenate([mixed, cur[:, n:]], axis=1)


def _blend_h(left: jax.Array, cur: jax.Array, extent: int) -> jax.Array:
    """Linearly blend ``cur``'s left columns into ``left``'s right columns
    (diffusers ``AutoencoderKL.blend_h``)."""
    n = min(left.shape[2], cur.shape[2], extent)
    w = (jnp.arange(n, dtype=jnp.float32) / n).astype(cur.dtype)
    mixed = left[:, :, -n:] * (1.0 - w)[None, None, :, None] + cur[
        :, :, :n
    ] * w[None, None, :, None]
    return jnp.concatenate([mixed, cur[:, :, n:]], axis=2)


def vae_decode_tiled(params, latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """Decode in overlapping spatial tiles, blending seams with linear ramps.

    Diffusers ``AutoencoderKL.tiled_decode`` semantics (the reference's
    ``--enable_tiling``): tiles of ``cfg.tile_latent_size`` latent px are
    taken at stride ``tile * (1 - overlap)``; each decoded tile is blended
    into its top/left neighbours over ``tile_sample * overlap`` output px,
    then cropped to the stride so the stitched frame has no duplication.
    Peak activation memory drops from O(H*W) to O(tile^2) — the knob that
    makes 2k+ px decodes fit.  Tile positions are static, so XLA compiles
    one decode per distinct (edge) tile shape and reuses it.
    """
    b, h, w, _ = latents.shape
    tl = cfg.tile_latent_size
    if h <= tl and w <= tl:
        return _vae_decode_dense(params, latents, cfg)
    f = cfg.upscale_factor
    stride = max(1, int(tl * (1.0 - cfg.tile_overlap_factor)))
    blend = int(tl * f * cfg.tile_overlap_factor)
    row_limit = tl * f - blend

    rows = []
    for i in range(0, h, stride):
        row = []
        for j in range(0, w, stride):
            tile = latents[:, i : i + tl, j : j + tl, :]
            row.append(_vae_decode_dense(params, tile, cfg))
        rows.append(row)

    # blend sources are always the ORIGINAL decoded neighbours (diffusers
    # reads rows[i-1][j] / row[j-1], never the already-blended tiles)
    out_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend)
            out_row.append(tile[:, :row_limit, :row_limit])
        out_rows.append(jnp.concatenate(out_row, axis=2))
    return jnp.concatenate(out_rows, axis=1)[:, : h * f, : w * f]


def vae_decode(params, latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """(B, h, w, latent_channels) scaled latents -> (B, H, W, 3) in [-1, 1].

    Dispatches on the config's decode memory knobs: ``use_slicing`` decodes
    batch elements one at a time (exact), ``use_tiling`` decodes overlapping
    spatial tiles (approximate at seams) — reference ``--enable_slicing`` /
    ``--enable_tiling``.
    """
    inner = vae_decode_tiled if cfg.use_tiling else _vae_decode_dense
    if cfg.use_slicing and latents.shape[0] > 1:
        return jnp.concatenate(
            [
                inner(params, latents[i : i + 1], cfg)
                for i in range(latents.shape[0])
            ],
            axis=0,
        )
    return inner(params, latents, cfg)
