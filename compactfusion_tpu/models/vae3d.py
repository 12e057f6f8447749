"""Causal 3D video VAE decoder (CogVideoX family), functional JAX.

Faithful re-implementation of diffusers ``AutoencoderKLCogVideoX``'s decoder
(the model the reference converts on its VAE ranks, ``base_pipeline.py:
457-463``, ``pipeline_cogvideox.py:439``):

  * ``CogVideoXCausalConv3d`` — temporal padding replicates the first frame
    (frame t never sees the future), spatial padding is zero;
  * ``CogVideoXSpatialNorm3D`` — GroupNorm on the features, modulated by
    1x1x1 convs of the RAW LATENT ``zq`` nearest-resized to the feature
    resolution (first frame resized separately when T is odd);
  * ``CogVideoXUpsample3D`` — nearest 2x spatial upsample; in
    ``compress_time`` blocks the first frame is kept un-doubled (T -> 2T-1)
    so ``T_out = (T_lat - 1) * temporal_ratio + 1``; the upsample conv is a
    PER-FRAME 2D 3x3 conv (diffusers uses ``nn.Conv2d`` — a (1, 3, 3)
    kernel here, so real 4D checkpoint weights load and no temporal mixing
    happens in the upsampler);
  * decode order: conv_in, mid (2 spatial-norm resnets), up blocks
    (layers_per_block+1 resnets + upsampler), spatial norm_out, silu,
    conv_out.

Ground-truth parity vs the torch reference: ``tests/io/test_backbone_parity``
(vae3d case).  Layout here is (B, T, H, W, C) — TPU-native channels-last.
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
    #: 2^levels temporal compression undone by the first `levels` up blocks
    temporal_compress_levels: int = 2
    scaling_factor: float = 1.15258426  # CogVideoX
    #: CogVideoX-2b/5b invert scaling only; 1.5 variants also scale spatially
    dtype: Any = jnp.bfloat16
    #: decode in overlapping SPATIAL tiles blended with linear ramps
    #: (diffusers AutoencoderKLCogVideoX.tiled_decode semantics — the
    #: reference calls vae.enable_tiling() for the video families); the
    #: memory knob that makes real-scale (720p+) video decode fit: peak
    #: activations and the causal mid-attention's score matrix scale with
    #: the tile area instead of the full frame
    use_tiling: bool = False
    tile_latent_size: int = 64  # latent px per spatial tile side
    tile_overlap_factor: float = 0.25

    @property
    def temporal_ratio(self) -> int:
        return 2**self.temporal_compress_levels


def cogvideox_vae() -> VAE3DConfig:
    return VAE3DConfig()


def hunyuanvideo_vae() -> VAE3DConfig:
    """HunyuanVideo causal 3D VAE (decoded by :func:`hv_vae3d_decode` —
    plain GroupNorm resnets, replicate-padded causal convs, causal mid
    attention; NOT the CogVideoX spatial-norm decoder)."""
    return VAE3DConfig(
        block_out_channels=(128, 256, 512, 512),
        layers_per_block=2,
        scaling_factor=0.476986,
    )


def tiny_hv_vae3d() -> VAE3DConfig:
    return VAE3DConfig(
        latent_channels=4,
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        temporal_compress_levels=1,
    )


def tiny_vae3d() -> VAE3DConfig:
    return tiny_hv_vae3d()  # identical smoke-test config for both decoders


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


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


def _init_spatial_norm(key, c, zq_c, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": {"g": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)},
        "conv_y": _init_conv3(k1, zq_c, c, (1, 1, 1), dtype),
        "conv_b": _init_conv3(k2, zq_c, c, (1, 1, 1), dtype),
    }


def _init_resnet(key, c_in, c_out, zq_c, dtype):
    ks = jax.random.split(key, 5)
    p = {
        "norm1": _init_spatial_norm(ks[0], c_in, zq_c, dtype),
        "conv1": _init_conv3(ks[1], c_in, c_out, dtype=dtype),
        "norm2": _init_spatial_norm(ks[2], c_out, zq_c, dtype),
        "conv2": _init_conv3(ks[3], c_out, c_out, dtype=dtype),
    }
    if c_in != c_out:
        p["shortcut"] = _init_conv3(ks[4], c_in, c_out, (1, 1, 1), dtype)
    return p


def init_vae3d_decoder(key, cfg: VAE3DConfig):
    dt = cfg.dtype
    chans = list(reversed(cfg.block_out_channels))
    zq = cfg.latent_channels
    ks = iter(jax.random.split(key, 128))
    p = {
        "conv_in": _init_conv3(next(ks), zq, chans[0], dtype=dt),
        "mid_res1": _init_resnet(next(ks), chans[0], chans[0], zq, dt),
        "mid_res2": _init_resnet(next(ks), chans[0], chans[0], zq, dt),
        "norm_out": _init_spatial_norm(next(ks), chans[-1], zq, dt),
        "conv_out": _init_conv3(next(ks), chans[-1], cfg.out_channels, dtype=dt),
    }
    up = []
    c_prev = chans[0]
    for i, c in enumerate(chans):
        blocks = []
        for _ in range(cfg.layers_per_block + 1):
            blocks.append(_init_resnet(next(ks), c_prev, c, zq, dt))
            c_prev = c
        blk = {"resnets": blocks}
        if i < len(chans) - 1:
            # diffusers CogVideoXUpsample3D conv is a per-frame nn.Conv2d
            blk["upsample_conv"] = _init_conv3(next(ks), c, c, (1, 3, 3), dt)
        up.append(blk)
    p["up"] = up
    return p


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _causal_conv3(p, x):
    """(B, T, H, W, C): replicate-first-frame temporal pad, zero spatial."""
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        (1, 1, 1),
        padding=((0, 0), (pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _plain_conv3(p, x):
    """Non-causal 3x3x3 conv, zero padding on all axes (upsampler conv)."""
    kt, kh, kw = p["w"].shape[:3]
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        (1, 1, 1),
        padding=(
            ((kt - 1) // 2, (kt - 1) // 2),
            ((kh - 1) // 2, (kh - 1) // 2),
            ((kw - 1) // 2, (kw - 1) // 2),
        ),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _nearest_resize_zq(zq, t, hh, ww):
    """Nearest-resize zq (B, Tz, hz, wz, C) to (B, t, hh, ww, C) by integer
    repetition on H/W and CogVideoX's first-frame-split rule on T."""
    b, tz, hz, wz, c = zq.shape
    if t != tz:
        if t % 2 == 1 and t > 1:
            # first latent frame -> first feature frame; the rest upsample
            rep = (t - 1) // (tz - 1)
            rest = jnp.repeat(zq[:, 1:], rep, axis=1)
            zq = jnp.concatenate([zq[:, :1], rest], axis=1)
        else:
            zq = jnp.repeat(zq, t // tz, axis=1)
    if hh != zq.shape[2]:
        zq = jnp.repeat(zq, hh // zq.shape[2], axis=2)
    if ww != zq.shape[3]:
        zq = jnp.repeat(zq, ww // zq.shape[3], axis=3)
    return zq


def _spatial_norm(p, x, zq, groups, eps=1e-6):
    """CogVideoXSpatialNorm3D: groupnorm(x) * conv_y(zq') + conv_b(zq')."""
    b, t, hh, ww, c = x.shape
    zq = _nearest_resize_zq(zq, t, hh, ww)
    x32 = x.astype(jnp.float32).reshape(b, t, hh, ww, groups, c // groups)
    # torch GroupNorm statistics reduce over (T, H, W, C/g) — time included
    # (causality comes from the conv padding / tiled decode, not the norm)
    mu = jnp.mean(x32, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=(1, 2, 3, 5), keepdims=True) - mu * mu,
        0.0,
    )
    y = ((x32 - mu) * lax.rsqrt(var + eps)).reshape(b, t, hh, ww, c)
    y = y * p["norm"]["g"].astype(jnp.float32) + p["norm"]["b"].astype(
        jnp.float32
    )
    scale = _plain_conv3(p["conv_y"], zq)
    shift = _plain_conv3(p["conv_b"], zq)
    return (
        y * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    ).astype(x.dtype)


def _resnet3(p, x, zq, groups):
    h = _causal_conv3(p["conv1"], cm.silu(_spatial_norm(p["norm1"], x, zq, groups)))
    h = _causal_conv3(p["conv2"], cm.silu(_spatial_norm(p["norm2"], h, zq, groups)))
    if "shortcut" in p:
        x = _plain_conv3(p["shortcut"], x)
    return x + h


def _upsample3(p, x, temporal: bool):
    """CogVideoXUpsample3D: nearest 2x (h, w); ``temporal`` additionally
    doubles frames 1..T-1, keeping frame 0 (odd-T rule); PER-FRAME 2D conv
    (a (1, 3, 3) kernel — no temporal mixing, matching nn.Conv2d)."""
    b, t, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if temporal and t > 1:
        if t % 2 == 1:
            rest = jnp.repeat(x[:, 1:], 2, axis=1)
            x = jnp.concatenate([x[:, :1], rest], axis=1)
        else:
            x = jnp.repeat(x, 2, axis=1)
    return _plain_conv3(p, x)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _blend_v3(above, cur, extent):
    """Blend cur's top rows into above's bottom rows ((B, T, H, W, C))."""
    n = min(above.shape[2], cur.shape[2], extent)
    w = (jnp.arange(n, dtype=jnp.float32) / n).astype(cur.dtype)
    mixed = above[:, :, -n:] * (1.0 - w)[None, None, :, None, None] + cur[
        :, :, :n
    ] * w[None, None, :, None, None]
    return jnp.concatenate([mixed, cur[:, :, n:]], axis=2)


def _blend_h3(left, cur, extent):
    n = min(left.shape[3], cur.shape[3], extent)
    w = (jnp.arange(n, dtype=jnp.float32) / n).astype(cur.dtype)
    mixed = left[:, :, :, -n:] * (1.0 - w)[None, None, None, :, None] + cur[
        :, :, :, :n
    ] * w[None, None, None, :, None]
    return jnp.concatenate([mixed, cur[:, :, :, n:]], axis=3)


def _tiled_decode3d(decode_fn, latents, cfg: VAE3DConfig):
    """Overlapping spatial tiles over (H, W), all frames per tile, blended
    with linear ramps — diffusers ``AutoencoderKLCogVideoX.tiled_decode`` /
    ``AutoencoderKLHunyuanVideo.tiled_decode`` structure (the temporal axis
    is NOT tiled: causal convs would need boundary-frame caches).  Each tile
    decodes with its own latent window, so the spatial-norm zq conditioning
    matches the tile exactly like the diffusers per-tile decode."""
    b, t, h, w, _ = latents.shape
    tl = cfg.tile_latent_size
    if h <= tl and w <= tl:
        return decode_fn(latents)
    # spatial upscale = one 2x per non-final up block
    upscale = 2 ** (len(cfg.block_out_channels) - 1)
    stride = max(1, int(tl * (1.0 - cfg.tile_overlap_factor)))
    blend = int(tl * upscale * cfg.tile_overlap_factor)
    row_limit = tl * upscale - blend

    rows = []
    for i in range(0, h, stride):
        row = []
        for j in range(0, w, stride):
            row.append(decode_fn(latents[:, :, i : i + tl, j : j + tl, :]))
        rows.append(row)

    out_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v3(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = _blend_h3(row[j - 1], tile, blend)
            out_row.append(tile[:, :, :row_limit, :row_limit])
        out_rows.append(jnp.concatenate(out_row, axis=3))
    out = jnp.concatenate(out_rows, axis=2)
    return out[:, :, : h * upscale, : w * upscale]


# ---------------------------------------------------------------------------
# HunyuanVideo causal 3D VAE decoder (AutoencoderKLHunyuanVideo)
# ---------------------------------------------------------------------------


def _causal_conv3_repl(p, x):
    """HunyuanVideoCausalConv3d: REPLICATE padding everywhere — spatial
    edges replicate, temporal front replicates the first frame (k-1)."""
    kt, kh, kw = p["w"].shape[:3]
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    if kt > 1 or pad_h or pad_w:
        x = jnp.pad(
            x,
            ((0, 0), (kt - 1, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
            mode="edge",
        )
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        (1, 1, 1),
        padding=((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _plain_groupnorm3(p, x, groups, eps=1e-6):
    """torch GroupNorm over (T, H, W, C/g) — time included."""
    b, t, hh, ww, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, t, hh, ww, groups, c // groups)
    mu = jnp.mean(x32, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.maximum(
        jnp.mean(jnp.square(x32), axis=(1, 2, 3, 5), keepdims=True) - mu * mu,
        0.0,
    )
    y = ((x32 - mu) * lax.rsqrt(var + eps)).reshape(b, t, hh, ww, c)
    return (
        y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    ).astype(x.dtype)


def _resnet3_hv(p, x, groups):
    h = _causal_conv3_repl(
        p["conv1"], cm.silu(_plain_groupnorm3(p["norm1"], x, groups))
    )
    h = _causal_conv3_repl(
        p["conv2"], cm.silu(_plain_groupnorm3(p["norm2"], h, groups))
    )
    if "shortcut" in p:
        x = _causal_conv3_repl(p["shortcut"], x)
    return x + h


def _mid_attn_hv(p, x, groups):
    """Single-head attention over flattened (T*H*W) tokens with a CAUSAL
    frame mask (token of frame f attends frames <= f).  Routed through
    ``ops.attention.sdpa`` like the 2D VAE's mid attention — a hand-rolled
    dense (T*H*W)^2 fp32 score matrix would be ~53 GB at 720p real scale."""
    from compactfusion_tpu.ops.attention import sdpa

    b, t, hh, ww, c = x.shape
    y = _plain_groupnorm3(p["norm"], x, groups).reshape(b, t * hh * ww, c)
    q = cm.linear(p["q"], y)
    k = cm.linear(p["k"], y)
    v = cm.linear(p["v"], y)
    frame = jnp.repeat(jnp.arange(t), hh * ww)
    mask = frame[:, None] >= frame[None, :]
    o = sdpa(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :], mask=mask)
    o = cm.linear(p["out"], o[:, :, 0].astype(x.dtype))
    return x + o.reshape(b, t, hh, ww, c)


def _upsample3_hv(p, x, temporal: bool):
    """HunyuanVideoUpsampleCausal3D: first frame spatial-only, rest
    (t, h, w)-doubled when temporal; CAUSAL conv after."""
    b, t, h, w, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if temporal and t > 1:
        rest = jnp.repeat(x[:, 1:], 2, axis=1)
        x = jnp.concatenate([x[:, :1], rest], axis=1)
    return _causal_conv3_repl(p, x)


def init_hv_vae3d_decoder(key, cfg: VAE3DConfig):
    """Init with the HunyuanVideo topology (plain GroupNorms + mid attn)."""
    dt = cfg.dtype
    chans = list(reversed(cfg.block_out_channels))
    ks = iter(jax.random.split(key, 128))

    def norm(c):
        return {"g": jnp.ones((c,), dt), "b": jnp.zeros((c,), dt)}

    def resnet(c_in, c_out):
        p = {
            "norm1": norm(c_in),
            "conv1": _init_conv3(next(ks), c_in, c_out, dtype=dt),
            "norm2": norm(c_out),
            "conv2": _init_conv3(next(ks), c_out, c_out, dtype=dt),
        }
        if c_in != c_out:
            p["shortcut"] = _init_conv3(next(ks), c_in, c_out, (1, 1, 1), dt)
        return p

    c0 = chans[0]
    p = {
        "conv_in": _init_conv3(next(ks), cfg.latent_channels, c0, dtype=dt),
        "mid_res1": resnet(c0, c0),
        "mid_attn": {
            "norm": norm(c0),
            "q": cm.init_linear(next(ks), c0, c0, dtype=dt),
            "k": cm.init_linear(next(ks), c0, c0, dtype=dt),
            "v": cm.init_linear(next(ks), c0, c0, dtype=dt),
            "out": cm.init_linear(next(ks), c0, c0, dtype=dt),
        },
        "mid_res2": resnet(c0, c0),
        "norm_out": norm(chans[-1]),
        "conv_out": _init_conv3(next(ks), chans[-1], cfg.out_channels, dtype=dt),
    }
    up = []
    c_prev = c0
    for i, c in enumerate(chans):
        blocks = [resnet(c_prev if j == 0 else c, c)
                  for j in range(cfg.layers_per_block + 1)]
        c_prev = c
        blk = {"resnets": blocks}
        if i < len(chans) - 1:
            blk["upsample_conv"] = _init_conv3(next(ks), c, c, dtype=dt)
        up.append(blk)
    p["up"] = up
    return p


def hv_vae3d_decode(params, latents: jax.Array, cfg: VAE3DConfig) -> jax.Array:
    """HunyuanVideo decode: (B, T_lat, h, w, C) SCALED latents -> pixels."""
    if cfg.use_tiling:
        dense = dataclasses.replace(cfg, use_tiling=False)
        return _tiled_decode3d(
            lambda z: hv_vae3d_decode(params, z, dense), latents, cfg
        )
    g = cfg.norm_num_groups
    x = (latents / cfg.scaling_factor).astype(cfg.dtype)
    x = _causal_conv3_repl(params["conv_in"], x)
    x = _resnet3_hv(params["mid_res1"], x, g)
    x = _mid_attn_hv(params["mid_attn"], x, g)
    x = _resnet3_hv(params["mid_res2"], x, g)
    n_up = len(params["up"])
    for i, up in enumerate(params["up"]):
        for r in up["resnets"]:
            x = _resnet3_hv(r, x, g)
        if "upsample_conv" in up:
            # HunyuanVideo places TIME upsampling at the LAST
            # temporal_compress_levels non-final up blocks
            # (add_time_upsample = i >= len - 1 - levels and not final),
            # i.e. blocks {1, 2} of the real 4-block decoder — not the
            # first blocks like CogVideoX
            x = _upsample3_hv(
                up["upsample_conv"], x,
                i >= n_up - 1 - cfg.temporal_compress_levels,
            )
    x = cm.silu(_plain_groupnorm3(params["norm_out"], x, g))
    return _causal_conv3_repl(params["conv_out"], x)


def vae3d_decode(params, latents: jax.Array, cfg: VAE3DConfig) -> jax.Array:
    """(B, T_lat, h, w, C_lat) SCALED latents -> (B, T, H, W, 3).

    T = (T_lat - 1) * temporal_ratio + 1 (CogVideoX frame-count rule);
    H = h * 8, W = w * 8.
    """
    if cfg.use_tiling:
        dense = dataclasses.replace(cfg, use_tiling=False)
        return _tiled_decode3d(
            lambda z: vae3d_decode(params, z, dense), latents, cfg
        )
    g = cfg.norm_num_groups
    zq = (latents / cfg.scaling_factor).astype(cfg.dtype)
    x = _causal_conv3(params["conv_in"], zq)
    x = _resnet3(params["mid_res1"], x, zq, g)
    x = _resnet3(params["mid_res2"], x, zq, g)
    for i, up in enumerate(params["up"]):
        for r in up["resnets"]:
            x = _resnet3(r, x, zq, g)
        if "upsample_conv" in up:
            x = _upsample3(
                up["upsample_conv"], x, i < cfg.temporal_compress_levels
            )
    x = cm.silu(_spatial_norm(params["norm_out"], x, zq, g))
    return _causal_conv3(params["conv_out"], x)
