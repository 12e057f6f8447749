"""Patch-parallel VAE decode: height-sharded conv decoder with halo exchange.

Replaces the reference's ``distvae`` ``DecoderAdapter``
(``xfuser/model_executor/pipelines/base_pipeline.py:96-100,457-463``): the
latent image is split into horizontal bands across a mesh axis, every 3x3
conv exchanges one-row halos with its neighbours (``lax.ppermute`` with
non-wrapping permutations — missing boundary halos arrive as zeros, exactly
SAME-padding semantics), GroupNorm statistics are reduced over the axis with
``psum``, and the tiny mid-block global attention runs on the all-gathered
feature map.  The result is bit-equal to the single-device decoder.

The band shards stay height-aligned across every 2x upsample, so each device
decodes H/W * upsample**2 of the pixels — the distvae memory story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.vae import VAEConfig, _conv, _mid_attn


def _halo(x: jax.Array, axis_name: str, world: int, halo: int = 1):
    """Return (top, bottom) halo rows from the neighbouring bands."""
    if world == 1:
        z = jnp.zeros_like(x[:, :halo])
        return z, z
    down = [(i, i + 1) for i in range(world - 1)]  # i sends to i+1
    up = [(i + 1, i) for i in range(world - 1)]  # i+1 sends to i
    top = lax.ppermute(x[:, -halo:], axis_name, down)  # from prev band
    bottom = lax.ppermute(x[:, :halo], axis_name, up)  # from next band
    return top, bottom


def _conv3_halo(p, x, axis_name, world):
    """3x3 stride-1 conv on a height band, exact via halo exchange."""
    top, bottom = _halo(x, axis_name, world, 1)
    xp = jnp.concatenate([top, x, bottom], axis=1)
    y = (
        lax.conv_general_dilated(
            xp,
            p["w"].astype(x.dtype),
            (1, 1),
            padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["b"].astype(x.dtype)
    )
    return y


def _groupnorm_dist(p, x, groups, axis_name, eps=1e-6):
    """GroupNorm with statistics reduced over the height-band axis."""
    b, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    cnt = jnp.float32(h * w * (c // groups))
    s1 = jnp.sum(x32, axis=(1, 2, 4), keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=(1, 2, 4), keepdims=True)
    s1 = lax.psum(s1, axis_name)
    s2 = lax.psum(s2, axis_name)
    n = lax.psum(cnt, axis_name)
    mu = s1 / n
    # clamp: E[x^2]-mu^2 cancellation can yield tiny negatives -> rsqrt NaN
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    y = ((x32 - mu) * lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(
        x.dtype
    )


def _resnet_dist(p, x, groups, axis_name, world):
    h = _conv3_halo(
        p["conv1"], cm.silu(_groupnorm_dist(p["norm1"], x, groups, axis_name)),
        axis_name, world,
    )
    h = _conv3_halo(
        p["conv2"], cm.silu(_groupnorm_dist(p["norm2"], h, groups, axis_name)),
        axis_name, world,
    )
    if "shortcut" in p:
        x = _conv(p["shortcut"], x)
    return x + h


def _mid_attn_dist(p, x, groups, axis_name, world):
    """Global mid-block attention: all-gather the (small) feature map."""
    if world == 1:
        return _mid_attn(p, x, groups)
    xn = _groupnorm_dist(p["norm"], x, groups, axis_name)
    b, h, w, c = xn.shape
    full = lax.all_gather(xn, axis_name)  # (W_dev, B, h, w, c)
    full = jnp.transpose(full, (1, 0, 2, 3, 4)).reshape(b, world * h * w, c)
    q = cm.linear(p["q"], full)
    k = cm.linear(p["k"], full)
    v = cm.linear(p["v"], full)
    from compactfusion_tpu.ops.attention import sdpa

    o = sdpa(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])[:, :, 0]
    o = cm.linear(p["out"], o).reshape(b, world, h, w, c)
    my = lax.axis_index(axis_name)
    return x + jnp.take(o, my, axis=1)


def _upsample_halo(p, x, axis_name, world):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
    return _conv3_halo(p, x, axis_name, world)


@functools.lru_cache(maxsize=8)
def _vae_mesh_decode_fn(cfg: VAEConfig, vae_mesh):
    """One jitted banded decoder per (cfg, mesh) — jit caches key on callable
    identity, so building the shard_map wrapper inside decode_on_vae_mesh
    would recompile on EVERY decoded image (CLAUDE.md: 'shard_map closures
    recompile per call')."""
    from jax.sharding import PartitionSpec as P

    world = vae_mesh.devices.size
    axis = vae_mesh.axis_names[0]
    return jax.jit(
        jax.shard_map(
            functools.partial(
                parallel_vae_decode, cfg=cfg, axis_name=axis, world=world
            ),
            mesh=vae_mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
            check_vma=False,
        )
    )


def decode_on_vae_mesh(vae_params, latents, cfg: VAEConfig, vae_mesh):
    """Decode on the dedicated VAE device tail (reference separate-VAE-ranks
    mode: ``parallel_state.py:297-308`` + latents hand-off
    ``base_pipeline.py:654-669``).

    ``latents``: (B, H, W, C) full latent image (host/any sharding); it is
    resharded to height bands over the VAE mesh (the P2P send from the last
    DiT rank in the reference is just a resharding here) and decoded with the
    halo-exchange decoder.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    axis = vae_mesh.axis_names[0]
    band = NamedSharding(vae_mesh, P(None, axis, None, None))
    latents = jax.device_put(latents, band)
    return _vae_mesh_decode_fn(cfg, vae_mesh)(vae_params, latents)


def parallel_vae_decode(
    params, latents_band: jax.Array, cfg: VAEConfig, axis_name: str, world: int
) -> jax.Array:
    """Decode a height band (B, h_local, w, C_latent) -> (B, H_local*8, W*8, 3).

    Must run inside shard_map with the band axis sharded over ``axis_name``.
    Matches :func:`compactfusion_tpu.models.vae.vae_decode` exactly.
    """
    g = cfg.norm_num_groups
    # same dtype rule as vae_decode: compute the conv stack in cfg.dtype
    # (fp32 latents must not drag the whole decode to fp32)
    x = (latents_band / cfg.scaling_factor + cfg.shift_factor).astype(cfg.dtype)
    x = _conv(params["post_quant_conv"], x)
    x = _conv3_halo(params["conv_in"], x, axis_name, world)
    x = _resnet_dist(params["mid_res1"], x, g, axis_name, world)
    x = _mid_attn_dist(params["mid_attn"], x, g, axis_name, world)
    x = _resnet_dist(params["mid_res2"], x, g, axis_name, world)
    for up in params["up"]:
        for r in up["resnets"]:
            x = _resnet_dist(r, x, g, axis_name, world)
        if "upsample_conv" in up:
            x = _upsample_halo(up["upsample_conv"], x, axis_name, world)
    x = cm.silu(_groupnorm_dist(params["norm_out"], x, g, axis_name))
    return _conv3_halo(params["conv_out"], x, axis_name, world)
