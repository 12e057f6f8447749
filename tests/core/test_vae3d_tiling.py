"""3D video VAE tiled decode (reference vae.enable_tiling() for the video
families -> diffusers AutoencoderKLCogVideoX/HunyuanVideo.tiled_decode
spatial-tile semantics; the temporal axis is not tiled)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.models.vae3d import (
    hv_vae3d_decode,
    init_hv_vae3d_decoder,
    init_vae3d_decoder,
    tiny_hv_vae3d,
    tiny_vae3d,
    vae3d_decode,
)
from tests.helpers import rel_err


def _latents(cfg, b, t, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((b, t, h, w, cfg.latent_channels)), jnp.float32
    )


@pytest.mark.parametrize(
    "which,init_fn,decode_fn",
    [
        ("cog", init_vae3d_decoder, vae3d_decode),
        ("hv", init_hv_vae3d_decoder, hv_vae3d_decode),
    ],
)
def test_tiled_3d_decode_shape_and_seam_error(which, init_fn, decode_fn):
    cfg = dataclasses.replace(
        tiny_vae3d(), tile_latent_size=8, tile_overlap_factor=0.25
    )
    params = init_fn(jax.random.PRNGKey(0), cfg)
    lat = _latents(cfg, 1, 2, 12, 20, seed=3)
    dense = decode_fn(params, lat, cfg)
    tiled = decode_fn(
        params, lat, dataclasses.replace(cfg, use_tiling=True)
    )
    assert tiled.shape == dense.shape
    # seams blend linearly: approximate, but bounded (per-tile GroupNorm
    # stats and edge padding differ from the dense decode — the same
    # approximation diffusers ships; HV's GLOBAL (T,H,W) GroupNorm makes
    # per-tile stats diverge hardest at tiny random-init scale)
    bound = 0.7 if which == "hv" else 0.35
    err = rel_err(tiled, dense)
    assert 0.0 < err < bound, err
    assert np.isfinite(np.asarray(tiled, np.float32)).all()


def test_tiled_3d_passthrough_when_small():
    cfg = dataclasses.replace(tiny_vae3d(), tile_latent_size=64)
    params = init_vae3d_decoder(jax.random.PRNGKey(0), cfg)
    lat = _latents(cfg, 1, 2, 8, 8)
    dense = vae3d_decode(params, lat, cfg)
    tiled = vae3d_decode(
        params, lat, dataclasses.replace(cfg, use_tiling=True)
    )
    np.testing.assert_array_equal(np.asarray(tiled), np.asarray(dense))


def test_enable_tiling_reaches_video_vae_config():
    """--enable_tiling flows into VAE3DConfig.use_tiling for the video
    builders (the reference calls vae.enable_tiling() for CogVideoX)."""
    from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs

    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(
        parser.parse_args(["--model", "x", "--enable_tiling"])
    )
    engine, _ = args.create_config()
    assert engine.runtime_config.enable_tiling
