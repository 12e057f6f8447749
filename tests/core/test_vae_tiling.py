"""VAE decode memory knobs: tiled + sliced decode (reference
``--enable_tiling`` / ``--enable_slicing`` -> diffusers
``AutoencoderKL.tiled_decode`` / ``enable_slicing`` semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.models.vae import (
    init_vae_decoder,
    tiny_vae,
    vae_decode,
    vae_decode_tiled,
)
from tests.helpers import rel_err


@pytest.fixture(scope="module")
def vae():
    cfg = tiny_vae()
    params = init_vae_decoder(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _latents(cfg, b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((b, h, w, cfg.latent_channels)), jnp.float32
    )


def test_slicing_is_exact(vae):
    params, cfg = vae
    lat = _latents(cfg, 3, 12, 12)
    dense = vae_decode(params, lat, cfg)
    sliced = vae_decode(
        params, lat, dataclasses.replace(cfg, use_slicing=True)
    )
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(sliced))


def test_tiling_passthrough_when_small(vae):
    params, cfg = vae
    tcfg = dataclasses.replace(cfg, use_tiling=True, tile_latent_size=32)
    lat = _latents(cfg, 1, 12, 12)
    dense = vae_decode(params, lat, cfg)
    tiled = vae_decode(params, lat, tcfg)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(tiled))


@pytest.mark.parametrize("h,w", [(20, 20), (24, 16)])
def test_tiled_decode_shape_and_seam_error(vae, h, w):
    """Tiled output has the exact full-frame shape; seam error vs the dense
    decode is bounded (tiles lose cross-tile mid-attention context — the
    same approximation diffusers ships) and non-zero (the tiled path ran)."""
    params, cfg = vae
    tcfg = dataclasses.replace(
        cfg, use_tiling=True, tile_latent_size=8, tile_overlap_factor=0.25
    )
    lat = _latents(cfg, 1, h, w, seed=h * 31 + w)
    dense = vae_decode(params, lat, cfg)
    tiled = vae_decode_tiled(params, lat, tcfg)
    f = cfg.upscale_factor
    assert tiled.shape == (1, h * f, w * f, cfg.out_channels)
    err = rel_err(tiled, dense)
    assert np.isfinite(np.asarray(tiled, np.float32)).all()
    assert 0.0 < err < 0.5, err


def test_tiled_plus_sliced_compose(vae):
    params, cfg = vae
    tcfg = dataclasses.replace(
        cfg, use_tiling=True, use_slicing=True, tile_latent_size=8
    )
    lat = _latents(cfg, 2, 20, 20)
    out = vae_decode(params, lat, tcfg)
    per = jnp.concatenate(
        [
            vae_decode_tiled(
                params, lat[i : i + 1], dataclasses.replace(tcfg, use_slicing=False)
            )
            for i in range(2)
        ],
        axis=0,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(per))


def test_cli_flags_reach_vae_config():
    """--enable_tiling/--enable_slicing flow args -> RuntimeConfig -> the
    pipeline's VAEConfig (parallel_api._vae_opts)."""
    from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
    from compactfusion_tpu.parallel_api import _vae_opts

    parser = xFuserArgs.add_cli_args(FlexibleArgumentParser())
    args = xFuserArgs.from_cli_args(
        parser.parse_args(
            ["--model", "tiny-pixart", "--enable_tiling", "--enable_slicing"]
        )
    )
    engine, _ = args.create_config()
    assert engine.runtime_config.enable_tiling
    assert engine.runtime_config.enable_slicing
    vcfg = _vae_opts(tiny_vae(), engine)
    assert vcfg.use_tiling and vcfg.use_slicing
