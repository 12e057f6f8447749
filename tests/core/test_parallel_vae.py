"""Parallel VAE decode must be exact vs the single-device decoder.

Exactness holds in fp32 (identical math, halo-exchanged convs); the
production bf16 path differs only by conv accumulation-order rounding and is
covered by a tolerance test."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models.vae import init_vae_decoder, tiny_vae, vae_decode
from compactfusion_tpu.parallel.mesh import AXIS_RING, make_mesh
from compactfusion_tpu.parallel.vae import parallel_vae_decode


@pytest.mark.parametrize("world", [2, 4])
def test_parallel_decode_exact(world):
    cfg = dataclasses.replace(tiny_vae(), dtype=jnp.float32)
    params = init_vae_decoder(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (1, 16, 8, cfg.latent_channels), jnp.float32
    )
    ref = vae_decode(params, lat, cfg)

    mesh = make_mesh(ParallelConfig(ring_degree=world))
    f = jax.jit(
        jax.shard_map(
            lambda p, l: parallel_vae_decode(p, l, cfg, AXIS_RING, world),
            mesh=mesh,
            in_specs=(P(), P(None, AXIS_RING, None, None)),
            out_specs=P(None, AXIS_RING, None, None),
            check_vma=False,
        )
    )
    out = f(params, lat)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-5
    )


def test_separate_vae_ranks_decode():
    """DiT on 4 devices + dedicated 2-device VAE tail (reference
    vae_parallel_size mode): decode on the tail mesh, exact result."""
    from compactfusion_tpu.parallel.mesh import make_vae_mesh
    from compactfusion_tpu.parallel.vae import decode_on_vae_mesh

    p = ParallelConfig(ring_degree=4, vae_parallel_size=2)
    vae_mesh = make_vae_mesh(p)
    cfg = dataclasses.replace(tiny_vae(), dtype=jnp.float32)
    params = init_vae_decoder(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (1, 16, 8, cfg.latent_channels), jnp.float32
    )
    ref = vae_decode(params, lat, cfg)
    out = decode_on_vae_mesh(params, lat, cfg, vae_mesh)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-5
    )
    # output really lives on the VAE tail devices
    dev_ids = {d.id for d in out.sharding.device_set}
    assert dev_ids == {4, 5}


def test_parallel_decode_bf16_close():
    """Production dtype (bf16): banded decode matches within rounding."""
    cfg = tiny_vae()  # bf16
    params = init_vae_decoder(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (1, 16, 8, cfg.latent_channels), jnp.float32
    )
    ref = vae_decode(params, lat, cfg)
    world = 4
    mesh = make_mesh(ParallelConfig(ring_degree=world))
    f = jax.jit(
        jax.shard_map(
            lambda p, l: parallel_vae_decode(p, l, cfg, AXIS_RING, world),
            mesh=mesh,
            in_specs=(P(), P(None, AXIS_RING, None, None)),
            out_specs=P(None, AXIS_RING, None, None),
            check_vma=False,
        )
    )
    out = f(params, lat)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.04
    )
