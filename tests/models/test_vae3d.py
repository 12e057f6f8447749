"""Causal 3D video VAE decoder tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.models.vae3d import (
    init_vae3d_decoder,
    tiny_vae3d,
    vae3d_decode,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_vae3d()
    params = init_vae3d_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_decode_shapes(setup):
    cfg, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 8, 8, 4), jnp.float32)
    out = jax.jit(lambda p, l: vae3d_decode(p, l, cfg))(params, lat)
    # 2 up blocks: one 2x spatial+temporal, one final (no upsample in last)
    # -> spatial 2x, temporal r=2: frames (3-1)*2+1 = 5
    assert out.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_temporal_causality(setup):
    """Changing a later latent frame must not affect earlier output frames."""
    cfg, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4), jnp.float32)
    out1 = vae3d_decode(params, lat, cfg)
    lat2 = lat.at[:, -1].add(10.0)  # perturb only the last latent frame
    out2 = vae3d_decode(params, lat2, cfg)
    # earlier output frames identical; last frames differ
    r = 2
    t_keep = (lat.shape[1] - 2) * r + 1  # frames driven by latents < last
    np.testing.assert_allclose(
        np.asarray(out1[:, : t_keep - 1], np.float32),
        np.asarray(out2[:, : t_keep - 1], np.float32),
        atol=1e-5,
    )
    assert (
        np.abs(np.asarray(out1[:, -1] - out2[:, -1], np.float32)).max() > 1e-3
    )
