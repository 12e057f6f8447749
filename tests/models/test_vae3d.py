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


def test_causal_conv_is_causal(setup):
    """The CAUSAL CONV primitive never sees the future (frame t output
    depends only on frames <= t).  The full decoder is deliberately NOT
    strictly frame-causal in single-shot mode — exactly like diffusers
    AutoencoderKLCogVideoX (GroupNorm statistics span time and the
    upsampler conv is temporally symmetric); causality there enables
    chunked TILED decoding, which reuses this primitive's padding."""
    from compactfusion_tpu.models.vae3d import _causal_conv3, _init_conv3

    p = _init_conv3(jax.random.PRNGKey(3), 4, 8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 6, 6, 4), jnp.float32)
    y1 = _causal_conv3(p, x)
    y2 = _causal_conv3(p, x.at[:, -1].add(10.0))
    np.testing.assert_allclose(
        np.asarray(y1[:, :-1]), np.asarray(y2[:, :-1]), atol=1e-5
    )
    assert np.abs(np.asarray(y1[:, -1] - y2[:, -1])).max() > 1e-3


def test_decode_sensitive_to_late_frames(setup):
    """Perturbing the last latent frame must strongly change the last
    output frames and only weakly (via norm statistics) the first."""
    cfg, params = setup
    lat = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 4), jnp.float32)
    out1 = np.asarray(vae3d_decode(params, lat, cfg), np.float32)
    out2 = np.asarray(
        vae3d_decode(params, lat.at[:, -1].add(10.0), cfg), np.float32
    )
    d_first = np.abs(out1[:, 0] - out2[:, 0]).mean()
    d_last = np.abs(out1[:, -1] - out2[:, -1]).mean()
    assert d_last > 10 * d_first, (d_first, d_last)
