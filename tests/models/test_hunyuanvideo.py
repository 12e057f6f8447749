"""HunyuanVideo pipeline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models.hunyuanvideo import (
    hunyuanvideo_tiny,
    init_hunyuanvideo,
)
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.hunyuanvideo import (
    HunyuanVideoPipeline,
    HunyuanVideoPipelineConfig,
)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _cfg(mcfg, parallel, compact=CompactConfig(), steps=4):
    return HunyuanVideoPipelineConfig(
        model=mcfg, parallel=parallel, compact=compact, num_steps=steps,
        height=4 * 16, width=4 * 16, num_frames=5,  # 2 latent frames, 32 tokens
    )


def test_hunyuanvideo_sharded_and_compact():
    from tests.helpers import spice_params

    mcfg = hunyuanvideo_tiny()
    params = spice_params(init_hunyuanvideo(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(1)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, mcfg.pooled_dim)), jnp.float32)
    key = jax.random.PRNGKey(2)

    c1 = _cfg(mcfg, ParallelConfig())
    ref = HunyuanVideoPipeline(
        params, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(txt, key, pooled=pooled)

    cN = _cfg(mcfg, ParallelConfig(ulysses_degree=2, ring_degree=2))
    out = HunyuanVideoPipeline(params, cN, make_mesh(cN.parallel))(txt, key, pooled=pooled)
    assert rel_err(out, ref) < 5e-3

    compact = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY,
        warmup_steps=2, residual=1, error_feedback=True,
    )
    cC = _cfg(mcfg, ParallelConfig(ring_degree=4), compact=compact, steps=6)
    c1b = _cfg(mcfg, ParallelConfig(), steps=6)
    ref6 = HunyuanVideoPipeline(
        params, c1b, make_mesh(c1b.parallel, devices=jax.devices()[:1])
    )(txt, key, pooled=pooled)
    outc = HunyuanVideoPipeline(params, cC, make_mesh(cC.parallel))(txt, key, pooled=pooled)
    err = rel_err(outc, ref6)
    assert np.isfinite(np.asarray(outc, np.float32)).all()
    assert err > 1e-5, "compact pipeline identical to lossless - test blind"
    assert err < 0.25, f"compact HunyuanVideo diverged: {err}"


def test_hunyuanvideo_pixel_decode():
    import dataclasses

    from compactfusion_tpu.models.vae3d import (
        init_hv_vae3d_decoder,
        tiny_hv_vae3d,
    )

    mcfg = hunyuanvideo_tiny()
    params = init_hunyuanvideo(jax.random.PRNGKey(0), mcfg)
    vcfg = dataclasses.replace(
        tiny_hv_vae3d(), latent_channels=mcfg.in_channels // 4
    )
    vae_params = init_hv_vae3d_decoder(jax.random.PRNGKey(1), vcfg)
    cfg = _cfg(mcfg, ParallelConfig(), steps=2)
    mesh = make_mesh(cfg.parallel, devices=jax.devices()[:1])
    pipe = HunyuanVideoPipeline(
        params, cfg, mesh, vae_params=vae_params, vae_cfg=vcfg
    )
    rng = np.random.default_rng(3)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    video = pipe(txt, jax.random.PRNGKey(2))
    f, hl, wl = cfg.grid
    # HV's upsampler ALWAYS keeps the first frame un-doubled (no odd/even
    # check, unlike CogVideoX): T_out = (f-1)*ratio + 1
    t_out = (f - 1) * vcfg.temporal_ratio + 1
    scale = 2 ** (len(vcfg.block_out_channels) - 1)
    assert video.shape == (1, t_out, hl * 2 * scale, wl * 2 * scale, 3)
    assert np.isfinite(np.asarray(video, np.float32)).all()
    lat = pipe(txt, jax.random.PRNGKey(2), decode=False)
    assert lat.ndim == 3


def test_hunyuanvideo_sync_pipefusion_exact():
    """pp=2 sync PipeFusion over BOTH block families must reproduce the
    single-device pipeline EXACTLY (token refiner stays replicated)."""
    from tests.helpers import spice_params

    mcfg = hunyuanvideo_tiny()
    params = spice_params(init_hunyuanvideo(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(4)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, mcfg.pooled_dim)), jnp.float32)
    key = jax.random.PRNGKey(6)

    c1 = _cfg(mcfg, ParallelConfig(), steps=3)
    ref = HunyuanVideoPipeline(
        params, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(txt, key, pooled=pooled)
    cP = _cfg(mcfg, ParallelConfig(pp_degree=2), steps=3)
    out = HunyuanVideoPipeline(params, cP, make_mesh(cP.parallel))(
        txt, key, pooled=pooled
    )
    assert rel_err(out, ref) < 1e-5
