"""SD3 MMDiT + pipeline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models.sd3 import init_sd3, sd3_forward, sd3_tiny
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.vae import tiny_vae
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.sd3 import SD3Pipeline, SD3PipelineConfig


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


from tests.helpers import spice_params


@pytest.fixture(scope="module")
def tiny():
    mcfg = sd3_tiny()
    return mcfg, spice_params(init_sd3(jax.random.PRNGKey(0), mcfg))


def test_forward_shapes(tiny):
    mcfg, params = tiny
    b, s_img, s_txt = 2, 16, 8
    img = jnp.ones((b, s_img, mcfg.patch**2 * mcfg.in_channels), mcfg.dtype)
    txt = jnp.ones((b, s_txt, mcfg.text_dim), mcfg.dtype)
    pooled = jnp.ones((b, mcfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 500.0)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, 4, 4)
    out, st = jax.jit(
        lambda p, i, c, pl_, t: sd3_forward(p, i, c, pl_, t, mcfg, pos_embed=pos)
    )(params, img, txt, pooled, t)
    assert out.shape == (b, s_img, mcfg.patch**2 * mcfg.in_channels)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def _pipe_cfg(mcfg, parallel, compact=CompactConfig(), steps=4):
    return SD3PipelineConfig(
        model=mcfg,
        vae=tiny_vae(),
        parallel=parallel,
        compact=compact,
        num_steps=steps,
        height=8 * 8,
        width=8 * 8,  # latent 8x8 -> 16 tokens
    )


def _inputs(mcfg, b=1, s_txt=8, seed=1):
    rng = np.random.default_rng(seed)
    txt = jnp.asarray(
        np.stack(
            [rng.standard_normal((b, s_txt, mcfg.text_dim)), np.zeros((b, s_txt, mcfg.text_dim))]
        ),
        jnp.float32,
    )
    pooled = jnp.asarray(
        np.stack(
            [rng.standard_normal((b, mcfg.pooled_dim)), np.zeros((b, mcfg.pooled_dim))]
        ),
        jnp.float32,
    )
    return txt, pooled


@pytest.mark.parametrize(
    "parallel",
    [
        ParallelConfig(ulysses_degree=2, ring_degree=2),
        ParallelConfig(cfg_degree=2, ring_degree=2, ulysses_degree=2),
    ],
)
def test_sd3_sharded_matches_single_device(tiny, parallel):
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(2)

    cfg1 = _pipe_cfg(mcfg, ParallelConfig())
    ref = SD3Pipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)
    assert np.isfinite(np.asarray(ref, np.float32)).all()

    cfgN = _pipe_cfg(mcfg, parallel)
    out = SD3Pipeline(params, None, cfgN, make_mesh(cfgN.parallel))(
        txt, pooled, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_sd3_compact(tiny):
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(3)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = SD3Pipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    compact = CompactConfig(
        enabled=True,
        compress_type=CompressType.BINARY,
        warmup_steps=2,
        residual=1,
        error_feedback=True,
    )
    par = ParallelConfig(cfg_degree=2, ring_degree=4)
    cfgC = _pipe_cfg(mcfg, par, compact=compact, steps=steps)
    out = SD3Pipeline(params, None, cfgC, make_mesh(par))(
        txt, pooled, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-5, "compact pipeline identical to lossless - test blind"
    assert err < 0.2, f"compact SD3 diverged: {err}"


def test_sd3_patch_pipelined_pipefusion(tiny):
    """pp=2 x M=4 async patch pipeline (reference SD3 _async_pipeline):
    stale image K/V + always-fresh text stream must approximate the sync
    result; close and sensitive."""
    import dataclasses as _dc

    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(13)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = SD3Pipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    cfgP = _dc.replace(
        _pipe_cfg(mcfg, ParallelConfig(pp_degree=2), steps=steps),
        num_pipeline_patch=4,
        runtime_warmup_steps=2,
    )
    out = SD3Pipeline(params, None, cfgP, make_mesh(cfgP.parallel))(
        txt, pooled, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-6, "patch pipeline identical to sync - stale KV not exercised"
    assert err < 0.3, f"patch-pipelined SD3 diverged: {err}"


def test_sd3_sync_pipefusion_exact(tiny):
    """pp=2 sync PipeFusion (stage-sharded joint-block stack + masked
    ppermute rounds) must match single-device EXACTLY."""
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(13)

    c1 = _pipe_cfg(mcfg, ParallelConfig(), steps=3)
    ref = SD3Pipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)
    cP = _pipe_cfg(mcfg, ParallelConfig(pp_degree=2), steps=3)
    out = SD3Pipeline(params, None, cP, make_mesh(cP.parallel))(
        txt, pooled, key, decode=False
    )
    assert rel_err(out, ref) < 1e-5
