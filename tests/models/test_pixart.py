"""PixArt backbone + pipeline tests on tiny configs.

The key e2e check (analog of the reference's multi-GPU vs single-GPU parity
runs): the sharded USP pipeline must produce the same latents as the
single-device pipeline, and the compact-compressed pipeline must stay close.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.pixart import (
    init_pixart,
    pixart_forward,
    pixart_tiny,
)
from compactfusion_tpu.models.vae import init_vae_decoder, tiny_vae, vae_decode
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.pixart import (
    PixArtPipeline,
    PixArtPipelineConfig,
)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


from tests.helpers import spice_params


@pytest.fixture(scope="module")
def tiny_setup():
    mcfg = pixart_tiny()
    key = jax.random.PRNGKey(0)
    params = spice_params(init_pixart(key, mcfg))
    vcfg = tiny_vae()
    vae_params = init_vae_decoder(jax.random.PRNGKey(1), vcfg)
    return mcfg, params, vcfg, vae_params


def _text(b=1, s=8, d=32, seed=2):
    rng = np.random.default_rng(seed)
    cond = rng.standard_normal((b, s, d))
    uncond = np.zeros((b, s, d))
    text = jnp.asarray(np.stack([cond, uncond]), jnp.float32)
    mask = jnp.ones((2, b, s), bool)
    return text, mask


def test_forward_shapes(tiny_setup):
    mcfg, params, _, _ = tiny_setup
    b, s = 2, 16
    x = jnp.ones((b, s, mcfg.patch**2 * mcfg.in_channels), mcfg.dtype)
    t = jnp.full((b,), 500.0)
    text = jnp.ones((b, 8, mcfg.text_dim), mcfg.dtype)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, 4, 4)
    out, state = jax.jit(
        lambda p, x, t, c: pixart_forward(p, x, t, c, mcfg, pos_embed=pos)
    )(params, x, t, text)
    assert out.shape == (b, s, mcfg.patch**2 * mcfg.out_channels)
    assert state == ()


def test_precomputed_text_kv_matches_in_block(tiny_setup):
    """The hoisted text path (precompute_text_kv, used by the pipeline's
    step scan) is op-identical to the per-block computation — exact match."""
    from compactfusion_tpu.models.pixart import precompute_text_kv

    mcfg, params, _, _ = tiny_setup
    b, s = 2, 16
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.standard_normal((b, s, mcfg.patch**2 * mcfg.in_channels)),
        jnp.float32,
    )
    t = jnp.full((b,), 500.0)
    text = jnp.asarray(rng.standard_normal((b, 8, mcfg.text_dim)), jnp.float32)
    mask = jnp.ones((b, 8), bool)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, 4, 4)
    ref, _ = pixart_forward(
        params, x, t, text, mcfg, pos_embed=pos, text_mask=mask
    )
    kv = precompute_text_kv(params, text)
    assert kv.shape == (mcfg.depth, b, 8, 2 * mcfg.dim)
    out, _ = pixart_forward(
        params, x, t, text, mcfg, pos_embed=pos, text_mask=mask, text_kv=kv
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vae_decode_shapes(tiny_setup):
    _, _, vcfg, vae_params = tiny_setup
    lat = jnp.ones((1, 8, 8, vcfg.latent_channels), jnp.float32)
    img = jax.jit(lambda p, l: vae_decode(p, l, vcfg))(vae_params, lat)
    # two up blocks -> one 2x upsample
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img, np.float32)).all()


def _pipe_cfg(mcfg, vcfg, parallel, compact=CompactConfig(), steps=4):
    return PixArtPipelineConfig(
        model=mcfg,
        vae=vcfg,
        parallel=parallel,
        compact=compact,
        num_steps=steps,
        guidance_scale=4.5,
        height=8 * 8,  # latent 8x8 -> 16 tokens at patch 2
        width=8 * 8,
    )


def test_pipeline_single_device(tiny_setup):
    mcfg, params, vcfg, vae_params = tiny_setup
    cfg = _pipe_cfg(mcfg, vcfg, ParallelConfig())
    mesh = make_mesh(cfg.parallel, devices=jax.devices()[:1])
    pipe = PixArtPipeline(params, vae_params, cfg, mesh)
    text, mask = _text()
    img = pipe(text, mask, jax.random.PRNGKey(3))
    # tiny VAE has 2 blocks -> one 2x upsample of the 8x8 latent
    assert img.shape == (1, 16, 16, 3)
    arr = np.asarray(img, np.float32)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0


@pytest.mark.parametrize(
    "parallel",
    [
        ParallelConfig(ulysses_degree=2, ring_degree=2),
        ParallelConfig(ulysses_degree=4),
        ParallelConfig(ring_degree=4),
        ParallelConfig(ulysses_degree=2, ring_degree=2, cfg_degree=2),
    ],
)
def test_sharded_matches_single_device(tiny_setup, parallel):
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(4)

    cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig())
    mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
        text, mask, key, decode=False
    )

    cfgN = _pipe_cfg(mcfg, vcfg, parallel)
    meshN = make_mesh(cfgN.parallel)
    out = PixArtPipeline(params, vae_params, cfgN, meshN)(
        text, mask, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_compact_pipeline_tracks_uncompressed(tiny_setup):
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(5)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig(), steps=steps)
    mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
        text, mask, key, decode=False
    )

    compact = CompactConfig(
        enabled=True,
        compress_type=CompressType.INT2,
        warmup_steps=2,
        residual=1,
        error_feedback=True,
    )
    par = ParallelConfig(ring_degree=4)
    cfgC = _pipe_cfg(mcfg, vcfg, par, compact=compact, steps=steps)
    out = PixArtPipeline(params, vae_params, cfgC, make_mesh(par))(
        text, mask, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # sensitivity floor: compression must actually perturb the output
    assert err > 1e-5, "compact pipeline identical to lossless - test blind"
    assert err < 0.15, f"compressed pipeline diverged: rel_err={err}"


@pytest.mark.parametrize("patch_async", [False, True])
def test_patch_parallel_pipeline(tiny_setup, patch_async):
    """Patch-gather override (DistriFusion when async) vs single device."""
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(6)
    steps = 5

    cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig(), steps=steps)
    mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
        text, mask, key, decode=False
    )

    compact = CompactConfig(
        enabled=True,
        compress_type=(
            CompressType.IDENTITY if patch_async else CompressType.BINARY
        ),
        warmup_steps=2,
        residual=1,
        error_feedback=not patch_async,
        patch_gather=True,
        patch_async=patch_async,
    )
    par = ParallelConfig(ring_degree=4)
    cfgP = _pipe_cfg(mcfg, vcfg, par, compact=compact, steps=steps)
    out = PixArtPipeline(params, vae_params, cfgP, make_mesh(par))(
        text, mask, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err < 0.2, f"patch-parallel pipeline diverged: {err}"


@pytest.mark.parametrize(
    "parallel",
    [
        ParallelConfig(pp_degree=2, ring_degree=2),
        ParallelConfig(pp_degree=2, ulysses_degree=2, ring_degree=2),
    ],
)
def test_pipefusion_matches_single_device(tiny_setup, parallel):
    """PP stage-sharded blocks (sync pipeline, M=1) must be exact."""
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(7)

    cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig())
    mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
        text, mask, key, decode=False
    )

    cfgN = _pipe_cfg(mcfg, vcfg, parallel)
    out = PixArtPipeline(params, vae_params, cfgN, make_mesh(cfgN.parallel))(
        text, mask, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_patch_pipelined_pipefusion(tiny_setup):
    """pp=2 stages x M=4 micro-patches (reference _async_pipeline): stale-KV
    patches approximate the sync result; must stay close and be sensitive."""
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(8)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig(), steps=steps)
    mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
        text, mask, key, decode=False
    )

    import dataclasses as _dc

    cfgP = _dc.replace(
        _pipe_cfg(mcfg, vcfg, ParallelConfig(pp_degree=2), steps=steps),
        num_pipeline_patch=4,
        runtime_warmup_steps=2,
    )
    out = PixArtPipeline(params, vae_params, cfgP, make_mesh(cfgP.parallel))(
        text, mask, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-6, "patch pipeline identical to sync - stale KV not exercised"
    assert err < 0.3, f"patch-pipelined PipeFusion diverged: {err}"


def test_patch_pipelined_error_decays_with_steps(tiny_setup):
    """Staleness error must DECAY along the denoise trajectory (the
    reference's premise for one-iteration-stale KV: per-step latent updates
    shrink as denoising converges, so the async pipeline's divergence from
    sync falls as more steps run).  A blow-up here would mean staleness
    errors compound instead — the failure mode the warmup steps exist to
    prevent."""
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(21)

    import dataclasses as _dc

    def err_at(steps):
        cfg1 = _pipe_cfg(mcfg, vcfg, ParallelConfig(), steps=steps)
        mesh1 = make_mesh(cfg1.parallel, devices=jax.devices()[:1])
        ref = PixArtPipeline(params, vae_params, cfg1, mesh1)(
            text, mask, key, decode=False
        )
        cfgP = _dc.replace(
            _pipe_cfg(mcfg, vcfg, ParallelConfig(pp_degree=2), steps=steps),
            num_pipeline_patch=4,
            runtime_warmup_steps=2,
        )
        out = PixArtPipeline(
            params, vae_params, cfgP, make_mesh(cfgP.parallel)
        )(text, mask, key, decode=False)
        return rel_err(out, ref)

    errs = [err_at(s) for s in (4, 8, 12)]
    assert all(e > 1e-7 for e in errs), errs  # staleness engaged
    # per-step error INCREMENT must collapse as the trajectory converges
    # (measured: +9.1e-5 over steps 4->8, +1.5e-5 over 8->12) — compounding
    # staleness would grow the increment instead
    d1 = errs[1] - errs[0]
    d2 = errs[2] - errs[1]
    assert d2 < d1 * 0.7, errs
    # and the accumulated error stays far below the old 0.3 acceptance bound
    assert errs[2] < 0.05, errs


def test_patch_pipelined_pipefusion_with_ulysses(tiny_setup):
    """pp=2 x ulysses=2 x M=4: PipeFusion composed with Ulysses SP
    (reference cache_manager._sequence_parallel_cache_update) must match the
    pp-only patch pipeline EXACTLY (same stale-KV math, different sharding)."""
    mcfg, params, vcfg, vae_params = tiny_setup
    text, mask = _text()
    key = jax.random.PRNGKey(12)
    steps = 6

    import dataclasses as _dc

    def run(parallel):
        cfgP = _dc.replace(
            _pipe_cfg(mcfg, vcfg, parallel, steps=steps),
            num_pipeline_patch=4,
            runtime_warmup_steps=2,
        )
        return PixArtPipeline(params, vae_params, cfgP, make_mesh(cfgP.parallel))(
            text, mask, key, decode=False
        )

    ref = run(ParallelConfig(pp_degree=2))
    out = run(ParallelConfig(pp_degree=2, ulysses_degree=2))
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert rel_err(out, ref) < 5e-3, rel_err(out, ref)
