"""FLUX backbone + pipeline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.flux import (
    flux_forward,
    flux_image_positions,
    flux_tiny,
    init_flux,
)
from compactfusion_tpu.models.vae import tiny_vae
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


from tests.helpers import spice_params


@pytest.fixture(scope="module")
def tiny():
    mcfg = flux_tiny()
    params = spice_params(init_flux(jax.random.PRNGKey(0), mcfg))
    return mcfg, params


def test_forward_shapes(tiny):
    mcfg, params = tiny
    b, s_img, s_txt = 2, 16, 8
    img = jnp.ones((b, s_img, mcfg.in_channels), mcfg.dtype)
    txt = jnp.ones((b, s_txt, mcfg.text_dim), mcfg.dtype)
    pooled = jnp.ones((b, mcfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 500.0)
    g = jnp.full((b,), 3500.0)
    img_rope = cm.rope_frequencies(flux_image_positions(4, 4), mcfg.axes_dim)
    txt_rope = cm.rope_frequencies(
        jnp.zeros((s_txt, 3), jnp.int32), mcfg.axes_dim
    )
    out, sd, ss = jax.jit(
        lambda p, i, c, pl, t, g: flux_forward(
            p, i, c, pl, t, g, mcfg, img_rope=img_rope, txt_rope=txt_rope
        )
    )(params, img, txt, pooled, t, g)
    assert out.shape == (b, s_img, mcfg.in_channels)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def _pipe_cfg(mcfg, parallel, compact=CompactConfig(), steps=4):
    return FluxPipelineConfig(
        model=mcfg,
        vae=tiny_vae(),
        parallel=parallel,
        compact=compact,
        num_steps=steps,
        height=4 * 16,
        width=8 * 16,  # grid 4x8 = 32 tokens
    )


def _inputs(mcfg, b=1, s_txt=8, seed=1):
    rng = np.random.default_rng(seed)
    txt = jnp.asarray(rng.standard_normal((b, s_txt, mcfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((b, mcfg.pooled_dim)), jnp.float32)
    return txt, pooled


def test_flux_pipeline_single_device(tiny):
    mcfg, params = tiny
    cfg = _pipe_cfg(mcfg, ParallelConfig())
    mesh = make_mesh(cfg.parallel, devices=jax.devices()[:1])
    pipe = FluxPipeline(params, None, cfg, mesh)
    txt, pooled = _inputs(mcfg)
    lat = pipe(txt, pooled, jax.random.PRNGKey(2), decode=False)
    assert lat.shape == (1, 32, mcfg.in_channels)
    assert np.isfinite(np.asarray(lat, np.float32)).all()


@pytest.mark.parametrize(
    "parallel",
    [
        ParallelConfig(ulysses_degree=2, ring_degree=2),
        ParallelConfig(ring_degree=8),
        ParallelConfig(ulysses_degree=4, ring_degree=2),
    ],
)
def test_flux_sharded_matches_single_device(tiny, parallel):
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(3)

    cfg1 = _pipe_cfg(mcfg, ParallelConfig())
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    cfgN = _pipe_cfg(mcfg, parallel)
    out = FluxPipeline(params, None, cfgN, make_mesh(cfgN.parallel))(
        txt, pooled, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_flux_compact_tracks_uncompressed(tiny):
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(4)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    compact = CompactConfig(
        enabled=True,
        compress_type=CompressType.BINARY,
        warmup_steps=2,
        residual=1,
        error_feedback=True,
    )
    par = ParallelConfig(ulysses_degree=2, ring_degree=2)
    cfgC = _pipe_cfg(mcfg, par, compact=compact, steps=steps)
    out = FluxPipeline(params, None, cfgC, make_mesh(par))(
        txt, pooled, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-5, "compact pipeline identical to lossless - test blind"
    assert err < 0.2, f"compact FLUX diverged: {err}"


def test_flux_fbcache(tiny):
    """FBCache pipeline: close to baseline at a low threshold, runs e2e."""
    import dataclasses as _dc

    from compactfusion_tpu.cache.accel import CacheAccelConfig

    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(9)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    cfgC = _dc.replace(
        cfg1, cache=CacheAccelConfig(mode="fbcache", threshold=0.05)
    )
    out = FluxPipeline(
        params, None, cfgC, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err < 0.3, f"FBCache FLUX diverged: {err}"


def test_flux_single_scan_fused_matches_generic(tiny):
    """The fused-stream single-block fastpath (concat once, fused rope
    table) must match the generic joint-tensor path exactly."""
    from compactfusion_tpu.models.attn_impl import SingleDeviceAttn
    from compactfusion_tpu.models.flux import flux_single_scan

    class _GenericGate(SingleDeviceAttn):
        # subclass defeats the exact-type fastpath gate -> generic path
        pass

    mcfg, params = tiny
    b, s_img, s_txt = 2, 16, 8
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.standard_normal((b, s_img, mcfg.dim)), mcfg.dtype)
    txt = jnp.asarray(rng.standard_normal((b, s_txt, mcfg.dim)), mcfg.dtype)
    temb = jnp.asarray(rng.standard_normal((b, mcfg.dim)), mcfg.dtype)
    img_rope = cm.rope_frequencies(flux_image_positions(4, 4), mcfg.axes_dim)
    txt_rope = cm.rope_frequencies(
        jnp.zeros((s_txt, 3), jnp.int32), mcfg.axes_dim
    )

    def run(attn):
        i, t, _ = jax.jit(
            lambda p: flux_single_scan(
                p["single_blocks"], img, txt, temb, mcfg,
                img_rope=img_rope, txt_rope=txt_rope, attn=attn,
            )
        )(params)
        return i, t

    i_fast, t_fast = run(SingleDeviceAttn())
    i_ref, t_ref = run(_GenericGate())
    assert rel_err(i_fast, i_ref) < 1e-6
    assert rel_err(t_fast, t_ref) < 1e-6


def test_flux_tp_matches_single_device(tiny):
    """TP over double-block FFNs AND single-block MLPs (split proj_out)."""
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(11)
    cfg1 = _pipe_cfg(mcfg, ParallelConfig())
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)
    cfgT = _pipe_cfg(mcfg, ParallelConfig(tp_degree=2, ring_degree=2, ulysses_degree=2))
    out = FluxPipeline(params, None, cfgT, make_mesh(cfgT.parallel))(
        txt, pooled, key, decode=False
    )
    assert rel_err(out, ref) < 2e-2


def test_flux_patch_pipelined_pipefusion(tiny):
    """pp=2 stages x M=4 micro-patches over the 2*PS virtual pipeline
    (reference pipeline_flux.py:555-721 _async_pipeline): stale-KV patches
    approximate the sync result; must stay close and be sensitive."""
    import dataclasses as _dc

    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(9)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    cfgP = _dc.replace(
        _pipe_cfg(mcfg, ParallelConfig(pp_degree=2), steps=steps),
        num_pipeline_patch=4,
        runtime_warmup_steps=2,
    )
    out = FluxPipeline(params, None, cfgP, make_mesh(cfgP.parallel))(
        txt, pooled, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-6, "patch pipeline identical to sync - stale KV not exercised"
    assert err < 0.3, f"patch-pipelined FLUX PipeFusion diverged: {err}"


def test_flux_patch_pp_more_warmup_is_closer(tiny):
    """More sync warmup steps must reduce the stale-KV error (sanity that
    the pipeline actually switches between sync and patch mode)."""
    import dataclasses as _dc

    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(10)
    steps = 6

    cfg1 = _pipe_cfg(mcfg, ParallelConfig(), steps=steps)
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    errs = []
    for warm in (1, 5):
        cfgP = _dc.replace(
            _pipe_cfg(mcfg, ParallelConfig(pp_degree=2), steps=steps),
            num_pipeline_patch=4,
            runtime_warmup_steps=warm,
        )
        out = FluxPipeline(params, None, cfgP, make_mesh(cfgP.parallel))(
            txt, pooled, key, decode=False
        )
        errs.append(rel_err(out, ref))
    assert errs[1] < errs[0], errs


def test_flux_patch_pp_identity_padding(tiny):
    """Non-divisible block counts (real FLUX: 19 doubles) get zero-init
    identity pad blocks — the padded patch pipeline must match the unpadded
    single-device run as closely as a divisible one does."""
    import dataclasses as _dc

    mcfg = _dc.replace(flux_tiny(), double_layers=3, single_layers=3)
    from tests.helpers import spice_params as _sp

    params = _sp(init_flux(jax.random.PRNGKey(4), mcfg))
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(14)
    steps = 5

    cfg1 = FluxPipelineConfig(
        model=mcfg, vae=tiny_vae(), parallel=ParallelConfig(),
        num_steps=steps, height=4 * 16, width=8 * 16,
    )
    ref = FluxPipeline(
        params, None, cfg1, make_mesh(cfg1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)

    cfgP = FluxPipelineConfig(
        model=mcfg, vae=tiny_vae(), parallel=ParallelConfig(pp_degree=2),
        num_steps=steps, height=4 * 16, width=8 * 16,
        num_pipeline_patch=4, runtime_warmup_steps=2,
    )
    out = FluxPipeline(params, None, cfgP, make_mesh(cfgP.parallel))(
        txt, pooled, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert 1e-6 < err < 0.3, err


def test_flux_sync_pipefusion_exact(tiny):
    """pp=2 SYNC PipeFusion (num_pipeline_patch=1): stage-sharded double+
    single stacks with masked ppermute rounds must match single-device
    EXACTLY (the padded identity blocks are zero-init no-ops)."""
    mcfg, params = tiny
    txt, pooled = _inputs(mcfg)
    key = jax.random.PRNGKey(11)

    c1 = _pipe_cfg(mcfg, ParallelConfig(), steps=3)
    ref = FluxPipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(txt, pooled, key, decode=False)
    cP = _pipe_cfg(mcfg, ParallelConfig(pp_degree=2), steps=3)
    out = FluxPipeline(params, None, cP, make_mesh(cP.parallel))(
        txt, pooled, key, decode=False
    )
    assert rel_err(out, ref) < 1e-5


def test_flux_int8_weights_match_bf16(tiny):
    """Weights-only int8 (VERDICT r4 #2: full-depth FLUX on one v5e rides
    cm.quantize_params_int8 over the block stacks): quantized forward must
    track the bf16 forward within per-channel-scale rounding error."""
    mcfg, params = tiny
    b, s_img, s_txt = 2, 16, 8
    rng = np.random.default_rng(3)
    img = jnp.asarray(
        rng.standard_normal((b, s_img, mcfg.in_channels)), mcfg.dtype
    )
    txt = jnp.asarray(rng.standard_normal((b, s_txt, mcfg.text_dim)), mcfg.dtype)
    pooled = jnp.asarray(rng.standard_normal((b, mcfg.pooled_dim)), jnp.float32)
    t = jnp.full((b,), 500.0)
    g = jnp.full((b,), 3500.0)
    img_rope = cm.rope_frequencies(flux_image_positions(4, 4), mcfg.axes_dim)
    txt_rope = cm.rope_frequencies(
        jnp.zeros((s_txt, 3), jnp.int32), mcfg.axes_dim
    )

    fwd = jax.jit(
        lambda p, i: flux_forward(
            p, i, txt, pooled, t, g, mcfg, img_rope=img_rope, txt_rope=txt_rope
        )[0]
    )
    ref = fwd(params, img)
    qparams = cm.quantize_params_int8(
        params, keys=("double_blocks", "single_blocks")
    )
    # only the block stacks are quantized; embedders/head stay bf16
    assert "w_q" in qparams["double_blocks"]["img_qkv"]
    assert "w_q" not in str(type(qparams["x_embedder"].get("w_q", None)))
    assert qparams["x_embedder"]["w"].dtype == mcfg.dtype
    out = fwd(qparams, img)
    err = rel_err(out, ref)
    # int8 per-channel rounding: small but nonzero (bf16 fwd is not exactly
    # reproduced); spiced params keep the signal path live
    assert 1e-4 < err < 0.05, err


def test_quantize_params_int8_fullquant_t5_shares_walker():
    """keys=None quantizes every >=2D linear in the tree."""
    p = {
        "a": {"w": jnp.ones((8, 16), jnp.bfloat16), "b": jnp.zeros(16)},
        "vec": {"w": jnp.ones((16,), jnp.bfloat16)},
    }
    q = cm.quantize_params_int8(p)
    assert set(q["a"]) == {"w_q", "scale", "b"}
    assert q["a"]["w_q"].dtype == jnp.int8
    assert q["vec"]["w"].shape == (16,)  # 1D untouched
    x = jnp.ones((2, 8), jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(cm.linear(q["a"], x), np.float32),
        np.asarray(cm.linear(p["a"], x), np.float32),
        rtol=1e-2,
    )
