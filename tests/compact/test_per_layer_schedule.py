"""Per-layer compression plans (reference ``compress_func(layer, step)``).

The reference consults a callable per forward (``compact/ring.py:180-181``);
here it resolves to a static (steps x layer-segments) table and the PixArt
pipeline compiles one block-scan per contiguous layer segment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models.pixart import init_pixart, pixart_tiny
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.pixart import (
    PixArtPipeline,
    PixArtPipelineConfig,
    layer_plan_segments,
)
from tests.helpers import rel_err, spice_params


@pytest.fixture(scope="module")
def setup():
    mcfg = pixart_tiny()
    params = spice_params(init_pixart(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(1)
    text = jnp.asarray(
        np.stack(
            [rng.standard_normal((1, 8, mcfg.text_dim)),
             np.zeros((1, 8, mcfg.text_dim))]
        ),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    return mcfg, params, text, mask


def _cfg(mcfg, compact, steps=6):
    return PixArtPipelineConfig(
        model=mcfg,
        vae=None,
        parallel=ParallelConfig(ring_degree=4),
        compact=compact,
        num_steps=steps,
        height=64,
        width=64,
    )


def test_layer_plan_segments():
    plans = [
        (CompressType.WARMUP,) * 4,
        (CompressType.BINARY,) * 2 + (CompressType.INT2,) * 2,
    ]
    assert layer_plan_segments(plans, 4) == ((0, 2), (2, 4))
    assert layer_plan_segments([plans[0]], 4) == ((0, 4),)


def test_uniform_compress_func_matches_builtin_schedule(setup):
    mcfg, params, text, mask = setup
    key = jax.random.PRNGKey(2)
    mesh = make_mesh(ParallelConfig(ring_degree=4))

    base_cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY,
        warmup_steps=2, residual=1, error_feedback=True,
    )
    out_builtin = PixArtPipeline(
        params, None, _cfg(mcfg, base_cfg), mesh
    )(text, mask, key, decode=False)

    fn_cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY,
        warmup_steps=2, residual=1, error_feedback=True,
        compress_func=lambda layer, step: (
            CompressType.WARMUP if step < 2 else CompressType.BINARY
        ),
    )
    out_fn = PixArtPipeline(
        params, None, _cfg(mcfg, fn_cfg), mesh
    )(text, mask, key, decode=False)
    np.testing.assert_array_equal(np.asarray(out_builtin), np.asarray(out_fn))


def test_per_layer_plan_runs_and_is_between_extremes(setup):
    """First layer uncompressed (IDENTITY), second layer 1-bit: the error vs
    the lossless run must sit strictly between all-lossless (0) and
    all-compressed."""
    mcfg, params, text, mask = setup
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(ParallelConfig(ring_degree=4))
    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])

    ref = PixArtPipeline(
        params, None,
        _cfg(mcfg, CompactConfig()).__class__(
            model=mcfg, vae=None, parallel=ParallelConfig(),
            num_steps=6, height=64, width=64,
        ),
        mesh1,
    )(text, mask, key, decode=False)

    def plan(methods):
        return CompactConfig(
            enabled=True, compress_type=CompressType.BINARY,
            warmup_steps=1, residual=1, error_feedback=True,
            compress_func=lambda layer, step: (
                CompressType.WARMUP if step < 1 else methods[layer]
            ),
        )

    out_mixed = PixArtPipeline(
        params, None,
        _cfg(mcfg, plan({0: CompressType.IDENTITY, 1: CompressType.BINARY})),
        mesh,
    )(text, mask, key, decode=False)
    out_full = PixArtPipeline(
        params, None,
        _cfg(mcfg, plan({0: CompressType.BINARY, 1: CompressType.BINARY})),
        mesh,
    )(text, mask, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6, "mixed plan identical to lossless - test blind"
    assert err_mixed < err_full, (err_mixed, err_full)
    assert err_full < 0.3


# ---------------------------------------------------------------------------
# FLUX: per-layer plans across the double/single block families
# ---------------------------------------------------------------------------


def test_flux_per_layer_plan():
    from compactfusion_tpu.models.flux import flux_tiny, init_flux
    from compactfusion_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig

    mcfg = flux_tiny()
    params = spice_params(init_flux(jax.random.PRNGKey(7), mcfg))
    rng = np.random.default_rng(8)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((1, mcfg.pooled_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(9)

    def fcfg(parallel, compact=CompactConfig()):
        return FluxPipelineConfig(
            model=mcfg, vae=None, parallel=parallel, compact=compact,
            num_steps=4, height=4 * 16, width=8 * 16,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = FluxPipeline(params, None, fcfg(ParallelConfig()), mesh1)(
        txt, pooled, key, decode=False
    )

    def plan(first_double, rest):
        # double layer 0 gets ``first_double``, everything else ``rest``
        return CompactConfig(
            enabled=True, compress_type=CompressType.BINARY,
            warmup_steps=1, residual=1, error_feedback=True,
            compress_func=lambda layer, step: (
                CompressType.WARMUP if step < 1
                else (first_double if layer == 0 else rest)
            ),
        )

    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = FluxPipeline(
        params, None,
        fcfg(par, plan(CompressType.IDENTITY, CompressType.BINARY)), mesh,
    )(txt, pooled, key, decode=False)
    out_full = FluxPipeline(
        params, None,
        fcfg(par, plan(CompressType.BINARY, CompressType.BINARY)), mesh,
    )(txt, pooled, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    assert err_mixed < err_full, (err_mixed, err_full)


# ---------------------------------------------------------------------------
# SD3: per-layer plans over the joint-block stack
# ---------------------------------------------------------------------------


def test_sd3_per_layer_plan():
    from compactfusion_tpu.models.sd3 import init_sd3, sd3_tiny
    from compactfusion_tpu.pipelines.sd3 import SD3Pipeline, SD3PipelineConfig

    mcfg = sd3_tiny()
    params = spice_params(init_sd3(jax.random.PRNGKey(11), mcfg))
    rng = np.random.default_rng(12)
    txt = jnp.asarray(
        rng.standard_normal((2, 1, 8, mcfg.text_dim)), jnp.float32
    )
    pooled = jnp.asarray(
        rng.standard_normal((2, 1, mcfg.pooled_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(13)

    def scfg(parallel, compact=CompactConfig()):
        return SD3PipelineConfig(
            model=mcfg, vae=None, parallel=parallel, compact=compact,
            num_steps=4, height=64, width=128,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = SD3Pipeline(params, None, scfg(ParallelConfig()), mesh1)(
        txt, pooled, key, decode=False
    )

    def plan(first, rest):
        return CompactConfig(
            enabled=True, compress_type=CompressType.BINARY,
            warmup_steps=1, residual=1, error_feedback=True,
            compress_func=lambda layer, step: (
                CompressType.WARMUP if step < 1
                else (first if layer == 0 else rest)
            ),
        )

    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = SD3Pipeline(
        params, None, scfg(par, plan(CompressType.IDENTITY, CompressType.BINARY)),
        mesh,
    )(txt, pooled, key, decode=False)
    out_full = SD3Pipeline(
        params, None, scfg(par, plan(CompressType.BINARY, CompressType.BINARY)),
        mesh,
    )(txt, pooled, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    assert err_mixed < err_full, (err_mixed, err_full)


# ---------------------------------------------------------------------------
# CogVideoX + HunyuanVideo: per-layer plans on the video pipelines
# ---------------------------------------------------------------------------


def _mixed_plan(first, rest, warmup=1):
    return CompactConfig(
        enabled=True, compress_type=CompressType.BINARY,
        warmup_steps=warmup, residual=1, error_feedback=True,
        compress_func=lambda layer, step: (
            CompressType.WARMUP if step < warmup
            else (first if layer == 0 else rest)
        ),
    )


def test_cogvideox_per_layer_plan():
    from compactfusion_tpu.models.cogvideox import cogvideox_tiny, init_cogvideox
    from compactfusion_tpu.pipelines.cogvideox import (
        CogVideoXPipeline,
        CogVideoXPipelineConfig,
    )

    mcfg = cogvideox_tiny()
    params = spice_params(init_cogvideox(jax.random.PRNGKey(21), mcfg))
    rng = np.random.default_rng(22)
    txt = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, mcfg.text_dim)),
                  np.zeros((1, 8, mcfg.text_dim))]),
        jnp.float32,
    )
    key = jax.random.PRNGKey(23)

    def ccfg(parallel, compact=CompactConfig()):
        return CogVideoXPipelineConfig(
            model=mcfg, parallel=parallel, compact=compact,
            num_steps=4, height=64, width=64, num_frames=5,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = CogVideoXPipeline(params, ccfg(ParallelConfig()), mesh1)(
        txt, key, decode=False
    )

    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = CogVideoXPipeline(
        params, ccfg(par, _mixed_plan(CompressType.IDENTITY, CompressType.BINARY)),
        mesh,
    )(txt, key, decode=False)
    out_full = CogVideoXPipeline(
        params, ccfg(par, _mixed_plan(CompressType.BINARY, CompressType.BINARY)),
        mesh,
    )(txt, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    assert err_mixed < err_full, (err_mixed, err_full)


def test_hunyuanvideo_per_layer_plan():
    from compactfusion_tpu.models.hunyuanvideo import (
        hunyuanvideo_tiny,
        init_hunyuanvideo,
    )
    from compactfusion_tpu.pipelines.hunyuanvideo import (
        HunyuanVideoPipeline,
        HunyuanVideoPipelineConfig,
    )

    mcfg = hunyuanvideo_tiny()
    params = spice_params(init_hunyuanvideo(jax.random.PRNGKey(31), mcfg))
    rng = np.random.default_rng(32)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    key = jax.random.PRNGKey(33)

    def hcfg(parallel, compact=CompactConfig()):
        return HunyuanVideoPipelineConfig(
            model=mcfg, parallel=parallel, compact=compact,
            num_steps=4, height=64, width=128, num_frames=5,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = HunyuanVideoPipeline(params, hcfg(ParallelConfig()), mesh1)(
        txt, key, decode=False
    )

    # double layer 0 lossless, everything else (incl. singles) binary
    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = HunyuanVideoPipeline(
        params, hcfg(par, _mixed_plan(CompressType.IDENTITY, CompressType.BINARY)),
        mesh,
    )(txt, key, decode=False)
    out_full = HunyuanVideoPipeline(
        params, hcfg(par, _mixed_plan(CompressType.BINARY, CompressType.BINARY)),
        mesh,
    )(txt, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    assert err_mixed < err_full, (err_mixed, err_full)


# ---------------------------------------------------------------------------
# ConsisID: per-layer plans with interval identity injection in the scan
# ---------------------------------------------------------------------------


def test_consisid_per_layer_plan():
    from compactfusion_tpu.models.consisid import consisid_tiny, init_consisid
    from compactfusion_tpu.pipelines.consisid import (
        ConsisIDPipeline,
        ConsisIDPipelineConfig,
    )

    mcfg = consisid_tiny()
    params = spice_params(init_consisid(jax.random.PRNGKey(51), mcfg))
    rng = np.random.default_rng(52)
    txt = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, mcfg.text_dim)),
                  np.zeros((1, 8, mcfg.text_dim))]),
        jnp.float32,
    )
    ids = jnp.asarray(
        rng.standard_normal((1, 5, mcfg.id_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(53)

    def ccfg(parallel, compact=CompactConfig()):
        return ConsisIDPipelineConfig(
            model=mcfg, parallel=parallel, compact=compact,
            num_steps=4, height=64, width=64, num_frames=5,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = ConsisIDPipeline(params, ccfg(ParallelConfig()), mesh1)(
        txt, key, id_states=ids, decode=False
    )

    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = ConsisIDPipeline(
        params, ccfg(par, _mixed_plan(CompressType.IDENTITY, CompressType.BINARY)),
        mesh,
    )(txt, key, id_states=ids, decode=False)
    out_full = ConsisIDPipeline(
        params, ccfg(par, _mixed_plan(CompressType.BINARY, CompressType.BINARY)),
        mesh,
    )(txt, key, id_states=ids, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    assert err_mixed < err_full, (err_mixed, err_full)


# ---------------------------------------------------------------------------
# Step-Video: per-layer plans on the full-TP video backbone
# ---------------------------------------------------------------------------


def test_stepvideo_per_layer_plan():
    from compactfusion_tpu.models.stepvideo import init_stepvideo, stepvideo_tiny
    from compactfusion_tpu.pipelines.stepvideo import (
        StepVideoPipeline,
        StepVideoPipelineConfig,
    )

    mcfg = stepvideo_tiny()
    params = spice_params(init_stepvideo(jax.random.PRNGKey(61), mcfg))
    rng = np.random.default_rng(62)
    txt = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, mcfg.text_dim)),
                  np.zeros((1, 8, mcfg.text_dim))]),
        jnp.float32,
    )
    key = jax.random.PRNGKey(63)

    def scfg(parallel, compact=CompactConfig()):
        return StepVideoPipelineConfig(
            model=mcfg, parallel=parallel, compact=compact,
            num_steps=4, height=4 * 32, width=4 * 32, num_frames=17,
        )

    # reference = the SAME ring topology with an all-lossless plan, so the
    # measured error is purely compression-induced (the SP-vs-single-device
    # bf16/merge noise otherwise dominates this tiny model's binary error)
    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    ref = StepVideoPipeline(
        params, scfg(par, _mixed_plan(CompressType.IDENTITY, CompressType.IDENTITY)),
        mesh,
    )(txt, key)

    out_mixed = StepVideoPipeline(
        params, scfg(par, _mixed_plan(CompressType.IDENTITY, CompressType.BINARY)),
        mesh,
    )(txt, key)
    out_full = StepVideoPipeline(
        params, scfg(par, _mixed_plan(CompressType.BINARY, CompressType.BINARY)),
        mesh,
    )(txt, key)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    # fewer compressed layers should not be MUCH worse than all-compressed;
    # strict ordering is not guaranteed at tiny random-init scale (EF error
    # interactions flip it within ~5% depending on the denoise trajectory),
    # so assert the same-magnitude bound instead
    assert err_mixed < err_full * 1.5, (err_mixed, err_full)


# ---------------------------------------------------------------------------
# HunyuanDiT: per-layer plans across the down/up skip halves
# ---------------------------------------------------------------------------


def test_hunyuandit_per_layer_plan():
    from compactfusion_tpu.models.hunyuandit import (
        hunyuandit_tiny,
        init_hunyuandit,
    )
    from compactfusion_tpu.pipelines.hunyuandit import (
        HunyuanDiTPipeline,
        HunyuanDiTPipelineConfig,
    )

    mcfg = hunyuandit_tiny()
    params = spice_params(init_hunyuandit(jax.random.PRNGKey(41), mcfg))
    rng = np.random.default_rng(42)
    text = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, mcfg.text_dim)),
                  np.zeros((1, 8, mcfg.text_dim))]),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    key = jax.random.PRNGKey(43)

    def hcfg(parallel, compact=CompactConfig()):
        return HunyuanDiTPipelineConfig(
            model=mcfg, parallel=parallel, compact=compact,
            num_steps=4, height=64, width=64,
        )

    mesh1 = make_mesh(ParallelConfig(), devices=jax.devices()[:1])
    ref = HunyuanDiTPipeline(params, None, hcfg(ParallelConfig()), mesh1)(
        text, mask, key, decode=False
    )

    def plan(head, last):
        # layers 0..depth-2 get ``head``, the final up layer gets ``last``
        # — the boundary sits INSIDE the up stack (layers 2,3 at depth=4),
        # so the up stack itself must split into two scan segments
        return CompactConfig(
            enabled=True, compress_type=CompressType.BINARY,
            warmup_steps=1, residual=1, error_feedback=True,
            compress_func=lambda layer, step: (
                CompressType.WARMUP if step < 1
                else (last if layer == mcfg.depth - 1 else head)
            ),
        )

    par = ParallelConfig(ring_degree=4)
    mesh = make_mesh(par)
    out_mixed = HunyuanDiTPipeline(
        params, None,
        hcfg(par, plan(CompressType.IDENTITY, CompressType.BINARY)), mesh,
    )(text, mask, key, decode=False)
    out_full = HunyuanDiTPipeline(
        params, None,
        hcfg(par, plan(CompressType.BINARY, CompressType.BINARY)), mesh,
    )(text, mask, key, decode=False)

    err_mixed = rel_err(out_mixed, ref)
    err_full = rel_err(out_full, ref)
    assert np.isfinite(np.asarray(out_mixed, np.float32)).all()
    assert err_mixed > 1e-6
    # the plans differ at layers 0..2, so the outputs must too
    assert rel_err(out_mixed, out_full) > 1e-6
    # compressing 1/4 layers must hurt visibly less than compressing 4/4
    # (a single-layer difference is noise-level under EF dynamics — this
    # 3-layer margin is what makes the ordering deterministic)
    assert err_mixed < err_full, (err_mixed, err_full)
