"""HunyuanDiT backbone + pipeline tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.hunyuandit import (
    hunyuandit_positions,
    hunyuandit_forward,
    hunyuandit_tiny,
    init_hunyuandit,
)
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.hunyuandit import (
    HunyuanDiTPipeline,
    HunyuanDiTPipelineConfig,
)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


from tests.helpers import spice_params


@pytest.fixture(scope="module")
def tiny():
    mcfg = hunyuandit_tiny()
    return mcfg, spice_params(init_hunyuandit(jax.random.PRNGKey(0), mcfg))


def test_forward_shapes(tiny):
    mcfg, params = tiny
    b, s, s_txt = 2, 16, 8
    x = jnp.ones((b, s, mcfg.patch**2 * mcfg.in_channels), mcfg.dtype)
    text = jnp.ones((b, s_txt, mcfg.text_dim), mcfg.dtype)
    t = jnp.full((b,), 500.0)
    rope = cm.rope_frequencies(hunyuandit_positions(4, 4), mcfg.rope_axes)
    out, sd, su = jax.jit(
        lambda p, x, t, c: hunyuandit_forward(p, x, t, c, mcfg, rope=rope)
    )(params, x, t, text)
    assert out.shape == (b, s, mcfg.patch**2 * mcfg.out_channels)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def _pipe_cfg(mcfg, parallel, compact=CompactConfig(), steps=4):
    return HunyuanDiTPipelineConfig(
        model=mcfg, parallel=parallel, compact=compact,
        num_steps=steps, height=64, width=64,  # 16 tokens
    )


def _text(mcfg, b=1, s=8, seed=1):
    rng = np.random.default_rng(seed)
    text = jnp.asarray(
        np.stack(
            [rng.standard_normal((b, s, mcfg.text_dim)), np.zeros((b, s, mcfg.text_dim))]
        ),
        jnp.float32,
    )
    return text, jnp.ones((2, b, s), bool)


def test_hunyuan_sharded_matches_single(tiny):
    mcfg, params = tiny
    text, mask = _text(mcfg)
    key = jax.random.PRNGKey(2)
    c1 = _pipe_cfg(mcfg, ParallelConfig())
    ref = HunyuanDiTPipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(text, mask, key, decode=False)
    cN = _pipe_cfg(mcfg, ParallelConfig(ulysses_degree=2, ring_degree=2, cfg_degree=2))
    out = HunyuanDiTPipeline(params, None, cN, make_mesh(cN.parallel))(
        text, mask, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_hunyuan_compact(tiny):
    mcfg, params = tiny
    text, mask = _text(mcfg)
    key = jax.random.PRNGKey(3)
    c1 = _pipe_cfg(mcfg, ParallelConfig(), steps=6)
    ref = HunyuanDiTPipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(text, mask, key, decode=False)
    compact = CompactConfig(
        enabled=True, compress_type=CompressType.INT2,
        warmup_steps=2, residual=1, error_feedback=True,
    )
    par = ParallelConfig(ring_degree=4)
    cC = _pipe_cfg(mcfg, par, compact=compact, steps=6)
    out = HunyuanDiTPipeline(params, None, cC, make_mesh(par))(
        text, mask, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-5, "compact pipeline identical to lossless - test blind"
    assert err < 0.25, f"compact HunyuanDiT diverged: {err}"


def test_hunyuan_pipefusion_with_skip_channel(tiny):
    """pp=2 stage-sharded down/up blocks with mirror-stage skip exchange
    (the reference's PP skip channel) must be exact."""
    mcfg, params = tiny
    text, mask = _text(mcfg)
    key = jax.random.PRNGKey(4)
    c1 = _pipe_cfg(mcfg, ParallelConfig())
    ref = HunyuanDiTPipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(text, mask, key, decode=False)
    cP = _pipe_cfg(mcfg, ParallelConfig(pp_degree=2, ring_degree=2))
    out = HunyuanDiTPipeline(params, None, cP, make_mesh(cP.parallel))(
        text, mask, key, decode=False
    )
    assert rel_err(out, ref) < 2e-2


def test_hunyuandit_patch_pipelined_pipefusion(tiny):
    """pp=2 x M=4 async patch pipeline with the skip train (reference
    pipeline_hunyuandit.py:552-825): stale-KV patches approximate the sync
    result; must stay close and be sensitive."""
    import dataclasses as _dc

    import numpy as np

    from compactfusion_tpu.config import ParallelConfig
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.hunyuandit import (
        HunyuanDiTPipeline,
        HunyuanDiTPipelineConfig,
    )
    from tests.helpers import rel_err

    mcfg, params = tiny
    rng = np.random.default_rng(5)
    text = jnp.asarray(
        np.stack(
            [rng.standard_normal((1, 8, mcfg.text_dim)),
             np.zeros((1, 8, mcfg.text_dim))]
        ),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    key = jax.random.PRNGKey(11)
    steps = 6

    def cfg(parallel, **kw):
        return HunyuanDiTPipelineConfig(
            model=mcfg, parallel=parallel, num_steps=steps,
            height=8 * 16, width=8 * 16, **kw,  # 8x8 = 64 tokens
        )

    c1 = cfg(ParallelConfig())
    ref = HunyuanDiTPipeline(
        params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(text, mask, key, decode=False)

    cP = _dc.replace(
        cfg(ParallelConfig(pp_degree=2)),
        num_pipeline_patch=4,
        runtime_warmup_steps=2,
    )
    out = HunyuanDiTPipeline(params, None, cP, make_mesh(cP.parallel))(
        text, mask, key, decode=False
    )
    err = rel_err(out, ref)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert err > 1e-6, "patch pipeline identical to sync - stale KV not exercised"
    assert err < 0.3, f"patch-pipelined HunyuanDiT diverged: {err}"
