"""Tensor-parallel FFN tests.

Analog of reference ``tests/layers/feedforward_test.py:12-40`` (TP-wrapped
FeedForward vs the serial module) plus full-pipeline TP parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.pixart import init_pixart, pixart_tiny
from compactfusion_tpu.models.vae import tiny_vae
from compactfusion_tpu.parallel.mesh import AXIS_TP, make_mesh
from compactfusion_tpu.parallel.tp import tp_param_specs
from compactfusion_tpu.pipelines.pixart import PixArtPipeline, PixArtPipelineConfig


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_tp_ffn_matches_serial():
    tp = 4
    d, hidden = 64, 256
    key = jax.random.PRNGKey(0)
    params = cm.init_ffn(key, d, hidden, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, d), jnp.float32)
    ref = cm.ffn(params, x)

    mesh = make_mesh(ParallelConfig(tp_degree=tp))
    specs = {
        "fc1": {"w": P(None, AXIS_TP), "b": P(AXIS_TP)},
        "fc2": {"w": P(AXIS_TP, None), "b": P()},
    }
    f = jax.shard_map(
        lambda p, x: cm.ffn(p, x, tp_axis=AXIS_TP),
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    out = f(params, x)
    assert rel_err(out, ref) < 1e-5


def test_tp_param_specs_structure():
    params = init_pixart(jax.random.PRNGKey(0), pixart_tiny())
    specs = tp_param_specs(params)
    assert specs["blocks"]["ffn"]["fc1"]["w"] == P(None, None, AXIS_TP)
    assert specs["blocks"]["ffn"]["fc2"]["w"] == P(None, AXIS_TP, None)
    assert specs["blocks"]["attn_qkv"]["w"] == P()
    assert specs["patch_embed"]["w"] == P()


def test_tp_pipeline_matches_single_device():
    mcfg = pixart_tiny()
    params = init_pixart(jax.random.PRNGKey(0), mcfg)
    vcfg = tiny_vae()

    def cfg_for(parallel):
        return PixArtPipelineConfig(
            model=mcfg, vae=vcfg, parallel=parallel, num_steps=4,
            guidance_scale=4.5, height=64, width=64,
        )

    rng = np.random.default_rng(2)
    text = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, 32)), np.zeros((1, 8, 32))]),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    key = jax.random.PRNGKey(3)

    c1 = cfg_for(ParallelConfig())
    ref = PixArtPipeline(params, None, c1, make_mesh(c1.parallel, devices=jax.devices()[:1]))(
        text, mask, key, decode=False
    )

    cN = cfg_for(ParallelConfig(tp_degree=2, ring_degree=2, ulysses_degree=2))
    out = PixArtPipeline(params, None, cN, make_mesh(cN.parallel))(
        text, mask, key, decode=False
    )
    assert rel_err(out, ref) < 5e-3


def test_pp_specs_shard_only_top_level_stacks():
    """model_param_specs(pp=True) must shard ONLY the top-level block
    stacks: nested stacks reusing a name (HunyuanVideo's token-refiner
    ``refiner.blocks``) are not pipeline stages and stay replicated."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from compactfusion_tpu.parallel.mesh import AXIS_PP
    from compactfusion_tpu.parallel.tp import model_param_specs

    params = {
        "double_blocks": {"attn": {"w": np.zeros((4, 8, 8))}},
        "refiner": {"blocks": {"attn": {"w": np.zeros((2, 8, 8))}}},
        "perceiver": {"w": np.zeros((2, 8, 8))},
        "x_embedder": {"w": np.zeros((8, 8))},
    }
    specs = model_param_specs(params, pp=True)
    assert specs["double_blocks"]["attn"]["w"] == P(AXIS_PP)
    assert specs["refiner"]["blocks"]["attn"]["w"] == P()
    assert specs["perceiver"]["w"] == P()
    assert specs["x_embedder"]["w"] == P()
