"""Latte pipeline e2e test (tiny config, sharded parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models.latte import init_latte, latte_tiny
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.latte import LattePipeline, LattePipelineConfig
from tests.helpers import rel_err, spice_params


def test_latte_pipeline_sharded_matches_single():
    mcfg = latte_tiny()
    params = spice_params(init_latte(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(1)
    text = jnp.asarray(
        np.stack(
            [rng.standard_normal((1, 8, mcfg.text_dim)), np.zeros((1, 8, mcfg.text_dim))]
        ),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    key = jax.random.PRNGKey(2)

    def cfg_for(par):
        return LattePipelineConfig(
            model=mcfg, parallel=par, num_steps=4, guidance_scale=7.5,
            height=64, width=64, num_frames=8,
        )

    c1 = cfg_for(ParallelConfig())
    ref = LattePipeline(params, c1, make_mesh(c1.parallel, devices=jax.devices()[:1]))(
        text, mask, key
    )
    cN = cfg_for(ParallelConfig(ulysses_degree=2, ring_degree=2, cfg_degree=2))
    out = LattePipeline(params, cN, make_mesh(cN.parallel))(text, mask, key)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert rel_err(out, ref) < 2e-2
