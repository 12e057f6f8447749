"""Early config-time validation of degree/geometry factorizations.

The reference rejects invalid degree products at config creation
(``xfuser/config/config.py:187-234``); these tests pin that invalid
factorizations fail at ``*PipelineConfig`` construction with a readable
message — not as a raw XLA ``ValueError`` deep inside jit (the failure mode
the round-3 latency sweep hit on its ``u8`` row).
"""

import jax.numpy as jnp
import pytest

from compactfusion_tpu.config import (
    ParallelConfig,
    validate_parallel_geometry,
)
from compactfusion_tpu.models.flux import FluxConfig
from compactfusion_tpu.models.pixart import PixArtConfig
from compactfusion_tpu.pipelines.flux import FluxPipelineConfig
from compactfusion_tpu.pipelines.latte import LattePipelineConfig
from compactfusion_tpu.pipelines.pixart import PixArtPipelineConfig


def _mcfg(heads=4, depth=4):
    return PixArtConfig(
        dim=64 * heads // 4, depth=depth, heads=heads, text_dim=32,
        sample_size=8, dtype=jnp.float32,
    )


def test_heads_not_divisible_by_ulysses():
    with pytest.raises(ValueError, match="heads.*divisible.*ulysses"):
        PixArtPipelineConfig(
            model=_mcfg(heads=4), vae=None,
            parallel=ParallelConfig(ulysses_degree=8),
            height=64, width=64,
        )


def test_tokens_not_divisible_by_sp():
    # 64x64 image, patch 2 -> 16 tokens; ring*ulysses = 4*4 = 16 ok, 32 not
    with pytest.raises(ValueError, match="tokens.*divisible.*sp_degree"):
        PixArtPipelineConfig(
            model=_mcfg(heads=32), vae=None,
            parallel=ParallelConfig(ring_degree=8, ulysses_degree=4),
            height=64, width=64,
        )


def test_depth_not_divisible_by_pp():
    with pytest.raises(ValueError, match="depth.*pp_degree"):
        PixArtPipelineConfig(
            model=_mcfg(depth=5), vae=None,
            parallel=ParallelConfig(pp_degree=2),
            height=64, width=64,
        )


def test_flux_patch_pp_needs_deep_virtual_pipeline():
    mcfg = FluxConfig(
        dim=128, double_layers=2, single_layers=4, heads=4,
        text_dim=32, pooled_dim=16, axes_dim=(8, 12, 12),
        dtype=jnp.float32,
    )
    with pytest.raises(ValueError, match="num_pipeline_patch >= 2"):
        FluxPipelineConfig(
            model=mcfg, vae=None,
            parallel=ParallelConfig(pp_degree=2),
            num_pipeline_patch=2,  # needs >= 2*pp = 4
            height=256, width=256,
        )
    # M = 2*pp passes
    FluxPipelineConfig(
        model=mcfg, vae=None,
        parallel=ParallelConfig(pp_degree=2),
        num_pipeline_patch=4, height=256, width=256,
    )


def test_latte_frames_vs_sp():
    from compactfusion_tpu.models.latte import LatteConfig

    mcfg = LatteConfig(dim=64, num_pairs=1, heads=4, text_dim=32,
                       dtype=jnp.float32)
    with pytest.raises(ValueError, match="num_frames.*divisible"):
        LattePipelineConfig(
            model=mcfg, parallel=ParallelConfig(ring_degree=2, ulysses_degree=2),
            height=64, width=64, num_frames=6,
        )


def test_valid_configs_pass():
    PixArtPipelineConfig(
        model=_mcfg(heads=8, depth=4), vae=None,
        parallel=ParallelConfig(ring_degree=2, ulysses_degree=2, pp_degree=2),
        height=64, width=64,
    )
    validate_parallel_geometry(
        ParallelConfig(ulysses_degree=2, tp_degree=2),
        heads=8, tokens=64, depth=4, tp_shards_heads=True,
    )
    with pytest.raises(ValueError, match="ulysses_degree \\(2\\) \\* tp_degree \\(4\\)"):
        validate_parallel_geometry(
            ParallelConfig(ulysses_degree=2, tp_degree=4),
            heads=12, tokens=64, tp_shards_heads=True,
        )
