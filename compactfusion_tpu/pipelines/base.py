"""Shared pipeline machinery.

The reference implements the distributed denoise loop per pipeline class
(``xfuser/model_executor/pipelines/base_pipeline.py`` + per-model
``_sync_pipeline``/``_async_pipeline``); here every pipeline is a single SPMD
program: latent tokens sharded over (dp, cfg, ring, ulysses), the denoise loop
a ``lax.scan`` (two scans when the compression schedule switches from warmup
to steady state), and CFG guidance either batch-doubled locally (cfg_degree=1)
or exchanged over the cfg mesh axis (cfg_degree=2 — the reference's
``_process_cfg_split_batch``, ``base_pipeline.py:525-552``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.parallel.mesh import (
    AXIS_CFG,
    AXIS_DP,
    AXIS_RING,
    AXIS_ULYSSES,
)

#: latent token sharding: (batch over dp, tokens over ring x ulysses)
LATENT_SPEC = P(AXIS_DP, (AXIS_RING, AXIS_ULYSSES), None)
#: replicated text conditioning with a leading (cond, uncond) axis over cfg
TEXT_SPEC = P(AXIS_CFG, AXIS_DP)


def seq_shard_info(ulysses_size: int, ring_size: int):
    """(shard_index, num_shards) for the (ring, ulysses) token sharding."""
    r = lax.axis_index(AXIS_RING)
    u = lax.axis_index(AXIS_ULYSSES)
    return r * ulysses_size + u, ring_size * ulysses_size


def slice_local_tokens(full: jax.Array, ulysses_size: int, ring_size: int, axis=0):
    """Slice this device's token shard out of a replicated (S, ...) table."""
    idx, n = seq_shard_info(ulysses_size, ring_size)
    local = full.shape[axis] // n
    return lax.dynamic_slice_in_dim(full, idx * local, local, axis=axis)


def cfg_combine(eps: jax.Array, guidance_scale: float, cfg_degree: int) -> jax.Array:
    """Classifier-free guidance combine.

    cfg_degree == 2: this device computed either the cond (cfg rank 0) or the
    uncond (rank 1) prediction; exchange over the cfg axis and form
    ``uncond + g * (cond - uncond)`` on both ranks (keeps latents replicated
    over cfg, like the reference's split-batch mode).

    cfg_degree == 1 with a leading 2-batch: local split combine.
    """
    if cfg_degree == 2:
        other = lax.ppermute(eps, AXIS_CFG, [(0, 1), (1, 0)])
        is_cond = lax.axis_index(AXIS_CFG) == 0
        cond = jnp.where(is_cond, eps, other)
        uncond = jnp.where(is_cond, other, eps)
        return uncond + guidance_scale * (cond - uncond)
    cond, uncond = jnp.split(eps, 2, axis=0)
    return uncond + guidance_scale * (cond - uncond)


def prepare_latents(
    key: jax.Array, batch: int, tokens: int, token_dim: int, dtype=jnp.bfloat16
) -> jax.Array:
    return jax.random.normal(key, (batch, tokens, token_dim), jnp.float32).astype(dtype)
