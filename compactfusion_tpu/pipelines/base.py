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


def dynamic_cfg_table(guidance_scale: float, timesteps, num_steps: int):
    """Per-step CogVideoX dynamic-CFG scales (reference
    ``pipeline_cogvideox.py:303-306``): g(t) = 1 + g0 * (1 - cos(pi *
    ((n - t)/n)^5)) / 2 with t the RAW timestep value.  Computed on the HOST
    in float64 exactly like the reference (``math.cos`` of ``t.item()``) —
    the phase is up to ~1e7 rad, far beyond fp32 cosine precision — and
    indexed per step inside the scan."""
    import numpy as np

    ts = np.asarray(timesteps, np.float64)
    g = 1.0 + guidance_scale * (
        (1.0 - np.cos(np.pi * ((num_steps - ts) / num_steps) ** 5.0)) / 2.0
    )
    return jnp.asarray(g, jnp.float32)


def carry_ef_state(prev, fresh):
    """Pick the EF cache to enter a step segment with.

    Returns ``prev`` (the previous segment's final cache — EF must continue
    across the warmup/steady or per-layer-plan segment boundary) when it is
    structurally compatible with ``fresh``, else the freshly initialised
    cache.  Each attention-state family must be checked INDEPENDENTLY: with a
    per-layer ``compress_func`` only one family's plan may change method class
    at a boundary, so one family can be carryable while the other is not.
    """
    if (
        prev is not None
        and jax.tree_util.tree_leaves(prev)
        and jax.tree_util.tree_structure(prev)
        == jax.tree_util.tree_structure(fresh)
    ):
        return prev
    return fresh


def layer_plan_segments(plans, depth):
    """Resolve per-step per-layer plans to a COMMON layer segmentation.

    ``plans``: one per-layer method tuple per step.  Returns ((l0, l1), ...)
    layer ranges whose bounds are the union of every step's method-run
    boundaries — using one segmentation for all steps keeps the EF-cache
    pytree structure identical across step segments so caches carry through
    (the reference's per-(layer, src) dict does this for free,
    ``compact/ring.py:184-205``).
    """
    bounds = {0, depth}
    for plan in plans:
        for l in range(1, depth):
            if plan[l] != plan[l - 1]:
                bounds.add(l)
    edges = sorted(bounds)
    return tuple(zip(edges[:-1], edges[1:]))


def compact_layer_segments(compact, num_steps: int, depth: int):
    """Contiguous per-step method segments, allowing per-layer plans.

    Returns ``[(plan, [step, ...]), ...]`` where ``plan`` is ``None``
    (compression off), a single CompressType (layer-uniform step), or a tuple
    of ``(method, n_layers)`` layer segments (per-layer ``compress_func``
    plans, reference ``compact/utils.py:51``) sharing one segmentation across
    all steps.  Pipelines compile one scan per (step-segment, layer-segment).
    """
    if compact.enabled and compact.compress_func is not None:
        plans = [compact.layer_plan(s, depth) for s in range(num_steps)]
        seg_ranges = layer_plan_segments(plans, depth)
        schedule = [
            tuple((plan[l0], l1 - l0) for l0, l1 in seg_ranges)
            for plan in plans
        ]
    else:
        schedule = [
            compact.type_at(0, s) if compact.enabled else None
            for s in range(num_steps)
        ]
    return _group_by_method(schedule)


def _group_by_method(schedule):
    """[(method-or-plan, [step, ...]), ...]: contiguous equal-method runs.

    One grouping rule for single- and two-family pipelines — a change to
    segment-equality semantics must not let their step segmentations diverge.
    """
    segments = []
    for s, m in enumerate(schedule):
        if segments and segments[-1][0] == m:
            segments[-1][1].append(s)
        else:
            segments.append((m, [s]))
    return segments


def compact_two_family_segments(compact, num_steps: int, n_first: int, n_second: int):
    """``compact_layer_segments`` for models with TWO stacked block families
    (FLUX-style double/single stacks; layer index runs first family then
    second).  With ``compress_func`` set, each step's plan is a pair
    ``(first_segs, second_segs)`` of ``(method, n_layers)`` tuples — each
    family gets its own shared layer segmentation.
    """
    if compact.enabled and compact.compress_func is not None:
        total = n_first + n_second
        plans = [compact.layer_plan(s, total) for s in range(num_steps)]
        segs_a = layer_plan_segments([pl[:n_first] for pl in plans], n_first)
        segs_b = layer_plan_segments([pl[n_first:] for pl in plans], n_second)
        schedule = [
            (
                tuple((pl[l0], l1 - l0) for l0, l1 in segs_a),
                tuple((pl[n_first + l0], l1 - l0) for l0, l1 in segs_b),
            )
            for pl in plans
        ]
    else:
        schedule = [
            compact.type_at(0, s) if compact.enabled else None
            for s in range(num_steps)
        ]
    return _group_by_method(schedule)
