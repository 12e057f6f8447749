"""TeaCache / First-Block-Cache: skip transformer stacks on small step deltas.

Reference semantics: ``CachedTransformerBlocks`` / ``FBCached`` / ``TeaCached``
(``xfuser/model_executor/cache/utils.py:76-249``):

  * FBCache: run the first transformer block; if the relative-L1 change of its
    output vs the previous denoise step is under a threshold, skip every
    remaining block and replay the cached residual (final - first) from the
    last fully-computed step.
  * TeaCache: probe the timestep-modulated input of the first block instead,
    pass the relative change through a polynomial rescale, and accumulate it
    across steps — skip while the accumulator stays under the threshold,
    reset it whenever a full run happens.
  * Under sequence parallelism the probe is all-reduced over the SP group
    (``cache/utils.py:110-117``) so every rank takes the same branch.

Here the decision is a scalar ``lax.cond`` inside the denoise scan and the
cache (previous probe, residual, accumulator) is an explicit state pytree.
Incompatible with CompactFusion EF compression (skipped steps would desync
the ring base caches) — pipelines assert the combination away, as does the
reference in practice.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


@dataclasses.dataclass(frozen=True)
class CacheAccelConfig:
    mode: str = "none"  # "none" | "fbcache" | "teacache"
    threshold: float = 0.12
    #: polynomial rescale coefficients (highest order first), TeaCache only.
    #: Default: identity.  FLUX uses the fitted degree-4 polynomial below.
    poly: Tuple[float, ...] = (1.0, 0.0)
    #: mesh axes to psum the probe over (sp axes) so all ranks agree.
    sp_axes: Tuple[str, ...] = ()


#: TeaCache's fitted degree-4 rescale polynomial for FLUX (highest order
#: first) — maps the relative-L1 probe change to an accumulated skip signal
#: (reference ``cache/utils.py:22`` flux_coef).
FLUX_TEACACHE_POLY: Tuple[float, ...] = (
    498.651651,
    -283.781631,
    55.8554382,
    -3.82021401,
    0.264230861,
)


class CacheAccelState(NamedTuple):
    prev_probe: jax.Array  # previous probe tensor
    residual: jax.Array  # cached (final - first_block_out) residual
    accum: jax.Array  # () teacache accumulator
    has_prev: jax.Array  # () int32
    skips: jax.Array  # () int32 — number of skipped steps (observability)


def init_cache_state(probe_shape, residual_shape, dtype) -> CacheAccelState:
    return CacheAccelState(
        prev_probe=jnp.zeros(probe_shape, dtype),
        residual=jnp.zeros(residual_shape, dtype),
        accum=jnp.zeros((), jnp.float32),
        has_prev=jnp.zeros((), jnp.int32),
        skips=jnp.zeros((), jnp.int32),
    )


def _rel_l1(cur, prev, sp_axes) -> jax.Array:
    num = jnp.sum(jnp.abs(cur.astype(jnp.float32) - prev.astype(jnp.float32)))
    den = jnp.sum(jnp.abs(prev.astype(jnp.float32)))
    for ax in sp_axes:
        num = lax.psum(num, ax)
        den = lax.psum(den, ax)
    return num / jnp.maximum(den, 1e-8)


def should_skip(
    cfg: CacheAccelConfig,
    state: CacheAccelState,
    probe: jax.Array,
    force_compute=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (skip: bool scalar, new_accum).

    ``probe`` is the FIRST-BLOCK RESIDUAL block0(x) - x (fbcache — the
    reference compares residuals, not raw block outputs, whose step-to-step
    change is far smaller at the same threshold) or the modulated first-block
    input (teacache).  ``force_compute``: scalar bool forcing a full run —
    pass ``i == num_steps - 1`` from the denoise loop (the reference's
    TeaCache ``reset_mask`` guarantees the final, quality-critical step
    always computes; applied to both modes here).
    """
    rel = _rel_l1(probe, state.prev_probe, cfg.sp_axes)
    if cfg.mode == "teacache":
        rescaled = jnp.polyval(jnp.asarray(cfg.poly, jnp.float32), rel)
        accum = state.accum + rescaled
        skip = (state.has_prev > 0) & (accum < cfg.threshold)
        if force_compute is not None:
            skip = skip & jnp.logical_not(force_compute)
        accum = jnp.where(skip, accum, 0.0)
        return skip, accum
    # fbcache
    skip = (state.has_prev > 0) & (rel < cfg.threshold)
    if force_compute is not None:
        skip = skip & jnp.logical_not(force_compute)
    return skip, state.accum


def next_probe(cfg: CacheAccelConfig, state: CacheAccelState, probe, skip):
    """The prev_probe to carry: FBCache pins it across skip runs (reference
    updates ``modulated_inputs`` only on full-compute steps, so slow drift
    accumulates against a fixed reference and eventually forces a recompute);
    TeaCache refreshes it every step (its accumulator carries the history)."""
    if cfg.mode == "teacache":
        return probe.astype(state.prev_probe.dtype)
    return jnp.where(skip, state.prev_probe, probe.astype(state.prev_probe.dtype))
