"""Flow-match Euler discrete scheduler (FLUX / SD3).

Reference: the wrapper at ``xfuser/model_executor/schedulers/
scheduling_flow_match_euler_discrete.py:17-127`` around diffusers
``FlowMatchEulerDiscreteScheduler``.  Pure-array version: the schedule is a
static table, ``step`` is one fused ``x + (σ_{i+1} − σ_i)·v`` — trivially
scannable (the reference's patch-mode step gating lives in the PipeFusion
loop, not here).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class FlowMatchSchedule(NamedTuple):
    sigmas: jax.Array  # (N+1,) fp32, sigma_N = 0
    timesteps: jax.Array  # (N,) fp32 — model conditioning values (sigma*1000)


def flow_match_schedule(
    num_steps: int,
    shift: float = 3.0,
    use_dynamic_shifting: bool = False,
    mu: Optional[float] = None,
    num_train_timesteps: int = 1000,
    final_sigma: Optional[float] = None,
) -> FlowMatchSchedule:
    """Build the sigma table.

    ``shift`` is the static SD3-style time shift; FLUX uses dynamic shifting
    where ``mu`` is resolution-dependent (computed by
    :func:`calculate_shift`).

    ``final_sigma``: last PRE-SHIFT sigma of the table.  The default
    ``1/num_train_timesteps`` is the diffusers FlowMatchEulerDiscrete
    default that SD3 inherits; the FLUX pipeline overrides its scheduler
    with ``sigmas = linspace(1.0, 1/num_inference_steps, N)`` (reference
    ``pipeline_flux.py:275``) and HunyuanVideo/Step-Video build
    ``linspace(1, 0, N+1)[:-1]`` (same endpoint) — those callers must pass
    ``1.0 / num_steps`` or every interior sigma deviates from the reference
    schedule.
    """
    if final_sigma is None:
        final_sigma = 1.0 / num_train_timesteps
    sigmas = jnp.linspace(1.0, final_sigma, num_steps, dtype=jnp.float32)
    if use_dynamic_shifting:
        assert mu is not None, "dynamic shifting requires mu"
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    timesteps = sigmas * num_train_timesteps
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])
    return FlowMatchSchedule(sigmas=sigmas, timesteps=timesteps)


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """FLUX resolution-dependent mu (diffusers ``calculate_shift``)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def flow_match_step(
    sched: FlowMatchSchedule, i: jax.Array, sample: jax.Array, velocity: jax.Array
) -> jax.Array:
    """Euler step: x <- x + (sigma_{i+1} - sigma_i) * v.  fp32 state math."""
    sigma = sched.sigmas[i]
    sigma_next = sched.sigmas[i + 1]
    x32 = sample.astype(jnp.float32)
    out = x32 + (sigma_next - sigma) * velocity.astype(jnp.float32)
    return out.astype(sample.dtype)


def flow_match_scale_noise(
    sched: FlowMatchSchedule, i: jax.Array, sample: jax.Array, noise: jax.Array
) -> jax.Array:
    """Forward process at step i (img2img entry): x = (1-σ)·x0 + σ·ε."""
    sigma = sched.sigmas[i]
    return ((1.0 - sigma) * sample.astype(jnp.float32) + sigma * noise).astype(
        sample.dtype
    )
