"""DDPM-family schedulers: DDIM, DDPM (ancestral), DPM-Solver++ 2M.

Reference: the wrappers in ``xfuser/model_executor/schedulers/`` around
diffusers DDIM / DDPM / DPMSolverMultistep (used by PixArt, Latte, HunyuanDiT,
CogVideoX).  All pure functions over a precomputed schedule table; the
multistep DPM state (previous x0 prediction) is an explicit NamedTuple
threaded through the denoise scan.

Epsilon-prediction convention with optional learned-variance outputs: the
model emits 2*C channels and the variance half is split off AND DISCARDED by
the caller (PixArt/DiT style).  ``ddpm_step`` always uses the fixed posterior
variance — the diffusers DDPMScheduler default (``variance_type
"fixed_small"``); learned-range variance is not implemented.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DDPMSchedule(NamedTuple):
    timesteps: jax.Array  # (N,) int32, descending
    alphas_cumprod: jax.Array  # (T,) fp32 over the full 1000 train steps
    final_alpha_cumprod: jax.Array  # () fp32


def ddpm_schedule(
    num_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = True,
    timestep_spacing: str = "leading",
    snr_shift_scale: Optional[float] = None,
    rescale_zero_snr: bool = False,
) -> DDPMSchedule:
    """``snr_shift_scale`` / ``rescale_zero_snr`` are the CogVideoX DDIM
    variants (shift the SNR of the forward process; force terminal SNR 0)."""
    if beta_schedule == "scaled_linear":
        betas = (
            jnp.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float32
            )
            ** 2
        )
    elif beta_schedule == "linear":
        betas = jnp.linspace(
            beta_start, beta_end, num_train_timesteps, dtype=jnp.float32
        )
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule}")
    alphas_cumprod = jnp.cumprod(1.0 - betas)

    if snr_shift_scale is not None:
        alphas_cumprod = alphas_cumprod / (
            snr_shift_scale + (1.0 - snr_shift_scale) * alphas_cumprod
        )
    if rescale_zero_snr:
        # Lin et al. 2023: shift+scale sqrt(alpha_bar) so the terminal step
        # has SNR exactly 0 while the first step is unchanged
        ab = jnp.sqrt(alphas_cumprod)
        ab0, abt = ab[0], ab[-1]
        ab = (ab - abt) * ab0 / (ab0 - abt)
        alphas_cumprod = jnp.clip(ab**2, 1e-12, 1.0)

    if timestep_spacing == "leading":
        step = num_train_timesteps // num_steps
        timesteps = (jnp.arange(num_steps) * step).round()[::-1].astype(jnp.int32)
    elif timestep_spacing == "trailing":
        timesteps = jnp.round(
            jnp.arange(num_train_timesteps, 0, -num_train_timesteps / num_steps)
        ).astype(jnp.int32) - 1
    elif timestep_spacing == "linspace":
        # the diffusers DPMSolverMultistepScheduler default: N+1 points over
        # [0, T-1], reversed, dropping the final 0 (set_timesteps linspace
        # branch) — consumers that read timesteps[i+1] (dpm_step) handle the
        # non-uniform spacing; the fixed-stride t - T//N steppers (ddim/ddpm)
        # must keep leading/trailing tables
        timesteps = (
            jnp.linspace(0.0, num_train_timesteps - 1, num_steps + 1)
            .round()[::-1][:-1]
            .astype(jnp.int32)
        )
    else:
        raise ValueError(f"unknown timestep spacing {timestep_spacing}")

    final = (
        jnp.asarray(1.0, jnp.float32) if set_alpha_to_one else alphas_cumprod[0]
    )
    return DDPMSchedule(timesteps, alphas_cumprod, final)


def _alpha_at(sched: DDPMSchedule, t: jax.Array) -> jax.Array:
    """alphas_cumprod[t] with t possibly < 0 meaning the final alpha."""
    return jnp.where(t >= 0, sched.alphas_cumprod[jnp.maximum(t, 0)], sched.final_alpha_cumprod)


def _pred_x0(sample32, eps32, a_t):
    return (sample32 - jnp.sqrt(1.0 - a_t) * eps32) / jnp.sqrt(a_t)


# ---------------------------------------------------------------------------
# DDIM (eta = 0)
# ---------------------------------------------------------------------------


def ddim_step(
    sched: DDPMSchedule,
    i: jax.Array,
    num_steps: int,
    sample: jax.Array,
    eps: jax.Array,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    t = sched.timesteps[i]
    t_prev = t - num_train_timesteps // num_steps
    a_t = _alpha_at(sched, t)
    a_prev = _alpha_at(sched, t_prev)
    x32, e32 = sample.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = _pred_x0(x32, e32, a_t)
    out = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * e32
    return out.astype(sample.dtype)


def ddim_step_v(
    sched: DDPMSchedule,
    i: jax.Array,
    num_steps: int,
    sample: jax.Array,
    v: jax.Array,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    """DDIM step for v-prediction models (CogVideoX family)."""
    t = sched.timesteps[i]
    t_prev = t - num_train_timesteps // num_steps
    a_t = _alpha_at(sched, t)
    a_prev = _alpha_at(sched, t_prev)
    x32, v32 = sample.astype(jnp.float32), v.astype(jnp.float32)
    sa, sb = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    x0 = sa * x32 - sb * v32
    eps = sa * v32 + sb * x32
    out = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return out.astype(sample.dtype)


# ---------------------------------------------------------------------------
# DDPM ancestral
# ---------------------------------------------------------------------------


def ddpm_step(
    sched: DDPMSchedule,
    i: jax.Array,
    num_steps: int,
    sample: jax.Array,
    eps: jax.Array,
    key: jax.Array,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    t = sched.timesteps[i]
    t_prev = t - num_train_timesteps // num_steps
    a_t = _alpha_at(sched, t)
    a_prev = _alpha_at(sched, t_prev)
    alpha_t = a_t / a_prev
    beta_t = 1.0 - alpha_t
    x32, e32 = sample.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = jnp.clip(_pred_x0(x32, e32, a_t), -1.0, 1.0)
    # posterior mean coefficients (DDPM eq. 7)
    coef_x0 = jnp.sqrt(a_prev) * beta_t / (1.0 - a_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - a_prev) / (1.0 - a_t)
    mean = coef_x0 * x0 + coef_xt * x32
    var = jnp.clip(beta_t * (1.0 - a_prev) / (1.0 - a_t), 1e-20)
    noise = jax.random.normal(key, sample.shape, jnp.float32)
    out = mean + jnp.where(t_prev >= 0, jnp.sqrt(var), 0.0) * noise
    return out.astype(sample.dtype)


# ---------------------------------------------------------------------------
# DPM-Solver++ (2M multistep) — PixArt's default sampler
# ---------------------------------------------------------------------------


class DPMState(NamedTuple):
    prev_x0: jax.Array  # x0 prediction from the previous step
    prev_lambda: jax.Array  # () lambda at the previous step
    have_prev: jax.Array  # () bool-ish int32


def dpm_init_state(shape, dtype=jnp.float32) -> DPMState:
    return DPMState(
        prev_x0=jnp.zeros(shape, jnp.float32),
        prev_lambda=jnp.zeros((), jnp.float32),
        have_prev=jnp.zeros((), jnp.int32),
    )


def dpm_step_patch(
    sched: DDPMSchedule,
    i: jax.Array,
    num_steps: int,
    sample: jax.Array,
    eps: jax.Array,
    prev_x0: jax.Array,
    prev_lambda: jax.Array,
    have_prev: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """DPM++ 2M update on an arbitrary slice with explicit scalar state.

    Used by patch-pipelined PipeFusion where each image patch advances
    through the schedule independently (the reference's patch-gated scheduler
    wrappers, ``schedulers/scheduling_flow_match_euler_discrete.py:117-122``).
    Returns (new_sample, new_prev_x0, new_prev_lambda).
    """
    st = DPMState(prev_x0=prev_x0, prev_lambda=prev_lambda, have_prev=have_prev)
    out, ns = dpm_step(sched, i, num_steps, sample, eps, st)
    return out, ns.prev_x0, ns.prev_lambda


def dpm_step(
    sched: DDPMSchedule,
    i: jax.Array,
    num_steps: int,
    sample: jax.Array,
    eps: jax.Array,
    state: DPMState,
) -> Tuple[jax.Array, DPMState]:
    """One DPM-Solver++ 2M step (data-prediction, multistep order <= 2)."""
    t = sched.timesteps[i]
    is_last = i == num_steps - 1
    t_prev = jnp.where(is_last, -1, sched.timesteps[jnp.minimum(i + 1, num_steps - 1)])
    a_t = _alpha_at(sched, t)
    a_next = _alpha_at(sched, t_prev)

    alpha_t, sigma_t = jnp.sqrt(a_t), jnp.sqrt(1.0 - a_t)
    alpha_n, sigma_n = jnp.sqrt(a_next), jnp.sqrt(1.0 - jnp.minimum(a_next, 1 - 1e-8))
    lam_t = jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, 1e-10))
    lam_n = jnp.log(alpha_n) - jnp.log(jnp.maximum(sigma_n, 1e-10))

    x32, e32 = sample.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (x32 - sigma_t * e32) / alpha_t

    h = lam_n - lam_t
    h_prev = lam_t - state.prev_lambda
    r = h_prev / jnp.where(h == 0, 1e-10, h)

    # second-order correction when a previous x0 exists (and not final step)
    use2 = (state.have_prev > 0) & jnp.logical_not(is_last)
    d = jnp.where(
        use2,
        (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * state.prev_x0,
        x0,
    )
    out = (sigma_n / sigma_t) * x32 - alpha_n * jnp.expm1(-h) * d
    new_state = DPMState(
        prev_x0=x0, prev_lambda=lam_t, have_prev=jnp.ones((), jnp.int32)
    )
    return out.astype(sample.dtype), new_state
