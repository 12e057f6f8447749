"""Scheduler table + step tests.

The timestep TABLES are pinned against the diffusers formulas the reference
wraps (DPMSolverMultistepScheduler.set_timesteps "linspace" default for
PixArt, DDIM/DDPM "leading"); the steppers are checked for convergence on an
analytically-known denoising problem.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.schedulers.diffusion import (
    ddim_step,
    ddpm_schedule,
    ddpm_step,
    dpm_init_state,
    dpm_step,
)


def test_linspace_matches_diffusers_dpm_formula():
    # diffusers DPMSolverMultistepScheduler.set_timesteps (linspace branch):
    # np.linspace(0, T-1, N+1).round()[::-1][:-1]
    for n in (4, 20, 28, 50):
        want = (
            np.linspace(0, 999, n + 1).round()[::-1][:-1].astype(np.int32)
        )
        got = np.asarray(
            ddpm_schedule(n, timestep_spacing="linspace").timesteps
        )
        np.testing.assert_array_equal(got, want)
    # 20-step table starts at the TERMINAL timestep (leading starts at 950 —
    # the mismatch this spacing option exists to fix)
    t20 = np.asarray(ddpm_schedule(20, timestep_spacing="linspace").timesteps)
    assert t20[0] == 999 and t20[-1] == 50


def test_leading_and_trailing_tables():
    lead = np.asarray(ddpm_schedule(20, timestep_spacing="leading").timesteps)
    np.testing.assert_array_equal(lead, (np.arange(20) * 50)[::-1])
    trail = np.asarray(ddpm_schedule(20, timestep_spacing="trailing").timesteps)
    assert trail[0] == 999 and trail[-1] == 49
    np.testing.assert_array_equal(-np.diff(trail), np.full(19, 50))


def _run_sampler(stepper, n_steps, spacing):
    """Denoise toward a known x0 with the exact eps oracle: any correct
    sampler must recover x0 (DPM/DDIM exactly, DDPM up to injected noise)."""
    sched = ddpm_schedule(n_steps, timestep_spacing=spacing)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    eps_true = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    a0 = sched.alphas_cumprod[sched.timesteps[0]]
    x = jnp.sqrt(a0) * x0 + jnp.sqrt(1 - a0) * eps_true

    def eps_oracle(x, t):
        a = sched.alphas_cumprod[t]
        return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)

    return sched, x, x0, eps_oracle


def test_dpm_recovers_x0_with_exact_eps_linspace():
    n = 12
    sched, x, x0, eps_oracle = _run_sampler(dpm_step, n, "linspace")
    st = dpm_init_state(x.shape)
    for i in range(n):
        t = sched.timesteps[i]
        x, st = dpm_step(sched, jnp.int32(i), n, x, eps_oracle(x, t), st)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-2)


def test_ddim_recovers_x0_with_exact_eps():
    n = 10
    sched, x, x0, eps_oracle = _run_sampler(ddim_step, n, "leading")
    for i in range(n):
        t = sched.timesteps[i]
        x = ddim_step(sched, jnp.int32(i), n, x, eps_oracle(x, t))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddpm_converges_with_exact_eps():
    n = 25
    sched, x, x0, eps_oracle = _run_sampler(ddpm_step, n, "leading")
    key = jax.random.PRNGKey(0)
    for i in range(n):
        key, k = jax.random.split(key)
        t = sched.timesteps[i]
        x = ddpm_step(sched, jnp.int32(i), n, x, eps_oracle(x, t), k)
    # ancestral sampling injects noise; loose bound, but must land near x0
    assert float(jnp.linalg.norm(x - x0) / jnp.linalg.norm(x0)) < 0.35
