"""TeaCache / First-Block-Cache tests (reference cache/utils.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.cache.accel import CacheAccelConfig, init_cache_state
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.pixart import init_pixart, pixart_forward, pixart_tiny


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


@pytest.fixture(scope="module")
def setup():
    mcfg = pixart_tiny()
    params = init_pixart(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(1)
    b, s = 1, 16
    x = jnp.asarray(
        rng.standard_normal((b, s, mcfg.patch**2 * mcfg.in_channels)), jnp.float32
    )
    text = jnp.asarray(rng.standard_normal((b, 8, mcfg.text_dim)), jnp.float32)
    t = jnp.full((b,), 500.0)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, 4, 4)
    return mcfg, params, x, text, t, pos


def _run(mcfg, params, x, text, t, pos, cache_cfg, state):
    return pixart_forward(
        params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos,
        cache_cfg=cache_cfg, cache_state=state,
    )


def test_fbcache_threshold_zero_never_skips(setup):
    mcfg, params, x, text, t, pos = setup
    ref, _ = pixart_forward(
        params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos
    )
    cc = CacheAccelConfig(mode="fbcache", threshold=0.0)
    shp = (1, 16, mcfg.dim)
    st = init_cache_state(shp, shp, jnp.float32)
    out, _, st = _run(mcfg, params, x, text, t, pos, cc, st)
    out2, _, st = _run(mcfg, params, x, text, t, pos, cc, st)
    assert int(st.skips) == 0
    np.testing.assert_allclose(
        np.asarray(out2, np.float32), np.asarray(ref, np.float32), atol=1e-5
    )


def test_fbcache_skips_on_identical_steps(setup):
    mcfg, params, x, text, t, pos = setup
    cc = CacheAccelConfig(mode="fbcache", threshold=0.5)
    shp = (1, 16, mcfg.dim)
    st = init_cache_state(shp, shp, jnp.float32)
    out1, _, st = _run(mcfg, params, x, text, t, pos, cc, st)
    out2, _, st = _run(mcfg, params, x, text, t, pos, cc, st)
    # identical input -> rel change 0 -> must skip, and replay is exact here
    assert int(st.skips) == 1
    assert rel_err(out2, out1) < 1e-3


def test_teacache_accumulates_then_runs(setup):
    mcfg, params, x, text, t, pos = setup
    cc = CacheAccelConfig(mode="teacache", threshold=0.08)
    shp = (1, 16, mcfg.dim)
    st = init_cache_state(shp, shp, jnp.float32)
    rng = np.random.default_rng(2)
    skips = []
    for i in range(6):
        xi = x + 0.2 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        _, _, st = _run(mcfg, params, xi, text, t, pos, cc, st)
        skips.append(int(st.skips))
    # must have skipped at least once and also run fully at least once
    assert skips[-1] >= 1
    assert skips[-1] < 5


def test_cache_force_compute_blocks_skip(setup):
    """The final-step force (reference TeaCache reset_mask) must override a
    would-skip decision in both modes."""
    mcfg, params, x, text, t, pos = setup
    shp = (1, 16, mcfg.dim)
    for mode in ("fbcache", "teacache"):
        cc = CacheAccelConfig(mode=mode, threshold=1e6)  # would always skip
        st = init_cache_state(shp, shp, jnp.float32)
        _, _, st = _run(mcfg, params, x, text, t, pos, cc, st)
        _, _, st = pixart_forward(
            params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos,
            cache_cfg=cc, cache_state=st, cache_force=jnp.asarray(True),
        )
        assert int(st.skips) == 0, mode


def test_fbcache_pinned_probe_forces_recompute_on_drift():
    """prev_probe pins across skip runs (reference updates modulated_inputs
    only on full-compute steps): slow drift below the per-step threshold
    accumulates against the pinned reference and must eventually force a
    recompute.  A prev updated every step would skip forever."""
    import jax.numpy as jnp

    from compactfusion_tpu.cache.accel import (
        CacheAccelState,
        next_probe,
        should_skip,
    )

    cc = CacheAccelConfig(mode="fbcache", threshold=0.05)
    rng = np.random.default_rng(3)
    probe = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    drift = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    st = init_cache_state(probe.shape, probe.shape, jnp.float32)

    def step(st, probe):
        skip, accum = should_skip(cc, st, probe)
        return (
            CacheAccelState(
                prev_probe=next_probe(cc, st, probe, skip),
                residual=st.residual,
                accum=accum,
                has_prev=jnp.ones((), jnp.int32),
                skips=st.skips + skip.astype(jnp.int32),
            ),
            bool(skip),
        )

    # per-step drift ~2% rel-L1 (< 5% threshold), same direction every step
    skips = []
    p = probe
    for i in range(12):
        p = p + 0.02 * drift
        st, skipped = step(st, p)
        skips.append(skipped)
    assert any(skips), skips  # per-step drift is under threshold -> skips
    # ... but the pinned reference accumulates the drift: a recompute MUST
    # occur after the first skip run (prev refreshed every step would make
    # every step after the first a skip)
    assert not all(skips[1:]), skips
