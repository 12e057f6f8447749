"""The bandwidth-lean no-LSE XLA attention path vs the reference path.

``sdpa`` (mask-free, non-causal, flash-ineligible) routes through
``_xla_attn_nolse``, which replaces the softmax max with the per-row
Cauchy-Schwarz bound and rides the row normaliser on free MXU lanes
(docs/PERF.md).  It must stay numerically interchangeable with
``attn_with_lse(impl="xla")`` — cross-attention in every image family and
the small-shape fallbacks all go through it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.ops.attention import _xla_attn_nolse, attn_with_lse, sdpa


def _qkv(b, sq, sk, h, d, seed=0, dtype=jnp.float32, scale=1.0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)) * scale, dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)) * scale, dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    return q, k, v


# d=72 exercises the ones-column MXU rowsum; d=128 the fused-reduce branch
@pytest.mark.parametrize("d", [72, 128])
@pytest.mark.parametrize(
    "lens", [None, (120, 37), (64, 0)], ids=["nomask", "prefix", "deadrow"]
)
def test_nolse_matches_reference(d, lens):
    q, k, v = _qkv(2, 256, 120, h=4, d=d, seed=0)
    kl = None if lens is None else jnp.asarray(lens, jnp.int32)
    ref, _ = attn_with_lse(q, k, v, kv_lens=kl, impl="xla")
    out = _xla_attn_nolse(q, k, v, None, kl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_nolse_large_logits_stable():
    """Huge logits (Δ≈9000 of Cauchy-Schwarz slack) underflow every exp in
    the fast path; the tiny-rowsum oracle must engage the exact-path
    fallback — without it the output here is identically zero.

    At |logit|≈4000 the fp32 rounding of the scores dot itself moves
    softmax weights by ~1e-3 between compilations, so the reference path is
    not bit-reproducible against itself; assert against an fp64 ground
    truth instead, requiring the fallback to be as accurate as the
    reference path is."""
    q, k, v = _qkv(1, 64, 64, h=2, d=72, seed=1, scale=40.0)
    out = _xla_attn_nolse(q, k, v, None, None)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out))) > 0.0, "fallback did not engage"

    qq, kk, vv = (np.asarray(t, np.float64) for t in (q, k, v))
    s = np.einsum("bqhd,bkhd->bhqk", qq, kk) * 72**-0.5
    s -= s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    gt = np.einsum("bhqk,bkhd->bqhd", p, vv)

    ref, _ = attn_with_lse(q, k, v, impl="xla")
    err_ref = float(np.max(np.abs(np.asarray(ref, np.float64) - gt)))
    err_out = float(np.max(np.abs(np.asarray(out, np.float64) - gt)))
    # a few-ulp headroom: at these magnitudes each compilation's dot tiling
    # rounds logits by ~2.4e-4, so even two runs of the SAME math differ;
    # the un-fallen-back fast path would be off by max|gt| ≈ 1.7 here
    assert err_out < max(5 * err_ref, 1e-4), (err_out, err_ref)


def test_nolse_dead_rows_zeroed():
    q, k, v = _qkv(2, 32, 16, h=2, d=72, seed=2)
    out = _xla_attn_nolse(q, k, v, None, jnp.asarray([0, 16], jnp.int32))
    assert float(jnp.max(jnp.abs(out[0]))) == 0.0
    assert float(jnp.max(jnp.abs(out[1]))) > 0.0


def test_sdpa_auto_routes_through_nolse():
    """sdpa's mask-free auto path must equal the explicit no-LSE path
    bit-for-bit (i.e. the routing actually engages)."""
    q, k, v = _qkv(1, 128, 120, h=2, d=72, seed=3)
    kl = jnp.asarray([100], jnp.int32)
    auto = sdpa(q, k, v, kv_lens=kl)
    direct = _xla_attn_nolse(q, k, v, None, kl)
    assert np.array_equal(np.asarray(auto), np.asarray(direct))


def test_sdpa_masked_path_unchanged():
    """Arbitrary masks and causal still use the lse reference path."""
    q, k, v = _qkv(1, 64, 64, h=2, d=72, seed=4)
    mask = jnp.tril(jnp.ones((64, 64), bool))
    ref, _ = attn_with_lse(q, k, v, mask=mask, impl="xla")
    np.testing.assert_allclose(
        np.asarray(sdpa(q, k, v, mask=mask)), np.asarray(ref), atol=1e-6
    )
    ref_c, _ = attn_with_lse(q, k, v, causal=True, impl="xla")
    np.testing.assert_allclose(
        np.asarray(sdpa(q, k, v, causal=True)), np.asarray(ref_c), atol=1e-6
    )


def test_nolse_grad_finite_at_zero_kv():
    """d‖x‖/dx is NaN at x=0 and all-zero K/V rows are ROUTINE (zero text
    embeddings are the standard CFG null conditioning) — the Cauchy-Schwarz
    bound's norms must use the grad-safe form so fine-tuning through the
    model never sees NaN (regression: benchmark/delta_coherence.py training
    diverged to NaN through this path)."""
    q, _, _ = _qkv(2, 64, 8, h=4, d=32, seed=5)
    zeros = jnp.zeros((2, 8, 4, 32), jnp.float32)

    def loss(kv):
        k, v = kv
        return jnp.mean(sdpa(q, k, v) ** 2)

    gk, gv = jax.grad(loss)((zeros, zeros))
    assert np.isfinite(np.asarray(gk)).all()
    assert np.isfinite(np.asarray(gv)).all()
