"""Codec tests: packed encode/decode vs sim twin, compression ratios.

Mirrors the reference's kernel-vs-sim test matrix
(``tests/compact/compress_fastpath_test.py``, ``compress_slowpath_test.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.compact import codecs
from compactfusion_tpu.config import CompressType


def _rand(shape, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), dtype=dtype)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


SHAPES = [(64, 128), (256, 512), (100, 256)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("rank", [-1, 1, 4])
def test_binary_packed_matches_sim(shape, rank):
    x = _rand(shape, seed=shape[0] + rank)
    sim = codecs.sim_binary(x, rank)
    out = codecs.decode_binary(codecs.encode_binary(x, rank))
    # scales travel as bf16 in the packed payload, sim keeps fp32
    assert rel_err(out, sim) < 2e-2
    # signs must agree exactly
    np.testing.assert_array_equal(np.sign(np.asarray(out)), np.sign(np.asarray(sim)))


@pytest.mark.parametrize("shape", SHAPES)
def test_int2_packed_matches_sim(shape):
    x = _rand(shape, seed=3)
    sim = codecs.sim_int2(x)
    out = codecs.decode_int2(codecs.encode_int2(x))
    assert rel_err(out, sim) < 2e-2


def test_int2_levels():
    # every output element must be one of the 4 levels +-0.5*s, +-2*s where
    # s = chan_mean * normalized tok_mean (reference sim_int2 semantics),
    # with the scale factors rounded to the bf16 wire dtype like the codec
    import ml_dtypes

    x = _rand((128, 256), seed=4)
    x32 = np.asarray(x, np.float64)
    a = np.abs(x32)
    chan = a.mean(0, keepdims=True)
    tok = a.mean(1, keepdims=True)
    tok = tok / (tok.mean() + 1e-6)
    wire = lambda t: t.astype(np.float32).astype(ml_dtypes.bfloat16).astype(np.float64)
    s = wire(chan) * wire(tok)
    out = np.asarray(codecs.sim_int2(x), np.float64)
    ratio = out / s
    levels = np.array([-2.0, -0.5, 0.5, 2.0])
    dist = np.min(np.abs(ratio[..., None] - levels[None, None, :]), axis=-1)
    assert dist.max() < 1e-3


@pytest.mark.parametrize("shape", SHAPES)
def test_int2_minmax_packed_matches_sim(shape):
    x = _rand(shape, seed=5)
    sim = codecs.sim_int2_minmax(x)
    out = codecs.decode_int2_minmax(codecs.encode_int2_minmax(x))
    assert rel_err(out, sim) < 2e-2


@pytest.mark.parametrize("shape", SHAPES)
def test_int4_packed_matches_sim(shape):
    x = _rand(shape, seed=6)
    sim = codecs.sim_int4(x)
    out = codecs.decode_int4(codecs.encode_int4(x))
    assert rel_err(out, sim) < 2e-2
    assert rel_err(out, x) < 0.15  # int4 should reconstruct reasonably


def test_int8_roundtrip():
    x = _rand((128, 256), seed=7)
    out = codecs.decode_int8(codecs.encode_int8(x))
    assert rel_err(out, x) < 1e-2


@pytest.mark.parametrize("rank", [1, 4, 16])
def test_low_rank_exact_on_low_rank_input(rank):
    rng = np.random.default_rng(8)
    u = rng.standard_normal((128, rank))
    v = rng.standard_normal((rank, 256))
    x = jnp.asarray(u @ v, jnp.float32)
    out = codecs.decode_low_rank(codecs.encode_low_rank(x, rank))
    assert rel_err(out, x) < 2e-2


def test_low_rank_awl_upweights_rows():
    """AWL (attention-aware low-rank): rows with larger importance weight are
    fit better than under the unweighted rank-k model, the wire payload is
    byte-identical to plain LOW_RANK, and a None scale degrades exactly to
    plain LOW_RANK (reference ``slowpath.py:218-237``)."""
    x = _rand((256, 128), seed=13)
    scale = jnp.ones((256,)).at[:32].set(10.0)

    p_awl = codecs.encode_low_rank_awl(x, 4, scale)
    p_plain = codecs.encode_low_rank(x, 4)
    assert codecs.payload_nbytes(p_awl) == codecs.payload_nbytes(p_plain)

    out_awl = np.asarray(codecs.decode_low_rank(p_awl))
    out_plain = np.asarray(codecs.decode_low_rank(p_plain))
    xa = np.asarray(x)

    def row_err(out, rows):
        return np.linalg.norm((out - xa)[rows]) / np.linalg.norm(xa[rows])

    assert row_err(out_awl, slice(0, 32)) < row_err(out_plain, slice(0, 32))

    # None scale == plain low-rank, exactly
    p_none = codecs.encode_low_rank_awl(x, 4, None)
    np.testing.assert_array_equal(np.asarray(p_none.u), np.asarray(p_plain.u))
    np.testing.assert_array_equal(np.asarray(p_none.v), np.asarray(p_plain.v))

    # sim twin agrees with the packed path (scales travel as bf16)
    sim = codecs.sim_low_rank_awl(x, 4, scale)
    assert rel_err(jnp.asarray(out_awl), sim) < 5e-2


def _awl_attention_errors(seed, n=256, d=64, m=6, rank=8, n_q=64):
    """Attention-output rel-err (plain vs AWL low-rank K) in the regime the
    reference's AWL premise describes (``xfuser/compact/ring.py:99``:
    "smaller the v norm, typically larger the attn score").

    ``m`` retrieval keys each own a private direction: queries align with
    them (large scores) and their V rows have small norm; the remaining
    background keys carry the bulk Frobenius energy and large-norm V rows.
    An unweighted rank-``rank`` fit spends its subspace on the background
    spectrum and garbles the high-score keys' logits — redistributing
    softmax mass onto the large-V background.  The V-norm weighting pulls
    the important keys into the subspace at identical wire bytes.
    """
    rng = np.random.default_rng(seed)
    w = np.linalg.qr(rng.standard_normal((d, m)))[0].T  # m orthonormal dirs
    k = rng.standard_normal((n, d)).astype(np.float32)
    # matched logit ~ 4*16/sqrt(d) = 8 >> background logit noise (sigma~0.6),
    # so ~90% of softmax mass sits on the matched important key; yet each
    # important row's Frobenius energy (16^2=256) stays BELOW the background
    # spectrum's top singular values (~(sqrt(n-m)+sqrt(d))^2 ~ 560), so the
    # unweighted rank-k fit spends its whole subspace on background rows.
    k[:m] = 16.0 * w + 0.05 * rng.standard_normal((m, d))
    v = 3.0 * rng.standard_normal((n, d)).astype(np.float32)
    v[:m] *= 0.03  # important keys: small V norm (the reference's premise)
    q = 4.0 * w[rng.integers(0, m, size=n_q)] + 0.3 * rng.standard_normal(
        (n_q, d)
    ).astype(np.float32)

    def attn(k_hat):
        logits = (q @ np.asarray(k_hat, np.float32).T) / np.sqrt(d)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        return (p / p.sum(-1, keepdims=True)) @ v

    ref = attn(k)
    kj = jnp.asarray(k)
    scale = codecs.awl_row_scale(jnp.asarray(v))
    out_plain = codecs.decode_low_rank(codecs.encode_low_rank(kj, rank))
    out_awl = codecs.decode_low_rank(codecs.encode_low_rank_awl(kj, rank, scale))
    return (
        rel_err(attn(out_plain), ref),
        rel_err(attn(out_awl), ref),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_awl_beats_plain_low_rank_on_attention_output(seed):
    """End-to-end mechanism win at matched bytes (VERDICT r2 item 5): under
    the importance-skew regime, AWL's attention output error is a fraction
    of plain LOW_RANK's.  (At random init both tie — see docs/PERF.md codec
    analysis and ``benchmark/awl_attention.py``.)"""
    err_plain, err_awl = _awl_attention_errors(seed)
    assert err_awl < 0.5 * err_plain, (err_plain, err_awl)
    assert err_plain > 0.05  # the regime must actually stress plain low-rank


def test_awl_row_scale_semantics():
    """mean(||v_row||)/||v_row|| — small-norm rows get large weight."""
    v = jnp.concatenate(
        [jnp.ones((4, 64)) * 0.1, jnp.ones((4, 64)) * 10.0], axis=0
    )
    s = np.asarray(codecs.awl_row_scale(v))
    assert (s[:4] > s[4:]).all()
    np.testing.assert_allclose(
        s * np.linalg.norm(np.asarray(v), axis=-1),
        np.mean(np.linalg.norm(np.asarray(v), axis=-1)),
        rtol=1e-3,
    )


def test_low_rank_q_matches_sim():
    x = _rand((128, 256), seed=9)
    sim = codecs.sim_low_rank_q(x, 4)
    out = codecs.decode_low_rank_q(codecs.encode_low_rank_q(x, 4))
    assert rel_err(out, sim) < 5e-2


@pytest.mark.parametrize("m", [4, 8, 16])
def test_sparse_keeps_group_max(m):
    x = _rand((32, 128), seed=10)
    out = np.asarray(codecs.sim_sparse(x, m))
    xr = np.asarray(x).reshape(32, 128 // m, m)
    outr = out.reshape(32, 128 // m, m)
    # exactly one nonzero per group, equal to the max-|.| element
    assert (np.count_nonzero(outr, axis=-1) == 1).all()
    np.testing.assert_allclose(
        np.abs(outr).max(-1), np.abs(xr).max(-1), rtol=1e-2, atol=1e-3
    )


def test_compression_ratios():
    """Bytes-on-wire accounting: BINARY ~ 16x less than bf16 raw (plus scales)."""
    x = _rand((4096, 3072), seed=11, dtype=jnp.bfloat16)
    raw = x.size * x.dtype.itemsize
    nb_bin = codecs.payload_nbytes(codecs.encode_binary(x, -1))
    nb_int2 = codecs.payload_nbytes(codecs.encode_int2(x))
    nb_int4 = codecs.payload_nbytes(codecs.encode_int4(x))
    assert raw / nb_bin > 15.0
    assert raw / nb_int2 > 7.5
    assert raw / nb_int4 > 3.8


@pytest.mark.parametrize(
    "method",
    [
        CompressType.BINARY,
        CompressType.INT2,
        CompressType.INT2_MINMAX,
        CompressType.INT4,
        CompressType.LOW_RANK,
        CompressType.SPARSE,
    ],
)
def test_dispatch_roundtrip_jit(method):
    x = _rand((64, 128), seed=12)

    @jax.jit
    def f(x):
        p = codecs.encode(x, method, rank=2, sparse_ratio=8)
        return codecs.decode(p, method, sparse_ratio=8)

    out = f(x)
    sim = codecs.sim_roundtrip(x, method, rank=2, sparse_ratio=8)
    assert rel_err(out, sim) < 5e-2
