"""AWL vs plain LOW_RANK at matched bytes: attention-output error.

The AWL premise (reference ``compact_update_awl_scale``,
``xfuser/compact/ring.py:86-103``: "smaller the v norm, typically larger
the attn score") only pays off when key importance is non-uniform and
anti-correlated with V-row norm — a property of trained checkpoints, not
random inits (see docs/PERF.md codec analysis).  This benchmark measures
the mechanism end to end in BOTH regimes, at byte-identical payloads:

* ``random``: i.i.d. Gaussian K/V/Q — importance is uniform, AWL ties
  plain LOW_RANK (this is why QUALITY_SWEEP/QUALITY_REAL_SCALE show no
  AWL win on random-init models).
* ``importance-skewed``: retrieval-style attention where a few small-V-norm
  keys carry ~90% of the softmax mass while the background rows carry the
  Frobenius energy.  The unweighted rank-k fit spends its subspace on the
  background and garbles the high-score keys' logits; the V-norm weighting
  pulls them into the subspace → AWL wins by an order of magnitude.

    python benchmark/awl_attention.py     # → AWL_ATTENTION.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.compact import codecs


def attn_errors(seed, skewed, n=256, d=64, m=6, rank=8, n_q=64):
    rng = np.random.default_rng(seed)
    k = rng.standard_normal((n, d)).astype(np.float32)
    v = 3.0 * rng.standard_normal((n, d)).astype(np.float32)
    if skewed:
        w = np.linalg.qr(rng.standard_normal((d, m)))[0].T
        k[:m] = 16.0 * w + 0.05 * rng.standard_normal((m, d))
        v[:m] *= 0.03
        q = 4.0 * w[rng.integers(0, m, size=n_q)] + 0.3 * rng.standard_normal(
            (n_q, d)
        ).astype(np.float32)
    else:
        q = rng.standard_normal((n_q, d)).astype(np.float32)

    def attn(k_hat):
        logits = (q @ np.asarray(k_hat, np.float32).T) / np.sqrt(d)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        return (p / p.sum(-1, keepdims=True)) @ v

    ref = attn(k)

    def rel(out):
        return float(np.linalg.norm(out - ref) / np.linalg.norm(ref))

    kj = jnp.asarray(k)
    scale = codecs.awl_row_scale(jnp.asarray(v))
    p_plain = codecs.encode_low_rank(kj, rank)
    p_awl = codecs.encode_low_rank_awl(kj, rank, scale)
    assert codecs.payload_nbytes(p_awl) == codecs.payload_nbytes(p_plain)
    return (
        rel(attn(codecs.decode_low_rank(p_plain))),
        rel(attn(codecs.decode_low_rank(p_awl))),
        codecs.payload_nbytes(p_plain),
        n * d * 2,  # bf16 raw bytes
    )


def main():
    report = {"rank": 8, "shape": [256, 64], "regimes": {}}
    for regime, skewed in (("random", False), ("importance-skewed", True)):
        plain, awl = [], []
        for seed in range(8):
            ep, ea, nbytes, raw = attn_errors(seed, skewed)
            plain.append(ep)
            awl.append(ea)
        report["regimes"][regime] = {
            "attn_out_rel_err_low_rank": round(float(np.mean(plain)), 4),
            "attn_out_rel_err_low_rank_awl": round(float(np.mean(awl)), 4),
            "awl_improvement_x": round(float(np.mean(plain) / np.mean(awl)), 2),
            "payload_bytes": int(nbytes),
            "raw_bytes_bf16": int(raw),
            "seeds": 8,
        }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "AWL_ATTENTION.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
