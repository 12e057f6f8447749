"""On-silicon validation + timing of the fused Pallas quant fastpath.

The interpret-mode tests (``tests/compact/test_fastpath.py``) prove the
kernel MATH; this script proves the Mosaic kernels COMPILE AND MATCH on a
real TPU — the evidence VERDICT r1 flagged as missing (the bench runs
compression-off and the multichip dryrun runs on CPU where the fastpath is
gated off).  Runs binary + int2 quant/dequant at FLUX-scale K/V shapes,
asserts bit-equality with the jnp codecs, times a full compressed
compress->decompress round trip (the per-hop ring work), and prints one
JSON report (written to FASTPATH_TPU.json at the repo root).

Run: python benchmark/fastpath_on_tpu.py   (requires the TPU chip)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.compact import codecs
from compactfusion_tpu.compact.packing import pack_2bit, pack_bits
from compactfusion_tpu.ops import quant_pallas as qp


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def _sync(x):
    # block_until_ready does not block through the axon tunnel; force a
    # device->host transfer
    return np.asarray(x)


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the TPU chip, got {jax.default_backend()}"
    )
    report = {"backend": "tpu", "device": str(jax.devices()[0]), "checks": {}}

    # FLUX-scale ring K/V slab: (B*S_local, H*D) = (4096, 3072) after the
    # (B, S, H, D) -> (N, C) flatten the engine performs
    n, c = 4096, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.bfloat16).astype(jnp.float32)
    base = jnp.asarray(rng.standard_normal((n, c)) * 0.9, jnp.float32)
    delta = x - base

    # ---- binary (rank -1 mean scale + rank 4 subspace scale) ----
    for rank in (-1, 4):
        u, v = codecs._scale_uv(delta, rank)
        u = u.astype(codecs.SCALE_DTYPE)
        v = v.astype(codecs.SCALE_DTYPE)
        packed, new_base = qp.binary_quant_fastpath(x, base, u, v)
        packed_np = _sync(packed)
        ref_packed = _sync(pack_bits((delta >= 0).astype(jnp.uint8)))
        bits_equal = bool((packed_np == ref_packed).all())
        scale = u.astype(jnp.float32) @ v.astype(jnp.float32)
        ref_base = base + jnp.where(delta >= 0, 1.0, -1.0) * scale
        base_err = rel_err(_sync(new_base), _sync(ref_base))
        x_hat = qp.binary_dequant_fastpath(packed, base, u, v)
        roundtrip_err = rel_err(_sync(x_hat), _sync(new_base))
        # wire compat: jnp codec decodes the Pallas payload
        wire_err = rel_err(
            _sync(base + codecs.decode_binary(codecs.BinaryPayload(packed, u, v))),
            _sync(new_base),
        )
        report["checks"][f"binary_rank{rank}"] = {
            "bits_exact": bits_equal,
            "base_rel_err": base_err,
            "dequant_roundtrip_rel_err": roundtrip_err,
            "jnp_codec_wire_rel_err": wire_err,
        }
        assert bits_equal and base_err < 1e-4 and roundtrip_err < 1e-5

    # ---- int2 ----
    u, v = codecs._mean_scale_uv(delta)
    u = u.astype(codecs.SCALE_DTYPE)
    v = v.astype(codecs.SCALE_DTYPE)
    packed, new_base = qp.int2_quant_fastpath(x, base, u, v)
    s = u.astype(jnp.float32) @ v.astype(jnp.float32)
    pos = delta >= 0
    mag = jnp.where(pos, delta > s, delta < -s)
    ref_codes = (2 * pos.astype(jnp.uint8) + mag.astype(jnp.uint8)).astype(jnp.uint8)
    bits_equal = bool((_sync(packed) == _sync(pack_2bit(ref_codes))).all())
    ref_base = base + jnp.where(pos, 1.0, -1.0) * jnp.where(mag, 2.0, 0.5) * s
    base_err = rel_err(_sync(new_base), _sync(ref_base))
    x_hat = qp.int2_dequant_fastpath(packed, base, u, v)
    roundtrip_err = rel_err(_sync(x_hat), _sync(new_base))
    report["checks"]["int2"] = {
        "bits_exact": bits_equal,
        "base_rel_err": base_err,
        "dequant_roundtrip_rel_err": roundtrip_err,
    }
    assert bits_equal and base_err < 1e-4 and roundtrip_err < 1e-5

    # ---- timing: one ring hop's compress + decompress at FLUX scale ----
    REPS = 20

    @jax.jit
    def hops(x, base, u, v):
        # REPS chained compress->decompress round trips (data dependency via
        # the EF base, like consecutive ring steps); returns a scalar so the
        # host sync doesn't measure a 48 MB tunnel transfer
        def body(carry, _):
            base = carry
            packed, nb = qp.binary_quant_fastpath(x, base, u, v)
            x_hat = qp.binary_dequant_fastpath(packed, base, u, v)
            return nb, jnp.sum(x_hat[0, :8])

        base, sums = jax.lax.scan(body, base, None, length=REPS)
        return jnp.sum(sums) + jnp.sum(base[0, :8])

    u, v = codecs._scale_uv(delta, -1)
    u = u.astype(codecs.SCALE_DTYPE)
    v = v.astype(codecs.SCALE_DTYPE)
    _sync(hops(x, base, u, v))  # compile + run
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(hops(x, base, u, v))
        times.append(time.perf_counter() - t0)
    hop_ms = min(times) * 1e3 / REPS
    bytes_raw = n * c * 2  # bf16 K or V slab
    bytes_packed = n * c // 8 + (u.size + v.size) * 2
    report["timing"] = {
        "shape": [n, c],
        "compress_plus_decompress_ms": round(hop_ms, 3),
        "bytes_raw": bytes_raw,
        "bytes_packed": int(bytes_packed),
        "compression_ratio": round(bytes_raw / bytes_packed, 2),
    }

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FASTPATH_TPU.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
