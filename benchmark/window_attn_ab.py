"""A/B timing: banded (windowed) flash kernel vs full flash on the real chip.

DiTFastAttn's RESIDUAL_WINDOW_ATTN is only worth selecting if window
attention is actually cheaper than full attention (the reference relies on
``flash_attn_func(window_size=...)``, ``fast_attention/attn_layer.py:175-186``;
a masked full-cost sdpa would be quality-loss-for-no-speedup).  This script
measures both on the real TPU with the dispatch-immune harness (inputs
generated in-jit, fori_loop, t(hi)-t(lo) delta) and writes
``WINDOW_ATTN_AB.json``.

    python benchmark/window_attn_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.utils import jax_cache

jax_cache.enable()

from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

N_LO, N_HI = 10, 40


def make_runner(b, s, h, d, n, window):
    @jax.jit
    def run(key):
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.normal(k1, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, s, h, d), jnp.bfloat16)

        def body(i, acc):
            out, _ = flash_attn_with_lse(q + (i * 0.0), k, v, window=window)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, 0.0)

    return run


def timed(run, key):
    t0 = time.time()
    v = float(np.asarray(run(key)))
    return time.time() - t0, v


def measure(b, s, h, d, window):
    key = jax.random.PRNGKey(0)
    lo = make_runner(b, s, h, d, N_LO, window)
    hi = make_runner(b, s, h, d, N_HI, window)
    timed(lo, key)  # compile
    t_lo, _ = timed(lo, key)
    timed(hi, key)  # compile
    t_hi, _ = timed(hi, key)
    return (t_hi - t_lo) / (N_HI - N_LO) * 1e3  # ms/call


def main():
    results = []
    for b, s, h, d in [(1, 4096, 24, 128), (1, 8192, 16, 128)]:
        full = measure(b, s, h, d, None)
        for w in (128, 512):
            win = measure(b, s, h, d, w)
            row = {
                "shape": [b, s, h, d],
                "window": w,
                "full_ms": round(full, 3),
                "window_ms": round(win, 3),
                "speedup": round(full / win, 2),
            }
            results.append(row)
            print(row, flush=True)
    out = {"results": results, "note": "banded flash vs full flash, v5e"}
    with open(os.path.join(os.path.dirname(__file__), "..", "WINDOW_ATTN_AB.json"), "w") as f:
        json.dump(out, f, indent=2)
    ok = all(r["speedup"] > 1.0 for r in results)
    print("WINDOW FASTER THAN FULL:" , ok)


if __name__ == "__main__":
    main()
