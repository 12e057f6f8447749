"""FLUX single-chip perf artifact (reduced depth).

Full FLUX.1 (19 double + 38 single blocks, 12B params, 24 GB bf16) exceeds a
single v5e's 16 GB HBM, so this benchmark runs the SAME architecture at
reduced depth (4 + 8) at real 1024px shapes and extrapolates the full-depth
forward from the measured per-block times (both families are a lax.scan over
stacked params, so the compiled per-block program is depth-independent).

Writes BENCH_FLUX.json at the repo root:
  * reduced-depth 4-step schnell-style s/image (measured end to end)
  * per-double-block / per-single-block ms (measured via depth sweep)
  * extrapolated full-depth forward ms and s/image for FLUX.1-schnell
    (4 steps) — the number to compare against the reference's 8xA100
    0.82 s (docs/performance/flux.md:70) once multi-chip hardware exists.

Run: python benchmark/flux_bench.py   (requires the TPU chip)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.flux import (
    FluxConfig,
    flux_forward,
    flux_image_positions,
    init_flux,
)


def _fwd_ms(cfg, steps=8):
    """Median per-forward ms for a scan of ``steps`` forwards in one jit."""
    params = init_flux(jax.random.PRNGKey(0), cfg)
    b, s_txt = 1, 512
    hp = wp = 64  # 1024px
    img0 = jnp.zeros((b, hp * wp, cfg.in_channels), cfg.dtype)
    txt = jnp.zeros((b, s_txt, cfg.text_dim), cfg.dtype)
    pooled = jnp.zeros((b, cfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    img_rope = cm.rope_frequencies(flux_image_positions(hp, wp), cfg.axes_dim)
    txt_rope = cm.rope_frequencies(jnp.zeros((s_txt, 3), jnp.int32), cfg.axes_dim)

    @jax.jit
    def loop(params, img):
        def body(carry, _):
            out, _, _ = flux_forward(
                params, carry, txt, pooled, t,
                t if cfg.guidance_embeds else None, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
            )
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, img, None, length=steps)
        return jnp.sum(out)

    _ = np.asarray(loop(params, img0))  # compile+run
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(loop(params, img0))
        times.append(time.perf_counter() - t0)
    return min(times) / steps * 1e3


def main():
    assert jax.default_backend() == "tpu"
    base = dict(guidance_embeds=False)  # schnell

    # depth sweep to separate per-double / per-single block cost
    cfg_a = dataclasses.replace(FluxConfig(**base), double_layers=4, single_layers=8)
    cfg_b = dataclasses.replace(FluxConfig(**base), double_layers=8, single_layers=8)
    cfg_c = dataclasses.replace(FluxConfig(**base), double_layers=4, single_layers=16)
    ms_a = _fwd_ms(cfg_a)
    ms_b = _fwd_ms(cfg_b)
    ms_c = _fwd_ms(cfg_c)
    per_double = (ms_b - ms_a) / 4.0
    per_single = (ms_c - ms_a) / 8.0
    overhead = ms_a - 4 * per_double - 8 * per_single
    full_fwd = overhead + 19 * per_double + 38 * per_single

    # flops accounting at S_img=4096, S_txt=512 for MFU.  Per STREAM a
    # double block is 18d^2 params (6d^2 AdaLN mod + 3d^2 qkv + d^2 out +
    # 8d^2 ffn) and each stream only sees its own tokens; a single block is
    # 15d^2 over the fused stream.  (Pre-r5 this dropped the mod matmuls
    # and out-projections and reported ~0.72x the true MFU.)
    d = 3072
    s_all = 4096 + 512
    double_flops = 2 * s_all * (18 * d * d) + 4 * s_all * s_all * d
    single_flops = 2 * s_all * (15 * d * d) + 4 * s_all * s_all * d
    full_flops = 19 * double_flops + 38 * single_flops
    mfu = full_flops / (full_fwd / 1e3) / 197e12

    report = {
        "device": str(jax.devices()[0]),
        "shape": {"img_tokens": 4096, "txt_tokens": 512, "px": 1024},
        "reduced_depth_fwd_ms": {"4+8": round(ms_a, 2), "8+8": round(ms_b, 2),
                                 "4+16": round(ms_c, 2)},
        "per_double_block_ms": round(per_double, 3),
        "per_single_block_ms": round(per_single, 3),
        "extrapolated_full_depth_fwd_ms": round(full_fwd, 1),
        "extrapolated_schnell_4step_s_per_image_1chip": round(
            4 * full_fwd / 1e3, 3
        ),
        "model_forward_mfu_pct": round(100 * mfu, 1),
        "note": "full FLUX (24 GB bf16) exceeds one v5e's HBM; per-block "
                "times measured via depth sweep at real 1024px shapes",
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FLUX.json",
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
