"""Cost of int8 EF caches (``quantized_cache``) — making the fused-ring
gate a DECISION, not an accident (VERDICT r4 weak #3 / next #6).

As of r5 the fused compressed-ring kernel supports int8 EF bases directly
at B == 1 (``ops/ring_flash_pallas.compact_binary_ring_flash
quantized=True``, bit-pinned against the jnp path in
``tests/core/test_compact_ring_fused.py``); other configs take the
ppermute path.  This script supplies the numbers behind that design:

1. STATIC HBM accounting (exact, from payload shapes): per-device EF base
   bytes — ``layers * 2(K,V) * ring * S_local * C * dtype`` — for the
   flagship shapes, bf16 vs int8.  Punchline: at FLUX-1024 ring-8 the raw
   caches are ~2.9 GB bf16 vs 1.45 GB int8; at CogVideoX-49f ring-8 they
   are 9.05 GB bf16 vs 4.54 GB int8 — int8 is what makes compressed-ring
   video FIT next to ~5 GB of weights on a 16 GB v5e; at
   HunyuanVideo-129f scale caches are 88/44 GB — that scale needs cache
   sharding/offload in ANY dtype.

2. MEASURED per-step compute cost of the int8 dequant/requant (the
   emulated ring on one chip, PixArt 0.61B 512px, binary codec): pipeline
   seconds/image with quantized_cache off vs on.  The kernels' comm-overlap
   value cannot be measured on one chip (no RDMA); this isolates what the
   quantization costs in COMPUTE.

Writes QUANT_CACHE_COST.json.

    python benchmark/quantized_cache_cost.py          # on the real chip
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BUSY_FLAG = "/tmp/tpu_busy"


def static_hbm_table():
    shapes = {
        # (layers, tokens, C=heads*head_dim per ring rank at ulysses=1)
        "flux_1024_ring8": (57, 4096, 3072, 8),
        "cogvideox5b_49f_720x480_ring8": (42, 17550, 3072, 8),
        "hunyuanvideo_720p_129f_ring8": (60, 118800, 3072, 8),
    }
    out = {}
    for name, (layers, tokens, c, ring) in shapes.items():
        s_loc = tokens // ring
        elems = layers * 2 * ring * s_loc * c
        scale_bytes = layers * 2 * ring * 2 * c * 2  # bf16 scale+min rows
        out[name] = {
            "ef_cache_gb_bf16": round(elems * 2 / 1e9, 2),
            "ef_cache_gb_int8": round((elems + scale_bytes) / 1e9, 2),
        }
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from compactfusion_tpu.utils import jax_cache

    jax_cache.enable()

    from compactfusion_tpu.config import (
        CompactConfig,
        CompressType,
        ParallelConfig,
    )
    from compactfusion_tpu.models.common import jit_init
    from compactfusion_tpu.models.pixart import init_pixart, pixart_alpha_512
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )

    mcfg = pixart_alpha_512()
    params = jit_init(init_pixart, jax.random.PRNGKey(0), mcfg)
    par = ParallelConfig()
    mesh = make_mesh(par, devices=jax.devices()[:1])

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((2, 1, 120, mcfg.text_dim)), jnp.float32)
    mask = jnp.ones((2, 1, 120), bool)
    key = jax.random.PRNGKey(2)
    checksum = jax.jit(jnp.sum)

    def run_case(quantized):
        compact = CompactConfig(
            enabled=True,
            compress_type=CompressType.BINARY,
            warmup_steps=2,
            residual=1,
            error_feedback=True,
            fastpath=not quantized,  # fastpath gate also excludes quantized
            quantized_cache=quantized,
            simulate_ring=4,
        )
        pcfg = PixArtPipelineConfig(
            model=mcfg, vae=None, parallel=par, compact=compact,
            num_steps=20, guidance_scale=4.5, height=512, width=512,
        )
        pipe = PixArtPipeline(params, None, pcfg, mesh)

        def run(n=1):
            for _ in range(n):
                lat = pipe(text, mask, key, decode=False)
            return float(np.asarray(checksum(lat)))

        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(4)
            times.append((time.perf_counter() - t0) / 4)
        return min(times)

    raw = run_case(False)
    quant = run_case(True)
    out = {
        "workload": "PixArt-0.61B 512px 20 steps CFG, emulated ring-4 "
        "(SimRingAttn), binary codec, single v5e",
        "sec_per_image_raw_bf16_cache": round(raw, 4),
        "sec_per_image_quantized_cache": round(quant, 4),
        "quantized_cache_overhead_pct": round((quant / raw - 1) * 100, 1),
        "static_hbm": static_hbm_table(),
        "note": "compute-side cost of the ppermute fallback's int8 "
        "dequant/requant; the fused kernel's comm-overlap value is a "
        "multi-chip quantity this one-chip measurement cannot see",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUANT_CACHE_COST.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    created = False
    try:
        os.close(os.open(_BUSY_FLAG, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        created = True
    except FileExistsError:
        sys.exit(f"{_BUSY_FLAG} exists: another TPU job is running")
    try:
        main()
    finally:
        if created:
            os.remove(_BUSY_FLAG)
