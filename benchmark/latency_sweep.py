"""Config-matrix latency sweep — one JSON, every parallel factorization.

Analog of the reference's ``benchmark/single_node_latency_test.py`` (which
spawns ``torchrun`` subprocesses over size x cfg x pp x ulysses x ring
factorizations of N GPUs).  SPMD makes subprocess orchestration unnecessary:
this enumerates every valid ``ParallelConfig`` factorization of the visible
device pool IN PROCESS, times each compiled pipeline, and writes
``LATENCY_SWEEP.json``.

Runs today on the virtual CPU mesh (functional validation of every
factorization; absolute times are not meaningful there) and unchanged on a
real TPU pod slice the day one is attached — the device pool is whatever
``jax.devices()`` reports.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmark/latency_sweep.py --sizes 64 --steps 4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def factorizations(n: int, max_pp: int):
    """(cfg, pp, ulysses, ring) with cfg*pp*ulysses*ring == n (dp fills in
    nothing — the sweep measures model parallelism like the reference)."""
    out = []
    for cfg_deg in (1, 2):
        if n % cfg_deg:
            continue
        mp = n // cfg_deg
        pp = 1
        while pp <= min(mp, max_pp):
            sp = mp // pp
            if pp * sp == mp:
                uly = 1
                while uly <= sp:
                    ring = sp // uly
                    if uly * ring == sp:
                        out.append((cfg_deg, pp, uly, ring))
                    uly *= 2
            pp *= 2
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[64])
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--n_devices", type=int, default=0, help="0 = all")
    p.add_argument("--max_pp", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (CPU-mesh validation runs)")
    p.add_argument("--compact", default="none",
                   help="none | binary | low-rank | ... (ring codecs)")
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # the axon plugin force-appends itself to jax_platforms; pin CPU
        # explicitly or the sweep grabs (and contends for) the real chip
        if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from compactfusion_tpu.config import (
        CompactConfig,
        CompressType,
        ParallelConfig,
    )
    from compactfusion_tpu.models.common import jit_init
    from compactfusion_tpu.models.pixart import (
        init_pixart,
        pixart_alpha_512,
        pixart_tiny,
    )
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )
    from compactfusion_tpu.utils import jax_cache

    jax_cache.enable()

    n = args.n_devices or len(jax.devices())
    mcfg = pixart_tiny() if args.tiny else pixart_alpha_512()
    params = jit_init(init_pixart, jax.random.PRNGKey(0), mcfg)

    rows = []
    for size in args.sizes:
        tokens = (size // 8 // mcfg.patch) ** 2
        for cfg_deg, pp, uly, ring in factorizations(n, args.max_pp):
            par = ParallelConfig(
                cfg_degree=cfg_deg, pp_degree=pp,
                ulysses_degree=uly, ring_degree=ring,
            )
            tag = f"s{size}-cfg{cfg_deg}-pp{pp}-u{uly}-r{ring}"
            if tokens % max(par.sp_degree, 1):
                rows.append({"config": tag, "skipped": "tokens % sp != 0"})
                continue
            if mcfg.heads % uly:
                rows.append({"config": tag, "skipped": "heads % ulysses != 0"})
                continue
            compact = (
                CompactConfig()
                if args.compact == "none" or ring == 1
                else CompactConfig(
                    enabled=True,
                    compress_type=CompressType(args.compact),
                    warmup_steps=1,
                    comp_rank=2 if "rank" in args.compact else -1,
                )
            )
            try:
                pcfg = PixArtPipelineConfig(
                    model=mcfg, vae=None, parallel=par, compact=compact,
                    num_steps=args.steps, guidance_scale=4.5,
                    height=size, width=size,
                )
                mesh = make_mesh(par, devices=jax.devices()[: par.world_size])
                pipe = PixArtPipeline(params, None, pcfg, mesh)
                rng = np.random.default_rng(0)
                text = jnp.asarray(
                    rng.standard_normal((2, 1, 8, mcfg.text_dim)), jnp.float32
                )
                mask = jnp.ones((2, 1, 8), bool)
                key = jax.random.PRNGKey(1)

                t0 = time.perf_counter()
                lat = pipe(text, mask, key, decode=False)
                np.asarray(lat, np.float32)  # sync (tunnel-safe)
                compile_s = time.perf_counter() - t0

                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    lat = pipe(text, mask, key, decode=False)
                    np.asarray(lat, np.float32)
                    times.append(time.perf_counter() - t0)
                rows.append(
                    {
                        "config": tag,
                        "world_size": par.world_size,
                        "latency_s": round(min(times), 4),
                        "compile_s": round(compile_s, 1),
                    }
                )
            except Exception as e:  # record, keep sweeping
                rows.append({"config": tag, "error": f"{type(e).__name__}: {e}"[:200]})
            print(rows[-1], flush=True)

    report = {
        "devices": n,
        "backend": jax.default_backend(),
        "model": "pixart-tiny" if args.tiny else "pixart-alpha-512",
        "steps": args.steps,
        "compact": args.compact,
        "rows": rows,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LATENCY_SWEEP.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"rows": len(rows), "out": out_path}))


if __name__ == "__main__":
    main()
