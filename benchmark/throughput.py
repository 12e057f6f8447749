"""Single-chip throughput: PixArt-512 images/sec vs batch size.

The latency bench (bench.py) measures one CFG image at a time; production
serving batches requests.  Larger batches raise MXU utilisation (bigger
matmul M dims) until HBM capacity or attention VPU overhead saturates.

Writes THROUGHPUT.json at the repo root:
    {"batch": [...], "sec_per_image": [...], "images_per_sec": [...]}

Run: python benchmark/throughput.py   (requires the TPU chip)
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

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models.common import jit_init
from compactfusion_tpu.models.pixart import init_pixart, pixart_alpha_512
from compactfusion_tpu.models.vae import init_vae_decoder, sd_vae
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.pipelines.pixart import PixArtPipeline, PixArtPipelineConfig


def main():
    mcfg = pixart_alpha_512()
    params = jit_init(init_pixart, jax.random.PRNGKey(0), mcfg)
    vcfg = sd_vae()
    vae_params = jit_init(init_vae_decoder, jax.random.PRNGKey(1), vcfg)

    pcfg = PixArtPipelineConfig(
        model=mcfg, vae=vcfg, parallel=ParallelConfig(),
        num_steps=20, guidance_scale=4.5, height=512, width=512,
    )
    mesh = make_mesh(pcfg.parallel, devices=jax.devices()[:1])
    pipe = PixArtPipeline(params, vae_params, pcfg, mesh)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(2)
    checksum = jax.jit(jnp.sum)

    batches, spi, ips = [], [], []
    for b in (1, 2, 4, 8):
        text = jnp.asarray(
            rng.standard_normal((2, b, 120, mcfg.text_dim)), jnp.float32
        )
        mask = jnp.ones((2, b, 120), bool)
        img = pipe(text, mask, key)  # compile + warm
        float(np.asarray(checksum(img.astype(jnp.float32))))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            img = pipe(text, mask, key)
        float(np.asarray(checksum(img.astype(jnp.float32))))
        dt = (time.perf_counter() - t0) / n
        batches.append(b)
        spi.append(round(dt / b, 4))
        ips.append(round(b / dt, 3))
        print(f"batch {b}: {dt:.3f} s/call = {dt / b:.4f} s/image "
              f"({b / dt:.2f} img/s)", flush=True)

    out = {
        "metric": "pixart_alpha_512px_20steps_throughput_1chip",
        "batch": batches,
        "sec_per_image": spi,
        "images_per_sec": ips,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "THROUGHPUT.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
