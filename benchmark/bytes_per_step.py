"""Inter-chip bytes/step accounting — the CompactFusion headline metric.

Reference: the paper's ">=100x compression, <1% of data sent" claim
(``README.md:34``) and the latency CSVs in ``compact_plot/latency_data/``.
This script computes, from static payload shapes, the exact bytes each device
puts on the interconnect per denoise step for a given model/parallel/compact
config — uncompressed ring vs compressed ring — and prints a JSON report.

    python benchmark/bytes_per_step.py --model flux --ring_degree 8 \
        --compact_type binary --height 1024 --width 1024
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json

import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.compact import codecs
from compactfusion_tpu.config import CompressType


MODELS = {
    # (layers_with_attention, heads, head_dim, token_fn)
    "flux": dict(layers=57, heads=24, head_dim=128,
                 tokens=lambda h, w, f: (h // 16) * (w // 16)),
    "pixart": dict(layers=28, heads=16, head_dim=72,
                   tokens=lambda h, w, f: (h // 16) * (w // 16)),
    "sd3": dict(layers=24, heads=24, head_dim=64,
                tokens=lambda h, w, f: (h // 16) * (w // 16)),
    "cogvideox": dict(layers=42, heads=48, head_dim=64,
                      tokens=lambda h, w, f: ((f - 1) // 4 + 1)
                      * (h // 16) * (w // 16)),
    "hunyuanvideo": dict(layers=60, heads=24, head_dim=128,
                         tokens=lambda h, w, f: ((f - 1) // 4 + 1)
                         * (h // 16) * (w // 16)),
}


def ring_bytes_per_step(
    model: str,
    ring: int,
    ulysses: int,
    height: int,
    width: int,
    frames: int = 1,
    compact_type: str = "none",
    comp_rank: int = -1,
    batch: int = 1,
    kv_dtype_bytes: int = 2,
):
    m = MODELS[model]
    tokens = m["tokens"](height, width, frames)
    # per-device ring-block geometry after the ulysses all-to-all
    n = batch * tokens // ring
    c = (m["heads"] // ulysses) * m["head_dim"]

    raw_block = n * c * kv_dtype_bytes  # one K or V block
    hops = ring - 1  # each device forwards its payload ring-1 times
    raw_per_layer = 2 * raw_block * hops  # K and V

    if compact_type == "none":
        comp_per_layer = raw_per_layer
    else:
        x = jnp.zeros((n, c), jnp.bfloat16)
        payload = codecs.encode(
            x, CompressType(compact_type), rank=comp_rank
        )
        comp_block = codecs.payload_nbytes(payload)
        comp_per_layer = 2 * comp_block * hops

    return {
        "model": model,
        "tokens": tokens,
        "ring": ring,
        "ulysses": ulysses,
        "block_shape": [n, c],
        "raw_bytes_per_step_per_device": raw_per_layer * m["layers"],
        "compressed_bytes_per_step_per_device": comp_per_layer * m["layers"],
        "compression_ratio": raw_per_layer / comp_per_layer,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="flux", choices=sorted(MODELS))
    p.add_argument("--ring_degree", type=int, default=8)
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--compact_type", default="binary")
    p.add_argument("--compact_rank", type=int, default=-1)
    args = p.parse_args()

    report = ring_bytes_per_step(
        args.model,
        args.ring_degree,
        args.ulysses_degree,
        args.height,
        args.width,
        args.num_frames,
        args.compact_type,
        args.compact_rank,
    )
    print(json.dumps(report, indent=2, default=float))


if __name__ == "__main__":
    main()
