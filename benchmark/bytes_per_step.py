"""Inter-chip bytes/step accounting — the CompactFusion headline metric.

Reference: the paper's ">=100x compression, <1% of data sent" claim
(``README.md:34``) and the latency CSVs in ``compact_plot/latency_data/``.
This script computes, from static payload shapes, the exact bytes each device
puts on the interconnect per denoise step for a given model/parallel/compact
config — uncompressed ring vs compressed ring — and prints a JSON report.

    python benchmark/bytes_per_step.py --model flux --ring_degree 8 \
        --compact_type binary --height 1024 --width 1024

``--northstar`` emits BYTES_NORTHSTAR.json: the FLUX-1024 ring-8 rows that
demonstrate the >=100x configurations (low-rank rank-2/4, AWL, and a
per-layer binary+low-rank mix), with steady-state AND warmup-amortised
ratios.  Quality at these exact codecs is measured at real scale by
``benchmark/quality_real_scale.py`` (QUALITY_REAL_SCALE.json).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json

import jax

# static payload-shape accounting only: pin CPU AFTER import or the axon
# plugin grabs the single-tenant chip and deadlocks any running TPU job
jax.config.update("jax_platforms", "cpu")

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


def _block_bytes(n: int, c: int, compact_type: str, comp_rank: int) -> int:
    """Wire bytes of ONE compressed K-or-V block (static payload shapes)."""
    x = jnp.zeros((n, c), jnp.bfloat16)
    payload = codecs.encode(x, CompressType(compact_type), rank=comp_rank)
    return codecs.payload_nbytes(payload)


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
    layer_plan=None,
):
    """``layer_plan``: optional per-layer mix [(compact_type, rank, n_layers),
    ...] (the per-layer ``compress_func`` of the reference); overrides
    ``compact_type`` and must sum to the model's layer count."""
    m = MODELS[model]
    tokens = m["tokens"](height, width, frames)
    # per-device ring-block geometry after the ulysses all-to-all
    n = batch * tokens // ring
    c = (m["heads"] // ulysses) * m["head_dim"]

    raw_block = n * c * kv_dtype_bytes  # one K or V block
    hops = ring - 1  # each device forwards its payload ring-1 times
    raw_per_layer = 2 * raw_block * hops  # K and V
    raw_total = raw_per_layer * m["layers"]

    if layer_plan is not None:
        assert sum(nl for _, _, nl in layer_plan) == m["layers"]
        comp_total = sum(
            2 * _block_bytes(n, c, ct, rk) * hops * nl
            for ct, rk, nl in layer_plan
        )
    elif compact_type == "none":
        comp_total = raw_total
    else:
        comp_total = (
            2 * _block_bytes(n, c, compact_type, comp_rank) * hops * m["layers"]
        )

    return {
        "model": model,
        "tokens": tokens,
        "ring": ring,
        "ulysses": ulysses,
        "block_shape": [n, c],
        "raw_bytes_per_step_per_device": raw_total,
        "compressed_bytes_per_step_per_device": comp_total,
        "compression_ratio": raw_total / comp_total,
    }


def northstar(out_path: str):
    """The >=100x evidence rows: FLUX-1024, ring-8, per-device bytes/step.

    Matches the paper headline (``/root/reference/README.md:34``, latency
    CSVs ``compact_plot/latency_data/latency_eth.csv``): low-rank at small
    rank crosses 100x; the per-layer mix shows the practical schedule
    (1-bit early layers for fidelity + rank-2 low-rank for the rest).
    """
    rows = []
    configs = [
        ("binary", dict(compact_type="binary")),
        ("int2", dict(compact_type="int2")),
        ("low-rank-r4", dict(compact_type="low-rank", comp_rank=4)),
        ("low-rank-r2", dict(compact_type="low-rank", comp_rank=2)),
        ("low-rank-awl-r2", dict(compact_type="low-rank-awl", comp_rank=2)),
        (
            "mix-binary9+low-rank-r2",
            dict(layer_plan=[("binary", -1, 9), ("low-rank", 2, 48)]),
        ),
    ]
    warmup, steps = 4, 28  # FLUX.1-dev 28-step schedule, 4 warmup
    for name, kw in configs:
        r = ring_bytes_per_step(
            "flux", ring=8, ulysses=1, height=1024, width=1024, **kw
        )
        steady = r["compression_ratio"]
        # warmup steps send raw payloads: amortised end-to-end ratio
        e2e = steps / (warmup + (steps - warmup) / steady)
        rows.append(
            {
                "config": name,
                "steady_state_ratio": round(float(steady), 1),
                "e2e_ratio_28steps_4warmup": round(float(e2e), 2),
                "bytes_per_step_per_device": int(
                    r["compressed_bytes_per_step_per_device"]
                ),
                "raw_bytes_per_step_per_device": int(
                    r["raw_bytes_per_step_per_device"]
                ),
                "pct_of_data_sent": round(100.0 / steady, 3),
            }
        )
    report = {
        "workload": "FLUX-1024 (4096 tokens), ring_degree=8, bf16 K/V",
        "headline": max(r["steady_state_ratio"] for r in rows),
        "claim": ">=100x inter-chip bytes/step reduction (BASELINE.json)",
        "quality_at_these_codecs": "QUALITY_REAL_SCALE.json",
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--northstar", action="store_true",
                   help="emit BYTES_NORTHSTAR.json (>=100x configs)")
    p.add_argument("--model", default="flux", choices=sorted(MODELS))
    p.add_argument("--ring_degree", type=int, default=8)
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num_frames", type=int, default=1)
    p.add_argument("--compact_type", default="binary")
    p.add_argument("--compact_rank", type=int, default=-1)
    args = p.parse_args()
    if "low-rank" in args.compact_type and args.compact_rank < 1:
        p.error(
            "--compact_type low-rank* needs an explicit --compact_rank >= 1 "
            "(the factor rank IS the payload size)"
        )

    if args.northstar:
        northstar(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "BYTES_NORTHSTAR.json",
            )
        )
        return

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
