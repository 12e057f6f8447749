"""Analytical multi-chip latency model — the bandwidth-sweep story.

The paper's headline latency results (``compact_plot/latency_data/
latency_{pcie,nvlink,eth}.csv`` + the ``tc``-throttled ``BW_test.sh`` runs)
show compression winning exactly when the link is slow.  Multi-chip TPU
hardware is not attached in this environment, so this script produces the
HONEST analog: an ANALYTICAL roofline combining

  * MEASURED single-chip compute (``BENCH_FLUX.json``: per-block forward
    times at real 1024px shapes, 59.8% model-forward MFU on v5e), and
  * EXACT per-device wire volume from static payload shapes
    (``benchmark/bytes_per_step.ring_bytes_per_step`` — the same accounting
    behind ``BYTES_NORTHSTAR.json``),

under a simple execution model: per denoise step,

    t_step = max(t_compute, overlap * t_comm) + (1 - overlap) * t_comm

with t_comm = ring bytes / link bandwidth (each device sends and receives
its payload every hop; hops pipeline, so the serialized wire time is the
per-device byte volume over the per-link bandwidth).  ``overlap`` models
how much of the transfer hides under the flash partials (XLA scheduler /
the fused ring kernel); both 0 (worst case) and 1 (perfect) are reported.

EVERY number here is a model prediction, not a measurement — the JSON says
so.  Measured inputs are cited inline.

    python benchmark/latency_model.py        # writes LATENCY_MODEL.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- measured single-chip inputs (BENCH_FLUX.json, v5e) -------------------
FWD_MS_1CHIP = 575.4  # full-depth FLUX-1024 forward, measured per-block
STEPS = 28

# ---- link bandwidths (GB/s, per direction per device) ---------------------
LINKS = {
    # v5e ICI: 4 links x ~50 GB/s each direction per chip (public v5e
    # spec: 1600 Gbps aggregate).  The ring implementations send each hop
    # to ONE neighbor in one direction (ppermute rotation / the fused RDMA
    # kernel), so the effective SEND bandwidth is a single link — counting
    # the receive-side link would halve predicted ICI comm time for
    # traffic no code path splits into counter-rotating half-rings
    "ici_v5e_ring": 50.0,
    # DCN between slices/hosts (~200 Gbps NICs)
    "dcn_25GBps": 25.0,
    # the paper's bandwidth-constrained point (latency_eth.csv: 2000 MB/s)
    "eth_2GBps": 2.0,
    # heavily constrained multi-datacenter style link
    "wan_0.5GBps": 0.5,
}


def model(ring: int = 8):
    from benchmark.bytes_per_step import ring_bytes_per_step

    # compute shrinks ~linearly with sequence sharding (attention's
    # quadratic term is subdominant at FLUX-1024; measured FFN-dominated)
    t_compute = FWD_MS_1CHIP / ring / 1e3  # s per step per device

    configs = [
        ("uncompressed-ring", dict(compact_type="none")),
        ("compact-1bit", dict(compact_type="binary")),
        ("compact-low-rank-r2", dict(compact_type="low-rank", comp_rank=2)),
    ]
    warmup = 4  # warmup steps ship RAW bf16 payloads (CompactConfig default)
    out = {"model": "FLUX-1024, 28 steps, ring-%d" % ring,
           "inputs": {
               "fwd_ms_1chip_measured": FWD_MS_1CHIP,
               "t_compute_per_step_s": round(t_compute, 4),
               "source": "BENCH_FLUX.json (59.8% MFU, v5e) + exact payload shapes",
           },
           "note": "ANALYTICAL PREDICTION, not a measurement",
           "reference_measured_eth_2GBps": {
               "ring_s": 44.41, "compact_1bit_s": 13.89, "speedup": 3.2,
               "source": "compact_plot/latency_data/latency_eth.csv (8 GPUs)",
               "comment": "same direction; larger predicted ratios here "
                          "because the v5e compute term is smaller",
           },
           "links": {}}
    for link, bw in LINKS.items():
        rows = []
        base_e2e = None
        for name, kw in configs:
            r = ring_bytes_per_step(
                "flux", ring=ring, ulysses=1, height=1024, width=1024, **kw
            )
            bytes_dev = r["compressed_bytes_per_step_per_device"]
            raw_dev = r["raw_bytes_per_step_per_device"]
            t_comm = bytes_dev / (bw * 1e9)
            t_comm_raw = raw_dev / (bw * 1e9)
            # warmup steps send RAW payloads — on slow links they dominate
            # the compressed configs' e2e (bytes_per_step.py amortises the
            # same way); uncompressed configs have bytes_dev == raw_dev
            steady = STEPS - warmup
            e2e0 = warmup * (t_compute + t_comm_raw) + steady * (
                t_compute + t_comm
            )
            e2e1 = warmup * max(t_compute, t_comm_raw) + steady * max(
                t_compute, t_comm
            )
            if base_e2e is None:
                base_e2e = (e2e0, e2e1)
            rows.append({
                "config": name,
                "comm_s_per_step": round(t_comm, 4),
                "e2e_s_no_overlap": round(e2e0, 2),
                "e2e_s_full_overlap": round(e2e1, 2),
                "speedup_vs_uncompressed_no_overlap": round(
                    base_e2e[0] / e2e0, 2
                ),
                "speedup_vs_uncompressed_full_overlap": round(
                    base_e2e[1] / e2e1, 2
                ),
            })
        out["links"][link] = rows
    return out


def main():
    report = model()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LATENCY_MODEL.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
