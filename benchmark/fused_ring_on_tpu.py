"""On-silicon validation of the fused compressed-ring kernel BODY.

Multi-chip RDMA cannot run on one chip, but everything else in
``compact_binary_ring_flash`` can: the in-kernel 1-bit unpack (int32
shifts), the rank-K scale matmul, the EF base write, and the flash
accumulation all lower through Mosaic and execute at ``ring_size=1`` (the
degenerate ring: zero RDMA steps, sender EF update + exact-local
attention).  This script runs that on the real TPU against the unfused
ppermute-path semantics and writes ``FUSED_RING_TPU.json`` — lifting the
kernel from "interpreter-verified" to "compute body validated on v5e;
RDMA/barrier path pending multi-chip hardware".

    python benchmark/fused_ring_on_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from compactfusion_tpu.utils import jax_cache

jax_cache.enable()

from compactfusion_tpu.compact.ring import compact_ring_attention
from compactfusion_tpu.compact.engine import EFState
from compactfusion_tpu.compact.ring import CompactRingState, init_ring_state
from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.ops.ring_flash_pallas import compact_binary_ring_flash


def main():
    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"needs the TPU chip, got {dev.platform}"
    mesh = Mesh(np.array([dev]), ("ring",))

    results = []
    cases = [
        (1, 1024, 16, 128, -1, "binary"),
        (2, 512, 8, 128, 2, "binary"),
        (1, 1024, 16, 128, -1, "int2"),
        (1, 1024, 16, 128, 2, "lowrank"),  # the north-star >=100x codec
    ]
    for (b, s, h, d, rank, codec) in cases:
        n, c = b * s, h * d
        rng = np.random.default_rng(0)
        # production activation dtype: bf16 inputs make every MXU product
        # exact, so the two flash schedules (in-kernel vs flash_pallas) and
        # the two EF paths (Mosaic vs XLA codecs) are directly comparable
        q, k, v = (
            jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
            for _ in range(3)
        )
        base0 = jnp.asarray(
            rng.standard_normal((1, n, c)) * 0.5, jnp.float32
        )  # non-zero base: the delta path is exercised

        method = {
            "binary": CompressType.BINARY,
            "int2": CompressType.INT2,
            "lowrank": CompressType.LOW_RANK,
        }[codec]
        cfg = CompactConfig(
            enabled=True, compress_type=method, comp_rank=rank,
            residual=1, error_feedback=True, warmup_steps=0, fastpath=False,
        )

        def fused(q, k, v, kb, vb):
            out, lse, kb2, vb2 = compact_binary_ring_flash(
                q, k, v, kb, vb, axis_name="ring", ring_size=1,
                mesh_axes=(("ring", 1),), comp_rank=rank, codec=codec,
            )
            return out, kb2, vb2

        def ref(q, k, v, st):
            out, st2 = compact_ring_attention(
                q, k, v, st, cfg=cfg, method=method,
                axis_name="ring", ring_size=1,
            )
            return out, st2

        fused_fn = jax.jit(jax.shard_map(
            fused, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False,
        ))
        ref_fn = jax.jit(jax.shard_map(
            ref, mesh=mesh, in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False,
        ))

        st = CompactRingState(
            k=EFState(base=base0, delta_base=None),
            v=EFState(base=base0, delta_base=None),
        )
        t0 = time.time()
        out_f, kb_f, vb_f = fused_fn(q, k, v, base0, base0)
        out_f = np.asarray(out_f, np.float32)  # tunnel-safe sync
        t_fused = time.time() - t0
        out_r, st_r = ref_fn(q, k, v, st)
        out_r = np.asarray(out_r, np.float32)

        err_out = float(
            np.linalg.norm(out_f - out_r) / (np.linalg.norm(out_r) + 1e-12)
        )
        err_kb = float(
            np.linalg.norm(np.asarray(kb_f) - np.asarray(st_r.k.base))
            / (np.linalg.norm(np.asarray(st_r.k.base)) + 1e-12)
        )
        # EF bases must match the unfused codecs BIT-EXACTLY (fp32 state,
        # bf16 wire scales — every op pair is exact on both sides).  out is
        # bounded by 1-ulp bf16 output rounding between the two flash
        # schedules (different m/l update orders round the final bf16 cast
        # differently on ~13% of elements; measured max|diff| = 2^-9).
        # steady-state compute-body timing: amortise the tunnel RTT over N
        # queued calls with ONE device->host sync (bench.py methodology).
        # ring_size=1 has zero RDMA, so this compares the two codec+flash
        # COMPUTE schedules — in-kernel Mosaic dequant/EF vs the XLA
        # codec ops + separate flash kernel of the ppermute path.
        def _ms_per_call(fn, *args, n=20, reps=3):
            o = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(o)[0][0, 0])  # settle
            best = float("inf")
            for _ in range(reps):  # min-of-reps: tunnel dispatch is spiky
                t0 = time.perf_counter()
                for _ in range(n):
                    o = fn(*args)
                np.asarray(jax.tree_util.tree_leaves(o)[0][0, 0])
                best = min(best, (time.perf_counter() - t0) / n * 1e3)
            return best

        ms_fused = _ms_per_call(fused_fn, q, k, v, base0, base0)
        ms_ref = _ms_per_call(ref_fn, q, k, v, st)

        row = {
            "shape": [b, s, h, d], "comp_rank": rank, "codec": codec,
            "out_rel_err_vs_unfused": err_out,
            "ef_base_rel_err_vs_unfused": err_kb,
            "first_call_s": round(t_fused, 1),
            "fused_ms_per_call": round(ms_fused, 2),
            "unfused_ms_per_call": round(ms_ref, 2),
            "ok": bool(err_out < 5e-3 and err_kb == 0.0),
        }
        results.append(row)
        print(row, flush=True)
        assert row["ok"], row

    report = {
        "device": str(dev.device_kind),
        "note": (
            "ring_size=1 degenerate case: in-kernel unpack/scale-matmul/"
            "EF-write/flash validated ON SILICON; RDMA + neighbor barriers "
            "remain interpreter-verified pending multi-chip hardware"
        ),
        "timing_note": (
            "compute-body only (zero RDMA at ring_size=1): fused wins "
            "~1.4x for binary/int2 (in-kernel Mosaic dequant beats the XLA "
            "unpack+pack op chain); lowrank fused is ~0.5 ms slower — its "
            "codec compute is tiny, so the kernel's EF-base relayout "
            "(R,B*S,C)<->(B,H,R,S,D) dominates.  On multi-chip the fused "
            "path's point is comm/compute overlap, which this cannot "
            "measure; the ppermute path stays the default."
        ),
        "results": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FUSED_RING_TPU.json",
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print("FUSED RING BODY OK ON TPU")


if __name__ == "__main__":
    main()
