"""Compression statistics.

Reference semantics: ``StatsLogger`` (``xfuser/compact/stats.py:37-120,389+``)
— per-(cache-key, step) reconstruction error / relative error / cosine
similarity / norms, plus a bytes-on-the-wire summary giving the end-to-end
compression ratio the paper reports.

Split into two halves, jit-compatible by construction:
  * :func:`compression_metrics` — a pure function of (original, recon)
    returning a dict of scalars; call it inside the compiled step and ship
    the scalars out via ``jax.debug.callback`` (see :func:`log_inside_jit`)
    or as scan outputs.
  * :class:`StatsLogger` — the host-side accumulator with the reference's
    ``summary`` / ``summary_compression_volume`` reporting.
"""

from __future__ import annotations

import collections
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from compactfusion_tpu.compact.codecs import payload_nbytes


def compression_metrics(x: jax.Array, x_hat: jax.Array) -> Dict[str, jax.Array]:
    """Pure per-tensor reconstruction metrics (all fp32 scalars)."""
    x32 = x.astype(jnp.float32)
    r32 = x_hat.astype(jnp.float32)
    err = r32 - x32
    x_norm = jnp.linalg.norm(x32)
    e_norm = jnp.linalg.norm(err)
    cos = jnp.sum(x32 * r32) / jnp.maximum(
        x_norm * jnp.linalg.norm(r32), 1e-12
    )
    return {
        "err_norm": e_norm,
        "rel_err": e_norm / jnp.maximum(x_norm, 1e-12),
        "cos_sim": cos,
        "x_norm": x_norm,
    }


class StatsLogger:
    """Host-side accumulator (singleton like the reference ``stats_log()``)."""

    _instance: Optional["StatsLogger"] = None

    def __init__(self):
        self.records = collections.defaultdict(list)  # key -> [(step, metrics)]
        self.sent_bytes = 0
        self.raw_bytes = 0

    @classmethod
    def instance(cls) -> "StatsLogger":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    def reset(cls):
        cls._instance = StatsLogger()

    def log(self, key: str, step: int, metrics: Dict[str, float]):
        self.records[key].append((int(step), {k: float(v) for k, v in metrics.items()}))

    def log_volume(self, payload, raw_array):
        """Account one transfer (reference summary_compression_volume)."""
        self.sent_bytes += payload_nbytes(payload)
        self.raw_bytes += raw_array.size * raw_array.dtype.itemsize

    def account_volume(self, sent: int, raw: int):
        self.sent_bytes += sent
        self.raw_bytes += raw

    @property
    def compression_ratio(self) -> float:
        return self.raw_bytes / max(self.sent_bytes, 1)

    def summary(self) -> str:
        lines = []
        for key in sorted(self.records):
            recs = self.records[key]
            last = recs[-1][1]
            mean_rel = sum(m["rel_err"] for _, m in recs) / len(recs)
            lines.append(
                f"{key}: steps={len(recs)} mean_rel_err={mean_rel:.4f} "
                f"last_rel_err={last['rel_err']:.4f} last_cos={last['cos_sim']:.4f}"
            )
        if self.raw_bytes:
            lines.append(
                f"volume: raw={self.raw_bytes/1e6:.1f}MB "
                f"sent={self.sent_bytes/1e6:.3f}MB "
                f"ratio={self.compression_ratio:.1f}x"
            )
        return "\n".join(lines)


def log_inside_jit(key: str, step, metrics: Dict[str, jax.Array]):
    """Ship metrics from a compiled region to the host logger (debug mode)."""

    def cb(step_, **m):
        StatsLogger.instance().log(key, step_, m)

    jax.debug.callback(cb, step, **metrics)
