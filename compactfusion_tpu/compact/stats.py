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
        self.spectra = collections.defaultdict(list)  # key -> [[sv...], ...]
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

    def dump_eigenvalues(self, path: str, depth: Optional[int] = None):
        """JSON eigenvalue dump (reference ``save_eigenvalues``).

        ``depth``: with ordered logging, records arrive layer-major per
        denoise step; when given, spectra are grouped as
        ``[step][layer] -> [sv...]``, else as a flat per-call list.
        """
        import json

        out = {}
        for key, rows in self.spectra.items():
            if depth and len(rows) % depth == 0:
                out[key] = [
                    rows[i : i + depth] for i in range(0, len(rows), depth)
                ]
            else:
                out[key] = rows
        with open(path, "w") as f:
            json.dump(out, f)
        return out

    def dump_err_vs_steps(self, path: str, depth: Optional[int] = None):
        """JSON err-vs-step dump (reference ``dump_err_vs_steps``): per key,
        the layer-averaged rel-err / cos trajectory over denoise steps."""
        import json

        out = {}
        for key, recs in self.records.items():
            vals = [m for _, m in recs]
            if depth and len(vals) % depth == 0:
                steps = [
                    vals[i : i + depth] for i in range(0, len(vals), depth)
                ]
                out[key] = [
                    {
                        k: sum(m[k] for m in layer_ms) / len(layer_ms)
                        for k in layer_ms[0]
                    }
                    for layer_ms in steps
                ]
            else:
                out[key] = vals
        with open(path, "w") as f:
            json.dump(out, f)
        return out

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


def log_inside_jit(
    key: str, step, metrics: Dict[str, jax.Array], ordered=False, rank=None
):
    """Ship metrics from a compiled region to the host logger (debug mode).

    ``ordered=True`` preserves program execution order on the host — required
    when the host reconstructs (layer, denoise-step) indices from arrival
    order (the analysis harness does).  JAX refuses ordered callbacks for
    computations spanning >1 device, so on a multi-device mesh the call
    downgrades to an unordered callback and tags the key with ``rank`` (pass
    ``lax.axis_index(...)`` from inside shard_map) — per-rank streams still
    arrive in per-device program order under current runtimes; the strict
    guarantee holds on the single-device analysis harness (SimRingAttn).
    """
    from compactfusion_tpu.utils.collector import ambient_device_count

    if ordered and ambient_device_count() > 1:
        if rank is None:
            import warnings

            # without a rank tag all devices' records interleave into ONE
            # key and the arrival-order (layer, step) reconstruction the
            # caller requested is silently wrong — make the degradation loud
            warnings.warn(
                f"stats key {key!r}: ordered logging requested on a "
                "multi-device mesh without rank= — records will interleave "
                "across devices (pass rank=lax.axis_index(...))",
                stacklevel=2,
            )

            def cb_u(step_, **m):
                StatsLogger.instance().log(key, step_, m)

            jax.debug.callback(cb_u, step, **metrics)
        else:

            def cb_r(step_, rank_, **m):
                StatsLogger.instance().log(f"{key}@r{int(rank_)}", step_, m)

            jax.debug.callback(cb_r, step, rank, **metrics)
        return

    def cb(step_, **m):
        StatsLogger.instance().log(key, step_, m)

    jax.debug.callback(cb, step, **metrics, ordered=ordered)


# ---------------------------------------------------------------------------
# analysis: eigenvalue spectra + err-vs-step dumps
# (reference ``plot_eigenvalues`` / ``save_eigenvalues`` /
#  ``dump_err_vs_steps``, ``xfuser/compact/stats.py:683-762`` — JSON dumps
#  instead of matplotlib; these drove the paper's codec choices)
# ---------------------------------------------------------------------------


def spectrum(x: jax.Array, top_k: int = 64) -> jax.Array:
    """Top-k singular values of an (N, C) tensor (fp32, jit-safe)."""
    s = jnp.linalg.svd(x.astype(jnp.float32), compute_uv=False)
    k = min(top_k, s.shape[-1])
    return s[..., :k]


def _host_spectrum(arr, top_k: int):
    """Host-side top-k singular values.  The SVD deliberately runs on the
    HOST, not in-jit: ``jnp.linalg.svd`` inside a TPU program hangs the
    tunneled compiler indefinitely (observed 2026-08-21 — a bare
    ``jit(svd)`` probe never returns), and the values only feed host-side
    StatsLogger callbacks anyway, so shipping the activation and decomposing
    in numpy costs one transfer that analysis mode is already paying."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float32)
    s = np.linalg.svd(a, compute_uv=False)
    return s[..., : min(top_k, s.shape[-1])]


def log_spectrum_inside_jit(key: str, x: jax.Array, top_k: int = 64, rank=None):
    """Record the singular-value spectrum of ``x`` under ``key`` (ordered on
    a single device; unordered + rank-tagged key on a multi-device mesh, see
    ``log_inside_jit``)."""
    from compactfusion_tpu.utils.collector import ambient_device_count

    if ambient_device_count() > 1:
        if rank is None:

            def cb_u(a):
                StatsLogger.instance().spectra[key].append(
                    [float(v) for v in _host_spectrum(a, top_k).ravel()]
                )

            jax.debug.callback(cb_u, x)
        else:

            def cb_r(a, rank_):
                StatsLogger.instance().spectra[f"{key}@r{int(rank_)}"].append(
                    [float(v) for v in _host_spectrum(a, top_k).ravel()]
                )

            jax.debug.callback(cb_r, x, rank)
        return

    def cb(a):
        StatsLogger.instance().spectra[key].append(
            [float(v) for v in _host_spectrum(a, top_k).ravel()]
        )

    jax.debug.callback(cb, x, ordered=True)
