"""Activation collector: dump named tensors per (rank, step, layer) to disk.

Reference semantics: ``Collector.collect`` (``xfuser/collector/
collector.py:11-49``) — taps in the attention layer and compact cache dump
q/k/v/kbase/vbase/latents for offline analysis.  Enable by setting
``CFTPU_COLLECT_DIR``; calls are no-ops otherwise.  Works from inside jit via
``jax.debug.callback``.

Two addressing modes:
  * explicit ``(step, layer)`` — when the caller knows them statically;
  * auto-sequence (``step``/``layer`` omitted) — for taps inside a
    ``lax.scan`` where step/layer are trace-time-unknown: callbacks arrive in
    execution order, so a host-side monotonic counter per (name, rank)
    reconstructs (step, layer) as ``seq = step * n_layers + layer`` exactly
    like the ordered stats stream (``compact/stats.log_inside_jit``).

Ordering: JAX rejects ORDERED debug callbacks for any computation spanning
more than one device (``OrderedDebugEffect`` is not shardable), so the
auto-sequence mode uses ordered callbacks only when the enclosing computation
is single-device — detected from the named mesh axes visible at the trace
point (``ambient_device_count``), or forced via ``n_devices``.  Multi-device
computations fall back to unordered callbacks: per-rank streams still number
by host arrival order, which current JAX runtimes deliver in per-device
program order (cross-rank interleaving is harmless — files are per-rank).

``rank`` may be a traced per-device index (e.g. ``lax.axis_index`` inside
``shard_map``) so per-device shards don't collide; it defaults to the host
process index (reference uses the torch dist rank).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax import lax

_SEQ: dict = {}


def _dir() -> str:
    # read dynamically (not cached at import): enabling collection must be
    # reversible within one process — an import-time constant would leave
    # ordered-callback taps baked into every later trace (and ordered
    # effects refuse to run on >1 device), long after the caller unset it
    return os.environ.get("CFTPU_COLLECT_DIR", "")


def enabled() -> bool:
    return bool(_dir())


def ambient_device_count() -> int:
    """Trace-time device count of the enclosing computation, from the named
    mesh axes in scope (shard_map body).  Returns 1 outside shard_map — a
    caller jitting over a multi-device mesh WITHOUT named axes must pass the
    device count explicitly (see ``collect(n_devices=...)``)."""
    from compactfusion_tpu.parallel.mesh import MESH_AXIS_ORDER

    n = 1
    for name in MESH_AXIS_ORDER + ("vae",):
        try:
            n *= lax.axis_size(name)
        except NameError:
            pass
    return n


def collect(
    x: jax.Array,
    name: str,
    step: Optional[int] = None,
    layer: Optional[int] = None,
    rank=None,
    n_devices: Optional[int] = None,
) -> None:
    """Dump ``x`` as ``{dir}/{name}_s{step}_l{layer}_r{rank}.npy`` (explicit
    mode) or ``{dir}/{name}_n{seq:05d}_r{rank}.npy`` (auto-sequence mode).

    ``n_devices``: how many devices the enclosing computation spans; callers
    jitting over a multi-device mesh outside shard_map (e.g. the pipelines'
    latents taps) must pass ``mesh.size`` — named-axis detection can't see
    those devices, and an ordered callback would fail to lower there.
    """
    out_dir = _dir()
    if not out_dir:
        return

    if rank is None:
        rank = jax.process_index()

    if step is None and layer is None:
        if n_devices is None:
            n_devices = ambient_device_count()

        def cb_seq(arr, rank_):
            os.makedirs(out_dir, exist_ok=True)
            key = (name, int(rank_))
            seq = _SEQ.get(key, 0)
            _SEQ[key] = seq + 1
            path = os.path.join(out_dir, f"{name}_n{seq:05d}_r{int(rank_)}.npy")
            np.save(path, np.asarray(arr))

        jax.debug.callback(cb_seq, x, rank, ordered=n_devices == 1)
        return

    def cb(arr, step_, layer_, rank_):
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(
            out_dir, f"{name}_s{int(step_)}_l{int(layer_)}_r{int(rank_)}.npy"
        )
        np.save(path, np.asarray(arr))

    jax.debug.callback(cb, x, step, layer, rank)
