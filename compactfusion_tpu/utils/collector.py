"""Activation collector: dump named tensors per (rank, step, layer) to disk.

Reference semantics: ``Collector.collect`` (``xfuser/collector/
collector.py:11-49``) — taps in the attention layer and compact cache dump
q/k/v/kbase/vbase/latents for offline analysis.  Enable by setting
``CFTPU_COLLECT_DIR``; calls are no-ops otherwise.  Works from inside jit via
``jax.debug.callback``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_DIR = os.environ.get("CFTPU_COLLECT_DIR", "")


def enabled() -> bool:
    return bool(_DIR)


def collect(x: jax.Array, name: str, step, layer) -> None:
    """Dump ``x`` as ``{dir}/{name}_s{step}_l{layer}_r{rank}.npy``."""
    if not _DIR:
        return

    def cb(arr, step_, layer_):
        os.makedirs(_DIR, exist_ok=True)
        rank = jax.process_index()
        path = os.path.join(
            _DIR, f"{name}_s{int(step_)}_l{int(layer_)}_r{rank}.npy"
        )
        np.save(path, np.asarray(arr))

    jax.debug.callback(cb, x, step, layer)
