"""Named-scope profiler.

Reference semantics: ``Profiler`` (``xfuser/prof.py:5-170``) — a singleton
accumulating per-name elapsed time via paired CUDA events, with a decorator,
a context manager, and a per-rank summary sorted by total time with % of a
``total`` scope (``prof.py:172-189``).

TPU notes: XLA executes asynchronously and per-op device events do not exist,
so scopes measure HOST wall time and synchronize the device at scope exit
(``jax.block_until_ready`` on an optional result, or a device fence).  For
op-level device timing use :meth:`Profiler.trace`, which wraps
``jax.profiler.trace`` (xprof) around a scope — the reference's
torch-profiler hook (``prof.py:192-203``).
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Profiler:
    _instance: Optional["Profiler"] = None

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @classmethod
    def instance(cls) -> "Profiler":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    @classmethod
    @contextlib.contextmanager
    def scope(cls, name: str, sync: bool = True):
        self = cls.instance()
        if not self.enabled:
            yield
            return
        if sync:
            # drain device work queued by EARLIER async dispatches before
            # starting the clock, or their (potentially seconds-long under
            # the axon tunnel) completion gets charged to this scope
            _device_fence()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                _device_fence()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @classmethod
    def prof_func(cls, name: Optional[str] = None):
        def deco(fn):
            scope_name = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapped(*a, **kw):
                with cls.scope(scope_name):
                    return fn(*a, **kw)

            return wrapped

        return deco

    @classmethod
    @contextlib.contextmanager
    def trace(cls, log_dir: str = "/tmp/cftpu_trace"):
        """Device-accurate op-level trace via xprof."""
        with jax.profiler.trace(log_dir):
            yield

    @classmethod
    def summary(cls, total_scope: str = "total") -> str:
        """Per-scope breakdown sorted by total time (reference prof_summary)."""
        self = cls.instance()
        total = self.totals.get(total_scope, None)
        lines = ["name                                     total(s)   count     %"]
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            pct = f"{100.0 * t / total:5.1f}" if total else "    -"
            lines.append(f"{name:40s} {t:8.3f} {self.counts[name]:7d} {pct}")
        return "\n".join(lines)

    @classmethod
    def reset(cls):
        self = cls.instance()
        self.totals.clear()
        self.counts.clear()


def _device_fence():
    """Block until all queued device work completes (axon-safe: a device->host
    transfer, since block_until_ready alone does not flush the tunnel)."""
    try:
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.zeros(()) + 0)
    except Exception:  # pragma: no cover
        pass
