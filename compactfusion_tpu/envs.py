"""Environment-variable registry + capability probing.

TPU-native analog of ``xfuser/envs.py:22-129``: a lazily-evaluated env-var
registry (module ``__getattr__``) plus a singleton capability checker.  The
reference probes CUDA/flash-attn/yunchang/diffusers; here the capabilities
that gate code paths are the JAX backend (TPU vs CPU fallback), the TPU
generation (Pallas block rules and VMEM budgets differ across v4/v5e/v6),
device count/topology for mesh planning, and multi-host coordination vars.

Usage::

    from compactfusion_tpu import envs
    envs.CFTPU_LOGGING_LEVEL        # lazy env read
    envs.PACKAGES_CHECKER.get_env_info()["platform"]
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # logging level (reference XDIT_LOGGING_LEVEL, honored as a fallback)
    "CFTPU_LOGGING_LEVEL": lambda: os.getenv(
        "CFTPU_LOGGING_LEVEL", os.getenv("XDIT_LOGGING_LEVEL", "INFO")
    ),
    # persistent XLA compilation-cache directory (utils/jax_cache.py)
    "CFTPU_JAX_CACHE_DIR": lambda: os.getenv("CFTPU_JAX_CACHE_DIR", None),
    # activation-collector dump directory (utils/collector.py)
    "CFTPU_COLLECT_DIR": lambda: os.getenv("CFTPU_COLLECT_DIR", ""),
    # multi-host coordination (jax.distributed.initialize inputs; the
    # reference's MASTER_ADDR/MASTER_PORT analog)
    "COORDINATOR_ADDRESS": lambda: os.getenv("COORDINATOR_ADDRESS", None),
    "PROCESS_ID": lambda: (
        int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None
    ),
    "NUM_PROCESSES": lambda: (
        int(os.environ["NUM_PROCESSES"])
        if "NUM_PROCESSES" in os.environ
        else None
    ),
    # platform pinning (the axon plugin force-appends itself; see CLAUDE.md)
    "JAX_PLATFORMS": lambda: os.getenv("JAX_PLATFORMS", ""),
}


class PackagesEnvChecker:
    """Singleton capability prober (reference ``PackagesEnvChecker``).

    Lazy: nothing touches jax until first use, so importing this module
    never initializes a backend (important under the axon tunnel, where
    backend init opens the device connection).
    """

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._info = None
        return cls._instance

    def get_env_info(self) -> Dict[str, Any]:
        if self._info is None:
            self._info = self._probe()
        return self._info

    def _probe(self) -> Dict[str, Any]:
        import jax

        devices = jax.devices()
        dev0 = devices[0]
        platform = dev0.platform
        kind = getattr(dev0, "device_kind", "")
        info: Dict[str, Any] = {
            "jax_version": jax.__version__,
            "platform": platform,
            "device_kind": kind,
            "device_count": len(devices),
            "process_count": jax.process_count(),
            "local_device_count": jax.local_device_count(),
            # Pallas TPU kernels (flash/quant/fused-ring) need a real TPU;
            # on CPU every op falls back to the jnp reference paths, like
            # the reference's pytorch-attention fallback when flash-attn is
            # missing (ring.py:27-33)
            "has_pallas_tpu": platform == "tpu",
        }
        if platform == "tpu":
            # generation gates kernel tuning (VMEM budget, MXU shape)
            gen = "unknown"
            k = kind.lower()
            # v5e reports device_kind "TPU v5 lite" — map it before the
            # generic "v5" tag or generation-gated kernel tuning picks the
            # wrong branch on the primary target hardware
            if "lite" in k or "v5e" in k or "v5litepod" in k:
                gen = "v5e"
            else:
                for tag in ("v6", "v5p", "v5", "v4", "v3", "v2"):
                    if tag in k:
                        gen = tag
                        break
            info["tpu_generation"] = gen
            stats = getattr(dev0, "memory_stats", lambda: None)()
            # memory_stats() returns None when the backend doesn't support it
            info["hbm_bytes"] = (stats or {}).get("bytes_limit", None)
        return info

    def check_platform(self, expected: str) -> bool:
        return self.get_env_info()["platform"] == expected


PACKAGES_CHECKER = PackagesEnvChecker()


def __getattr__(name):
    # lazy evaluation of environment variables (reference envs.py:123-129)
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
