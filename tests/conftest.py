"""Test harness: 8 fake CPU devices.

The reference requires real GPUs under torchrun for every distributed test
(SURVEY.md §4); we instead run every collective on a virtual 8-device CPU mesh
so the full parallelism matrix is testable on any host.
"""

import os

# Must be set before jax is imported anywhere.  The session environment pins
# JAX_PLATFORMS=axon (one real TPU chip); tests always run on the fake 8-CPU
# mesh, so override it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-appends itself to jax_platforms regardless of the
# env var; pin the test session to the 8-device fake CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite recompiles identical scan-heavy
# pipelines on every run; warm-starting them cuts wall time substantially.
from compactfusion_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
