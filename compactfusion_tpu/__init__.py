"""compactfusion_tpu — a TPU-native parallel diffusion inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CompactFusion /
xDiT (reference: Cobalt-27/CompactFusion): multi-chip serving of DiT backbones
under hybrid parallelism (DP x CFG x Ulysses x Ring x PipeFusion x TP), with
the CompactFusion residual-compression hot path (delta encoding, 1-bit/2-bit
low-rank quantization, error feedback) expressed as pure-functional codecs and
Pallas TPU kernels fused into the ring collective.

Architecture stance (vs the reference, see SURVEY.md):
  - one SPMD program per pipeline over a single `jax.sharding.Mesh` with axes
    ("dp", "cfg", "pp", "ring", "ulysses", "tp") replaces process-group
    singletons (reference: xfuser/core/distributed/parallel_state.py).
  - all mutable global state of the reference (DiTRuntimeState, CompactCache,
    CacheManager, step counters) is an explicit pytree threaded through
    `lax.scan` carries.
  - collectives are `shard_map` + `ppermute`/`all_to_all`/`psum` over ICI,
    replacing NCCL groups + yunchang RingComm.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # Honour an explicit JAX_PLATFORMS=cpu even when a TPU plugin (e.g. the
    # axon tunnel) force-appends itself to jax_platforms — the virtual
    # multi-device CPU mesh is the documented test/dev harness.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from compactfusion_tpu.config import (  # noqa: F401
    CompactConfig,
    EngineConfig,
    InputConfig,
    ModelConfig,
    ParallelConfig,
    RuntimeConfig,
)
from compactfusion_tpu.parallel.mesh import MeshSpec, make_mesh  # noqa: F401
