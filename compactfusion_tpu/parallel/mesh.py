"""Device mesh construction.

TPU-native replacement for the reference's process-group machinery
(``xfuser/core/distributed/parallel_state.py:192-458`` — NCCL groups created
per parallel dimension, consulted through ``get_*_group()`` singletons, plus
the Megatron-style ``RankGenerator`` in ``core/distributed/utils.py:4-188``).

Here a single ``jax.sharding.Mesh`` with named axes replaces all of it: a
group is an axis name, a collective is ``psum/all_to_all/ppermute`` over that
name, and rank bookkeeping is ``jax.lax.axis_index``.  The "tp-sp-pp-cfg-dp"
order-string decomposition of the reference (``parallel_state.py:381-388``)
corresponds to mesh-axis order ``(dp, cfg, pp, ring, ulysses, tp)``: the
trailing axes vary fastest over the flat device list, so ulysses/tp groups
(highest traffic) occupy physically adjacent devices on the ICI torus.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from compactfusion_tpu.config import ParallelConfig

# Canonical axis names.
AXIS_DP = "dp"
AXIS_CFG = "cfg"
AXIS_PP = "pp"
AXIS_RING = "ring"
AXIS_ULYSSES = "ulysses"
AXIS_TP = "tp"

#: the two sequence-parallel sub-axes together (USP = ulysses x ring,
#: reference ``config/config.py:111-134``).  Use as a tuple in PartitionSpecs
#: to shard the token axis over the whole SP group.
AXIS_SEQ = (AXIS_RING, AXIS_ULYSSES)

MESH_AXIS_ORDER = (AXIS_DP, AXIS_CFG, AXIS_PP, AXIS_RING, AXIS_ULYSSES, AXIS_TP)


def ambient_mesh_axes(ring_axis: str, ring_size: int):
    """(name, size) of every named mesh axis in scope at this trace point.

    The fused ring kernels compute flattened logical neighbor ids from the
    FULL mesh shape, so they need the complete axis list even when only the
    ring axis participates.  Appends ``(ring_axis, ring_size)`` when the
    ring axis is not one of the canonical mesh axes (tests drive the kernels
    under a bare single-axis shard_map).
    """
    import jax.lax as lax

    axes = []
    for name in MESH_AXIS_ORDER:
        try:
            axes.append((name, lax.axis_size(name)))
        except NameError:
            pass
    if not any(n == ring_axis for n, _ in axes):
        axes.append((ring_axis, ring_size))
    return tuple(axes)


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Shape of the DiT mesh, plus the optional VAE device tail.

    The reference carves ``vae_parallel_size`` trailing ranks out of the world
    into a separate VAE group (``parallel_state.py:284-308``); we reproduce
    that by building the DiT mesh over the leading devices and keeping the
    tail as a flat VAE mesh.
    """

    parallel: ParallelConfig

    @property
    def axis_sizes(self):
        p = self.parallel
        return {
            AXIS_DP: p.dp_degree,
            AXIS_CFG: p.cfg_degree,
            AXIS_PP: p.pp_degree,
            AXIS_RING: p.ring_degree,
            AXIS_ULYSSES: p.ulysses_degree,
            AXIS_TP: p.tp_degree,
        }

    @property
    def shape(self):
        sizes = self.axis_sizes
        return tuple(sizes[a] for a in MESH_AXIS_ORDER)


def make_mesh(
    parallel: ParallelConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build the DiT device mesh.

    Axis order ``(dp, cfg, pp, ring, ulysses, tp)``: trailing axes are
    fastest-varying so the highest-bandwidth-demand groups (ulysses all_to_all,
    tp all_reduce) map onto adjacent ICI neighbours, and the ring axis forms a
    contiguous block per ring group — the layout the reference builds by hand
    with ``RankGenerator("tp-sp-pp-cfg-dp")``.
    """
    spec = MeshSpec(parallel)
    if devices is None:
        devices = jax.devices()
    world = parallel.world_size
    if len(devices) < world + parallel.vae_parallel_size:
        raise ValueError(
            f"need {world + parallel.vae_parallel_size} devices, have {len(devices)}"
        )
    dit_devices = np.asarray(devices[:world]).reshape(spec.shape)
    return Mesh(dit_devices, MESH_AXIS_ORDER)


def make_vae_mesh(
    parallel: ParallelConfig,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Optional[Mesh]:
    """Mesh over the trailing VAE devices (``parallel_state.py:297-308``)."""
    if parallel.vae_parallel_size == 0:
        return None
    if devices is None:
        devices = jax.devices()
    world = parallel.world_size
    tail = np.asarray(devices[world : world + parallel.vae_parallel_size])
    return Mesh(tail, ("vae",))


def init_distributed_environment(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bootstrap (reference ``init_distributed_environment``,
    ``parallel_state.py:192`` — NCCL world init, one process per GPU).

    JAX multi-controller: one process per HOST; every process then sees the
    global device list and runs the same SPMD program.  No-op on a single
    process.  Returns the number of global devices.

    Falls back to the env registry (COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, ``compactfusion_tpu/envs.py`` — the reference's
    MASTER_ADDR/MASTER_PORT analog) when args are not given.
    """
    if coordinator_address is None:
        from compactfusion_tpu import envs

        coordinator_address = envs.COORDINATOR_ADDRESS
        num_processes = num_processes or envs.NUM_PROCESSES
        process_id = process_id if process_id is not None else envs.PROCESS_ID
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def sp_axes(mesh: Mesh):
    """Sequence-parallel axis names present (size > 1) in ``mesh``."""
    return tuple(a for a in (AXIS_RING, AXIS_ULYSSES) if mesh.shape[a] > 1)


def axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]
