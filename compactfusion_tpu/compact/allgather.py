"""Compressed all-gather (CompactFusion patch-parallel transport).

Reference semantics: ``compact_all_gather`` (``xfuser/compact/main.py:
390-420``): each rank compresses its own tensor (withOUT updating its cache),
all-gathers the compressed payloads, then every rank decompresses all world
payloads against per-source EF base caches (update_cache=True) — so after the
call every rank holds identical reconstructions and identical caches.

Here the NCCL ``dist.all_gather`` of a flat fp16 buffer becomes one
``lax.all_gather`` of the payload pytree over a mesh axis, and the per-source
decompress loop is a ``vmap`` over the stacked EF state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.compact.engine import EFState, ef_compress, ef_decompress
from compactfusion_tpu.config import CompactConfig, CompressType


def compact_all_gather(
    x_nc: jax.Array,
    state: EFState,
    *,
    cfg: CompactConfig,
    method: CompressType,
    axis_name: str,
) -> Tuple[jax.Array, EFState]:
    """All-gather with delta compression + error feedback.

    Args:
      x_nc: (N, C) local tensor (tokens x channels).
      state: stacked per-source EF caches, leaves (W, N, C).

    Returns:
      (gathered, new_state): gathered (W, N, C) reconstructions in source-rank
      order; new_state with every slot updated.
    """
    my = lax.axis_index(axis_name)
    own = jax.tree_util.tree_map(
        lambda a: lax.dynamic_index_in_dim(a, my, axis=0, keepdims=False), state
    )
    payload, _ = ef_compress(x_nc, own, cfg, method, update_cache=False)
    # own-slot compress must not update (reference main.py:396-401); instead
    # every rank decompresses all W payloads below, which updates every slot
    # identically on every rank.
    payloads = lax.all_gather(payload, axis_name)  # leaves (W, ...)

    def dec(payload_i, state_i):
        return ef_decompress(payload_i, state_i, cfg, method, update_cache=True)

    gathered, new_state = jax.vmap(dec)(payloads, state)
    return gathered, new_state
