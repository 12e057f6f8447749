"""PipeFusion pipeline parallelism (stage-sharded transformer blocks).

Reference semantics: ``_split_transformer_blocks``
(``xfuser/model_executor/models/transformers/base_transformer.py:76-160``)
slices the block list across pp ranks; activations hop stage-to-stage over
NCCL P2P (``PipelineGroupCoordinator``, ``group_coordinator.py:620-1043``)
with shape handshakes and pre-allocated recv buffers.

TPU-native redesign: the stacked block parameters are sharded over the ``pp``
mesh axis (leading layer axis — each stage materialises only depth/pp blocks,
the PP memory win), and the stage handoff is a ``lax.ppermute`` with static
shapes (no handshake).  SPMD masking replaces per-rank control flow: at round
u every device applies ITS local blocks, but only stage u keeps the result;
after n_stages rounds the last stage holds the full composition, which a
masked ``psum`` broadcasts back to all stages.

This is the reference's synchronous pipeline (``_sync_pipeline``) at
num_pipeline_patch=1 — numerically EXACT.  The patch-pipelined overlap of
``_async_pipeline`` (stale-KV micro-patches) layers on top of this scheme by
increasing the round count to M + stages - 1 and gating per-patch activity,
and is tracked for a later round.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.parallel.mesh import AXIS_PP


def pipefusion_blocks(
    scan_blocks_fn: Callable[[jax.Array, Any], Tuple[jax.Array, Any]],
    h: jax.Array,
    state: Any,
    n_stages: int,
    axis: str = AXIS_PP,
) -> Tuple[jax.Array, Any]:
    """Run the stage-local block stack as a pipeline over ``axis``.

    Args:
      scan_blocks_fn: applies THIS device's local (depth/pp) blocks:
        ``(h, state) -> (h, state)``.
      h: activations entering the block stack — a (B, S_local, D) array or a
        PYTREE of such (e.g. the (vid, txt) pair of joint-attention models);
        identical on every stage at entry.
      state: per-local-layer attention/compression state.

    Returns:
      (h, state): h replicated across stages with the full-depth result;
      state holds each stage's local-layer updates.
    """
    if n_stages == 1:
        return scan_blocks_fn(h, state)

    my = lax.axis_index(axis)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    for u in range(n_stages):
        h_new, state_new = scan_blocks_fn(h, state)
        active = my == u
        h = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old), h_new, h
        )
        # discard state updates from masked (inactive) rounds so EF caches
        # only advance when this stage actually processed the activations
        state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(active, new, old), state_new, state
        )
        if u < n_stages - 1:
            h = lax.ppermute(h, axis, perm)
    # broadcast the last stage's result to every stage
    h = jax.tree_util.tree_map(
        lambda x: lax.psum(
            jnp.where(my == n_stages - 1, x, jnp.zeros_like(x)), axis
        ),
        h,
    )
    return h, state
