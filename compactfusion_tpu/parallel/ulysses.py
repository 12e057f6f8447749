"""Ulysses sequence parallelism: all-to-all swapping sequence <-> head sharding.

Reference semantics: yunchang ``SeqAllToAll4D`` as used by
``xFuserLongContextAttention`` (``xfuser/core/long_ctx_attention/hybrid/
attn_layer.py:151-171``): before attention, scatter heads / gather sequence
(each rank ends with the full sequence for H/U heads); after attention, the
inverse.  Here it is a single ``lax.all_to_all`` over the ``ulysses`` mesh
axis — on TPU this maps to an ICI all-to-all among physically adjacent chips
(mesh axis order puts ulysses fastest-varying, see ``parallel/mesh.py``).

All functions must be called inside ``shard_map`` with the ulysses axis
unmapped on the token dimension.
"""

from __future__ import annotations

import jax
from jax import lax


def scatter_heads_gather_seq(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, S/U_local, H, D) -> (B, S_local*U, H/U, D)."""
    return lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)


def scatter_seq_gather_heads(x: jax.Array, axis_name: str) -> jax.Array:
    """(B, S_local*U, H/U, D) -> (B, S_local, H, D) — inverse of the above."""
    return lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)


def slice_joint_heads(x: jax.Array, axis_name: str, ulysses_size: int) -> jax.Array:
    """Take this ulysses rank's head slice of a replicated joint tensor.

    Reference: ``hybrid/attn_layer.py:128-147`` — joint (text) K/V are
    replicated over SP ranks; after the ulysses all-to-all each rank owns a
    contiguous head block, so the joint tensors must be sliced to match.
    """
    h = x.shape[2]
    per = h // ulysses_size
    u = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(x, u * per, per, axis=2)
