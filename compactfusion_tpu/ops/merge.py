"""Online-softmax merge of partial attention results.

Reference semantics: yunchang ``update_out_and_lse`` (used by the ring loops,
``xfuser/compact/ring.py:263``): combine per-block flash-attention partials
(out_i, lse_i) into the exact global softmax result, in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def merge_out_lse(
    out: Optional[jax.Array],
    lse: Optional[jax.Array],
    block_out: jax.Array,
    block_lse: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Merge a new attention block into the running (out, lse) accumulator.

    Args:
      out: (B, S, H, D) fp32 running output, or None on the first block.
      lse: (B, H, S) fp32 running log-sum-exp, or None.
      block_out: (B, S, H, D) new block output.
      block_lse: (B, H, S) new block lse.

    Returns:
      merged (out, lse) in fp32.
    """
    block_out = block_out.astype(jnp.float32)
    block_lse = block_lse.astype(jnp.float32)
    if out is None:
        return block_out, block_lse
    new_lse = jnp.logaddexp(lse, block_lse)
    # weights, broadcast (B, H, S) -> (B, S, H, 1)
    w_old = jnp.exp(lse - new_lse).transpose(0, 2, 1)[..., None]
    w_new = jnp.exp(block_lse - new_lse).transpose(0, 2, 1)[..., None]
    return out * w_old + block_out * w_new, new_lse
