"""DiTFastAttn: per-(step, layer) attention compression plans.

Reference semantics: ``xfuser/core/fast_attention/`` —
``FastAttnMethod`` {FULL_ATTN, RESIDUAL_WINDOW_ATTN, OUTPUT_SHARE} (CFG_SHARE
is subsumed by the cfg axis in this build), windowed attention plus a cached
full-minus-window residual, per-step-per-layer greedy method selection whose
threshold ramps with depth (``select_methods``, ``fast_attention/
utils.py:143-192``), and a JSON-persisted calibration plan
(``fast_attn_state.py:38-40``).

Here the plan is a static (steps, layers) int table baked into the denoise
scan: the pipeline writes ``plan[i]`` into the attention state each step, the
scan slices a per-layer method scalar, and a 3-way ``lax.switch`` picks the
branch.  Single-device acceleration (reference L7): combine with DP/CFG axes
freely, but not with sequence parallelism (window masks don't shard).
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.ops.attention import attn_with_lse, sdpa


class FastAttnMethod(enum.IntEnum):
    FULL_ATTN = 0
    RESIDUAL_WINDOW_ATTN = 1
    OUTPUT_SHARE = 2


def window_mask(s: int, window: int) -> jax.Array:
    """(S, S) banded mask: True where |i - j| <= window."""
    idx = jnp.arange(s)
    return jnp.abs(idx[:, None] - idx[None, :]) <= window


def window_attention(q, k, v, window: int):
    mask = window_mask(q.shape[1], window)
    return sdpa(q, k, v, mask=mask)


@dataclasses.dataclass(frozen=True)
class FastAttnAttn:
    """Attention strategy applying a per-layer method plan.

    State (scan xs, leaves stacked over layers):
      method:   (L,) int32 — written by the pipeline from plan[step];
      residual: (L, B, S, H, D) cached full-minus-window residual;
      last_out: (L, B, S, H, D) cached output for OUTPUT_SHARE.
    """

    window_size: int = 64

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        z = jnp.zeros((n_layers, batch, seq_local, heads, head_dim), dtype)
        return {
            "method": jnp.zeros((n_layers,), jnp.int32),
            "residual": z,
            "last_out": z,
        }

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        assert joint_q is None, "fast-attn plans are for self-attention DiTs"
        method = state["method"]
        dt = state["residual"].dtype

        def full(_):
            out = sdpa(q, k, v)
            win = window_attention(q, k, v, self.window_size)
            residual = (out.astype(jnp.float32) - win.astype(jnp.float32)).astype(dt)
            return out, residual

        def window_res(_):
            win = window_attention(q, k, v, self.window_size)
            out = (win.astype(jnp.float32) + state["residual"].astype(jnp.float32)).astype(q.dtype)
            return out, state["residual"]

        def share(_):
            return state["last_out"].astype(q.dtype), state["residual"]

        out, residual = lax.switch(method, [full, window_res, share], None)
        new_state = {
            "method": method,
            "residual": residual,
            "last_out": out.astype(dt),
        }
        return out, new_state


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------


def compression_loss(ref: jax.Array, approx: jax.Array) -> jax.Array:
    """Relative L2 loss (reference ``fast_attention/utils.py:59-74``)."""
    r32 = ref.astype(jnp.float32)
    a32 = approx.astype(jnp.float32)
    return jnp.linalg.norm(a32 - r32) / jnp.maximum(jnp.linalg.norm(r32), 1e-8)


@dataclasses.dataclass(frozen=True)
class CalibrationAttn:
    """Computes FULL output while measuring candidate losses per layer.

    State: {last_out (L,B,S,H,D)}; per-layer ys carry (window_loss,
    share_loss) — gathered by the caller across one forward per step.
    """

    window_size: int = 64

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        return {
            "last_out": jnp.zeros(
                (n_layers, batch, seq_local, heads, head_dim), dtype
            ),
            "window_loss": jnp.zeros((n_layers,), jnp.float32),
            "share_loss": jnp.zeros((n_layers,), jnp.float32),
        }

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        out = sdpa(q, k, v)
        win = window_attention(q, k, v, self.window_size)
        new_state = {
            "last_out": out.astype(state["last_out"].dtype),
            "window_loss": compression_loss(out, win),
            "share_loss": compression_loss(out, state["last_out"]),
        }
        return out, new_state


def select_methods(
    window_loss, share_loss, threshold: float, n_layers: int
) -> Any:
    """Greedy per-layer selection with depth-ramped threshold.

    Reference ``select_methods``: for block i the budget is
    ``(i+1)/L * threshold``; pick the cheapest method under budget
    (OUTPUT_SHARE < RESIDUAL_WINDOW_ATTN < FULL_ATTN).
    """
    import numpy as np

    window_loss = np.asarray(window_loss)
    share_loss = np.asarray(share_loss)
    plan = np.full((n_layers,), int(FastAttnMethod.FULL_ATTN), np.int32)
    for i in range(n_layers):
        budget = (i + 1) / n_layers * threshold
        if share_loss[i] < budget:
            plan[i] = int(FastAttnMethod.OUTPUT_SHARE)
        elif window_loss[i] < budget:
            plan[i] = int(FastAttnMethod.RESIDUAL_WINDOW_ATTN)
    return plan


def save_plan(plan, path: str):
    import numpy as np

    with open(path, "w") as f:
        json.dump(np.asarray(plan).tolist(), f)


def load_plan(path: str):
    import numpy as np

    with open(path) as f:
        return np.asarray(json.load(f), np.int32)
