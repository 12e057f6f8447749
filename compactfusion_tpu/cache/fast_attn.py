"""DiTFastAttn: per-(step, layer) attention compression plans.

Reference semantics: ``xfuser/core/fast_attention/`` —
``FastAttnMethod`` {FULL_ATTN, RESIDUAL_WINDOW_ATTN, OUTPUT_SHARE, CFG_SHARE
and the window|full x CFG_SHARE combos} (``attn_layer.py:19-26``), windowed
attention plus a cached full-minus-window residual, CFG sharing (compute the
cond half of a batch-doubled CFG batch only, mirror to the uncond half —
``attn_layer.py:102-116,179-186``), per-step-per-layer greedy method
selection whose threshold ramps with depth (``select_methods``,
``fast_attention/utils.py:143-192``), and a JSON-persisted calibration plan
(``fast_attn_state.py:38-40``).

Here the plan is a static (steps, layers) int table baked into the denoise
scan: the pipeline writes ``plan[i]`` into the attention state each step, the
scan slices a per-layer method scalar, and a ``lax.switch`` picks the branch.
Window attention runs the BANDED Pallas flash kernel
(``ops/flash_pallas.flash_attn_with_lse(window=...)``) on TPU — off-band KV
blocks are skipped, so FLOPs scale with S*window like the reference's
``flash_attn_func(window_size=...)``, not masked full-cost attention.
Single-device acceleration (reference L7): combine with DP/CFG axes freely,
but not with sequence parallelism (window bands don't shard).
"""

from __future__ import annotations

import dataclasses
import enum
import json
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from compactfusion_tpu.ops.attention import sdpa


class FastAttnMethod(enum.IntEnum):
    FULL_ATTN = 0
    RESIDUAL_WINDOW_ATTN = 1
    OUTPUT_SHARE = 2
    FULL_ATTN_CFG_SHARE = 3
    RESIDUAL_WINDOW_ATTN_CFG_SHARE = 4
    # FULL variants that skip the residual-refresh window pass when no later
    # step consumes it (the reference's per-(step, layer)
    # ``need_cache_residual`` flag, ``fast_attention/utils.py:106-116``).
    # Never emitted by calibration — ``optimize_plan`` derives them.
    FULL_ATTN_NO_RESIDUAL = 5
    FULL_ATTN_CFG_SHARE_NO_RESIDUAL = 6


def window_mask(s: int, window: int) -> jax.Array:
    """(S, S) banded mask: True where |i - j| <= window."""
    idx = jnp.arange(s)
    return jnp.abs(idx[:, None] - idx[None, :]) <= window


def window_attention(q, k, v, window: int):
    """Banded self-attention |i-j| <= window.

    TPU: banded flash kernel, skipping off-band KV blocks (real FLOP
    savings).  Other backends (CPU tests): masked sdpa fallback.
    """
    if jax.default_backend() == "tpu":
        from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

        out, _ = flash_attn_with_lse(q, k, v, window=window)
        return out
    return sdpa(q, k, v, mask=window_mask(q.shape[1], window))


def _tile_cond(x_half: jax.Array) -> jax.Array:
    """[cond] -> [cond; cond] (CFG share: mirror to the uncond rows)."""
    return jnp.concatenate([x_half, x_half], axis=0)


@dataclasses.dataclass(frozen=True)
class FastAttnAttn:
    """Attention strategy applying a per-layer method plan.

    State (scan xs, leaves stacked over layers):
      method:   (L,) int32 — written by the pipeline from plan[step];
      residual: (L, B, S, H, D) cached full-minus-window residual;
      last_out: (L, B, S, H, D) cached output for OUTPUT_SHARE.

    ``cfg_batched``: the model batch is [cond; uncond] rows (batch-doubled
    CFG, cfg_degree == 1) — enables the CFG_SHARE methods, which run
    attention on the cond half only and mirror the output.  When False the
    CFG_SHARE methods silently degrade to their non-shared counterparts.
    """

    window_size: int = 64
    cfg_batched: bool = False

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
        half = q.shape[0] // 2
        cfg_ok = self.cfg_batched and q.shape[0] % 2 == 0

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

        def full_cfg(_):
            # cond half only; mirror output AND residual (reference caches
            # the doubled residual, attn_layer.py:179-181)
            out_h = sdpa(q[:half], k[:half], v[:half])
            win_h = window_attention(
                q[:half], k[:half], v[:half], self.window_size
            )
            res_h = (
                out_h.astype(jnp.float32) - win_h.astype(jnp.float32)
            ).astype(dt)
            return _tile_cond(out_h), _tile_cond(res_h)

        def window_cfg(_):
            win_h = window_attention(
                q[:half], k[:half], v[:half], self.window_size
            )
            out_h = (
                win_h.astype(jnp.float32)
                + state["residual"][:half].astype(jnp.float32)
            ).astype(q.dtype)
            return _tile_cond(out_h), state["residual"]

        def full_nores(_):
            # no later step reads the residual before the next FULL refresh
            # (optimize_plan proved it) — skip the window pass entirely
            return sdpa(q, k, v), state["residual"]

        def full_cfg_nores(_):
            out_h = sdpa(q[:half], k[:half], v[:half])
            return _tile_cond(out_h), state["residual"]

        branches = [full, window_res, share]
        branches.append(full_cfg if cfg_ok else full)
        branches.append(window_cfg if cfg_ok else window_res)
        branches.append(full_nores)
        branches.append(full_cfg_nores if cfg_ok else full_nores)

        out, residual = lax.switch(method, branches, None)
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

    State: {last_out (L,B,S,H,D)}; per-layer ys carry the loss of every
    candidate method — gathered by the caller across one forward per step.
    With ``cfg_batched`` the CFG-share candidates are measured by mirroring
    the cond half; otherwise their losses are reported as inf so
    ``select_methods`` never picks them.
    """

    window_size: int = 64
    cfg_batched: bool = False

    def init_state(self, n_layers, batch, seq_local, heads, head_dim, dtype):
        return {
            "last_out": jnp.zeros(
                (n_layers, batch, seq_local, heads, head_dim), dtype
            ),
            "window_loss": jnp.zeros((n_layers,), jnp.float32),
            "share_loss": jnp.zeros((n_layers,), jnp.float32),
            "full_cfg_loss": jnp.zeros((n_layers,), jnp.float32),
            "window_cfg_loss": jnp.zeros((n_layers,), jnp.float32),
        }

    def __call__(
        self, q, k, v, state, *, joint_q=None, joint_k=None, joint_v=None,
        joint_strategy="front",
    ):
        # silently dropping joint tensors would calibrate every candidate
        # against the WRONG attention distribution — fail like FastAttnAttn
        assert joint_q is None, "fast-attn calibration is for self-attention DiTs"
        out = sdpa(q, k, v)
        win = window_attention(q, k, v, self.window_size)
        if self.cfg_batched and q.shape[0] % 2 == 0:
            half = q.shape[0] // 2
            full_cfg_loss = compression_loss(out, _tile_cond(out[:half]))
            window_cfg_loss = compression_loss(out, _tile_cond(win[:half]))
        else:
            full_cfg_loss = jnp.asarray(jnp.inf, jnp.float32)
            window_cfg_loss = jnp.asarray(jnp.inf, jnp.float32)
        new_state = {
            "last_out": out.astype(state["last_out"].dtype),
            "window_loss": compression_loss(out, win),
            "share_loss": compression_loss(out, state["last_out"]),
            "full_cfg_loss": full_cfg_loss,
            "window_cfg_loss": window_cfg_loss,
        }
        return out, new_state


def select_methods(
    window_loss,
    share_loss,
    threshold: float,
    n_layers: int,
    window_cfg_loss=None,
    full_cfg_loss=None,
) -> Any:
    """Greedy per-layer selection with depth-ramped threshold.

    Reference ``select_methods`` + ``transformer_forward_pre_hook``
    (``utils.py:94-122,143-192``): for block i the budget is
    ``(i+1)/L * threshold``; candidates are tried cheapest-first —
    OUTPUT_SHARE, RESIDUAL_WINDOW_ATTN_CFG_SHARE, RESIDUAL_WINDOW_ATTN,
    FULL_ATTN_CFG_SHARE — falling back to FULL_ATTN.
    """
    import numpy as np

    window_loss = np.asarray(window_loss)
    share_loss = np.asarray(share_loss)
    inf = np.full_like(window_loss, np.inf)
    window_cfg_loss = (
        np.asarray(window_cfg_loss) if window_cfg_loss is not None else inf
    )
    full_cfg_loss = (
        np.asarray(full_cfg_loss) if full_cfg_loss is not None else inf
    )
    plan = np.full((n_layers,), int(FastAttnMethod.FULL_ATTN), np.int32)
    for i in range(n_layers):
        budget = (i + 1) / n_layers * threshold
        if share_loss[i] < budget:
            plan[i] = int(FastAttnMethod.OUTPUT_SHARE)
        elif window_cfg_loss[i] < budget:
            plan[i] = int(FastAttnMethod.RESIDUAL_WINDOW_ATTN_CFG_SHARE)
        elif window_loss[i] < budget:
            plan[i] = int(FastAttnMethod.RESIDUAL_WINDOW_ATTN)
        elif full_cfg_loss[i] < budget:
            plan[i] = int(FastAttnMethod.FULL_ATTN_CFG_SHARE)
    return plan


def optimize_plan(plan) -> Any:
    """Mark FULL steps whose cached residual is never consumed.

    The FULL branches refresh the windowed-attention residual for later
    RESIDUAL_WINDOW steps; when no such step follows before the next FULL
    refresh, that window pass is pure waste.  The reference precomputes the
    same per-(step, layer) ``need_cache_residual`` flags
    (``fast_attention/utils.py:106-116``); here the equivalent is rewriting
    FULL_ATTN(_CFG_SHARE) -> its ``_NO_RESIDUAL`` variant in the static plan
    table.  Apply when baking a calibrated/loaded plan into a pipeline —
    idempotent, and a no-op for plans already carrying NO_RESIDUAL entries.
    """
    import numpy as np

    F = FastAttnMethod
    plan = np.asarray(plan, np.int32).copy()
    steps, n_layers = plan.shape
    window = {int(F.RESIDUAL_WINDOW_ATTN), int(F.RESIDUAL_WINDOW_ATTN_CFG_SHARE)}
    to_nores = {
        int(F.FULL_ATTN): int(F.FULL_ATTN_NO_RESIDUAL),
        int(F.FULL_ATTN_CFG_SHARE): int(F.FULL_ATTN_CFG_SHARE_NO_RESIDUAL),
    }
    for l in range(n_layers):
        consumed_later = False  # does a step >= s+1 read the residual before
        # a FULL overwrites it?  (OUTPUT_SHARE passes it through untouched)
        for s in range(steps - 1, -1, -1):
            m = int(plan[s, l])
            if m in window:
                consumed_later = True
            elif m in to_nores:
                if not consumed_later:
                    plan[s, l] = to_nores[m]
                consumed_later = False
    return plan


def calibrate_pixart(params, pcfg, text, text_mask, key, threshold: float = 0.5):
    """Full DiTFastAttn calibration on the PixArt pipeline.

    Reference workflow (``select_methods`` + ``transformer_forward_pre_hook``,
    ``fast_attention/utils.py:77-192``): drive the denoise loop once with
    calibration prompts, measure each candidate method's loss per (step,
    layer), and pick the cheapest under the depth-ramped budget.  Here the
    per-layer candidate losses come out of one CalibrationAttn forward per
    step (attention-output loss instead of the reference's whole-transformer
    re-runs — one forward per step instead of 4L), and step 0 is pinned to
    FULL like the reference (``now_stepi == 0`` is skipped).

    Single-device (calibration is offline).  Returns a (steps, depth) int32
    plan for ``PixArtPipelineConfig.fast_attn_plan`` — persist with
    :func:`save_plan`.
    """
    import numpy as np

    from compactfusion_tpu.models import common as cm
    from compactfusion_tpu.models.pixart import pixart_forward
    from compactfusion_tpu.pipelines import base as pipe_base
    from compactfusion_tpu.schedulers.diffusion import (
        ddpm_schedule,
        dpm_init_state,
        dpm_step,
    )

    assert pcfg.parallel.world_size == 1, "calibrate on a single device"
    mcfg = pcfg.model
    steps = pcfg.num_steps
    sched = ddpm_schedule(steps, timestep_spacing="linspace")
    hp, wp = pcfg.grid
    pos = cm.sincos_pos_embed_2d(
        mcfg.dim, hp, wp,
        base_size=mcfg.base_size,
        interpolation_scale=mcfg.interpolation_scale,
    )
    do_cfg = pcfg.do_cfg
    cal = CalibrationAttn(
        window_size=pcfg.fast_attn_window, cfg_batched=do_cfg
    )

    if do_cfg:
        txt = jnp.concatenate([text[0], text[1]], axis=0)
        mask = jnp.concatenate([text_mask[0], text_mask[1]], axis=0)
    else:
        txt, mask = text[0], text_mask[0]

    b = text.shape[1]
    nb = 2 * b if do_cfg else b
    latents = pipe_base.prepare_latents(
        key, b, pcfg.tokens, mcfg.patch**2 * mcfg.in_channels, jnp.float32
    )
    dpm = dpm_init_state(latents.shape)
    cst = cal.init_state(
        mcfg.depth, nb, pcfg.tokens, mcfg.heads, mcfg.head_dim, jnp.float32
    )

    @jax.jit
    def step(latents, dpm, cst, i):
        t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
        x = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
        out, cst = pixart_forward(
            params, x.astype(mcfg.dtype), t, txt, mcfg,
            pos_embed=pos, attn=cal, attn_state=cst, text_mask=mask,
        )
        eps = out[..., : out.shape[-1] // 2]
        if do_cfg:
            eps = pipe_base.cfg_combine(eps, pcfg.guidance_scale, 1)
        latents, dpm = dpm_step(sched, i, steps, latents, eps, dpm)
        return latents, dpm, cst

    plan = np.zeros((steps, mcfg.depth), np.int32)  # FULL everywhere
    for i in range(steps):
        latents, dpm, cst = step(latents, dpm, cst, jnp.int32(i))
        if i == 0:
            continue  # reference pins step 0 to FULL_ATTN
        plan[i] = select_methods(
            np.asarray(cst["window_loss"]),
            np.asarray(cst["share_loss"]),
            threshold,
            mcfg.depth,
            window_cfg_loss=np.asarray(cst["window_cfg_loss"]),
            full_cfg_loss=np.asarray(cst["full_cfg_loss"]),
        )
    return plan


def save_plan(plan, path: str):
    import numpy as np

    with open(path, "w") as f:
        json.dump(np.asarray(plan).tolist(), f)


def load_plan(path: str):
    import numpy as np

    with open(path) as f:
        return np.asarray(json.load(f), np.int32)
