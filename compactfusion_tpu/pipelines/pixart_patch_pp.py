"""Patch-pipelined PipeFusion sampler (the reference's ``_async_pipeline``).

Reference semantics (``pipeline_pixart_alpha.py`` / ``pipeline_flux.py``
``_async_pipeline`` + ``PipelineGroupCoordinator`` + ``CacheManager``): the
latent image is split into M token patches; pp stages each hold a slice of
the transformer blocks; patches stream through the stages so every stage is
busy once the pipeline fills, and each block's attention runs the fresh
current patch against the (one-iteration-stale) cached K/V of the other
patches.  Warmup denoise steps run the synchronous full-sequence path and
prime the KV caches.

SPMD re-design: one ``lax.scan`` over micro-rounds.  At round u stage s works
on global patch counter g = u - s (patch m = g mod M, denoise step g div M);
invalid (bubble) rounds compute masked garbage that never lands in state.
Stage handoff is a ``ppermute`` of the hidden patch; the last stage applies
the head + per-patch DPM++ update and its latents copy is psum-broadcast so
stage 0 reads the next step's patch input.  Requires M >= pp stages (the
pipeline must be deep enough to cover the return latency), matching the
reference's num_pipeline_patch guidance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import PatchKVAttn
from compactfusion_tpu.models.pixart import (
    pixart_embed,
    pixart_forward,
    pixart_head,
)
from compactfusion_tpu.parallel.mesh import AXIS_CFG, AXIS_PP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import ddpm_schedule, dpm_step_patch


def build_patch_pp_sample_fn(cfg, mesh: Mesh, params_tree):
    """``sample(params, text, text_mask, latents0) -> latents`` for the
    PixArt config ``cfg`` with pp_degree > 1 and num_pipeline_patch M > 1.

    Supports dp/cfg axes alongside pp; sequence parallelism inside a stage is
    not combined with patch mode (as in the reference, PipeFusion and SP
    shard the same token axis differently).
    """
    p = cfg.parallel
    mcfg = cfg.model
    M = cfg.num_pipeline_patch
    PS = p.pp_degree
    assert PS > 1 and M >= PS, "patch pipeline needs pp>1 and M >= pp stages"
    assert p.sp_degree == 1, "patch mode shards tokens by patch, not by SP"
    sched = ddpm_schedule(cfg.num_steps)
    hp, wp = cfg.grid
    pos_full = cm.sincos_pos_embed_2d(
        mcfg.dim, hp, wp,
        base_size=mcfg.base_size,
        interpolation_scale=mcfg.interpolation_scale,
    )
    S = cfg.tokens
    assert S % M == 0
    s_patch = S // M
    warmup = min(cfg.runtime_warmup_steps, cfg.num_steps)
    L_local = mcfg.depth // PS

    def spmd(params, text, text_mask, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            text, text_mask = text[0], text_mask[0]
        elif cfg.do_cfg:
            text = jnp.concatenate([text[0], text[1]], axis=0)
            text_mask = jnp.concatenate([text_mask[0], text_mask[1]], axis=0)
        else:
            text, text_mask = text[0], text_mask[0]

        b = latents.shape[0]
        nb = 2 * b if (cfg.do_cfg and p.cfg_degree == 1) else b
        my = lax.axis_index(AXIS_PP)
        attn = PatchKVAttn()
        kv_state = attn.init_state(
            L_local, nb, S, mcfg.heads, mcfg.head_dim, mcfg.dtype
        )

        def model_batch(lat):
            x = lat
            if cfg.do_cfg and p.cfg_degree == 1:
                x = jnp.concatenate([lat, lat], axis=0)
            return x

        # ---- warmup: synchronous full-sequence steps (prime nothing yet)
        def warm_body(carry, i):
            latents, px0, plam, phave = carry
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            out, _ = pixart_forward(
                params, model_batch(latents).astype(mcfg.dtype), t, text,
                mcfg, pos_embed=pos_full, pp_stages=PS,
            )
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            new, x0, lam = dpm_step_patch(
                sched, i, cfg.num_steps, latents, eps, px0, plam[0], phave[0]
            )
            return (
                new, x0,
                jnp.full_like(plam, lam), jnp.ones_like(phave),
            ), None

        px0 = jnp.zeros_like(latents)
        plam = jnp.zeros((M,), jnp.float32)
        phave = jnp.zeros((M,), jnp.int32)
        (latents, px0, plam, phave), _ = lax.scan(
            warm_body, (latents, px0, plam, phave),
            jnp.arange(warmup, dtype=jnp.int32),
        )

        # ---- prime KV caches with one cache-filling full forward
        t = jnp.full((nb,), sched.timesteps[jnp.minimum(warmup, cfg.num_steps - 1)], jnp.float32)
        kv_state = dict(kv_state, offset=jnp.zeros((L_local,), jnp.int32))
        _, kv_state = pixart_forward(
            params, model_batch(latents).astype(mcfg.dtype), t, text, mcfg,
            pos_embed=pos_full, attn=attn, attn_state=kv_state, pp_stages=PS,
        )

        # ---- patch-pipelined steady state
        steady = cfg.num_steps - warmup
        total_patches = steady * M
        rounds = total_patches + PS - 1
        inbox = jnp.zeros((nb, s_patch, mcfg.dim), mcfg.dtype)

        def round_body(carry, u):
            latents, inbox, kv_state, px0, plam, phave = carry
            g = u - my
            valid = (g >= 0) & (g < total_patches)
            gc = jnp.clip(g, 0, total_patches - 1)
            m = gc % M
            i = warmup + gc // M
            off = m * s_patch
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            temb = cm.timestep_embedder(params["t_embed"], t, 256)

            # stage 0 embeds the latent patch; other stages take the inbox
            x_patch = lax.dynamic_slice_in_dim(latents, off, s_patch, axis=1)
            pos_patch = lax.dynamic_slice_in_dim(pos_full, off, s_patch, axis=0)
            h0 = pixart_embed(
                params, model_batch(x_patch).astype(mcfg.dtype), pos_patch, mcfg
            )
            h_in = jnp.where(my == 0, h0, inbox)

            kv_in = dict(kv_state, offset=jnp.full((L_local,), off, jnp.int32))
            h_out, kv_new = pixart_forward(
                params, h_in, t, text, mcfg, pos_embed=pos_patch,
                attn=attn, attn_state=kv_in, x_is_hidden=True,
                return_hidden=True,
            )
            # bubbles must not pollute the caches
            kv_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old), kv_new, kv_state
            )

            # last stage: head + per-patch scheduler update
            out = pixart_head(params, h_out, temb, mcfg)
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            px0_patch = lax.dynamic_slice_in_dim(px0, off, s_patch, axis=1)
            new_patch, x0_patch, lam = dpm_step_patch(
                sched, i, cfg.num_steps, x_patch, eps, px0_patch,
                plam[m], phave[m],
            )
            write = valid & (my == PS - 1)
            latents = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(latents, new_patch, off, axis=1),
                latents,
            )
            px0 = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(px0, x0_patch, off, axis=1),
                px0,
            )
            plam = jnp.where(write, plam.at[m].set(lam), plam)
            phave = jnp.where(write, phave.at[m].set(1), phave)

            # broadcast the last stage's latents/scheduler state to all stages
            bcast = lambda a: lax.psum(
                jnp.where(my == PS - 1, a, jnp.zeros_like(a)), AXIS_PP
            )
            latents, px0, plam, phave = (
                bcast(latents), bcast(px0), bcast(plam), bcast(phave),
            )

            # hand the hidden patch to the next stage
            perm = [(s_, (s_ + 1) % PS) for s_ in range(PS)]
            inbox = lax.ppermute(h_out, AXIS_PP, perm)
            return (latents, inbox, kv_state, px0, plam, phave), None

        carry = (latents, inbox, kv_state, px0, plam, phave)
        carry, _ = lax.scan(
            round_body, carry, jnp.arange(rounds, dtype=jnp.int32)
        )
        return carry[0]

    if p.tp_degree > 1 or p.pp_degree > 1:
        param_specs = model_param_specs(
            params_tree, tp=p.tp_degree > 1, pp=p.pp_degree > 1
        )
    else:
        param_specs = P()
    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(param_specs, base.TEXT_SPEC, base.TEXT_SPEC, base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)
