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
from compactfusion_tpu.parallel.mesh import AXIS_CFG, AXIS_PP, AXIS_TP, AXIS_ULYSSES
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
    U = p.ulysses_degree
    assert PS > 1 and M >= PS, "patch pipeline needs pp>1 and M >= pp stages"
    assert p.ring_degree == 1, (
        "patch mode composes with ULYSSES SP only (reference "
        "_sequence_parallel_cache_update is ulysses-aware, ring is not)"
    )
    # same linspace table as the sync PixArt pipeline (diffusers
    # DPMSolverMultistep default)
    sched = ddpm_schedule(cfg.num_steps, timestep_spacing="linspace")
    hp, wp = cfg.grid
    pos_full = cm.sincos_pos_embed_2d(
        mcfg.dim, hp, wp,
        base_size=mcfg.base_size,
        interpolation_scale=mcfg.interpolation_scale,
    )
    S = cfg.tokens
    assert S % M == 0
    s_patch = S // M
    assert s_patch % U == 0
    spl = s_patch // U  # per-ulysses-rank token slice of one patch
    warmup = min(cfg.runtime_warmup_steps, cfg.num_steps)
    assert cfg.num_steps > warmup, (
        "patch mode needs at least one steady (post-warmup) step"
    )
    tp = AXIS_TP if p.tp_degree > 1 else None
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
        if U > 1:
            from compactfusion_tpu.models.attn_impl import PatchKVUlyssesAttn

            u_idx = lax.axis_index(AXIS_ULYSSES)
            attn = PatchKVUlyssesAttn(ulysses_size=U)
            # LATENT_SPEC shards tokens over ulysses (contiguous blocks in
            # rank order since ring==1); the scheduler/bookkeeping here runs
            # on the full sequence, so gather on entry and re-slice on exit
            latents = lax.all_gather(latents, AXIS_ULYSSES, axis=1, tiled=True)
        else:
            u_idx = 0
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
                mcfg, pos_embed=pos_full, pp_stages=PS, text_mask=text_mask,
                tp_axis=tp,
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
        # all but the LAST warmup step run plain; the last one rides through
        # the PatchKV strategy below so it primes the caches as it denoises
        # (reference: sync warmup steps update the CacheManager as they run,
        # cache_manager.py:105) instead of paying a discarded extra forward
        (latents, px0, plam, phave), _ = lax.scan(
            warm_body, (latents, px0, plam, phave),
            jnp.arange(max(warmup - 1, 0), dtype=jnp.int32),
        )

        def strategy_full_forward(latents, i):
            """Full-sequence forward THROUGH the patch-KV strategy: each
            ulysses rank feeds its contiguous token slice, offset 0 covers
            the whole cache; returns the per-rank input slice + output."""
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            if U > 1:
                x_in = lax.dynamic_slice_in_dim(
                    latents, u_idx * (S // U), S // U, axis=1
                )
                pos_in = lax.dynamic_slice_in_dim(
                    pos_full, u_idx * (S // U), S // U, axis=0
                )
            else:
                x_in, pos_in = latents, pos_full
            out, new_state = pixart_forward(
                params, model_batch(x_in).astype(mcfg.dtype), t, text, mcfg,
                pos_embed=pos_in, attn=attn, attn_state=kv_state,
                pp_stages=PS, text_mask=text_mask, tp_axis=tp,
            )
            return x_in, out, new_state

        if warmup > 0:
            i_last = jnp.int32(warmup - 1)
            x_in, out, kv_state = strategy_full_forward(latents, i_last)
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            px0_in = (
                lax.dynamic_slice_in_dim(px0, u_idx * (S // U), S // U, axis=1)
                if U > 1
                else px0
            )
            new_loc, x0_loc, lam = dpm_step_patch(
                sched, i_last, cfg.num_steps, x_in, eps, px0_in,
                plam[0], phave[0],
            )
            if U > 1:
                latents = lax.all_gather(new_loc, AXIS_ULYSSES, axis=1, tiled=True)
                px0 = lax.all_gather(x0_loc, AXIS_ULYSSES, axis=1, tiled=True)
            else:
                latents, px0 = new_loc, x0_loc
            plam = jnp.full_like(plam, lam)
            phave = jnp.ones_like(phave)
        else:
            # no warmup step to ride: one discarded cache-priming forward
            _, _, kv_state = strategy_full_forward(latents, jnp.int32(0))

        # ---- patch-pipelined steady state
        steady = cfg.num_steps - warmup
        total_patches = steady * M
        rounds = total_patches + PS - 1
        inbox = jnp.zeros((nb, spl, mcfg.dim), mcfg.dtype)

        def round_body(carry, u):
            latents, inbox, kv_state, px0, plam, phave = carry
            g = u - my
            valid = (g >= 0) & (g < total_patches)
            gc = jnp.clip(g, 0, total_patches - 1)
            m = gc % M
            i = warmup + gc // M
            off = m * s_patch  # the patch's GLOBAL token offset (cache slot)
            loc = off + u_idx * spl  # this ulysses rank's slice of the patch
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            temb = cm.timestep_embedder(params["t_embed"], t, 256)

            # stage 0 embeds the latent patch; other stages take the inbox
            x_patch = lax.dynamic_slice_in_dim(latents, loc, spl, axis=1)
            pos_patch = lax.dynamic_slice_in_dim(pos_full, loc, spl, axis=0)
            h0 = pixart_embed(
                params, model_batch(x_patch).astype(mcfg.dtype), pos_patch, mcfg
            )
            h_in = jnp.where(my == 0, h0, inbox)

            kv_in = dict(kv_state, offset=jnp.full((L_local,), off, jnp.int32))
            h_out, kv_new = pixart_forward(
                params, h_in, t, text, mcfg, pos_embed=pos_patch,
                attn=attn, attn_state=kv_in, x_is_hidden=True,
                return_hidden=True, text_mask=text_mask, tp_axis=tp,
            )
            # bubbles must not pollute the caches
            kv_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old), kv_new, kv_state
            )

            # last stage: head + per-patch scheduler update on the local slice
            out = pixart_head(params, h_out, temb, mcfg)
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            px0_patch = lax.dynamic_slice_in_dim(px0, loc, spl, axis=1)
            new_patch, x0_patch, lam = dpm_step_patch(
                sched, i, cfg.num_steps, x_patch, eps, px0_patch,
                plam[m], phave[m],
            )
            write = valid & (my == PS - 1)
            sum_axes = (AXIS_PP, AXIS_ULYSSES) if U > 1 else (AXIS_PP,)

            def shard_write(full, piece):
                upd = lax.dynamic_update_slice_in_dim(full, piece, loc, axis=1)
                delta = jnp.where(write, upd - full, jnp.zeros_like(full))
                return full + lax.psum(delta, sum_axes)

            latents = shard_write(latents, new_patch)
            px0 = shard_write(px0, x0_patch)
            # lam/phave are identical on every ulysses rank: pp-broadcast only
            plam = jnp.where(write, plam.at[m].set(lam), plam)
            phave = jnp.where(write, phave.at[m].set(1), phave)
            bcast = lambda a: lax.psum(
                jnp.where(my == PS - 1, a, jnp.zeros_like(a)), AXIS_PP
            )
            plam, phave = bcast(plam), bcast(phave)

            # hand the hidden patch slice to the next stage
            perm = [(s_, (s_ + 1) % PS) for s_ in range(PS)]
            inbox = lax.ppermute(h_out, AXIS_PP, perm)
            return (latents, inbox, kv_state, px0, plam, phave), None

        carry = (latents, inbox, kv_state, px0, plam, phave)
        carry, _ = lax.scan(
            round_body, carry, jnp.arange(rounds, dtype=jnp.int32)
        )
        out = carry[0]
        if U > 1:
            out = lax.dynamic_slice_in_dim(out, u_idx * (S // U), S // U, axis=1)
        return out

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
