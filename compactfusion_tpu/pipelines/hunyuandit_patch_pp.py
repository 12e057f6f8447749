"""Patch-pipelined PipeFusion sampler for HunyuanDiT with the skip channel.

Reference semantics (``pipeline_hunyuandit.py:552-825`` ``_async_pipeline`` +
``pipeline_send_skip``/``recv_skip``): the U-ViT's long skip activations must
travel from each down-chunk stage to its MIRROR up-chunk stage alongside the
patch stream.

SPMD re-design: the same 2*PS virtual pipeline as FLUX patch-PP (virtual
stages 0..PS-1 = local DOWN chunks, PS..2PS-1 = local UP chunks), except the
per-patch message also carries a SKIP TRAIN — a (PS, L_local, B, s_patch, D)
buffer in which down chunk s deposits its skip stack at slot s; up chunk s
reads slot PS-1-s (reversed within the chunk).  The train rides the ordinary
ring handoff, which subsumes the reference's mirror-rank skip buffers without
extra communication primitives.

Warmup denoise steps run the exact synchronous PP path
(``hunyuandit_forward(pp_stages=PS)``) and one cache-priming patched forward
fills the stale-KV caches, like the PixArt patch pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import PatchKVAttn
from compactfusion_tpu.models.hunyuandit import (
    hunyuandit_down_scan,
    hunyuandit_forward,
    hunyuandit_head,
    hunyuandit_up_scan,
    up_skip_mask,
)
from compactfusion_tpu.parallel.mesh import AXIS_PP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import (
    ddpm_schedule,
    dpm_step_patch,
)


def build_hunyuandit_patch_pp_sample_fn(cfg, mesh: Mesh, params_tree):
    """``sample(params, text, text_mask, latents0) -> latents`` for a
    HunyuanDiT config with pp_degree > 1 and num_pipeline_patch M >= 2*PS."""
    p = cfg.parallel
    mcfg = cfg.model
    M = cfg.num_pipeline_patch
    PS = p.pp_degree
    # 2*PS-deep virtual pipeline (down + up block families per device): the
    # latents write for patch g lands at round g + 2*PS - 1 while stage 0
    # re-reads that patch at round g + M — see flux_patch_pp.py
    assert PS > 1 and M >= 2 * PS, (
        "HunyuanDiT patch pipeline needs pp>1 and M >= 2*pp (2*PS-deep "
        "virtual pipeline over down+up blocks)"
    )
    assert p.sp_degree == 1, "patch mode shards tokens by patch, not by SP"
    half = mcfg.depth // 2
    assert half % PS == 0
    L_loc = half // PS
    hp, wp = cfg.grid
    S = cfg.tokens
    assert S % M == 0
    s_patch = S // M
    sched = ddpm_schedule(cfg.num_steps)
    warmup = min(max(cfg.runtime_warmup_steps, 1), cfg.num_steps)
    assert cfg.num_steps > warmup, (
        "patch mode needs at least one steady (post-warmup) step"
    )
    tp = AXIS_TP if p.tp_degree > 1 else None
    from compactfusion_tpu.models.hunyuandit import hunyuandit_positions

    pos = hunyuandit_positions(hp, wp)
    cos_full, sin_full = cm.rope_frequencies(pos, mcfg.rope_axes)
    attn = PatchKVAttn()
    ring = [(s_, (s_ + 1) % PS) for s_ in range(PS)]

    def spmd(params, text, text_mask, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            text, text_mask = text[0], text_mask[0]
        elif cfg.do_cfg:
            text = jnp.concatenate([text[0], text[1]], axis=0)
            text_mask = jnp.concatenate([text_mask[0], text_mask[1]], axis=0)
        else:
            text, text_mask = text[0], text_mask[0]
        text = text.astype(mcfg.dtype)
        kv_lens = jnp.sum(text_mask, axis=-1).astype(jnp.int32)

        b = latents.shape[0]
        nb = 2 * b if (cfg.do_cfg and p.cfg_degree == 1) else b
        my = lax.axis_index(AXIS_PP)

        def model_batch(lat):
            if cfg.do_cfg and p.cfg_degree == 1:
                return jnp.concatenate([lat, lat], axis=0)
            return lat

        # ---- warmup: exact synchronous PP steps
        def warm_body(carry, i):
            latents, px0, plam, phave = carry
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            out, _, _ = hunyuandit_forward(
                params, model_batch(latents).astype(mcfg.dtype), t, text,
                mcfg, rope=(cos_full, sin_full), text_mask=text_mask,
                pp_stages=PS, tp_axis=tp,
            )
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            new, x0, lam = dpm_step_patch(
                sched, i, cfg.num_steps, latents, eps, px0, plam[0], phave[0]
            )
            return (
                new, x0, jnp.full_like(plam, lam), jnp.ones_like(phave),
            ), None

        px0 = jnp.zeros_like(latents)
        plam = jnp.zeros((M,), jnp.float32)
        phave = jnp.zeros((M,), jnp.int32)
        (latents, px0, plam, phave), _ = lax.scan(
            warm_body, (latents, px0, plam, phave),
            jnp.arange(warmup, dtype=jnp.int32),
        )

        # ---- prime the stale-KV caches with one patched full forward
        kv_d = attn.init_state(L_loc, nb, S, mcfg.heads, mcfg.head_dim, mcfg.dtype)
        kv_u = attn.init_state(L_loc, nb, S, mcfg.heads, mcfg.head_dim, mcfg.dtype)
        t = jnp.full(
            (nb,),
            sched.timesteps[jnp.minimum(warmup, cfg.num_steps - 1)],
            jnp.float32,
        )
        _, kv_d, kv_u = hunyuandit_forward(
            params, model_batch(latents).astype(mcfg.dtype), t, text, mcfg,
            rope=(cos_full, sin_full), attn=attn,
            attn_state_down=kv_d, attn_state_up=kv_u,
            text_mask=text_mask, pp_stages=PS, tp_axis=tp,
        )

        # ---- patch-pipelined steady state with the skip train
        steady = cfg.num_steps - warmup
        total = steady * M
        rounds = total + 2 * PS - 1
        zero_h = jnp.zeros((nb, s_patch, mcfg.dim), mcfg.dtype)
        zero_train = jnp.zeros((PS, L_loc) + zero_h.shape, mcfg.dtype)
        inbox = ((zero_h, zero_train), (zero_h, zero_train))

        def temb_at(i):
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            return cm.timestep_embedder(params["t_embed"], t, 256)

        def round_body(carry, u):
            latents, inbox, kv_d, kv_u, px0, plam, phave = carry
            in_d, in_s = inbox

            # ----- down unit: patch gA through the local down chunk
            gA = u - my
            validA = (gA >= 0) & (gA < total)
            gcA = jnp.clip(gA, 0, total - 1)
            mA = gcA % M
            iA = warmup + gcA // M
            offA = mA * s_patch
            tembA = temb_at(iA)
            ropeA = (
                lax.dynamic_slice_in_dim(cos_full, offA, s_patch, axis=0),
                lax.dynamic_slice_in_dim(sin_full, offA, s_patch, axis=0),
            )
            x_patch = lax.dynamic_slice_in_dim(latents, offA, s_patch, axis=1)
            h0 = cm.linear(
                params["patch_embed"], model_batch(x_patch).astype(mcfg.dtype)
            )
            h_in = jnp.where(my == 0, h0, in_d[0])
            train_in = jnp.where(my == 0, jnp.zeros_like(in_d[1]), in_d[1])
            kv_dA = dict(kv_d, offset=jnp.full((L_loc,), offA, jnp.int32))
            d_h, kv_d_new, skips = hunyuandit_down_scan(
                params["down_blocks"], h_in, tembA, text, mcfg,
                rope=ropeA, attn=attn, attn_state=kv_dA, kv_lens=kv_lens,
                tp_axis=tp,
            )
            kv_d = jax.tree_util.tree_map(
                lambda new, old: jnp.where(validA, new, old), kv_d_new, kv_d
            )
            d_train = lax.dynamic_update_slice_in_dim(
                train_in, skips[None].astype(train_in.dtype), my, axis=0
            )

            # ----- up unit: patch gB through the local up chunk
            gB = u - PS - my
            validB = (gB >= 0) & (gB < total)
            gcB = jnp.clip(gB, 0, total - 1)
            mB = gcB % M
            iB = warmup + gcB // M
            offB = mB * s_patch
            tembB = temb_at(iB)
            ropeB = (
                lax.dynamic_slice_in_dim(cos_full, offB, s_patch, axis=0),
                lax.dynamic_slice_in_dim(sin_full, offB, s_patch, axis=0),
            )
            # device 0's up input is device PS-1's down output + full train
            uh_in = jnp.where(my == 0, in_d[0], in_s[0])
            utrain = jnp.where(my == 0, in_d[1], in_s[1])
            # up chunk my consumes down chunk (PS-1-my)'s skips, reversed
            skips_me = jnp.flip(
                lax.dynamic_index_in_dim(utrain, PS - 1 - my, 0, keepdims=False),
                axis=0,
            )
            kv_uB = dict(kv_u, offset=jnp.full((L_loc,), offB, jnp.int32))
            u_h, kv_u_new = hunyuandit_up_scan(
                params["up_blocks"], uh_in, skips_me, tembB, text, mcfg,
                rope=ropeB, attn=attn, attn_state=kv_uB, kv_lens=kv_lens,
                tp_axis=tp,
                # up chunk `my` holds global up slots [my*L_loc, ...); slot
                # 0 (on stage 0) is the skip-less global block depth/2
                skip_mask=up_skip_mask(L_loc, offset=my * L_loc),
            )
            kv_u = jax.tree_util.tree_map(
                lambda new, old: jnp.where(validB, new, old), kv_u_new, kv_u
            )

            # ----- last device: head + per-patch DPM++ update
            out = hunyuandit_head(params, u_h, tembB, mcfg)
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            xB = lax.dynamic_slice_in_dim(latents, offB, s_patch, axis=1)
            px0B = lax.dynamic_slice_in_dim(px0, offB, s_patch, axis=1)
            newB, x0B, lam = dpm_step_patch(
                sched, iB, cfg.num_steps, xB, eps, px0B, plam[mB], phave[mB]
            )
            write = validB & (my == PS - 1)
            latents = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(latents, newB, offB, axis=1),
                latents,
            )
            px0 = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(px0, x0B, offB, axis=1),
                px0,
            )
            plam = jnp.where(write, plam.at[mB].set(lam), plam)
            phave = jnp.where(write, phave.at[mB].set(1), phave)
            bcast = lambda a: lax.psum(
                jnp.where(my == PS - 1, a, jnp.zeros_like(a)), AXIS_PP
            )
            latents, px0, plam, phave = (
                bcast(latents), bcast(px0), bcast(plam), bcast(phave),
            )

            inbox = lax.ppermute(
                ((d_h, d_train), (u_h, utrain)), AXIS_PP, ring
            )
            return (latents, inbox, kv_d, kv_u, px0, plam, phave), None

        carry = (latents, inbox, kv_d, kv_u, px0, plam, phave)
        carry, _ = lax.scan(
            round_body, carry, jnp.arange(rounds, dtype=jnp.int32)
        )
        return carry[0]

    param_specs = model_param_specs(params_tree, tp=p.tp_degree > 1, pp=True)
    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(param_specs, base.TEXT_SPEC, base.TEXT_SPEC, base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)
