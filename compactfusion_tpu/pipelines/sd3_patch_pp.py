"""Patch-pipelined PipeFusion sampler for SD3 (reference ``_async_pipeline``).

Reference semantics (``pipeline_stable_diffusion_3.py`` ``_async_pipeline`` +
``CacheManager``): image token patches stream through pp stages holding
slices of the joint transformer blocks; patched attention runs the fresh
patch (and the always-fresh text stream) against the one-iteration-stale
cached image K/V of the other patches.

SPMD re-design: one ``lax.scan`` over micro-rounds like the PixArt sampler,
except the handoff carries the (image patch, text stream) PAIR — SD3's joint
blocks update both streams, and the text tokens ride as PatchKV joint
tensors (recomputed every patch forward, only image K/V ages).  The last
stage applies the head + per-patch flow-match Euler update (stateless, so no
per-patch scheduler bookkeeping is needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import PatchKVAttn
from compactfusion_tpu.models.sd3 import (
    sd3_head,
    sd3_joint_scan,
    sd3_time_embed,
)
from compactfusion_tpu.parallel.mesh import AXIS_PP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.flow_match import flow_match_schedule


def build_sd3_patch_pp_sample_fn(cfg, mesh: Mesh, params_tree):
    """``sample(params, txt, pooled, latents0) -> latents`` for an SD3
    config with pp_degree > 1 and num_pipeline_patch M >= PS."""
    p = cfg.parallel
    mcfg = cfg.model
    M = cfg.num_pipeline_patch
    PS = p.pp_degree
    assert PS > 1 and M >= PS, "patch pipeline needs pp>1 and M >= pp stages"
    assert p.sp_degree == 1, "patch mode shards tokens by patch, not by SP"
    assert mcfg.depth % PS == 0
    hp, wp = cfg.grid
    S = cfg.tokens
    assert S % M == 0
    s_patch = S // M
    sched = flow_match_schedule(cfg.num_steps, shift=cfg.shift)
    warmup = min(max(cfg.runtime_warmup_steps, 1), cfg.num_steps)
    assert cfg.num_steps > warmup, (
        "patch mode needs at least one steady (post-warmup) step"
    )
    tp = AXIS_TP if p.tp_degree > 1 else None
    L_loc = mcfg.depth // PS
    pos_full = cm.cropped_pos_embed_2d(
        mcfg.dim, hp, wp, mcfg.pos_embed_max_size, mcfg.base_size
    )
    attn = PatchKVAttn()
    ring = [(s_, (s_ + 1) % PS) for s_ in range(PS)]

    def spmd(params, txt, pooled, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            txt, pooled = txt[0], pooled[0]
        elif cfg.do_cfg:
            txt = jnp.concatenate([txt[0], txt[1]], axis=0)
            pooled = jnp.concatenate([pooled[0], pooled[1]], axis=0)
        else:
            txt, pooled = txt[0], pooled[0]

        b = latents.shape[0]
        nb = 2 * b if (cfg.do_cfg and p.cfg_degree == 1) else b
        my = lax.axis_index(AXIS_PP)
        txt_emb0 = cm.linear(params["context_embedder"], txt.astype(mcfg.dtype))

        def model_batch(lat):
            if cfg.do_cfg and p.cfg_degree == 1:
                return jnp.concatenate([lat, lat], axis=0)
            return lat

        def temb_at(i):
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            return sd3_time_embed(params, pooled, t, mcfg)

        kv = attn.init_state(L_loc, nb, S, mcfg.heads, mcfg.head_dim, mcfg.dtype)

        # ---- warmup: synchronous full-sequence steps; PatchKV at offset 0
        # is exact full attention AND primes the caches
        def sync_step(carry, i):
            latents, kv = carry
            temb = temb_at(i)
            img = (
                cm.linear(params["patch_embed"], model_batch(latents).astype(mcfg.dtype))
                + pos_full.astype(mcfg.dtype)[None]
            )
            h = (img, txt_emb0)
            kv2 = dict(kv, offset=jnp.zeros((L_loc,), jnp.int32))
            for u in range(PS):
                i2, t2, st = sd3_joint_scan(
                    params["blocks"], h[0], h[1], temb, mcfg,
                    attn=attn, attn_state=kv2, tp_axis=tp,
                )
                active = my == u
                h = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), (i2, t2), h
                )
                kv2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), st, kv2
                )
                if u < PS - 1:
                    h = lax.ppermute(h, AXIS_PP, ring)
            v = sd3_head(params, h[0], temb, mcfg)
            if cfg.do_cfg:
                v = base.cfg_combine(v, cfg.guidance_scale, p.cfg_degree)
            new = latents + (sched.sigmas[i + 1] - sched.sigmas[i]) * v.astype(
                jnp.float32
            )
            new = lax.psum(
                jnp.where(my == PS - 1, new, jnp.zeros_like(new)), AXIS_PP
            )
            return (new, kv2), None

        (latents, kv), _ = lax.scan(
            sync_step, (latents, kv), jnp.arange(warmup, dtype=jnp.int32)
        )

        # ---- patch-pipelined steady state
        steady = cfg.num_steps - warmup
        total = steady * M
        rounds = total + PS - 1
        inbox = (
            jnp.zeros((nb, s_patch, mcfg.dim), mcfg.dtype),
            jnp.zeros_like(txt_emb0),
        )

        def round_body(carry, u):
            latents, inbox, kv = carry
            g = u - my
            valid = (g >= 0) & (g < total)
            gc = jnp.clip(g, 0, total - 1)
            m = gc % M
            i = warmup + gc // M
            off = m * s_patch
            temb = temb_at(i)

            x_patch = lax.dynamic_slice_in_dim(latents, off, s_patch, axis=1)
            pos_patch = lax.dynamic_slice_in_dim(pos_full, off, s_patch, axis=0)
            h0 = (
                cm.linear(params["patch_embed"], model_batch(x_patch).astype(mcfg.dtype))
                + pos_patch.astype(mcfg.dtype)[None]
            )
            img_in = jnp.where(my == 0, h0, inbox[0])
            txt_in = jnp.where(my == 0, txt_emb0, inbox[1])

            kv_in = dict(kv, offset=jnp.full((L_loc,), off, jnp.int32))
            img_o, txt_o, kv_new = sd3_joint_scan(
                params["blocks"], img_in, txt_in, temb, mcfg,
                attn=attn, attn_state=kv_in, tp_axis=tp,
            )
            kv = jax.tree_util.tree_map(
                lambda new, old: jnp.where(valid, new, old), kv_new, kv
            )

            v = sd3_head(params, img_o, temb, mcfg)
            if cfg.do_cfg:
                v = base.cfg_combine(v, cfg.guidance_scale, p.cfg_degree)
            newp = x_patch + (
                sched.sigmas[i + 1] - sched.sigmas[i]
            ) * v.astype(jnp.float32)
            write = valid & (my == PS - 1)
            latents = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(latents, newp, off, axis=1),
                latents,
            )
            latents = lax.psum(
                jnp.where(my == PS - 1, latents, jnp.zeros_like(latents)),
                AXIS_PP,
            )
            inbox = lax.ppermute((img_o, txt_o), AXIS_PP, ring)
            return (latents, inbox, kv), None

        carry = (latents, inbox, kv)
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
