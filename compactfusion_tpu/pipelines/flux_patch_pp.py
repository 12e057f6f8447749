"""Patch-pipelined PipeFusion sampler for FLUX (reference ``_async_pipeline``).

Reference semantics (``pipeline_flux.py:555-721`` + ``CacheManager``): image
token patches stream through pp stages holding slices of the transformer;
patched attention runs the fresh current patch against one-iteration-stale
cached K/V of the other patches, with the text tokens recomputed fresh every
patch forward (only image K/V ages — ``cache_manager.py:105``).

SPMD re-design for FLUX's two block families: a VIRTUAL pipeline of depth
2*PS — virtual stages 0..PS-1 are each device's local DOUBLE blocks, stages
PS..2PS-1 its local SINGLE blocks (the stacked layer axes are sharded over
the pp mesh axis, so every device holds D/PS doubles and S/PS singles).  At
micro-round u, device s advances patch ``u - s`` through its doubles AND
patch ``u - PS - s`` through its singles — the standard interleaved
(virtual-stage) schedule; one ``ppermute`` per round carries both family
outputs (image patch + text stream) to the next device.  The last device
applies the head + per-patch flow-match Euler update and psum-broadcasts the
latents so stage 0 reads the next step's patch.

Warmup denoise steps run synchronously (masked PP rounds over both families)
and prime the K/V caches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import PatchKVAttn
from compactfusion_tpu.models.flux import (
    flux_double_scan,
    flux_head,
    flux_image_positions,
    flux_single_scan,
    flux_time_embed,
)
from compactfusion_tpu.parallel.mesh import AXIS_PP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.flow_match import (
    calculate_shift,
    flow_match_schedule,
)


def build_flux_patch_pp_sample_fn(cfg, mesh: Mesh, params_tree):
    """``sample(params, txt, pooled, latents0) -> latents`` for a FLUX config
    with pp_degree > 1 and num_pipeline_patch M >= 2*pp stages."""
    p = cfg.parallel
    mcfg = cfg.model
    M = cfg.num_pipeline_patch
    PS = p.pp_degree
    # the VIRTUAL pipeline is 2*PS deep (doubles + singles per device): the
    # latents write for patch g lands at round g + 2*PS - 1, and stage 0
    # re-embeds that patch for the NEXT step at round g + M reading the
    # PREVIOUS round's latents — M < 2*PS would silently denoise from
    # latents missing the previous step's update
    assert PS > 1 and M >= 2 * PS, (
        "FLUX patch pipeline needs pp>1 and M >= 2*pp (2*PS-deep virtual "
        "pipeline over double+single blocks)"
    )
    assert p.sp_degree == 1, "patch mode shards tokens by patch, not by SP"
    # FluxPipeline pads the params with zero-init identity blocks first
    assert mcfg.double_layers % PS == 0 and mcfg.single_layers % PS == 0, (
        "pad params/config with models.flux.pad_flux_for_pp before building"
    )
    hp, wp = cfg.grid
    S = cfg.tokens
    assert S % M == 0
    s_patch = S // M
    mu = calculate_shift(S)
    sched = flow_match_schedule(
        cfg.num_steps, use_dynamic_shifting=True, mu=mu,
        final_sigma=1.0 / cfg.num_steps,  # reference pipeline_flux.py:275
    )
    warmup = min(max(cfg.runtime_warmup_steps, 1), cfg.num_steps)
    assert cfg.num_steps > warmup, (
        "patch mode needs at least one steady (post-warmup) step"
    )
    tp = AXIS_TP if p.tp_degree > 1 else None
    Ld = mcfg.double_layers // PS
    Ls = mcfg.single_layers // PS

    img_pos = flux_image_positions(hp, wp)
    cos_full, sin_full = cm.rope_frequencies(img_pos, mcfg.axes_dim)
    attn = PatchKVAttn()
    ring = [(s_, (s_ + 1) % PS) for s_ in range(PS)]

    def spmd(params, txt, pooled, latents):
        b = latents.shape[0]
        s_txt = txt.shape[1]
        txt_rope = cm.rope_frequencies(
            jnp.zeros((s_txt, len(mcfg.axes_dim)), jnp.int32), mcfg.axes_dim
        )
        guidance = (
            jnp.full((b,), cfg.guidance_scale * 1000.0, jnp.float32)
            if mcfg.guidance_embeds
            else None
        )
        my = lax.axis_index(AXIS_PP)
        txt_emb = cm.linear(params["context_embedder"], txt.astype(mcfg.dtype))
        kv_d = attn.init_state(Ld, b, S, mcfg.heads, mcfg.head_dim, mcfg.dtype)
        kv_s = attn.init_state(Ls, b, S, mcfg.heads, mcfg.head_dim, mcfg.dtype)

        def temb_at(i):
            t = jnp.full((b,), sched.timesteps[i], jnp.float32)
            return flux_time_embed(params, pooled, t, guidance, cfg.model)

        # ---- warmup: synchronous full-sequence steps; PatchKV at offset 0
        # is exact full attention AND primes the caches
        def sync_step(carry, i):
            latents, kv_d, kv_s = carry
            temb = temb_at(i)
            img = cm.linear(params["x_embedder"], latents.astype(mcfg.dtype))
            h = (img, txt_emb)
            kv_d2 = dict(kv_d, offset=jnp.zeros((Ld,), jnp.int32))
            for u in range(PS):
                i2, t2, st = flux_double_scan(
                    params["double_blocks"], h[0], h[1], temb, mcfg,
                    img_rope=(cos_full, sin_full), txt_rope=txt_rope,
                    attn=attn, attn_state=kv_d2, tp_axis=tp,
                )
                active = my == u
                h = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), (i2, t2), h
                )
                kv_d2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), st, kv_d2
                )
                h = lax.ppermute(h, AXIS_PP, ring)  # PS hops -> back on dev 0
            kv_s2 = dict(kv_s, offset=jnp.zeros((Ls,), jnp.int32))
            for u in range(PS):
                i2, t2, st = flux_single_scan(
                    params["single_blocks"], h[0], h[1], temb, mcfg,
                    img_rope=(cos_full, sin_full), txt_rope=txt_rope,
                    attn=attn, attn_state=kv_s2, tp_axis=tp,
                )
                active = my == u
                h = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), (i2, t2), h
                )
                kv_s2 = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(active, new, old), st, kv_s2
                )
                if u < PS - 1:
                    h = lax.ppermute(h, AXIS_PP, ring)
            # result lives on device PS-1: head + Euler step, broadcast
            v = flux_head(params, h[0], temb, mcfg)
            new = latents + (sched.sigmas[i + 1] - sched.sigmas[i]) * v.astype(
                jnp.float32
            )
            new = lax.psum(
                jnp.where(my == PS - 1, new, jnp.zeros_like(new)), AXIS_PP
            )
            # caches stay per-stage: each stage updated exactly its layers
            return (new, kv_d2, kv_s2), None

        (latents, kv_d, kv_s), _ = lax.scan(
            sync_step, (latents, kv_d, kv_s),
            jnp.arange(warmup, dtype=jnp.int32),
        )

        # ---- patch-pipelined steady state over the 2*PS virtual pipeline
        steady = cfg.num_steps - warmup
        total = steady * M
        rounds = total + 2 * PS - 1
        zero_patch = jnp.zeros((b, s_patch, mcfg.dim), mcfg.dtype)
        zero_txt = jnp.zeros_like(txt_emb)
        inbox = ((zero_patch, zero_txt), (zero_patch, zero_txt))

        def round_body(carry, u):
            latents, inbox, kv_d, kv_s = carry
            (in_d, in_s) = inbox

            # ----- doubles unit: patch gA through local double blocks
            gA = u - my
            validA = (gA >= 0) & (gA < total)
            gcA = jnp.clip(gA, 0, total - 1)
            mA = gcA % M
            iA = warmup + gcA // M
            offA = mA * s_patch
            tembA = temb_at(iA)
            x_patch = lax.dynamic_slice_in_dim(latents, offA, s_patch, axis=1)
            h0 = cm.linear(params["x_embedder"], x_patch.astype(mcfg.dtype))
            img_in = jnp.where(my == 0, h0, in_d[0])
            txt_in = jnp.where(my == 0, txt_emb, in_d[1])
            ropeA = (
                lax.dynamic_slice_in_dim(cos_full, offA, s_patch, axis=0),
                lax.dynamic_slice_in_dim(sin_full, offA, s_patch, axis=0),
            )
            kv_dA = dict(kv_d, offset=jnp.full((Ld,), offA, jnp.int32))
            d_img, d_txt, kv_d_new = flux_double_scan(
                params["double_blocks"], img_in, txt_in, tembA, mcfg,
                img_rope=ropeA, txt_rope=txt_rope, attn=attn, attn_state=kv_dA,
                tp_axis=tp,
            )
            kv_d = jax.tree_util.tree_map(
                lambda new, old: jnp.where(validA, new, old), kv_d_new, kv_d
            )

            # ----- singles unit: patch gB through local single blocks
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
            # device 0's singles input is device PS-1's doubles output (the
            # ring delivered it into in_d); others take the singles inbox
            simg_in = jnp.where(my == 0, in_d[0], in_s[0])
            stxt_in = jnp.where(my == 0, in_d[1], in_s[1])
            kv_sB = dict(kv_s, offset=jnp.full((Ls,), offB, jnp.int32))
            s_img, s_txt_o, kv_s_new = flux_single_scan(
                params["single_blocks"], simg_in, stxt_in, tembB, mcfg,
                img_rope=ropeB, txt_rope=txt_rope, attn=attn, attn_state=kv_sB,
                tp_axis=tp,
            )
            kv_s = jax.tree_util.tree_map(
                lambda new, old: jnp.where(validB, new, old), kv_s_new, kv_s
            )

            # ----- last device: head + per-patch flow Euler update
            v = flux_head(params, s_img, tembB, mcfg)
            xB = lax.dynamic_slice_in_dim(latents, offB, s_patch, axis=1)
            newB = xB + (sched.sigmas[iB + 1] - sched.sigmas[iB]) * v.astype(
                jnp.float32
            )
            write = validB & (my == PS - 1)
            latents = jnp.where(
                write,
                lax.dynamic_update_slice_in_dim(latents, newB, offB, axis=1),
                latents,
            )
            latents = lax.psum(
                jnp.where(my == PS - 1, latents, jnp.zeros_like(latents)),
                AXIS_PP,
            )

            # ----- hand both family outputs to the next device
            inbox = lax.ppermute(
                ((d_img, d_txt), (s_img, s_txt_o)), AXIS_PP, ring
            )
            return (latents, inbox, kv_d, kv_s), None

        carry = (latents, inbox, kv_d, kv_s)
        carry, _ = lax.scan(
            round_body, carry, jnp.arange(rounds, dtype=jnp.int32)
        )
        return carry[0]

    param_specs = model_param_specs(
        params_tree, tp=p.tp_degree > 1, pp=True
    )
    from compactfusion_tpu.parallel.mesh import AXIS_DP

    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(param_specs, P(AXIS_DP), P(AXIS_DP), base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)
