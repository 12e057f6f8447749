"""PixArt-α/Σ text-to-image pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_pixart_alpha.py``
(696 LoC of wrapper around diffusers): here the whole denoise loop is one SPMD
program — ``shard_map`` over the (dp, cfg, ring, ulysses) mesh, ``lax.scan``
over denoise steps, DPM-Solver++ 2M sampler, optional CompactFusion-compressed
ring attention with the warmup segment compiled as a separate scan.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.cache.accel import CacheAccelConfig, init_cache_state
from compactfusion_tpu.config import (
    CompactConfig,
    CompressType,
    ParallelConfig,
    validate_parallel_geometry,
)
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import (
    CompactUSPAttn,
    SingleDeviceAttn,
    USPAttn,
)
from compactfusion_tpu.models.pixart import (
    PixArtConfig,
    pixart_forward,
    precompute_text_kv,
)
from compactfusion_tpu.models.vae import VAEConfig, vae_decode
from compactfusion_tpu.parallel.mesh import AXIS_CFG, AXIS_DP, AXIS_RING, AXIS_TP, AXIS_ULYSSES
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import (
    ddpm_schedule,
    dpm_init_state,
    dpm_step,
)


@dataclasses.dataclass(frozen=True)
class PixArtPipelineConfig:
    model: PixArtConfig
    vae: VAEConfig
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()
    cache: CacheAccelConfig = CacheAccelConfig()
    #: DiTFastAttn per-(step, layer) method plan as a tuple-of-tuples of ints
    #: (FastAttnMethod values), shape (num_steps, depth); None = off.
    fast_attn_plan: Optional[tuple] = None
    #: DiTFastAttn window size
    fast_attn_window: int = 64
    num_steps: int = 20
    #: PipeFusion micro-patches per image (M>1 with pp>1 enables the
    #: patch-pipelined async path, reference --num_pipeline_patch)
    num_pipeline_patch: int = 1
    #: full-sequence synchronous steps before patch mode (reference
    #: --warmup_steps runtime option)
    runtime_warmup_steps: int = 1
    guidance_scale: float = 4.5
    height: int = 512
    width: int = 512

    @property
    def latent_hw(self) -> Tuple[int, int]:
        return self.height // 8, self.width // 8

    @property
    def grid(self) -> Tuple[int, int]:
        lh, lw = self.latent_hw
        return lh // self.model.patch, lw // self.model.patch

    @property
    def tokens(self) -> int:
        hp, wp = self.grid
        return hp * wp

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0

    def __post_init__(self):
        validate_parallel_geometry(
            self.parallel, heads=self.model.heads, tokens=self.tokens,
            depth=self.model.depth,
            num_pipeline_patch=self.num_pipeline_patch, family="pixart",
        )


def _attn_impl(cfg: PixArtPipelineConfig, method: Optional[CompressType]):
    p = cfg.parallel
    if cfg.fast_attn_plan is not None:
        from compactfusion_tpu.cache.fast_attn import FastAttnAttn

        assert p.sp_degree == 1, "DiTFastAttn window bands do not shard"
        assert not cfg.compact.enabled
        return FastAttnAttn(
            window_size=cfg.fast_attn_window,
            # batch-doubled CFG rows [cond; uncond] enable the CFG_SHARE
            # methods (reference attn_layer.py:24-26,102-116)
            cfg_batched=cfg.do_cfg and p.cfg_degree == 1,
        )
    if cfg.compact.enabled and cfg.compact.patch_gather:
        # patch-parallel override (reference override_with_patch_gather_fwd);
        # patches live on the ring axis, so ulysses must be 1
        from compactfusion_tpu.parallel.patch import PatchParallelAttn

        assert p.ulysses_degree == 1, "patch_gather requires ulysses_degree=1"
        if cfg.compact.patch_async:
            mode = "async"
        elif cfg.compact.compress_type != CompressType.IDENTITY:
            mode = "compact"
        else:
            mode = "sync"
        return PatchParallelAttn(
            cfg=cfg.compact, method=method, mode=mode, world=p.ring_degree
        )
    if cfg.compact.enabled and cfg.compact.simulate_ring > 0:
        from compactfusion_tpu.models.attn_impl import SimRingAttn

        assert p.sp_degree == 1, "simulate_ring runs on a single device"
        assert method is not None
        return SimRingAttn(
            cfg=cfg.compact, method=method, ring_size=cfg.compact.simulate_ring
        )
    if cfg.compact.enabled:
        assert method is not None
        return CompactUSPAttn(
            cfg=cfg.compact,
            method=method,
            ulysses_size=p.ulysses_degree,
            ring_size=p.ring_degree,
            fused_ring=p.use_fused_ring,
        )
    if p.sp_degree > 1:
        return USPAttn(ulysses_size=p.ulysses_degree, ring_size=p.ring_degree,
                       fused_ring=p.use_fused_ring)
    return SingleDeviceAttn()


layer_plan_segments = base.layer_plan_segments


def denoise_step_fn(cfg: PixArtPipelineConfig, plan):
    """Build the per-step body (per-device views inside shard_map).

    ``plan`` is None (compression off), a single CompressType (layer-uniform
    step), or a tuple of (method, n_layers) segments (per-layer
    compress_func plans) — the latter compiles one block-scan per segment.
    """
    # DPM-Solver++ reads timesteps[i+1], so it takes the diffusers
    # DPMSolverMultistep default "linspace" table (reference PixArt
    # scheduler config; leading/trailing remain for the fixed-stride
    # ddim/ddpm steppers)
    sched = ddpm_schedule(cfg.num_steps, timestep_spacing="linspace")
    if plan is None or isinstance(plan, CompressType):
        attn = _attn_impl(cfg, plan)
    elif len(plan) == 1:
        attn = _attn_impl(cfg, plan[0][0])
    else:
        assert cfg.parallel.pp_degree == 1 and cfg.cache.mode == "none", (
            "per-layer compression plans compose with SP/CFG/DP only"
        )
        attn = tuple((_attn_impl(cfg, m), n) for m, n in plan)
    p = cfg.parallel
    hp, wp = cfg.grid
    pos_full = cm.sincos_pos_embed_2d(
        cfg.model.dim, hp, wp,
        base_size=cfg.model.base_size,
        interpolation_scale=cfg.model.interpolation_scale,
    )

    use_cache = cfg.cache.mode != "none"
    cache_cfg = dataclasses.replace(
        cfg.cache,
        sp_axes=(AXIS_RING, AXIS_ULYSSES) if p.sp_degree > 1 else (),
    )

    if cfg.fast_attn_plan is not None:
        from compactfusion_tpu.cache.fast_attn import optimize_plan

        # rewrite FULL -> FULL_NO_RESIDUAL where no later step consumes the
        # cached residual (skips the residual-refresh window pass)
        plan_table = jnp.asarray(optimize_plan(cfg.fast_attn_plan), jnp.int32)
    else:
        plan_table = None

    def step(params, carry, i, text, text_mask, pos_local, text_kv=None):
        latents, dpm_state, attn_state, cache_state = carry
        if plan_table is not None:
            attn_state = dict(attn_state, method=plan_table[i])
        t = jnp.full((latents.shape[0],), sched.timesteps[i], jnp.float32)
        x = latents
        if cfg.do_cfg and p.cfg_degree == 1:
            # batch-doubled CFG: rows [cond; uncond]
            x = jnp.concatenate([latents, latents], axis=0)
            t = jnp.concatenate([t, t], axis=0)
        fwd_out = pixart_forward(
            params,
            x.astype(cfg.model.dtype),
            t,
            text,
            cfg.model,
            pos_embed=pos_local,
            attn=attn,
            attn_state=attn_state,
            text_mask=text_mask,
            tp_axis=AXIS_TP if p.tp_degree > 1 else None,
            pp_stages=p.pp_degree,
            cache_cfg=cache_cfg if use_cache else None,
            cache_state=cache_state,
            # the final, quality-critical step always computes (reference
            # TeaCache reset_mask at cnt == num_steps - 1)
            cache_force=i == cfg.num_steps - 1,
            text_kv=text_kv,
        )
        if use_cache:
            out, attn_state, cache_state = fwd_out
        else:
            out, attn_state = fwd_out
        eps = out[..., : out.shape[-1] // 2]  # drop learned variance half
        if cfg.do_cfg:
            eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
        latents, dpm_state = dpm_step(
            sched, i, cfg.num_steps, latents, eps, dpm_state
        )
        from compactfusion_tpu.utils import collector

        if collector.enabled():
            # per-step latents tap (reference pipeline_flux.py:481-483)
            collector.collect(latents, "latents")
        return (latents, dpm_state, attn_state, cache_state)

    return step, pos_full, attn


def build_sample_fn(cfg: PixArtPipelineConfig, mesh: Mesh, params_tree=None):
    """Compile the full text->latents sampler over the mesh.

    Returns ``sample(params, text, text_mask, latents0) -> latents`` where
      text: (2, B, S_text, text_dim) — [cond, uncond] on the leading axis
            (replicated when cfg_degree==1, sharded over cfg when ==2);
      latents0: (B, S_tokens, p*p*C) noise tokens.
    """
    p = cfg.parallel
    # per-step plan: (method, n_layers) segment tuples when compress_func is
    # set (shared segmentation across steps), a single method otherwise
    segments = base.compact_layer_segments(
        cfg.compact, cfg.num_steps, cfg.model.depth
    )

    def spmd(params, text, text_mask, latents):
        # text arrives (2, B_local, S, D) on the cfg axis (or full when cfg=1)
        if cfg.do_cfg and p.cfg_degree == 2:
            text = text[0]  # this cfg rank's half
            if text_mask is not None:
                text_mask = text_mask[0]
        elif cfg.do_cfg:
            text = jnp.concatenate([text[0], text[1]], axis=0)
            if text_mask is not None:
                text_mask = jnp.concatenate([text_mask[0], text_mask[1]], axis=0)
        else:
            text = text[0]
            if text_mask is not None:
                text_mask = text_mask[0]

        b_local = latents.shape[0]
        n_model_batch = (
            2 * b_local if (cfg.do_cfg and p.cfg_degree == 1) else b_local
        )
        s_local = cfg.tokens // p.sp_degree

        dpm_state = dpm_init_state(latents.shape)
        if cfg.cache.mode != "none":
            assert not cfg.compact.enabled, (
                "cache acceleration is incompatible with compact compression"
            )
            shp = (n_model_batch, s_local, cfg.model.dim)
            cache_state = init_cache_state(shp, shp, jnp.float32)
        else:
            cache_state = None
        carry = (latents, dpm_state, None, cache_state)

        # text is constant across denoise steps: hoist the caption MLP +
        # per-block cross_kv projections out of the step scan (with pp>1 the
        # blocks axis is stage-local inside shard_map, so this precomputes
        # exactly this stage's K/V).  Stored in the model compute dtype —
        # the reference's fp16 pipelines carry text states at half precision
        # too, and it keeps the in-loop cross-attention matmuls off the
        # fp32-promotion path when callers pass fp32 text embeddings.
        text_kv = precompute_text_kv(params, text).astype(cfg.model.dtype)

        for method, steps in segments:
            step_fn, pos_full, attn = denoise_step_fn(cfg, method)
            pos_local = (
                base.slice_local_tokens(pos_full, p.ulysses_degree, p.ring_degree)
                if p.sp_degree > 1
                else pos_full
            )
            if isinstance(attn, tuple):
                attn_state = tuple(
                    seg_attn.init_state(
                        n_l, n_model_batch, s_local, cfg.model.heads,
                        cfg.model.head_dim, jnp.float32,
                    )
                    for seg_attn, n_l in attn
                )
            else:
                attn_state = attn.init_state(
                    cfg.model.depth // p.pp_degree,
                    n_model_batch,
                    s_local,
                    cfg.model.heads,
                    cfg.model.head_dim,
                    jnp.float32,
                )
            # EF caches across step segments
            attn_state = base.carry_ef_state(carry[2], attn_state)
            carry = (carry[0], carry[1], attn_state, carry[3])

            def body(c, i, _step=step_fn, _pos=pos_local):
                return (
                    _step(params, c, i, text, text_mask, _pos, text_kv),
                    None,
                )

            carry, _ = lax.scan(
                body, carry, jnp.asarray(steps, jnp.int32)
            )
        return carry[0]

    if p.tp_degree > 1 or p.pp_degree > 1:
        assert params_tree is not None, "TP/PP need the param tree for specs"
        param_specs = model_param_specs(
            params_tree, tp=p.tp_degree > 1, pp=p.pp_degree > 1
        )
    else:
        param_specs = P()
    in_specs = (
        param_specs,  # FFNs sharded over tp when tp_degree > 1
        base.TEXT_SPEC,
        base.TEXT_SPEC,
        base.LATENT_SPEC,
    )
    fn = jax.shard_map(
        spmd, mesh=mesh, in_specs=in_specs, out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


def decode_latents(vae_params, latent_tokens, cfg: PixArtPipelineConfig):
    """Unpatchify token latents and decode to images (replicated decode)."""
    hp, wp = cfg.grid
    lat = cm.unpatchify(
        latent_tokens, cfg.model.patch, hp, wp, cfg.model.in_channels
    )
    img = vae_decode(vae_params, lat, cfg.vae)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


class PixArtPipeline:
    """User-facing pipeline (the reference's ``xFuserPixArtAlphaPipeline``)."""

    def __init__(self, params, vae_params, cfg: PixArtPipelineConfig, mesh: Mesh):
        self.params = params
        self.vae_params = vae_params
        self.cfg = cfg
        self.mesh = mesh
        if cfg.parallel.pp_degree > 1 and cfg.num_pipeline_patch > 1:
            from compactfusion_tpu.pipelines.pixart_patch_pp import (
                build_patch_pp_sample_fn,
            )

            self._sample = build_patch_pp_sample_fn(cfg, mesh, params)
        else:
            self._sample = build_sample_fn(cfg, mesh, params)
        if cfg.parallel.vae_parallel_size > 0:
            # separate VAE ranks (reference parallel_state.py:297-308 +
            # base_pipeline.py:654-669): decode on the device tail outside
            # the DiT mesh with the halo-exchange banded decoder
            from compactfusion_tpu.parallel.mesh import make_vae_mesh
            from compactfusion_tpu.parallel.vae import decode_on_vae_mesh

            vae_mesh = make_vae_mesh(cfg.parallel)
            hp, wp = cfg.grid

            def _decode_tail(vae_params, latent_tokens):
                lat = cm.unpatchify(
                    latent_tokens, cfg.model.patch, hp, wp,
                    cfg.model.in_channels,
                )
                img = decode_on_vae_mesh(vae_params, lat, cfg.vae, vae_mesh)
                return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

            self._decode = _decode_tail
        else:
            self._decode = jax.jit(
                functools.partial(decode_latents, cfg=cfg)
            )

    def __call__(self, text, text_mask, key, decode: bool = True):
        cfg = self.cfg
        if text_mask is None:
            text_mask = jnp.ones(text.shape[:3], dtype=bool)
        latents = base.prepare_latents(
            key,
            text.shape[1],
            cfg.tokens,
            cfg.model.patch * cfg.model.patch * cfg.model.in_channels,
            jnp.float32,
        )
        latents = self._sample(self.params, text, text_mask, latents)
        if not decode:
            return latents
        return self._decode(self.vae_params, latents)
