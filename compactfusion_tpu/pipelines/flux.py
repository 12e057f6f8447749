"""FLUX.1 text-to-image pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_flux.py``
(814 LoC): one SPMD program — image tokens sharded over (dp, ring, ulysses),
text replicated as joint tensors, flow-match Euler with FLUX's
resolution-dependent dynamic shift, embedded-guidance conditioning (FLUX.1 is
guidance-distilled: no CFG batch doubling, so the cfg mesh axis is unused
here), optional CompactFusion-compressed ring with the warmup segment
compiled as a separate scan.
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
from compactfusion_tpu.models.flux import (
    FluxConfig,
    flux_forward,
    flux_image_positions,
)
from compactfusion_tpu.models.vae import VAEConfig, vae_decode
from compactfusion_tpu.parallel.mesh import AXIS_DP, AXIS_RING, AXIS_TP, AXIS_ULYSSES
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.flow_match import (
    calculate_shift,
    flow_match_schedule,
    flow_match_step,
)


@dataclasses.dataclass(frozen=True)
class FluxPipelineConfig:
    model: FluxConfig
    vae: VAEConfig
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()
    cache: CacheAccelConfig = CacheAccelConfig()
    num_steps: int = 28
    guidance_scale: float = 3.5
    height: int = 1024
    width: int = 1024
    #: PipeFusion micro-patches per image (M > 1 with pp_degree > 1 enables
    #: the patch-pipelined async path, reference --num_pipeline_patch)
    num_pipeline_patch: int = 1
    #: full-sequence synchronous steps before patch mode
    runtime_warmup_steps: int = 1

    @property
    def grid(self) -> Tuple[int, int]:
        # vae 8x downsample then 2x2 packing
        return self.height // 16, self.width // 16

    @property
    def tokens(self) -> int:
        hp, wp = self.grid
        return hp * wp

    def __post_init__(self):
        # depth=None: FLUX pads both block families to divide pp stages
        # (pad_flux_for_pp); M >= 2*pp keeps the 2*PS-deep virtual pipeline
        # of the patch-PP sampler full
        validate_parallel_geometry(
            self.parallel, heads=self.model.heads, tokens=self.tokens,
            num_pipeline_patch=self.num_pipeline_patch,
            patch_pp_min_factor=2, family="flux",
        )


def _attn_impl(cfg: FluxPipelineConfig, method: Optional[CompressType]):
    p = cfg.parallel
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


def build_sample_fn(cfg: FluxPipelineConfig, mesh: Mesh, params_tree=None):
    """Compile ``sample(params, txt, pooled, latents0) -> latents``.

    txt: (B, S_txt, text_dim) T5 states; pooled: (B, pooled_dim);
    latents0: (B, S_tokens, in_channels) packed noise tokens.
    """
    p = cfg.parallel
    mcfg = cfg.model
    hp, wp = cfg.grid
    mu = calculate_shift(cfg.tokens)
    # FLUX overrides the scheduler sigmas with linspace(1, 1/N, N)
    # (reference pipeline_flux.py:275)
    sched = flow_match_schedule(
        cfg.num_steps, use_dynamic_shifting=True, mu=mu,
        final_sigma=1.0 / cfg.num_steps,
    )

    img_pos = flux_image_positions(hp, wp)
    cos_i_full, sin_i_full = cm.rope_frequencies(img_pos, mcfg.axes_dim)

    # per-layer plans (reference compress_func(layer, step)): a SHARED layer
    # segmentation per block family, per-step (double, single) method tuples
    segments = base.compact_two_family_segments(
        cfg.compact, cfg.num_steps, mcfg.double_layers, mcfg.single_layers
    )

    def spmd(params, txt, pooled, latents):
        s_txt = txt.shape[1]
        txt_pos = jnp.zeros((s_txt, len(mcfg.axes_dim)), jnp.int32)
        txt_rope = cm.rope_frequencies(txt_pos, mcfg.axes_dim)
        if p.sp_degree > 1:
            cos_i = base.slice_local_tokens(cos_i_full, p.ulysses_degree, p.ring_degree)
            sin_i = base.slice_local_tokens(sin_i_full, p.ulysses_degree, p.ring_degree)
        else:
            cos_i, sin_i = cos_i_full, sin_i_full
        img_rope = (cos_i, sin_i)

        b = latents.shape[0]
        guidance = (
            jnp.full((b,), cfg.guidance_scale * 1000.0, jnp.float32)
            if mcfg.guidance_embeds
            else None
        )
        s_local = cfg.tokens // p.sp_degree

        use_cache = cfg.cache.mode != "none"
        if use_cache:
            assert not cfg.compact.enabled, (
                "cache acceleration is incompatible with compact compression"
            )
            cache_cfg = dataclasses.replace(
                cfg.cache,
                sp_axes=(AXIS_RING, AXIS_ULYSSES) if p.sp_degree > 1 else (),
            )
            shp = (b, s_local, mcfg.dim)
            cache_state = init_cache_state(shp, shp, jnp.float32)
        else:
            cache_cfg, cache_state = None, None

        carry = (latents, None, None, cache_state)
        for method, steps in segments:

            def _init(a, n_layers):
                return a.init_state(
                    n_layers, b, s_local, mcfg.heads, mcfg.head_dim,
                    jnp.float32,
                )

            if isinstance(method, tuple):  # per-layer (double, single) plans
                attn_d = tuple((_attn_impl(cfg, m), n) for m, n in method[0])
                attn_s = tuple((_attn_impl(cfg, m), n) for m, n in method[1])
                sd = tuple(_init(a, n) for a, n in attn_d)
                ss = tuple(_init(a, n) for a, n in attn_s)
            else:
                attn_d = attn_s = _attn_impl(cfg, method)
                # per-STAGE local layers under sync PipeFusion
                sd = _init(attn_d, mcfg.double_layers // p.pp_degree)
                ss = _init(attn_s, mcfg.single_layers // p.pp_degree)
            # carry EF caches across segments, per family: a per-layer plan
            # can change one family's method class but not the other's
            sd = base.carry_ef_state(carry[1], sd)
            ss = base.carry_ef_state(carry[2], ss)
            carry = (carry[0], sd, ss, carry[3])

            def body(c, i, _attn=attn_d, _attn_s=attn_s):
                latents, sd, ss, cst = c
                t = jnp.full((b,), sched.timesteps[i], jnp.float32)
                fwd = flux_forward(
                    params,
                    latents.astype(mcfg.dtype),
                    txt.astype(mcfg.dtype),
                    pooled,
                    t,
                    guidance,
                    mcfg,
                    img_rope=img_rope,
                    txt_rope=txt_rope,
                    attn=_attn,
                    attn_state_double=sd,
                    attn_state_single=ss,
                    attn_single=_attn_s,
                    tp_axis=AXIS_TP if p.tp_degree > 1 else None,
                    cache_cfg=cache_cfg,
                    cache_state=cst,
                    # final step always computes (reference reset_mask)
                    cache_force=i == cfg.num_steps - 1,
                    pp_stages=p.pp_degree,
                )
                if use_cache:
                    v, sd, ss, cst = fwd
                else:
                    v, sd, ss = fwd
                latents = flow_match_step(sched, i, latents, v)
                from compactfusion_tpu.utils import collector

                if collector.enabled():
                    # per-step latents tap (reference pipeline_flux.py:481-483)
                    collector.collect(latents, "latents")
                return (latents, sd, ss, cst), None

            carry, _ = lax.scan(body, carry, jnp.asarray(steps, jnp.int32))
        return carry[0]

    if p.pp_degree > 1:
        assert (
            mcfg.double_layers % p.pp_degree == 0
            and mcfg.single_layers % p.pp_degree == 0
        ), "pad params/config with models.flux.pad_flux_for_pp first"
        assert cfg.cache.mode == "none", (
            "TeaCache/FBCache does not compose with sync PipeFusion"
        )
    if p.tp_degree > 1 or p.pp_degree > 1:
        assert params_tree is not None, "TP/PP need the param tree for specs"
        param_specs = model_param_specs(
            params_tree, tp=p.tp_degree > 1, pp=p.pp_degree > 1
        )
    else:
        param_specs = P()
    in_specs = (
        param_specs,
        P(AXIS_DP),
        P(AXIS_DP),
        base.LATENT_SPEC,
    )
    fn = jax.shard_map(
        spmd, mesh=mesh, in_specs=in_specs, out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


def unpack_latents(latent_tokens, cfg: FluxPipelineConfig):
    """(B, S, 64) packed tokens -> (B, H/8, W/8, 16) latent image."""
    hp, wp = cfg.grid
    return cm.unpatchify(latent_tokens, 2, hp, wp, cfg.vae.latent_channels)


def decode_latents(vae_params, latent_tokens, cfg: FluxPipelineConfig):
    lat = unpack_latents(latent_tokens, cfg)
    img = vae_decode(vae_params, lat, cfg.vae)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


class FluxPipeline:
    """User-facing pipeline (the reference's ``xFuserFluxPipeline``)."""

    def __init__(self, params, vae_params, cfg: FluxPipelineConfig, mesh: Mesh):
        self.params = params
        self.vae_params = vae_params
        self.cfg = cfg
        self.mesh = mesh
        if cfg.parallel.pp_degree > 1 and cfg.num_pipeline_patch > 1:
            from compactfusion_tpu.models.flux import pad_flux_for_pp
            from compactfusion_tpu.pipelines.flux_patch_pp import (
                build_flux_patch_pp_sample_fn,
            )

            # zero-init identity pad blocks make both block-family counts
            # divide the stage count (real FLUX has 19 double blocks)
            self.params, padded_model = pad_flux_for_pp(
                params, cfg.model, cfg.parallel.pp_degree
            )
            cfg = dataclasses.replace(cfg, model=padded_model)
            self._sample = build_flux_patch_pp_sample_fn(
                cfg, mesh, self.params
            )
        elif cfg.parallel.pp_degree > 1:
            # SYNC PipeFusion (num_pipeline_patch == 1): same zero-init
            # identity padding so both block-family counts divide the stages
            from compactfusion_tpu.models.flux import pad_flux_for_pp

            self.params, padded_model = pad_flux_for_pp(
                params, cfg.model, cfg.parallel.pp_degree
            )
            cfg = dataclasses.replace(cfg, model=padded_model)
            self._sample = build_sample_fn(cfg, mesh, self.params)
        else:
            self._sample = build_sample_fn(cfg, mesh, params)
        self._decode = jax.jit(functools.partial(decode_latents, cfg=cfg))

    def __call__(self, txt, pooled, key, decode: bool = True):
        cfg = self.cfg
        latents = base.prepare_latents(
            key, txt.shape[0], cfg.tokens, cfg.model.in_channels, jnp.float32
        )
        latents = self._sample(self.params, txt, pooled, latents)
        if not decode or self.vae_params is None:
            return latents
        return self._decode(self.vae_params, latents)
