"""HunyuanDiT text-to-image pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_hunyuandit.py``
(957 LoC): SPMD denoise loop with true CFG, DPM-Solver++ sampler, RoPE'd
skip-connection DiT, optional compressed ring over both block halves.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

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
from compactfusion_tpu.models.hunyuandit import (
    HunyuanDiTConfig,
    hunyuandit_forward,
)
from compactfusion_tpu.models.vae import VAEConfig, vae_decode
from compactfusion_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import (
    ddpm_schedule,
    dpm_init_state,
    dpm_step,
)


@dataclasses.dataclass(frozen=True)
class HunyuanDiTPipelineConfig:
    model: HunyuanDiTConfig
    vae: Optional[VAEConfig] = None
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()
    num_steps: int = 25
    guidance_scale: float = 5.0
    height: int = 1024
    width: int = 1024
    #: PipeFusion micro-patches per image (M > 1 with pp_degree > 1 enables
    #: the patch-pipelined async path with the skip train)
    num_pipeline_patch: int = 1
    #: full-sequence synchronous steps before patch mode
    runtime_warmup_steps: int = 1

    @property
    def grid(self) -> Tuple[int, int]:
        return (
            self.height // 8 // self.model.patch,
            self.width // 8 // self.model.patch,
        )

    @property
    def tokens(self) -> int:
        hp, wp = self.grid
        return hp * wp

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0

    def __post_init__(self):
        if self.model.depth % 2 != 0:
            raise ValueError(
                "hunyuandit: depth must be even (depth/2 down + depth/2 up "
                "mirror halves with long skips)"
            )
        # each mirror half splits over pp independently (the skip channel
        # pairs stage i with stage pp-1-i)
        validate_parallel_geometry(
            self.parallel, heads=self.model.heads, tokens=self.tokens,
            depth=self.model.depth // 2,
            num_pipeline_patch=self.num_pipeline_patch,
            patch_pp_min_factor=2, family="hunyuandit",
        )


def _attn_impl(cfg, method):
    p = cfg.parallel
    if cfg.compact.enabled:
        return CompactUSPAttn(
            cfg=cfg.compact, method=method,
            ulysses_size=p.ulysses_degree, ring_size=p.ring_degree,
            fused_ring=p.use_fused_ring,
        )
    if p.sp_degree > 1:
        return USPAttn(ulysses_size=p.ulysses_degree, ring_size=p.ring_degree,
                       fused_ring=p.use_fused_ring)
    return SingleDeviceAttn()


def build_sample_fn(cfg: HunyuanDiTPipelineConfig, mesh: Mesh, params_tree=None):
    p = cfg.parallel
    mcfg = cfg.model
    hp, wp = cfg.grid
    sched = ddpm_schedule(cfg.num_steps)
    from compactfusion_tpu.models.hunyuandit import hunyuandit_positions

    pos = hunyuandit_positions(hp, wp)
    cos_full, sin_full = cm.rope_frequencies(pos, mcfg.rope_axes)

    # down half = layers [0, depth/2), up half = [depth/2, depth)
    segments = base.compact_two_family_segments(
        cfg.compact, cfg.num_steps, mcfg.depth // 2, mcfg.depth // 2
    )

    def spmd(params, text, text_mask, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            text, text_mask = text[0], text_mask[0]
        elif cfg.do_cfg:
            text = jnp.concatenate([text[0], text[1]], axis=0)
            text_mask = jnp.concatenate([text_mask[0], text_mask[1]], axis=0)
        else:
            text, text_mask = text[0], text_mask[0]

        b_local = latents.shape[0]
        nb = 2 * b_local if (cfg.do_cfg and p.cfg_degree == 1) else b_local
        s_local = cfg.tokens // p.sp_degree
        if p.sp_degree > 1:
            rope = (
                base.slice_local_tokens(cos_full, p.ulysses_degree, p.ring_degree),
                base.slice_local_tokens(sin_full, p.ulysses_degree, p.ring_degree),
            )
        else:
            rope = (cos_full, sin_full)

        half = mcfg.depth // 2 // p.pp_degree
        dpm_state = dpm_init_state(latents.shape)
        carry = (latents, dpm_state, None, None)
        for method, steps in segments:

            def _init(a, n_layers):
                return a.init_state(
                    n_layers, nb, s_local, mcfg.heads, mcfg.head_dim,
                    jnp.float32,
                )

            if isinstance(method, tuple):  # per-layer (down, up) plans
                assert p.pp_degree == 1, (
                    "per-layer compress_func plans need pp_degree == 1"
                )
                attn_d = tuple((_attn_impl(cfg, m), n) for m, n in method[0])
                attn_u = tuple((_attn_impl(cfg, m), n) for m, n in method[1])
                sd = tuple(_init(a, n) for a, n in attn_d)
                su = tuple(_init(a, n) for a, n in attn_u)
            else:
                attn_d = attn_u = _attn_impl(cfg, method)
                sd = _init(attn_d, half)
                su = _init(attn_u, half)
            # carry EF caches across segments, per family: a per-layer plan
            # can change one family's method class but not the other's
            sd = base.carry_ef_state(carry[2], sd)
            su = base.carry_ef_state(carry[3], su)
            carry = (carry[0], carry[1], sd, su)

            def body(c, i, _attn=attn_d, _attn_u=attn_u):
                latents, dpm_st, sd, su = c
                t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
                x = latents
                if cfg.do_cfg and p.cfg_degree == 1:
                    x = jnp.concatenate([latents, latents], axis=0)
                out, sd, su = hunyuandit_forward(
                    params,
                    x.astype(mcfg.dtype),
                    t,
                    text.astype(mcfg.dtype),
                    mcfg,
                    rope=rope,
                    attn=_attn,
                    attn_state_down=sd,
                    attn_state_up=su,
                    attn_up=None if _attn is _attn_u else _attn_u,
                    text_mask=text_mask,
                    tp_axis=AXIS_TP if p.tp_degree > 1 else None,
                    pp_stages=p.pp_degree,
                )
                eps = out[..., : out.shape[-1] // 2]
                if cfg.do_cfg:
                    eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
                latents, dpm_st = dpm_step(
                    sched, i, cfg.num_steps, latents, eps, dpm_st
                )
                return (latents, dpm_st, sd, su), None

            carry, _ = lax.scan(body, carry, jnp.asarray(steps, jnp.int32))
        return carry[0]

    if p.tp_degree > 1 or p.pp_degree > 1:
        assert params_tree is not None
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


class HunyuanDiTPipeline:
    """User-facing pipeline (the reference's ``xFuserHunyuanDiTPipeline``)."""

    def __init__(self, params, vae_params, cfg: HunyuanDiTPipelineConfig, mesh: Mesh):
        self.params = params
        self.vae_params = vae_params
        self.cfg = cfg
        self.mesh = mesh
        if cfg.parallel.pp_degree > 1 and cfg.num_pipeline_patch > 1:
            from compactfusion_tpu.pipelines.hunyuandit_patch_pp import (
                build_hunyuandit_patch_pp_sample_fn,
            )

            self._sample = build_hunyuandit_patch_pp_sample_fn(
                cfg, mesh, params
            )
        else:
            self._sample = build_sample_fn(cfg, mesh, params)

    def __call__(self, text, text_mask, key, decode: bool = True):
        cfg = self.cfg
        if text_mask is None:
            text_mask = jnp.ones(text.shape[:3], bool)
        latents = base.prepare_latents(
            key,
            text.shape[1],
            cfg.tokens,
            cfg.model.patch**2 * cfg.model.in_channels,
            jnp.float32,
        )
        latents = self._sample(self.params, text, text_mask, latents)
        if not decode or self.vae_params is None:
            return latents
        hp, wp = cfg.grid
        lat = cm.unpatchify(latents, cfg.model.patch, hp, wp, cfg.model.in_channels)
        img = vae_decode(self.vae_params, lat, cfg.vae)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
