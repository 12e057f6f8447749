"""HunyuanVideo text-to-video pipeline.

TPU-native analog of the reference HunyuanVideo pipeline (headline workload
of ``docs/performance/hunyuanvideo.md`` — 129-frame 720p, >100k tokens,
Ulysses-8): video tokens sharded over (dp, ring, ulysses) with the FLUX-family
backbone, flow-match Euler sampling, embedded guidance, optional compressed
ring — the config-#5 workload (long-video USP at 100x compression).
"""

from __future__ import annotations

import dataclasses
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
from compactfusion_tpu.models.hunyuanvideo import (
    hunyuanvideo_forward,
    hunyuanvideo_positions,
)
from compactfusion_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.flow_match import (
    flow_match_schedule,
    flow_match_step,
)


@dataclasses.dataclass(frozen=True)
class HunyuanVideoPipelineConfig:
    model: object  # FluxConfig-shaped
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()
    num_steps: int = 50
    guidance_scale: float = 6.0
    height: int = 720
    width: int = 1280
    num_frames: int = 129
    shift: float = 7.0  # HunyuanVideo uses a large static flow shift

    @property
    def latent_frames(self) -> int:
        return (self.num_frames - 1) // 4 + 1

    @property
    def grid(self) -> Tuple[int, int, int]:
        return self.latent_frames, self.height // 16, self.width // 16

    @property
    def tokens(self) -> int:
        f, hp, wp = self.grid
        return f * hp * wp

    def __post_init__(self):
        # depth=None: the FLUX-shaped double/single block families are
        # padded to divide pp stages like flux.py does
        validate_parallel_geometry(
            self.parallel, heads=self.model.heads, tokens=self.tokens,
            family="hunyuanvideo",
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


def build_sample_fn(cfg: HunyuanVideoPipelineConfig, mesh: Mesh, params_tree=None):
    p = cfg.parallel
    mcfg = cfg.model
    f, hp, wp = cfg.grid
    # diffusers HunyuanVideoPipeline: sigmas = linspace(1, 0, N+1)[:-1]
    sched = flow_match_schedule(
        cfg.num_steps, shift=cfg.shift, final_sigma=1.0 / cfg.num_steps
    )
    pos = hunyuanvideo_positions(f, hp, wp)
    theta = getattr(mcfg, "rope_theta", 10000.0)
    cos_full, sin_full = cm.rope_frequencies(pos, mcfg.axes_dim, theta=theta)

    segments = base.compact_two_family_segments(
        cfg.compact, cfg.num_steps, mcfg.double_layers, mcfg.single_layers
    )

    def spmd(params, txt, text_mask, pooled, latents):
        s_txt = txt.shape[1]
        txt_rope = cm.rope_frequencies(
            jnp.zeros((s_txt, len(mcfg.axes_dim)), jnp.int32), mcfg.axes_dim,
            theta=theta,
        )
        if p.sp_degree > 1:
            rope = (
                base.slice_local_tokens(cos_full, p.ulysses_degree, p.ring_degree),
                base.slice_local_tokens(sin_full, p.ulysses_degree, p.ring_degree),
            )
        else:
            rope = (cos_full, sin_full)
        b = latents.shape[0]
        guidance = (
            jnp.full((b,), cfg.guidance_scale * 1000.0, jnp.float32)
            if mcfg.guidance_embeds else None
        )
        s_local = cfg.tokens // p.sp_degree

        carry = (latents, None, None)
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
            carry = (carry[0], sd, ss)

            def body(c, i, _attn=attn_d, _attn_s=attn_s):
                latents, sd, ss = c
                t = jnp.full((b,), sched.timesteps[i], jnp.float32)
                v, sd, ss = hunyuanvideo_forward(
                    params,
                    latents.astype(mcfg.dtype),
                    txt.astype(mcfg.dtype),
                    pooled,
                    t,
                    guidance,
                    mcfg,
                    video_rope=rope,
                    txt_rope=txt_rope,
                    text_mask=text_mask,
                    attn=_attn,
                    attn_state_double=sd,
                    attn_state_single=ss,
                    attn_single=_attn_s,
                    tp_axis=AXIS_TP if p.tp_degree > 1 else None,
                    pp_stages=p.pp_degree,
                )
                latents = flow_match_step(sched, i, latents, v)
                return (latents, sd, ss), None

            carry, _ = lax.scan(body, carry, jnp.asarray(steps, jnp.int32))
        return carry[0]

    if p.pp_degree > 1:
        assert (
            mcfg.double_layers % p.pp_degree == 0
            and mcfg.single_layers % p.pp_degree == 0
        ), "sync PipeFusion needs both block families divisible by pp_degree"
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
        in_specs=(
            param_specs, P(AXIS_DP), P(AXIS_DP), P(AXIS_DP), base.LATENT_SPEC,
        ),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


class HunyuanVideoPipeline:
    """User-facing pipeline: raw LLaMA text states go through the in-model
    token refiner; CLIP pooled rides the timestep conditioning.  With
    ``vae_params``/``vae_cfg`` set, decodes to pixel video through the
    HunyuanVideo causal 3D VAE (``models/vae3d.hv_vae3d_decode``)."""

    def __init__(
        self,
        params,
        cfg: HunyuanVideoPipelineConfig,
        mesh: Mesh,
        vae_params=None,
        vae_cfg=None,
    ):
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self._sample = build_sample_fn(cfg, mesh, params)
        self._decode = None
        if vae_params is not None:
            from compactfusion_tpu.models.vae3d import hv_vae3d_decode

            f, hl, wl = cfg.grid
            mcfg = cfg.model
            latent_c = mcfg.in_channels // 4  # 2x2 packing

            def decode(vp, latent_tokens):
                b = latent_tokens.shape[0]
                lat = latent_tokens.reshape(b * f, hl * wl, -1)
                lat = cm.unpatchify(lat, 2, hl, wl, latent_c).reshape(
                    b, f, hl * 2, wl * 2, latent_c
                )
                vid = hv_vae3d_decode(vp, lat, vae_cfg)
                # diffusers video postprocess: [0, 1] like the image pipelines
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            self._decode = jax.jit(decode)

    def __call__(self, txt, key, pooled=None, text_mask=None,
                 decode=None):
        cfg = self.cfg
        if txt.ndim == 4:  # (2, B, S, D) registry convention: cond only
            txt = txt[0]
        b = txt.shape[0]
        if pooled is None:
            pooled = jnp.zeros((b, cfg.model.pooled_dim), jnp.float32)
        if text_mask is None:
            text_mask = jnp.ones(txt.shape[:2], bool)
        latents = base.prepare_latents(
            key, b, cfg.tokens, cfg.model.in_channels, jnp.float32
        )
        latents = self._sample(self.params, txt, text_mask, pooled, latents)
        if decode is None:
            decode = self._decode is not None
        if decode:
            assert self._decode is not None, "no VAE params supplied"
            return self._decode(self.vae_params, latents)
        return latents
