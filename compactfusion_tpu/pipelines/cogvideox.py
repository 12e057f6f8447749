"""CogVideoX text-to-video pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_cogvideox.py``
(439 LoC): video tokens (frames x spatial patches) sharded over
(dp, ring, ulysses), true CFG, v-prediction DDIM with SNR-shifted zero-SNR
schedule, optional CompactFusion-compressed ring over the video K/V — the
config-#4 workload (compressed sequence parallelism for video).
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
from compactfusion_tpu.models.cogvideox import (
    CogVideoXConfig,
    cogvideox_forward,
    video_positions,
)
from compactfusion_tpu.parallel.mesh import AXIS_DP, AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import ddim_step_v, ddpm_schedule


@dataclasses.dataclass(frozen=True)
class CogVideoXPipelineConfig:
    model: CogVideoXConfig
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()
    num_steps: int = 50
    guidance_scale: float = 6.0
    #: per-step cosine-ramped guidance (reference ``use_dynamic_cfg``,
    #: ``pipeline_cogvideox.py:62,303-306``): g(t) = 1 + g0 * (1 - cos(pi *
    #: ((n - t)/n)^5)) / 2 with t the raw timestep value.
    use_dynamic_cfg: bool = False
    height: int = 480
    width: int = 720
    num_frames: int = 49  # pixel frames; latent frames = (n-1)//4 + 1

    @property
    def latent_frames(self) -> int:
        return (self.num_frames - 1) // 4 + 1

    @property
    def pad_latent_frames(self) -> int:
        """Padding so latent frames divide patch_t (CogVideoX 1.5); the
        padding frames are dropped before decode (reference
        ``pipeline_cogvideox.py:227-233``)."""
        return (-self.latent_frames) % self.model.patch_t

    @property
    def grid(self) -> Tuple[int, int, int]:
        hp = self.height // 8 // self.model.patch
        wp = self.width // 8 // self.model.patch
        ft = (self.latent_frames + self.pad_latent_frames) // self.model.patch_t
        return ft, hp, wp

    @property
    def tokens(self) -> int:
        f, hp, wp = self.grid
        return f * hp * wp

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0

    def __post_init__(self):
        validate_parallel_geometry(
            self.parallel, heads=self.model.heads, tokens=self.tokens,
            depth=self.model.depth,
            family=type(self).__name__.removesuffix("PipelineConfig").lower(),
        )


def _attn_impl(cfg: CogVideoXPipelineConfig, method: Optional[CompressType]):
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


def build_sample_fn(cfg: CogVideoXPipelineConfig, mesh: Mesh, params_tree=None):
    """``sample(params, txt, latents0) -> latents``.

    txt: (2, B, S_txt, text_dim) [cond, uncond]; latents0: (B, S, p*p*C).
    """
    p = cfg.parallel
    mcfg = cfg.model
    f, hp, wp = cfg.grid
    sched = ddpm_schedule(
        cfg.num_steps,
        beta_schedule="scaled_linear",
        snr_shift_scale=3.0,
        rescale_zero_snr=True,
        timestep_spacing="trailing",
    )
    pos = video_positions(f, hp, wp)
    if mcfg.use_rotary:
        cos_full, sin_full = cm.rope_frequencies(pos, mcfg.axes_dim)
    else:
        pos_full = cm.sincos_pos_embed_2d(mcfg.dim, f * hp, wp)

    segments = base.compact_layer_segments(
        cfg.compact, cfg.num_steps, mcfg.depth
    )
    dyn_cfg = base.dynamic_cfg_table(
        cfg.guidance_scale, sched.timesteps, cfg.num_steps
    )

    def spmd(params, txt, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            txt = txt[0]
        elif cfg.do_cfg:
            txt = jnp.concatenate([txt[0], txt[1]], axis=0)
        else:
            txt = txt[0]

        b_local = latents.shape[0]
        n_model_batch = 2 * b_local if (cfg.do_cfg and p.cfg_degree == 1) else b_local
        s_local = cfg.tokens // p.sp_degree
        if mcfg.use_rotary:
            rope = (
                base.slice_local_tokens(cos_full, p.ulysses_degree, p.ring_degree)
                if p.sp_degree > 1 else cos_full,
                base.slice_local_tokens(sin_full, p.ulysses_degree, p.ring_degree)
                if p.sp_degree > 1 else sin_full,
            )
            pe = None
        else:
            rope = None
            pe = (
                base.slice_local_tokens(pos_full, p.ulysses_degree, p.ring_degree)
                if p.sp_degree > 1 else pos_full
            )

        carry = (latents, None)
        for method, steps in segments:
            if isinstance(method, tuple):  # per-layer compress_func plans
                attn = tuple((_attn_impl(cfg, m), n) for m, n in method)
                st = tuple(
                    a.init_state(
                        n, n_model_batch, s_local, mcfg.heads, mcfg.head_dim,
                        jnp.float32,
                    )
                    for a, n in attn
                )
            else:
                attn = _attn_impl(cfg, method)
                st = attn.init_state(
                    # per-STAGE local layers under sync PipeFusion (the
                    # blocks stack is sharded over pp)
                    mcfg.depth // p.pp_degree, n_model_batch, s_local,
                    mcfg.heads, mcfg.head_dim, jnp.float32,
                )
            st = base.carry_ef_state(carry[1], st)  # EF caches across segments
            carry = (carry[0], st)

            def body(c, i, _attn=attn):
                latents, st = c
                t = jnp.full((n_model_batch,), sched.timesteps[i], jnp.float32)
                x = latents
                if cfg.do_cfg and p.cfg_degree == 1:
                    x = jnp.concatenate([latents, latents], axis=0)
                v, st = cogvideox_forward(
                    params,
                    x.astype(mcfg.dtype),
                    txt.astype(mcfg.dtype),
                    t,
                    mcfg,
                    video_rope=rope,
                    pos_embed=pe,
                    attn=_attn,
                    attn_state=st,
                    tp_axis=AXIS_TP if p.tp_degree > 1 else None,
                    pp_stages=p.pp_degree,
                )
                if cfg.do_cfg:
                    g = (
                        dyn_cfg[i] if cfg.use_dynamic_cfg
                        else cfg.guidance_scale
                    )
                    v = base.cfg_combine(v, g, p.cfg_degree)
                latents = ddim_step_v(sched, i, cfg.num_steps, latents, v)
                return (latents, st), None

            carry, _ = lax.scan(body, carry, jnp.asarray(steps, jnp.int32))
        return carry[0]

    if p.pp_degree > 1:
        assert mcfg.depth % p.pp_degree == 0, (
            "sync PipeFusion needs depth divisible by pp_degree"
        )
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
        in_specs=(param_specs, base.TEXT_SPEC, base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


class CogVideoXPipeline:
    """User-facing pipeline (the reference's ``xFuserCogVideoXPipeline``).

    With ``vae_params`` + ``vae_cfg`` set, ``__call__`` decodes latents with
    the causal 3D VAE (``models/vae3d.py``) to pixel video (B, T, H, W, 3),
    like the reference's ``pipeline_cogvideox.py:439`` decode tail;
    otherwise it returns latent tokens.
    """

    def __init__(
        self,
        params,
        cfg: CogVideoXPipelineConfig,
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
            from compactfusion_tpu.models.vae3d import vae3d_decode

            f, hp, wp = cfg.grid
            mcfg = cfg.model

            def decode(vae_params, latent_tokens):
                # (B, ft*hp*wp, pt*p*p*C) -> (B, T, h, w, C) -> pixels;
                # token channels are (p_t, p, p, C)-packed
                b = latent_tokens.shape[0]
                pt, p, c = mcfg.patch_t, mcfg.patch, mcfg.in_channels
                lat = latent_tokens.reshape(b, f, hp, wp, pt, p, p, c)
                lat = lat.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                    b, f * pt, hp * p, wp * p, c
                )
                # drop the divisibility padding frames (reference
                # pipeline_cogvideox.py:227-233 "additional_frames")
                lat = lat[:, cfg.pad_latent_frames:]
                vid = vae3d_decode(vae_params, lat, vae_cfg)
                # diffusers video postprocess: (x/2+0.5).clamp(0,1) — same
                # [0, 1] contract as the image pipelines
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            self._decode = jax.jit(decode)

    def __call__(self, txt, key, decode: Optional[bool] = None):
        cfg = self.cfg
        latents = base.prepare_latents(
            key,
            txt.shape[1],
            cfg.tokens,
            cfg.model.token_in,
            jnp.float32,
        )
        latents = self._sample(self.params, txt, latents)
        if decode is None:
            decode = self._decode is not None
        if decode:
            assert self._decode is not None, "no VAE params supplied"
            return self._decode(self.vae_params, latents)
        return latents
