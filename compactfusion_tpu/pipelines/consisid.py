"""ConsisID identity-preserving text-to-video pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_consisid.py``
(502 LoC): the CogVideoX denoise loop plus replicated face-identity tokens
(``id_states``) feeding the per-block gated ID cross-attention of
``models/consisid.py``.  The face encoders (ArcFace global + CLIP-visual
local, reference ``pipeline_consisid.py`` prepare steps) run outside the
scan like the text encoders; pass their projected output as ``id_states``.
Same parallelism axes as CogVideoX (dp, cfg, ring, ulysses) with the
CompactFusion compressed ring on video K/V.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import CompressType
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.consisid import (
    ConsisIDConfig,
    consisid_forward,
)
from compactfusion_tpu.models.cogvideox import video_positions
from compactfusion_tpu.parallel.mesh import AXIS_TP
from compactfusion_tpu.parallel.tp import model_param_specs
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.pipelines.cogvideox import (
    CogVideoXPipelineConfig,
    _attn_impl,
)
from compactfusion_tpu.schedulers.diffusion import ddim_step_v, ddpm_schedule


@dataclasses.dataclass(frozen=True)
class ConsisIDPipelineConfig(CogVideoXPipelineConfig):
    model: ConsisIDConfig = None  # type: ignore[assignment]
    #: number of face-identity tokens fed to the gated cross-attention
    id_tokens: int = 5


def build_sample_fn(cfg: ConsisIDPipelineConfig, mesh: Mesh, params_tree=None):
    """``sample(params, txt, id_states, latents0) -> latents``.

    txt: (2, B, S_txt, text_dim); id_states: (B, S_id, id_dim) replicated;
    latents0: (B, S, p*p*C).
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
    cos_full, sin_full = cm.rope_frequencies(
        video_positions(f, hp, wp), mcfg.axes_dim
    )

    segments = base.compact_layer_segments(
        cfg.compact, cfg.num_steps, mcfg.depth
    )
    dyn_cfg = base.dynamic_cfg_table(
        cfg.guidance_scale, sched.timesteps, cfg.num_steps
    )

    def spmd(params, txt, id_states, latents):
        if cfg.do_cfg and p.cfg_degree == 2:
            txt = txt[0]
        elif cfg.do_cfg:
            txt = jnp.concatenate([txt[0], txt[1]], axis=0)
        else:
            txt = txt[0]

        b_local = latents.shape[0]
        n_model_batch = (
            2 * b_local if (cfg.do_cfg and p.cfg_degree == 1) else b_local
        )
        ids = id_states
        if ids.shape[0] != n_model_batch:
            ids = jnp.concatenate([ids] * (n_model_batch // ids.shape[0]), 0)
        s_local = cfg.tokens // p.sp_degree
        rope = (
            base.slice_local_tokens(cos_full, p.ulysses_degree, p.ring_degree)
            if p.sp_degree > 1 else cos_full,
            base.slice_local_tokens(sin_full, p.ulysses_degree, p.ring_degree)
            if p.sp_degree > 1 else sin_full,
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
                    # per-STAGE local layers under sync PipeFusion
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
                v, st = consisid_forward(
                    params,
                    x.astype(mcfg.dtype),
                    txt.astype(mcfg.dtype),
                    ids.astype(mcfg.dtype),
                    t,
                    mcfg,
                    video_rope=rope,
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
        in_specs=(param_specs, base.TEXT_SPEC, P(), base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


class ConsisIDPipeline:
    """User-facing pipeline (the reference's ``xFuserConsisIDPipeline``)."""

    def __init__(
        self,
        params,
        cfg: ConsisIDPipelineConfig,
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

            def decode(vp, latent_tokens):
                b = latent_tokens.shape[0]
                lat = latent_tokens.reshape(b * f, hp * wp, -1)
                lat = cm.unpatchify(
                    lat, mcfg.patch, hp, wp, mcfg.in_channels
                ).reshape(b, f, hp * mcfg.patch, wp * mcfg.patch,
                          mcfg.in_channels)
                vid = vae3d_decode(vp, lat, vae_cfg)
                # diffusers video postprocess: [0, 1] like the image pipelines
                return jnp.clip(vid * 0.5 + 0.5, 0.0, 1.0)

            self._decode = jax.jit(decode)

    def encode_face(self, lfe_params, id_cond, id_vit_hidden, lfe_cfg=None):
        """Run the ``local_facial_extractor`` (models/face.py) ONCE outside
        the denoise scan: (B, id_dim_raw) + 5 ViT hidden maps -> id_states.

        Reference: the diffusers ConsisID transformer consumes
        ``id_cond``/``id_vit_hidden`` through its face encoder
        (consisid_transformer_3d.py:60-68) before the blocks run.
        """
        from compactfusion_tpu.models.face import lfe_consisid, lfe_forward

        return lfe_forward(
            lfe_params, id_cond, id_vit_hidden, lfe_cfg or lfe_consisid()
        )

    def __call__(self, txt, key, id_states=None,
                 decode: Optional[bool] = None):
        cfg = self.cfg
        b = txt.shape[1]
        if id_states is None:
            # unconditioned identity: zero tokens; with zero-init gates the
            # model reduces exactly to CogVideoX
            id_states = jnp.zeros(
                (b, cfg.id_tokens, cfg.model.id_dim), jnp.float32
            )
        latents = base.prepare_latents(
            key,
            b,
            cfg.tokens,
            cfg.model.patch**2 * cfg.model.in_channels,
            jnp.float32,
        )
        latents = self._sample(self.params, txt, id_states, latents)
        if decode is None:
            decode = self._decode is not None
        if decode:
            assert self._decode is not None, "no VAE params supplied"
            return self._decode(self.vae_params, latents)
        return latents
