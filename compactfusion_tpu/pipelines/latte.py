"""Latte text-to-video pipeline.

TPU-native analog of ``xfuser/model_executor/pipelines/pipeline_latte.py``
(381 LoC): frame-aligned sharding (spatial attention fully local, temporal
attention via two all-to-alls — see ``models/latte.py``), true CFG, DDIM
sampling.
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
    ParallelConfig,
    validate_parallel_geometry,
)
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.latte import LatteConfig, latte_forward
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_TP, AXIS_ULYSSES
from compactfusion_tpu.pipelines import base
from compactfusion_tpu.schedulers.diffusion import ddim_step, ddpm_schedule


@dataclasses.dataclass(frozen=True)
class LattePipelineConfig:
    model: LatteConfig
    parallel: ParallelConfig = ParallelConfig()
    compact: CompactConfig = CompactConfig()  # accepted; Latte's layout has
    # no ring K/V exchange to compress (spatial attention is local)
    num_steps: int = 50
    guidance_scale: float = 7.5
    height: int = 512
    width: int = 512
    num_frames: int = 16

    @property
    def grid(self) -> Tuple[int, int]:
        return (
            self.height // 8 // self.model.patch,
            self.width // 8 // self.model.patch,
        )

    @property
    def spatial_tokens(self) -> int:
        hp, wp = self.grid
        return hp * wp

    @property
    def tokens(self) -> int:
        return self.num_frames * self.spatial_tokens

    @property
    def do_cfg(self) -> bool:
        return self.guidance_scale > 1.0

    def __post_init__(self):
        sp = self.parallel.sp_degree
        if self.num_frames % sp != 0:
            raise ValueError(
                f"latte: num_frames ({self.num_frames}) must be divisible "
                f"by sp_degree (ring {self.parallel.ring_degree} x ulysses "
                f"{self.parallel.ulysses_degree} = {sp}) — Latte shards "
                f"frames, not flat tokens, so spatial attention stays local"
            )


def build_sample_fn(cfg: LattePipelineConfig, mesh: Mesh):
    p = cfg.parallel
    mcfg = cfg.model
    hp, wp = cfg.grid
    sched = ddpm_schedule(cfg.num_steps)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, hp, wp)
    tpos = cm._sincos_embed_1d(jnp.arange(cfg.num_frames, dtype=jnp.float32), mcfg.dim)
    sp_axes = (AXIS_RING, AXIS_ULYSSES) if p.sp_degree > 1 else ()
    assert cfg.num_frames % p.sp_degree == 0, "frames must divide sp_degree"

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
        f_local = cfg.num_frames // p.sp_degree

        def body(latents, i):
            t = jnp.full((nb,), sched.timesteps[i], jnp.float32)
            x = latents
            if cfg.do_cfg and p.cfg_degree == 1:
                x = jnp.concatenate([latents, latents], axis=0)
            out, _ = latte_forward(
                params,
                x.astype(mcfg.dtype),
                t,
                text.astype(mcfg.dtype),
                mcfg,
                frames_local=f_local,
                frames_total=cfg.num_frames,
                spatial_tokens=cfg.spatial_tokens,
                pos_embed=pos,
                temporal_pos_embed=tpos,
                sp_axes=sp_axes,
                text_mask=text_mask,
                tp_axis=AXIS_TP if p.tp_degree > 1 else None,
            )
            eps = out[..., : out.shape[-1] // 2]
            if cfg.do_cfg:
                eps = base.cfg_combine(eps, cfg.guidance_scale, p.cfg_degree)
            latents = ddim_step(sched, i, cfg.num_steps, latents, eps)
            return latents, None

        latents, _ = lax.scan(
            body, latents, jnp.arange(cfg.num_steps, dtype=jnp.int32)
        )
        return latents

    fn = jax.shard_map(
        spmd,
        mesh=mesh,
        in_specs=(P(), base.TEXT_SPEC, base.TEXT_SPEC, base.LATENT_SPEC),
        out_specs=base.LATENT_SPEC,
        check_vma=False,
    )
    return jax.jit(fn)


class LattePipeline:
    """User-facing pipeline (the reference's ``xFuserLattePipeline``).

    With ``vae_params``/``vae_cfg`` set, ``__call__`` decodes each frame
    through the 2D image VAE to pixel video (B, T, H, W, 3) in [0, 1], like
    the reference's per-frame ``vae.decode`` tail (``pipeline_latte.py``);
    otherwise it returns latent tokens."""

    def __init__(self, params, cfg: LattePipelineConfig, mesh: Mesh,
                 vae_params=None, vae_cfg=None):
        self.params = params
        self.cfg = cfg
        self.mesh = mesh
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self._sample = build_sample_fn(cfg, mesh)
        self._decode = None
        if vae_params is not None:
            from compactfusion_tpu.models.vae import vae_decode

            hp, wp = cfg.grid
            t = cfg.num_frames

            def decode(vp, latent_tokens):
                b = latent_tokens.shape[0]
                lat = latent_tokens.reshape(b * t, cfg.spatial_tokens, -1)
                lat = cm.unpatchify(
                    lat, cfg.model.patch, hp, wp, cfg.model.in_channels
                )
                img = vae_decode(vp, lat, vae_cfg)
                img = jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)
                return img.reshape(b, t, *img.shape[1:])

            self._decode = jax.jit(decode)

    def __call__(self, text, text_mask, key, decode: Optional[bool] = None):
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
        if decode is None:
            decode = self._decode is not None
        if not decode or self._decode is None:
            return latents
        return self._decode(self.vae_params, latents)
