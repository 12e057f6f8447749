"""HunyuanVideo backbone.

TPU-native counterpart of the reference's HunyuanVideo support
(``xfuser/model_executor/layers/attention_processor.py`` HunyuanVideo
processor + pipeline wrapper): architecturally a FLUX-family transformer —
double (MMDiT) blocks over [text, video] streams followed by single blocks on
the fused stream, multi-axis RoPE — with video (t, h, w) position ids and a
LLaMA-derived text context.  We therefore reuse :mod:`models.flux` wholesale:
``hunyuanvideo_config`` instantiates the FLUX block structure at HunyuanVideo
dimensions and :func:`hunyuanvideo_positions` supplies the 3D rope ids; the
upstream token-refiner text stack is absorbed by passing refined text states
in (encoders run outside the denoise scan, like all other pipelines here).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.flux import FluxConfig, flux_forward, init_flux  # noqa: F401


def hunyuanvideo_config() -> FluxConfig:
    """HunyuanVideo-T2V 720p: 20 double + 40 single blocks, heads 24x128."""
    return FluxConfig(
        dim=3072,
        double_layers=20,
        single_layers=40,
        heads=24,
        in_channels=64,  # 2x2-packed 16ch latent per frame
        text_dim=4096,  # LLaVA/LLaMA hidden states
        pooled_dim=768,
        axes_dim=(16, 56, 56),
        guidance_embeds=True,
    )


def hunyuanvideo_tiny() -> FluxConfig:
    return FluxConfig(
        dim=64, double_layers=2, single_layers=2, heads=4, in_channels=16,
        text_dim=32, pooled_dim=16, axes_dim=(8, 4, 4),
    )


def hunyuanvideo_positions(frames: int, hp: int, wp: int) -> jnp.ndarray:
    """(frames*hp*wp, 3) (t, row, col) ids for the video token grid."""
    t = jnp.repeat(jnp.arange(frames), hp * wp)
    rc = cm.patch_positions_2d(hp, wp)
    rc = jnp.tile(rc, (frames, 1))
    return jnp.concatenate([t[:, None], rc], axis=-1)


hunyuanvideo_forward = flux_forward
init_hunyuanvideo = init_flux
