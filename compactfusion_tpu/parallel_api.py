"""One-call parallelization API + model registry.

Reference: ``xDiTParallel`` (``xfuser/parallel.py:23-54``) — look up the
wrapper class for a pipeline, wrap it, warm up, run, save per-DP-rank — and
the registry pattern of ``model_executor/pipelines/register.py``.

Here the registry maps a model-name pattern to (model config, pipeline
config, pipeline class, init/convert functions); ``xDiTParallel`` builds the
mesh from the EngineConfig, loads or randomly initialises parameters, and
exposes the same call shape.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.cache.accel import CacheAccelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.config import EngineConfig, InputConfig
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.utils.logger import init_logger

logger = init_logger(__name__)


def _cache_cfg(engine: EngineConfig, family: str = "") -> CacheAccelConfig:
    """Map the runtime toggles (--use_fbcache / --use_teacache) to a cache
    config with the reference's default thresholds.  FLUX TeaCache uses the
    fitted degree-4 rescale polynomial (reference cache/utils.py:22)."""
    rt = engine.runtime_config
    if rt.use_fbcache:
        return CacheAccelConfig(mode="fbcache", threshold=0.12)
    if rt.use_teacache:
        from compactfusion_tpu.cache.accel import FLUX_TEACACHE_POLY

        poly = FLUX_TEACACHE_POLY if family == "flux" else (1.0, 0.0)
        return CacheAccelConfig(mode="teacache", threshold=0.25, poly=poly)
    return CacheAccelConfig()


def classify_height_width_bin(
    height: int, width: int, base_px: int, align: Optional[int] = None
) -> Tuple[int, int]:
    """Snap a requested (height, width) to the nearest aspect-ratio bin.

    Reference semantics: ``use_resolution_binning`` routes through diffusers'
    ``classify_height_width_bin`` with the PixArt ``ASPECT_RATIO_*_BIN``
    tables (``pipeline_pixart_sigma.py:168-182``) — generate at the bin the
    model was trained on, resize the output back.  The bins here are derived
    rather than tabulated: area-preserving, ``align``-aligned (h, w) pairs at
    the model's native area; the pair with the closest aspect ratio wins.
    Native squares map to themselves, so default requests are unchanged.
    """
    if align is None:
        # 32-aligned at the 512 scale, 64 at 1024+ (matching the granularity
        # of the published ASPECT_RATIO tables); floor of 16 keeps every bin
        # divisible by vae_factor * patch
        align = max(16, base_px // 16)
    area = base_px * base_px
    target = height / width
    cands = set()
    for a in range(align, 2 * base_px + 1, align):
        b = int(round(area / a / align)) * align
        if b >= align:
            cands.add((a, b))  # height-driven pair
            cands.add((b, a))  # width-driven pair
    best, best_d = (base_px, base_px), abs(target - 1.0)
    for h, w in sorted(cands):
        d = abs(target - h / w)
        if d < best_d - 1e-9:
            best, best_d = (h, w), d
    return best


def resize_and_crop(images: jax.Array, height: int, width: int) -> jax.Array:
    """Aspect-preserving bilinear resize then center crop to (height, width)
    — the output leg of resolution binning (reference
    ``resize_and_crop_tensor``, ``pipeline_pixart_sigma.py:355``)."""
    b, h, w, c = images.shape
    if (h, w) == (height, width):
        return images
    r = max(height / h, width / w)
    nh, nw = max(int(round(h * r)), height), max(int(round(w * r)), width)
    out = jax.image.resize(images, (b, nh, nw, c), method="bilinear")
    top, left = (nh - height) // 2, (nw - width) // 2
    return out[:, top : top + height, left : left + width]


def _bin_input(inp: InputConfig, base_px: int) -> InputConfig:
    """Apply resolution binning to the request (PixArt family)."""
    if not inp.use_resolution_binning:
        return inp
    bh, bw = classify_height_width_bin(inp.height, inp.width, base_px)
    if (bh, bw) != (inp.height, inp.width):
        logger.info(
            "resolution binning: %dx%d -> %dx%d (native area %d^2)",
            inp.height, inp.width, bh, bw, base_px,
        )
        inp = dataclasses.replace(inp, height=bh, width=bw)
    return inp


@dataclasses.dataclass
class _Family:
    name: str
    pattern: str
    build: Callable[[EngineConfig, InputConfig], Any]


_REGISTRY: Dict[str, _Family] = {}


def register_family(name: str, pattern: str):
    def deco(fn):
        _REGISTRY[name] = _Family(name, pattern, fn)
        return fn

    return deco


def resolve_family(model_name: str) -> _Family:
    low = model_name.lower()
    for fam in _REGISTRY.values():
        if re.search(fam.pattern, low):
            return fam
    raise ValueError(
        f"no pipeline registered for model {model_name!r}; "
        f"known: {[f.pattern for f in _REGISTRY.values()]}"
    )


# ---------------------------------------------------------------------------
# family builders (random init; pass checkpoint_dir to load HF weights)
# ---------------------------------------------------------------------------


def _vae_opts(vcfg, engine: EngineConfig):
    """Apply the runtime VAE decode memory knobs (reference --enable_tiling /
    --enable_slicing) to a 2D ``VAEConfig``.  The video (3D causal) VAE
    builders wire --enable_tiling into ``VAE3DConfig.use_tiling`` themselves
    (spatial tiled decode, the reference's vae.enable_tiling())."""
    rc = engine.runtime_config
    if rc.enable_tiling or rc.enable_slicing:
        vcfg = dataclasses.replace(
            vcfg, use_tiling=rc.enable_tiling, use_slicing=rc.enable_slicing
        )
    return vcfg


@register_family("pixart", r"pixart")
def _build_pixart(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.pixart import (
        init_pixart,
        pixart_alpha_512,
        pixart_sigma_1024,
    )
    from compactfusion_tpu.models.vae import init_vae_decoder, sd_vae
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )

    name = engine.model_config.model.lower()
    if "tiny" in name:  # smoke-test configs (examples/run.sh on the CPU mesh)
        from compactfusion_tpu.models.pixart import pixart_tiny
        from compactfusion_tpu.models.vae import tiny_vae

        mcfg, vcfg = pixart_tiny(), tiny_vae()
    else:
        if "2k" in name or inp.height > 1024:
            from compactfusion_tpu.models.pixart import pixart_sigma_2k

            mcfg = pixart_sigma_2k()
            sigma = True
        elif "sigma" in name or inp.height > 512:
            mcfg = pixart_sigma_1024()
            sigma = True
        else:
            mcfg = pixart_alpha_512()
            sigma = False
        # PixArt-alpha ships the SD 1.x VAE (scaling 0.18215); Sigma ships
        # the SDXL VAE (0.13025) — decoding with the wrong factor silently
        # mis-scales every image (same override _build_hunyuan applies)
        vcfg = (
            dataclasses.replace(sd_vae(), scaling_factor=0.13025)
            if sigma
            else sd_vae()
        )
    # snap to the model's native-area aspect bin (PixArt is the family the
    # reference bins; the output is resized back in xDiTParallel.__call__)
    inp = _bin_input(inp, mcfg.sample_size * 8)
    if checkpoint:
        tdir = os.path.join(checkpoint, "transformer")
        params = hf.convert_pixart(
            hf.load_safetensors(tdir if os.path.isdir(tdir) else checkpoint),
            mcfg,
        )
        vae_params = _load_vae2d(checkpoint, vcfg)
    else:
        params = cm.jit_init(init_pixart, jax.random.PRNGKey(0), mcfg)
        vae_params = cm.jit_init(init_vae_decoder, jax.random.PRNGKey(1), vcfg)
    pcfg = PixArtPipelineConfig(
        model=mcfg,
        vae=_vae_opts(vcfg, engine),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        cache=_cache_cfg(engine),
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_pipeline_patch=(
            engine.parallel_config.num_pipeline_patch
            or engine.parallel_config.pp_degree
        ),
        runtime_warmup_steps=engine.runtime_config.warmup_steps,
    )
    mesh = make_mesh(engine.parallel_config)
    return PixArtPipeline(params, vae_params, pcfg, mesh), pcfg


@register_family("flux", r"flux")
def _build_flux(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.flux import flux_dev, flux_schnell, init_flux
    from compactfusion_tpu.models.vae import flux_vae
    from compactfusion_tpu.pipelines.flux import FluxPipeline, FluxPipelineConfig

    name = engine.model_config.model.lower()
    if "tiny" in name:
        from compactfusion_tpu.models.flux import flux_tiny

        mcfg = flux_tiny()
    else:
        mcfg = flux_schnell() if "schnell" in name else flux_dev()
    if "tiny" in name:
        from compactfusion_tpu.models.vae import tiny_vae

        # flux packs 2x2 latent patches: vae latents = in_channels // 4
        vcfg = dataclasses.replace(
            tiny_vae(), latent_channels=mcfg.in_channels // 4
        )
    else:
        vcfg = flux_vae()
    if checkpoint:
        tdir = os.path.join(checkpoint, "transformer")
        params = hf.convert_flux(
            hf.load_safetensors(tdir if os.path.isdir(tdir) else checkpoint),
            mcfg,
        )
    else:
        params = cm.jit_init(init_flux, jax.random.PRNGKey(0), mcfg)
    pcfg = FluxPipelineConfig(
        model=mcfg,
        vae=_vae_opts(vcfg, engine),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        cache=_cache_cfg(engine, family="flux"),
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return FluxPipeline(params, _load_vae2d(checkpoint, vcfg), pcfg, mesh), pcfg


@register_family("sd3", r"stable-diffusion-3|sd3")
def _build_sd3(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.sd3 import init_sd3, sd3_medium
    from compactfusion_tpu.models.vae import sd3_vae
    from compactfusion_tpu.pipelines.sd3 import SD3Pipeline, SD3PipelineConfig

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.sd3 import sd3_tiny
        from compactfusion_tpu.models.vae import tiny_vae

        mcfg = sd3_tiny()
        vcfg = dataclasses.replace(
            tiny_vae(), latent_channels=mcfg.in_channels
        )
    else:
        mcfg = sd3_medium()
        vcfg = sd3_vae()
    if checkpoint:
        tdir = os.path.join(checkpoint, "transformer")
        params = hf.convert_sd3(
            hf.load_safetensors(tdir if os.path.isdir(tdir) else checkpoint),
            mcfg,
        )
    else:
        params = cm.jit_init(init_sd3, jax.random.PRNGKey(0), mcfg)
    pcfg = SD3PipelineConfig(
        model=mcfg,
        vae=_vae_opts(vcfg, engine),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return SD3Pipeline(params, _load_vae2d(checkpoint, vcfg), pcfg, mesh), pcfg


def _load_vae2d(checkpoint: Optional[str], vcfg, seed: int = 11):
    """2D image-VAE decoder params: HF ``vae/`` subdir or random init.

    FLUX/SD3-era AutoencoderKL checkpoints drop ``post_quant_conv``
    (``use_post_quant_conv=False``); synthesize an identity 1x1 conv so the
    shared decoder math applies unchanged."""
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.vae import init_vae_decoder

    if checkpoint:
        vae_dir = os.path.join(checkpoint, "vae")
        if os.path.isdir(vae_dir):
            state = hf.load_safetensors(vae_dir)
            if "post_quant_conv.weight" not in state:
                c = vcfg.latent_channels
                eye = np.eye(c, dtype=np.float32).reshape(c, c, 1, 1)
                state["post_quant_conv.weight"] = eye
                state["post_quant_conv.bias"] = np.zeros(c, np.float32)
            return hf.convert_vae_decoder(state, vcfg)
    return cm.jit_init(init_vae_decoder, jax.random.PRNGKey(seed), vcfg)


def _load_vae3d(checkpoint: Optional[str], vcfg):
    """CogVideoX-family 3D VAE params: HF ``vae/`` subdir or random init."""
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.vae3d import init_vae3d_decoder

    if checkpoint:
        vae_dir = os.path.join(checkpoint, "vae")
        if os.path.isdir(vae_dir):
            return hf.convert_vae3d_decoder(hf.load_safetensors(vae_dir), vcfg)
    return init_vae3d_decoder(jax.random.PRNGKey(11), vcfg)


@register_family("cogvideox", r"cogvideo")
def _build_cogvideox(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.cogvideox import (
        cogvideox_1_5_5b,
        cogvideox_2b,
        cogvideox_5b,
        init_cogvideox,
    )
    from compactfusion_tpu.models.vae3d import cogvideox_vae
    from compactfusion_tpu.pipelines.cogvideox import (
        CogVideoXPipeline,
        CogVideoXPipelineConfig,
    )

    name = engine.model_config.model.lower()
    is_15 = "1.5" in name or "1-5" in name  # THUDM/CogVideoX1.5-5B
    if "tiny" in name:
        from compactfusion_tpu.models.cogvideox import cogvideox_tiny

        mcfg = cogvideox_tiny(patch_t=2 if is_15 else 1)
    elif is_15:
        mcfg = cogvideox_1_5_5b()
    else:
        mcfg = cogvideox_5b() if "5b" in name else cogvideox_2b()
    if checkpoint and os.path.isdir(os.path.join(checkpoint, "transformer")):
        from compactfusion_tpu.io import hf

        params = hf.convert_cogvideox(
            hf.load_safetensors(os.path.join(checkpoint, "transformer")), mcfg
        )
    else:
        params = cm.jit_init(init_cogvideox, jax.random.PRNGKey(0), mcfg)
    if "tiny" in name:
        from compactfusion_tpu.models.vae3d import tiny_vae3d

        vcfg = dataclasses.replace(
            tiny_vae3d(), latent_channels=mcfg.in_channels
        )
    else:
        vcfg = cogvideox_vae()
        if engine.runtime_config.enable_tiling:
            vcfg = dataclasses.replace(vcfg, use_tiling=True)
    pcfg = CogVideoXPipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_frames=inp.num_frames,
    )
    mesh = make_mesh(engine.parallel_config)
    pipe = CogVideoXPipeline(
        params, pcfg, mesh,
        vae_params=_load_vae3d(checkpoint, vcfg), vae_cfg=vcfg,
    )
    return pipe, pcfg


@register_family("latte", r"latte")
def _build_latte(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.latte import init_latte, latte_1
    from compactfusion_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.latte import latte_tiny
        from compactfusion_tpu.models.vae import tiny_vae

        mcfg = latte_tiny()
        vcfg = tiny_vae()
    else:
        from compactfusion_tpu.models.vae import sd_vae

        mcfg = latte_1()
        vcfg = sd_vae()
    if checkpoint and os.path.isdir(os.path.join(checkpoint, "transformer")):
        from compactfusion_tpu.io import hf

        params = hf.convert_latte(
            hf.load_safetensors(os.path.join(checkpoint, "transformer")), mcfg
        )
    else:
        params = cm.jit_init(init_latte, jax.random.PRNGKey(0), mcfg)
    pcfg = LattePipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_frames=inp.num_frames,
    )
    mesh = make_mesh(engine.parallel_config)
    vcfg = _vae_opts(vcfg, engine)
    return LattePipeline(
        params, pcfg, mesh,
        vae_params=_load_vae2d(checkpoint, vcfg),
        vae_cfg=vcfg,
    ), pcfg


@register_family("hunyuanvideo", r"hunyuanvideo")
def _build_hunyuanvideo(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.hunyuanvideo import (
        hunyuanvideo_config,
        init_hunyuanvideo,
    )
    from compactfusion_tpu.pipelines.hunyuanvideo import (
        HunyuanVideoPipeline,
        HunyuanVideoPipelineConfig,
    )

    from compactfusion_tpu.models.vae3d import hunyuanvideo_vae, init_hv_vae3d_decoder

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.hunyuanvideo import hunyuanvideo_tiny

        mcfg = hunyuanvideo_tiny()
    else:
        mcfg = hunyuanvideo_config()
    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.vae3d import tiny_hv_vae3d

        # HV tokens are 2x2-packed: VAE latent channels = in_channels//4
        vcfg = dataclasses.replace(
            tiny_hv_vae3d(), latent_channels=mcfg.in_channels // 4
        )
    else:
        vcfg = hunyuanvideo_vae()
        if engine.runtime_config.enable_tiling:
            vcfg = dataclasses.replace(vcfg, use_tiling=True)
    vae_params = None
    if checkpoint:
        from compactfusion_tpu.io import hf

        tdir = os.path.join(checkpoint, "transformer")
        if os.path.isdir(tdir):
            params = hf.convert_hunyuanvideo(hf.load_safetensors(tdir), mcfg)
        else:
            params = cm.jit_init(init_hunyuanvideo, jax.random.PRNGKey(0), mcfg)
        vdir = os.path.join(checkpoint, "vae")
        if os.path.isdir(vdir):
            vae_params = hf.convert_hv_vae3d_decoder(
                hf.load_safetensors(vdir), vcfg
            )
    else:
        params = cm.jit_init(init_hunyuanvideo, jax.random.PRNGKey(0), mcfg)
    if vae_params is None:
        vae_params = init_hv_vae3d_decoder(jax.random.PRNGKey(12), vcfg)
    pcfg = HunyuanVideoPipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_frames=inp.num_frames,
    )
    mesh = make_mesh(engine.parallel_config)
    pipe = HunyuanVideoPipeline(
        params, pcfg, mesh, vae_params=vae_params, vae_cfg=vcfg
    )
    return pipe, pcfg


@register_family("consisid", r"consisid")
def _build_consisid(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.consisid import consisid_preview, init_consisid
    from compactfusion_tpu.models.vae3d import cogvideox_vae
    from compactfusion_tpu.pipelines.consisid import (
        ConsisIDPipeline,
        ConsisIDPipelineConfig,
    )

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.consisid import consisid_tiny

        mcfg = consisid_tiny()
    else:
        mcfg = consisid_preview()
    lfe_params = None
    if checkpoint and os.path.isdir(os.path.join(checkpoint, "transformer")):
        from compactfusion_tpu.io import hf
        from compactfusion_tpu.models.face import lfe_consisid

        state = hf.load_safetensors(os.path.join(checkpoint, "transformer"))
        params = hf.convert_consisid(state, mcfg)
        if "local_facial_extractor.latents" in state:
            lfe_params = hf.convert_local_facial_extractor(state, lfe_consisid())
    else:
        params = cm.jit_init(init_consisid, jax.random.PRNGKey(0), mcfg)
    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.vae3d import tiny_vae3d

        vcfg = dataclasses.replace(
            tiny_vae3d(), latent_channels=mcfg.in_channels
        )
    else:
        vcfg = cogvideox_vae()
        if engine.runtime_config.enable_tiling:
            vcfg = dataclasses.replace(vcfg, use_tiling=True)
    pcfg = ConsisIDPipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_frames=inp.num_frames,
    )
    mesh = make_mesh(engine.parallel_config)
    pipe = ConsisIDPipeline(
        params, pcfg, mesh,
        vae_params=_load_vae3d(checkpoint, vcfg), vae_cfg=vcfg,
    )
    pipe.lfe_params = lfe_params  # face encoder for pipe.encode_face
    return pipe, pcfg


@register_family("stepvideo", r"step[-_]?video")
def _build_stepvideo(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.stepvideo import (
        init_stepvideo,
        stepvideo_t2v,
    )
    from compactfusion_tpu.pipelines.stepvideo import (
        StepVideoPipeline,
        StepVideoPipelineConfig,
    )

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.stepvideo import stepvideo_tiny

        mcfg = stepvideo_tiny()
    else:
        mcfg = stepvideo_t2v()
    if checkpoint and os.path.isdir(os.path.join(checkpoint, "transformer")):
        from compactfusion_tpu.io import hf

        params = hf.convert_stepvideo(
            hf.load_safetensors(os.path.join(checkpoint, "transformer")), mcfg
        )
    else:
        params = cm.jit_init(init_stepvideo, jax.random.PRNGKey(0), mcfg)
    pcfg = StepVideoPipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
        num_frames=inp.num_frames,
    )
    mesh = make_mesh(engine.parallel_config)
    return StepVideoPipeline(params, pcfg, mesh), pcfg


@register_family("hunyuandit", r"hunyuan(?!.?video)")
def _build_hunyuan(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.hunyuandit import (
        hunyuandit_v12,
        init_hunyuandit,
    )
    from compactfusion_tpu.pipelines.hunyuandit import (
        HunyuanDiTPipeline,
        HunyuanDiTPipelineConfig,
    )

    if "tiny" in engine.model_config.model.lower():
        from compactfusion_tpu.models.hunyuandit import hunyuandit_tiny
        from compactfusion_tpu.models.vae import tiny_vae

        mcfg = hunyuandit_tiny()
        vcfg = tiny_vae()
    else:
        from compactfusion_tpu.models.vae import sd_vae

        mcfg = hunyuandit_v12()
        # HunyuanDiT ships the SDXL 4-channel VAE (scaling 0.13025)
        vcfg = dataclasses.replace(sd_vae(), scaling_factor=0.13025)
    if checkpoint and os.path.isdir(os.path.join(checkpoint, "transformer")):
        from compactfusion_tpu.io import hf

        params = hf.convert_hunyuandit(
            hf.load_safetensors(os.path.join(checkpoint, "transformer")), mcfg
        )
    else:
        params = init_hunyuandit(jax.random.PRNGKey(0), mcfg)
    pcfg = HunyuanDiTPipelineConfig(
        model=mcfg,
        vae=_vae_opts(vcfg, engine),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return HunyuanDiTPipeline(
        params, _load_vae2d(checkpoint, vcfg), pcfg, mesh
    ), pcfg


class xDiTParallel:
    """One-call parallel runner (reference ``xfuser/parallel.py:23-54``).

    Prompts go through the REAL text path — tokenizer -> T5/CLIP encoder ->
    embeddings (``models/prompt.py``).  With a checkpoint directory the
    encoders load pretrained weights from the diffusers layout; without one
    they run byte-level tokenizers over seeded random weights, so the full
    string -> image machinery stays exercisable offline.
    """

    def __init__(
        self,
        engine_config: EngineConfig,
        input_config: InputConfig,
        checkpoint: Optional[str] = None,
    ):
        self.engine_config = engine_config
        self.input_config = input_config
        # multi-host bootstrap (no-op unless COORDINATOR_ADDRESS et al. are
        # set — envs.py registry; reference init_distributed_environment)
        from compactfusion_tpu.parallel.mesh import init_distributed_environment

        init_distributed_environment()
        fam = resolve_family(engine_config.model_config.model)
        logger.info("building %s pipeline on %d devices",
                    fam.name, engine_config.parallel_config.world_size)
        self.family = fam.name
        self.pipeline, self.pipeline_config = fam.build(
            engine_config, input_config, checkpoint
        )
        if engine_config.runtime_config.quantize_backbone:
            self._quantize_backbone_int8()
        self.prompt_encoder = self._build_prompt_encoder(checkpoint)
        if engine_config.fast_attn_config.use_fast_attn:
            self._apply_fast_attn(engine_config.fast_attn_config)

    def _apply_fast_attn(self, fa):
        """DiTFastAttn calibration workflow (reference
        ``fast_attention_compression``: calibrate on captions -> per-(step,
        layer) method plan -> JSON cache -> run compressed).  PixArt family;
        requires sp_degree == 1 and compression off (window bands don't
        shard)."""
        import dataclasses

        from compactfusion_tpu.cache.fast_attn import (
            calibrate_pixart,
            load_plan,
            save_plan,
        )
        from compactfusion_tpu.pipelines.pixart import PixArtPipeline

        if self.family != "pixart":
            logger.warning("use_fast_attn: only the PixArt family is wired; ignoring")
            return
        pcfg = self.pipeline_config
        if (
            pcfg.parallel.sp_degree > 1
            or pcfg.parallel.pp_degree > 1
            or pcfg.compact.enabled
        ):
            logger.warning(
                "use_fast_attn needs sp/pp degree 1 and compression off; ignoring"
            )
            return

        mcfg = pcfg.model
        # HF model ids contain '/' — sanitize or save_plan dies on a missing
        # directory after the whole calibration ran; the threshold is part
        # of the key or a plan calibrated at another --threshold is silently
        # reused (reference keys its JSON cache per config the same way,
        # fast_attn_state.py:38-40)
        model_tag = re.sub(
            r"[^A-Za-z0-9._-]", "_", self.engine_config.model_config.model
        )
        cache_path = (
            f".cftpu_fastattn_{model_tag}"
            f"_{pcfg.num_steps}s_{mcfg.depth}l_w{fa.window_size}"
            f"_t{fa.threshold:g}.json"
        )
        plan = None
        if fa.use_cache and os.path.exists(cache_path):
            plan = load_plan(cache_path)
            if plan.shape != (pcfg.num_steps, mcfg.depth):
                plan = None  # stale cache for another config
        if plan is None:
            # calibration captions: COCO file when provided (reference
            # get_fast_attn_coco_path), else the request's own prompts
            prompts = list(self.input_config.prompt)
            if fa.coco_path and os.path.exists(fa.coco_path):
                import json as _json

                with open(fa.coco_path) as f:
                    anno = _json.load(f)
                n = max(fa.n_calib, 1)
                if isinstance(anno, list):  # plain caption list
                    prompts = [str(c) for c in anno[:n]]
                else:  # MS-COCO annotation format (reference select_methods)
                    prompts = [d["caption"] for d in anno["annotations"][:n]]
            negative = [""] * len(prompts)
            txt, mask = self.prompt_encoder.encode_for_pixart(
                prompts, negative,
                max_length=self.input_config.max_sequence_length,
            )
            cal_cfg = dataclasses.replace(pcfg, fast_attn_window=fa.window_size)
            logger.info("DiTFastAttn: calibrating %d steps x %d layers",
                        pcfg.num_steps, mcfg.depth)
            plan = calibrate_pixart(
                self.pipeline.params, cal_cfg, txt, mask,
                jax.random.PRNGKey(self.input_config.seed),
                threshold=fa.threshold,
            )
            if fa.use_cache:
                save_plan(plan, cache_path)
        self.pipeline_config = dataclasses.replace(
            pcfg,
            fast_attn_plan=tuple(tuple(int(m) for m in row) for row in plan),
            fast_attn_window=fa.window_size,
        )
        self.pipeline = PixArtPipeline(
            self.pipeline.params,
            self.pipeline.vae_params,
            self.pipeline_config,
            self.pipeline.mesh,
        )

    # per-layer block stacks eligible for int8 weight quantization (the
    # embedders/heads stay bf16 — tiny, and some have direct "w" accesses);
    # stepvideo is excluded: its TP einsum layers index p["w"] with custom
    # shapes, and full-TP8 is that model's memory answer anyway
    _INT8_BLOCK_KEYS = {
        "pixart": ("blocks",),
        "flux": ("double_blocks", "single_blocks"),
        "sd3": ("blocks",),
        "hunyuandit": ("down_blocks", "up_blocks"),
        "latte": ("spatial_blocks", "temporal_blocks"),
        "cogvideox": ("blocks",),
        "consisid": ("blocks",),
        "hunyuanvideo": ("double_blocks", "single_blocks"),
    }

    def _quantize_backbone_int8(self):
        """--quantize_backbone_int8: int8 weight-quantize the DiT block
        stacks (cm.quantize_params_int8; per-layer bf16 dequant inside the
        block scan).  The lever that fits full-depth FLUX (24 GB bf16 ->
        12 GB int8) on one 16 GB v5e — measured 561.5 ms/fwd at 1024px,
        85.2% MFU (BENCH_FLUX_FULL.json)."""
        par = self.engine_config.parallel_config
        assert par.tp_degree == 1 and par.pp_degree == 1, (
            "--quantize_backbone_int8 composes with dp/cfg/SP (weights "
            "replicated) but not with tp/pp param sharding specs yet"
        )
        keys = self._INT8_BLOCK_KEYS.get(self.family)
        if keys is None:
            logger.warning(
                "quantize_backbone_int8: no int8 key map for family %s; "
                "weights stay bf16", self.family,
            )
            return
        self.pipeline.params = cm.quantize_params_int8(
            self.pipeline.params, keys=keys
        )
        logger.info(
            "backbone block stacks %s quantized to int8", ", ".join(keys)
        )

    def _build_prompt_encoder(self, checkpoint: Optional[str]):
        from compactfusion_tpu.models.prompt import PromptEncoder

        enc = self._make_prompt_encoder(checkpoint)
        if self.engine_config.runtime_config.quantize_t5 and enc.t5 is not None:
            # --use_fp8_t5_encoder / --use_int8_t5_encoder: int8 weight
            # quantization (v5e has no fp8) — T5-XXL ~9.1 -> ~4.6 GB HBM
            from compactfusion_tpu.models.text_encoders import quantize_t5_int8

            enc.t5.params = quantize_t5_int8(enc.t5.params)
            logger.info("T5 encoder weights quantized to int8")
        return enc

    def _make_prompt_encoder(self, checkpoint: Optional[str]):
        from compactfusion_tpu.models.prompt import PromptEncoder

        mcfg = self.pipeline_config.model
        if checkpoint and any(
            os.path.isdir(os.path.join(checkpoint, d))
            for d in ("tokenizer", "tokenizer_2")
        ):
            from compactfusion_tpu.models.text_encoders import (
                clip_g,
                clip_l,
                clip_l_proj,
                t5_xxl,
            )

            if self.family == "sd3":
                return PromptEncoder.from_pretrained(
                    checkpoint,
                    t5_cfg=t5_xxl(),
                    clip_l_cfg=clip_l_proj(),
                    clip_g_cfg=clip_g(),
                )
            if self.family == "flux":
                return PromptEncoder.from_pretrained(
                    checkpoint, t5_cfg=t5_xxl(), clip_l_cfg=clip_l()
                )
            return PromptEncoder.from_pretrained(checkpoint, t5_cfg=t5_xxl())
        key = jax.random.PRNGKey(7)
        if self.family == "flux":
            return PromptEncoder.random(
                key, text_dim=mcfg.text_dim, pooled_dim=mcfg.pooled_dim
            )
        if self.family == "sd3":
            lo = min(768, mcfg.pooled_dim // 2)
            return PromptEncoder.random(
                key,
                text_dim=mcfg.text_dim,
                pooled_dim=lo,
                clip_g_dim=mcfg.pooled_dim - lo,
            )
        return PromptEncoder.random(key, text_dim=mcfg.text_dim)

    def _encode_identity(self, img_path: str):
        """--img_file_path -> ConsisID identity tokens (reference
        consisid examples' ``process_face_embeddings_infer``).  With a
        checkpointed face encoder the image features run through the real
        ``local_facial_extractor``; without one (random-init builds) the
        tokens come from the documented offline stand-in projection
        (``models/face.py`` module note)."""
        from compactfusion_tpu.models.face import (
            image_face_features,
            image_to_id_states,
            lfe_consisid,
        )

        pcfg = self.pipeline_config
        lfe_params = getattr(self.pipeline, "lfe_params", None)
        if lfe_params is not None:
            lcfg = lfe_consisid()
            id_cond, id_vit = image_face_features(img_path, lcfg)
            states = self.pipeline.encode_face(lfe_params, id_cond, id_vit, lcfg)
            states = states[:, : pcfg.id_tokens]
        else:
            states = image_to_id_states(
                img_path, pcfg.id_tokens, pcfg.model.id_dim
            )
        b = len(self.input_config.prompt)  # same identity for every prompt
        return jnp.broadcast_to(states, (b,) + states.shape[1:])

    def prepare_run(self, key: Optional[jax.Array] = None):
        """Warmup call (reference ``xDiTParallel`` -> ``pipe.prepare_run``,
        ``xfuser/parallel.py:38-44``): run one generation so every program in
        the real request path is compiled (and lands in the persistent XLA
        compile cache) before serving traffic."""
        import time

        t0 = time.perf_counter()
        out = self(key=key)
        np.asarray(out)  # force completion through the tunnel
        logger.info("prepare_run: warmed up in %.1f s", time.perf_counter() - t0)
        return self

    def __call__(self, key: Optional[jax.Array] = None, decode: Optional[bool] = None):
        if self.engine_config.runtime_config.use_profiler:
            # reference --use_profiler wraps generation in profiler traces;
            # here: wall-clock scopes + per-scope summary (utils/prof.py)
            from compactfusion_tpu.utils.prof import Profiler

            with Profiler.scope("total"):
                out = self._generate(key, decode)
            logger.info("profiler summary:\n%s", Profiler.summary())
            return out
        return self._generate(key, decode)

    def _generate(self, key: Optional[jax.Array] = None, decode: Optional[bool] = None):
        inp = self.input_config
        if decode is None:
            # reference --output_type: "latent" skips the VAE
            decode = inp.output_type != "latent"
        if key is None:
            key = jax.random.PRNGKey(inp.seed)
        prompts = list(inp.prompt)
        negative = list(inp.negative_prompt) * (
            len(prompts) if len(inp.negative_prompt) == 1 else 1
        )
        seq = inp.max_sequence_length
        enc = self.prompt_encoder
        if self.family == "flux":
            txt, pooled = enc.encode_for_flux(prompts, max_length=seq)
            return self.pipeline(txt, pooled, key, decode=decode)
        if self.family == "sd3":
            txt, pooled = enc.encode_for_sd3(prompts, negative, max_length=seq)
            return self.pipeline(txt, pooled, key, decode=decode)
        if self.family == "latte":
            txt, mask = enc.encode_for_pixart(prompts, negative, max_length=seq)
            return self.pipeline(txt, mask, key, decode=decode)
        if self.family in ("cogvideox", "hunyuanvideo", "consisid",
                           "stepvideo"):
            txt = enc.encode_for_video(prompts, negative, max_length=seq)
            if self.family == "consisid" and inp.img_file_path:
                return self.pipeline(
                    txt, key,
                    id_states=self._encode_identity(inp.img_file_path),
                    decode=decode,
                )
            return self.pipeline(txt, key, decode=decode)
        # pixart / hunyuandit: (2, B, S, D) + mask
        txt, mask = enc.encode_for_pixart(prompts, negative, max_length=seq)
        out = self.pipeline(txt, mask, key, decode=decode)
        pcfg = self.pipeline_config
        if (
            decode
            and self.family == "pixart"
            and getattr(out, "ndim", 0) == 4
            and out.shape[-1] == 3
            and (pcfg.height, pcfg.width) != (inp.height, inp.width)
        ):
            # binning changed the generation size: resize back to the request
            out = resize_and_crop(out, inp.height, inp.width)
        return out

    def save(self, directory: str, prefix: str = "cftpu", out=None):
        """Persist outputs per DP rank (reference xDiTParallel.save).

        Image pipelines write PNG (one per batch element); video/latent
        outputs fall back to .npy.  Pass ``out`` to persist an
        already-generated result instead of running again.
        """
        os.makedirs(directory, exist_ok=True)
        out = np.asarray(self() if out is None else out, np.float32)
        rank = jax.process_index()
        if out.ndim == 4 and out.shape[-1] == 3:  # (B, H, W, 3) in [0, 1]
            from PIL import Image

            paths = []
            # image pipelines return clip(img*0.5+0.5) in [0, 1]
            from compactfusion_tpu.utils.image import to_uint8

            img8 = to_uint8(out)
            for i in range(img8.shape[0]):
                path = os.path.join(
                    directory, f"{prefix}_rank{rank}_{i}.png"
                )
                Image.fromarray(img8[i]).save(path)
                paths.append(path)
            return paths[0] if len(paths) == 1 else paths
        path = os.path.join(directory, f"{prefix}_rank{rank}.npy")
        np.save(path, out)
        return path
