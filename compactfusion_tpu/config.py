"""Frozen configuration tree.

TPU-native analog of the reference's config layer
(``xfuser/config/config.py:187-234`` — ``EngineConfig``,
``{Model,Runtime,Parallel,FastAttn}Config``, ``InputConfig``) and of the
compression policy object (``xfuser/compact/utils.py:31-117`` —
``CompactConfig``).  Unlike the reference (mutable objects consulted through
module globals), everything here is a frozen, hashable dataclass so that it
can be closed over by ``jax.jit`` as a static argument.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Optional, Tuple


class CompressType(enum.Enum):
    """Compression codec selector.

    Mirrors the reference enum ``COMPACT_COMPRESS_TYPE``
    (``xfuser/compact/utils.py:10-29``).
    """

    WARMUP = "warmup"
    SPARSE = "sparse"
    BINARY = "binary"
    INT2 = "int2"
    INT2_MINMAX = "int2-minmax"
    INT4 = "int4"
    INT8 = "int8"
    IDENTITY = "identity"
    LOW_RANK = "low-rank"
    LOW_RANK_Q = "low-rank-int4"
    #: attention-aware low-rank: rows weighted by V-norm key importance
    #: before the subspace fit (reference ``LOW_RANK_AWL``,
    #: ``xfuser/compact/ring.py:74-117`` + ``slowpath.py:218-237``)
    LOW_RANK_AWL = "low-rank-awl"


@dataclasses.dataclass(frozen=True)
class CompactConfig:
    """Residual-compression policy.

    Reference: ``CompactConfig`` (``xfuser/compact/utils.py:31-117``).  The
    reference takes an arbitrary Python callable ``compress_func(layer, step)``;
    for a compiled TPU program the schedule must be static, so we expose
    ``warmup_steps`` + a single steady-state ``compress_type`` (the policy used
    by every published config: warmup steps send raw, later steps compressed —
    reference ``examples/configs.py:39-49``).  A custom callable can still be
    supplied for host-side planning; it is resolved to a static per-step
    schedule at trace time.
    """

    enabled: bool = False
    compress_type: CompressType = CompressType.BINARY
    warmup_steps: int = 4
    #: rank of the low-rank scale model (-1 = mean scale) — `comp_rank`.
    comp_rank: int = -1
    #: residual order: 0 = raw, 1 = delta, 2 = delta-of-delta.
    residual: int = 1
    #: error feedback: base <- base + dequant(quant(delta)) on both ends.
    error_feedback: bool = True
    #: simulate: compress->decompress locally, exchange uncompressed tensors.
    simulate: bool = False
    #: single-device ring-topology emulation for quality studies: run the
    #: pipeline on ONE device while each attention reproduces the exact K/V
    #: mix a ``ring_degree=simulate_ring`` compressed run would see (own
    #: chunk exact + R-1 EF-reconstructed chunks).  0 = off.  Requires
    #: sp_degree == 1.  See ``models/attn_impl.SimRingAttn``.
    simulate_ring: int = 0
    #: 1:M structured sparsity ratio for SPARSE.
    sparse_ratio: int = 8
    #: decay on the second-order delta base.
    delta_decay_factor: float = 0.9
    #: run the all-reduce cache-consistency oracle every forward (debug).
    check_consistency: bool = False
    #: use fused Pallas quant/dequant kernels where available.
    fastpath: bool = True
    #: store EF base caches int8-quantized (reference quantized_cache).
    quantized_cache: bool = False
    #: log per-(layer, step) compression stats (host callback; debug only).
    log_stats: bool = False
    #: override ring attention with patch-parallel gather forward.
    patch_gather: bool = False
    #: DistriFusion-style one-step-stale async gather (patch_gather mode).
    patch_async: bool = False
    #: optional per-(layer, step) policy, the reference's ``compress_func``
    #: (``compact/utils.py:51``, consulted per-forward at
    #: ``compact/ring.py:180-181``).  Resolved at TRACE time to a static
    #: (steps x layers) method table; pipelines compile one scan segment per
    #: contiguous (step-range, layer-range) method block.  When None, the
    #: layer-uniform warmup/steady schedule below applies.
    #: compared BY IDENTITY (functions hash/compare by id), so configs
    #: with different policies are != and never collide in jit/lru caches
    compress_func: Optional[Callable[[int, int], "CompressType"]] = None

    def __post_init__(self):
        if self.residual not in (0, 1, 2):
            raise ValueError(f"residual must be 0/1/2, got {self.residual}")
        if self.residual == 0 and self.error_feedback:
            raise ValueError("residual=0 does not support error feedback")
        if self.residual == 2 and not self.error_feedback:
            raise ValueError("residual=2 requires error feedback")
        if self.comp_rank == 0 or self.comp_rank < -1:
            raise ValueError("comp_rank must be >= 1 or -1 (mean scale)")

    def type_at(self, layer: int, step: int) -> CompressType:
        """Static compression schedule (per layer when compress_func set)."""
        if not self.enabled:
            return CompressType.IDENTITY
        if self.compress_func is not None:
            return self.compress_func(layer, step)
        if step < self.warmup_steps:
            return CompressType.WARMUP
        return self.compress_type

    def layer_plan(self, step: int, depth: int) -> Tuple["CompressType", ...]:
        """The static per-layer method tuple for one denoise step."""
        return tuple(self.type_at(l, step) for l in range(depth))


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """Degrees of each mesh axis.

    Reference: ``ParallelConfig`` (``xfuser/config/config.py``) +
    ``initialize_model_parallel`` (``parallel_state.py:310``).  The rank
    factorization order "tp-sp-pp-cfg-dp" becomes mesh-axis order
    ``(dp, cfg, pp, ring, ulysses, tp)`` — the last axes are fastest-varying,
    so ulysses/tp neighbours land on adjacent devices (ICI), matching the
    reference's intent of keeping high-traffic groups local.
    """

    dp_degree: int = 1
    cfg_degree: int = 1
    pp_degree: int = 1
    ulysses_degree: int = 1
    ring_degree: int = 1
    tp_degree: int = 1
    #: number of devices dedicated to parallel VAE decode (0 = decode in-mesh).
    vae_parallel_size: int = 0
    #: PipeFusion micro-patches per image (None -> pp_degree, reference
    #: --num_pipeline_patch default).
    num_pipeline_patch: Optional[int] = None
    #: route ring attention through the fused Pallas ring kernels
    #: (``ops/ring_flash_pallas``): RDMA+flash for the uncompressed ring,
    #: and packed-payload RDMA + in-kernel dequant/EF + flash for the
    #: compressed ring (1-bit + residual-1 + EF config; other codecs fall
    #: back to the ppermute path).  Opt-in: semantics are interpreter-
    #: verified, on-silicon multi-chip validation pending hardware.
    use_fused_ring: bool = False

    @property
    def sp_degree(self) -> int:
        return self.ulysses_degree * self.ring_degree

    @property
    def world_size(self) -> int:
        return (
            self.dp_degree
            * self.cfg_degree
            * self.pp_degree
            * self.sp_degree
            * self.tp_degree
        )

    def __post_init__(self):
        for name in (
            "dp_degree",
            "cfg_degree",
            "pp_degree",
            "ulysses_degree",
            "ring_degree",
            "tp_degree",
        ):
            v = getattr(self, name)
            if v < 1:
                raise ValueError(f"{name} must be >= 1, got {v}")
        if self.cfg_degree not in (1, 2):
            raise ValueError("cfg_degree (classifier-free guidance) must be 1 or 2")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Which model to run (reference: ``ModelConfig``, ``config/config.py``)."""

    model: str = "pixart-alpha"
    pretrained_model_name_or_path: Optional[str] = None
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Runtime toggles (reference: ``RuntimeConfig``, ``config/config.py``)."""

    warmup_steps: int = 1
    use_parallel_vae: bool = False
    #: wrap generation in utils.prof scopes and log the per-scope summary
    use_profiler: bool = False
    use_torch_compile: bool = False  # accepted for CLI parity; XLA always jits
    use_teacache: bool = False
    use_fbcache: bool = False
    use_fast_attn: bool = False
    #: VAE decode memory knobs (reference --enable_tiling/--enable_slicing)
    enable_tiling: bool = False
    enable_slicing: bool = False
    #: int8 weight-quantize the T5 text encoder (the reference's
    #: ``--use_fp8_t5_encoder`` via optimum-quanto, args.py + envs.py:52-120;
    #: v5e has no fp8, so the TPU-honest equivalent is int8 — T5-XXL drops
    #: ~9.1 -> ~4.6 GB of HBM; see models/text_encoders.quantize_t5_int8)
    quantize_t5: bool = False
    #: int8 weight-quantize the DiT backbone block stacks (TPU extension of
    #: the same idea: cm.quantize_params_int8 over the per-layer stacks,
    #: transparent bf16 dequant at the matmul operand read inside the block
    #: scan).  Full-depth FLUX fits one 16 GB v5e this way
    #: (BENCH_FLUX_FULL.json); parity-bounded by tests/models/test_flux.py
    quantize_backbone: bool = False


@dataclasses.dataclass(frozen=True)
class FastAttnConfig:
    """DiTFastAttn calibration settings (reference ``config/config.py``)."""

    use_fast_attn: bool = False
    n_step: int = 20
    n_calib: int = 8
    threshold: float = 0.5
    window_size: int = 64
    coco_path: Optional[str] = None
    use_cache: bool = False


@dataclasses.dataclass(frozen=True)
class InputConfig:
    """Generation request shape (reference: ``InputConfig``)."""

    height: int = 512
    width: int = 512
    num_frames: int = 1
    batch_size: int = 1
    num_inference_steps: int = 20
    guidance_scale: float = 4.5
    seed: int = 42
    max_sequence_length: int = 120
    prompt: Tuple[str, ...] = ("",)
    negative_prompt: Tuple[str, ...] = ("",)
    #: input image for identity-preserving families (reference
    #: --img_file_path, ConsisID; args.py:260)
    img_file_path: Optional[str] = None
    #: snap (height, width) to the nearest aspect-ratio bin at the model's
    #: native area and resize the output back (reference
    #: use_resolution_binning, config/args.py:453 -> diffusers
    #: classify_height_width_bin in pipeline_pixart_sigma.py:168-182)
    use_resolution_binning: bool = True
    #: "pil" decodes to pixels; "latent" returns raw latents (reference
    #: --output_type, config/args.py)
    output_type: str = "pil"


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Top-level config tree (reference: ``EngineConfig``)."""

    model_config: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    runtime_config: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    parallel_config: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    fast_attn_config: FastAttnConfig = dataclasses.field(default_factory=FastAttnConfig)
    compact_config: CompactConfig = dataclasses.field(default_factory=CompactConfig)


def resolve_compress_schedule(
    cfg: CompactConfig,
    num_steps: int,
    compress_func: Optional[Callable[[int, int], CompressType]] = None,
) -> Tuple[CompressType, ...]:
    """Resolve a (possibly callable) policy to a static per-step schedule.

    The reference calls ``compress_func(layer_idx, step)`` dynamically per
    forward (``compact/ring.py:180-181``); under XLA the schedule must be
    trace-static, so we evaluate it for every step up front (layer-uniform —
    all published reference configs are layer-uniform).
    """
    if compress_func is None:
        return tuple(cfg.type_at(0, s) for s in range(num_steps))
    return tuple(compress_func(0, s) for s in range(num_steps))


def validate_parallel_geometry(
    parallel: ParallelConfig,
    *,
    heads: int,
    tokens: int,
    depth: Optional[int] = None,
    num_pipeline_patch: int = 1,
    patch_pp_min_factor: int = 1,
    tp_shards_heads: bool = False,
    family: str = "model",
) -> None:
    """Reject degree/geometry factorizations up front with readable errors.

    The reference validates these at config time
    (``xfuser/config/config.py:187-234``); without this the first symptom is
    a raw XLA error deep inside jit (e.g. ``all_to_all split_axis ... not
    divisible``).  Called by every pipeline config's ``__post_init__``.

    heads: attention heads; the Ulysses all-to-all scatters this axis (and
    Step-Video TP additionally shards it column-wise: tp_shards_heads).
    tokens: image/video latent tokens; sharded over ring x ulysses, and over
    num_pipeline_patch first when patch-PP is on.
    depth: transformer blocks per PP-splittable stack (HunyuanDiT passes its
    depth/2 halves); must split evenly across pp stages.
    patch_pp_min_factor: families whose async patch-PP needs a deeper
    virtual pipeline pass 2 (FLUX/HunyuanDiT: M >= 2*pp).
    """
    u, r, pp = parallel.ulysses_degree, parallel.ring_degree, parallel.pp_degree
    head_shards = u * (parallel.tp_degree if tp_shards_heads else 1)
    if heads % head_shards != 0:
        detail = (
            f"ulysses_degree ({u}) * tp_degree ({parallel.tp_degree})"
            if tp_shards_heads
            else f"ulysses_degree ({u})"
        )
        raise ValueError(
            f"{family}: attention heads ({heads}) must be divisible by "
            f"{detail} — the Ulysses all-to-all scatters whole heads"
        )
    sp = u * r
    m = max(num_pipeline_patch, 1)
    if pp > 1 and m > 1:
        if tokens % m != 0:
            raise ValueError(
                f"{family}: latent tokens ({tokens}) must be divisible by "
                f"num_pipeline_patch ({m})"
            )
        if (tokens // m) % sp != 0:
            raise ValueError(
                f"{family}: tokens per pipeline patch ({tokens}//{m} = "
                f"{tokens // m}) must be divisible by sp_degree "
                f"(ring {r} x ulysses {u} = {sp})"
            )
        if m < patch_pp_min_factor * pp:
            raise ValueError(
                f"{family}: async patch-PP needs num_pipeline_patch >= "
                f"{patch_pp_min_factor}*pp_degree "
                f"({patch_pp_min_factor}*{pp} = {patch_pp_min_factor * pp}, "
                f"got {m}) to keep the virtual pipeline full"
            )
    elif tokens % sp != 0:
        raise ValueError(
            f"{family}: latent tokens ({tokens}) must be divisible by "
            f"sp_degree (ring {r} x ulysses {u} = {sp}) — pick an image/"
            f"video size whose token count splits evenly"
        )
    if depth is not None and depth % pp != 0:
        raise ValueError(
            f"{family}: transformer depth ({depth}) must split evenly over "
            f"pp_degree ({pp})"
        )


def validate_against_device_count(parallel: ParallelConfig, n_devices: int) -> None:
    total = parallel.world_size + parallel.vae_parallel_size
    if total > n_devices:
        raise ValueError(
            f"parallel config needs {total} devices "
            f"(dit {parallel.world_size} + vae {parallel.vae_parallel_size}) "
            f"but only {n_devices} are available"
        )
    if n_devices % parallel.world_size != 0 and parallel.vae_parallel_size == 0:
        raise ValueError(
            f"world size {parallel.world_size} does not divide device count {n_devices}"
        )


def round_up(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m)
