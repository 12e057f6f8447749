"""Functional building blocks shared by every DiT backbone.

The reference wraps diffusers ``nn.Module`` graphs
(``xfuser/model_executor/models/transformers/*``); here each layer is a pure
function over an explicit parameter pytree (nested dicts of arrays) so the
whole denoise step jits into one XLA program and parameters can be sharded
with ``PartitionSpec`` trees.  bfloat16 params / fp32 norm+softmax accumulation
— the TPU-native precision recipe.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.bfloat16):
    w = jax.random.truncated_normal(key, -2, 2, (d_in, d_out), jnp.float32)
    w = (w * 0.02).astype(dtype)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_layernorm(dim: int, affine: bool = True, dtype=jnp.bfloat16):
    if not affine:
        return {}
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def init_rmsnorm(dim: int, dtype=jnp.bfloat16):
    return {"g": jnp.ones((dim,), dtype)}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def dequant_weight(p, dtype):
    """Materialize a linear weight, transparently dequantizing the int8 form
    produced by :func:`quantize_params_int8` (int8 * f32 channel scale ->
    compute dtype; XLA fuses the convert into the matmul operand read, so a
    layer-stacked scan only ever holds ONE dequantized block in HBM)."""
    if "w_q" in p:
        return (p["w_q"].astype(jnp.float32) * p["scale"]).astype(dtype)
    return p["w"]


def linear(p, x):
    y = x @ dequant_weight(p, x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def layernorm(p, x, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    if "g" in p:
        y = y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rmsnorm(p, x, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    if p and "g" in p:
        y = y * p["g"].astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


# ---------------------------------------------------------------------------
# timestep / positional embeddings
# ---------------------------------------------------------------------------


def sinusoidal_embedding(
    t: jax.Array, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True
) -> jax.Array:
    """Standard DDPM sinusoidal timestep embedding -> (B, dim) fp32."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def init_timestep_embedder(key, dim: int, hidden: int, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, dim, hidden, dtype=dtype),
        "fc2": init_linear(k2, hidden, hidden, dtype=dtype),
    }


def timestep_embedder(p, t, dim: int):
    """sinusoidal -> MLP (the diffusers ``TimestepEmbedding`` shape)."""
    w1 = p["fc1"].get("w", p["fc1"].get("w_q"))
    emb = sinusoidal_embedding(t, dim).astype(
        jnp.bfloat16 if w1.dtype == jnp.int8 else w1.dtype
    )
    return linear(p["fc2"], silu(linear(p["fc1"], emb)))


def mlp_embedder(p, x):
    """MLP on a raw conditioning vector (FLUX pooled-CLIP / SD3 text embed)."""
    return linear(p["fc2"], silu(linear(p["fc1"], x)))


def patch_positions_2d(h_patches: int, w_patches: int) -> jax.Array:
    """(H*W, 2) row/col indices in raster order."""
    rows = jnp.repeat(jnp.arange(h_patches), w_patches)
    cols = jnp.tile(jnp.arange(w_patches), h_patches)
    return jnp.stack([rows, cols], axis=-1)


def _sincos_embed_1d(x: jax.Array, d: int) -> jax.Array:
    omega = jnp.arange(d // 2, dtype=jnp.float32) / (d / 2.0)
    omega = 1.0 / (10000.0**omega)
    out = x[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def sincos_pos_embed_2d(
    dim: int,
    h_patches: int,
    w_patches: int,
    base_size: Optional[int] = None,
    interpolation_scale: float = 1.0,
) -> jax.Array:
    """2D sin-cos positional embedding (H*W, dim) in raster order, fp32.

    Matches diffusers ``get_2d_sincos_pos_embed`` exactly (checkpoint
    compatibility, verified by ``tests/io/test_backbone_parity.py``): the
    FIRST half of the channels embeds the COLUMN (w) coordinate.  PixArt
    resolution interpolation: positions are rescaled to the training base
    grid (``base_size``) then by ``interpolation_scale``.
    """
    pos = patch_positions_2d(h_patches, w_patches).astype(jnp.float32)
    rows, cols = pos[:, 0], pos[:, 1]
    if base_size is not None:
        rows = rows / (h_patches / base_size) / interpolation_scale
        cols = cols / (w_patches / base_size) / interpolation_scale
    half = dim // 2
    return jnp.concatenate(
        [_sincos_embed_1d(cols, half), _sincos_embed_1d(rows, half)], axis=-1
    )


def cropped_pos_embed_2d(
    dim: int,
    h_patches: int,
    w_patches: int,
    max_size: int,
    base_size: int,
    interpolation_scale: float = 1.0,
) -> jax.Array:
    """SD3-style positional embedding: a (max_size, max_size) table built at
    ``base_size`` scaling, center-cropped to the actual grid (diffusers
    ``PatchEmbed.cropped_pos_embed``)."""
    coords = (
        jnp.arange(max_size, dtype=jnp.float32)
        / (max_size / base_size)
        / interpolation_scale
    )
    half = dim // 2
    top = (max_size - h_patches) // 2
    left = (max_size - w_patches) // 2
    rows = jnp.repeat(coords[top : top + h_patches], w_patches)
    cols = jnp.tile(coords[left : left + w_patches], h_patches)
    return jnp.concatenate(
        [_sincos_embed_1d(cols, half), _sincos_embed_1d(rows, half)], axis=-1
    )


# ---------------------------------------------------------------------------
# RoPE (FLUX / HunyuanVideo style, axis-split rotary)
# ---------------------------------------------------------------------------


def rope_frequencies(
    positions: jax.Array, axes_dim: Tuple[int, ...], theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array]:
    """Multi-axis RoPE tables.

    Args:
      positions: (S, n_axes) integer coordinates per token (FLUX: [t, h, w]).
      axes_dim: head-dim split per axis, sums to head_dim (FLUX: (16, 56, 56)).

    Returns:
      (cos, sin): (S, head_dim/2) fp32 tables.
    """
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        pos = positions[:, i].astype(jnp.float32)
        freqs = 1.0 / (
            theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        )  # (d/2,)
        angles = pos[:, None] * freqs[None, :]
        cos_parts.append(jnp.cos(angles))
        sin_parts.append(jnp.sin(angles))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate (B, S, H, D) by per-token tables (S, D/2), interleaved pairs."""
    x32 = x.astype(jnp.float32)
    xr = x32.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def rope_half_tables(
    cos: jax.Array, sin: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Duplicate (S, D/2) tables to the (S, D) form ``apply_rope_half`` eats.

    Build these OUTSIDE the block scan so the concat is done once, not per
    layer.
    """
    return (
        jnp.concatenate([cos, cos], axis=-1),
        jnp.concatenate([sin, sin], axis=-1),
    )


def apply_rope_half(x: jax.Array, cos_f: jax.Array, sin_f: jax.Array) -> jax.Array:
    """Rotate-half (NeoX-layout) rope on (B, S, H, D): dim pairs (i, i+D/2).

    Score-equivalent to :func:`apply_rope` once the producing Wq/Wk columns
    (and qk-norm gains) are permuted per head by :func:`rope_half_perm` —
    attention is invariant to a head-dim permutation applied to BOTH q and
    k, and rmsnorm's mean-square is permutation-invariant.  The payoff is
    layout: the half-swap is one D/2-lane rotation, where the interleaved
    form needs a stride-2 lane shuffle that Mosaic/XLA lowers expensively —
    measured 10.887 -> 10.362 ms per FLUX-1024 double block on v5e
    (_prof_flux.py rope_half; docs/PERF.md).
    """
    x32 = x.astype(jnp.float32)
    d2 = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., d2:], x32[..., :d2]], axis=-1)
    c = cos_f[None, :, None, :]
    s = sin_f[None, :, None, :]
    return (x32 * c + rot * s).astype(x.dtype)


def rope_half_perm(dh: int):
    """Head-dim permutation taking interleaved-pair rope channels to the
    rotate-half layout: new[j] = old[2j], new[D/2 + j] = old[2j + 1]."""
    import numpy as np

    return np.concatenate([np.arange(0, dh, 2), np.arange(1, dh, 2)])


# ---------------------------------------------------------------------------
# patchify / unpatchify
# ---------------------------------------------------------------------------


def patchify(x: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C) raster order."""
    b, h, w, c = x.shape
    hp, wp = h // patch, w // patch
    x = x.reshape(b, hp, patch, wp, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp * wp, patch * patch * c)


def unpatchify(x: jax.Array, patch: int, hp: int, wp: int, channels: int) -> jax.Array:
    """(B, hp*wp, p*p*C) -> (B, hp*p, wp*p, C)."""
    b = x.shape[0]
    x = x.reshape(b, hp, wp, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp * patch, wp * patch, channels)


# ---------------------------------------------------------------------------
# feed-forward (optionally tensor-parallel)
# ---------------------------------------------------------------------------


def init_ffn(key, dim: int, hidden: int, bias: bool = True, dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, dim, hidden, bias=bias, dtype=dtype),
        "fc2": init_linear(k2, hidden, dim, bias=bias, dtype=dtype),
    }


def ffn(p, x, act=gelu, tp_axis: Optional[str] = None):
    """GELU MLP.  With ``tp_axis``: fc1 column-parallel, fc2 row-parallel,
    psum over tp (Megatron split, reference ``layers/feedforward.py:15-69``);
    params must then be pre-sharded on the hidden axis."""
    h = act(linear(p["fc1"], x))
    if tp_axis is None:
        return linear(p["fc2"], h)
    y = h @ dequant_weight(p["fc2"], h.dtype)
    y = jax.lax.psum(y, tp_axis)
    if "b" in p["fc2"]:
        y = y + p["fc2"]["b"]
    return y


def quantize_params_int8(params, keys=None):
    """Per-output-channel symmetric int8 weight quantization of every linear
    in the tree (``{"w", "b"?}`` -> ``{"w_q", "scale", "b"?}``).

    Weights-only quantization: :func:`linear`/:func:`ffn` dequantize to the
    activation dtype at the matmul operand read, so MXU compute stays bf16
    and a layer-stacked scan holds one bf16 block at a time.  This is what
    lets full-depth FLUX (12B params, 24 GB bf16) fit a single 16 GB v5e —
    the reference instead needs torch fp8 / optimum-quanto on the T5 only
    (``xfuser/envs.py:52-120``); here it generalizes to any backbone.

    Args:
      params: model param tree.
      keys: optional iterable of top-level keys to quantize (e.g. the big
        block stacks); other subtrees pass through in full precision.
    """

    def quant(w):
        w32 = jnp.asarray(w, jnp.float32)
        # reduce over the INPUT axis (second-to-last) so the scale is
        # per-output-channel for both unstacked (in, out) and layer-stacked
        # (L, in, out) matrices
        scale = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0
        scale = jnp.where(scale == 0.0, 1.0, scale)
        q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
        return {"w_q": q, "scale": scale}

    def walk(p):
        if isinstance(p, dict):
            if "w" in p and getattr(p["w"], "ndim", 0) >= 2:
                out = quant(p["w"])
                if "b" in p:
                    out["b"] = p["b"]
                return out
            return {k: walk(v) for k, v in p.items()}
        return p

    if keys is None:
        return walk(params)
    return {k: (walk(v) if k in set(keys) else v) for k, v in params.items()}


def scan_segments(make_block, carry, blocks, attn, attn_state):
    """``lax.scan`` over stacked blocks, segmented by attention strategy.

    ``attn`` is either a single strategy (one scan over the full stack) or a
    tuple of ``(strategy, n_layers)`` segments (per-layer compression plans,
    reference ``compact/utils.py:51``); in the latter case ``attn_state`` is
    the matching tuple of per-segment state pytrees and one scan is compiled
    per contiguous layer segment.  ``make_block(strategy)`` returns the scan
    body ``(carry, (params, state)) -> (carry, state)``.

    Returns ``(carry, new_state)`` with ``new_state`` mirroring the
    segmentation of ``attn_state``.
    """
    if not isinstance(attn, (tuple, list)):
        return jax.lax.scan(make_block(attn), carry, (blocks, attn_state))
    new_state = []
    l0 = 0
    for (seg_attn, n_l), seg_state in zip(attn, attn_state):
        seg_blocks = jax.tree_util.tree_map(
            lambda x, _l0=l0, _n=n_l: x[_l0 : _l0 + _n], blocks
        )
        carry, st = jax.lax.scan(
            make_block(seg_attn), carry, (seg_blocks, seg_state)
        )
        new_state.append(st)
        l0 += n_l
    return carry, tuple(new_state)


def jit_init(init_fn, key, *args, **kwargs):
    """Run a parameter initializer as ONE compiled program.

    Eager initializers dispatch hundreds of small RNG ops; through the
    axon-tunneled TPU that costs minutes of round trips.  A single jitted
    call is one dispatch, and the compile is served by the persistent
    compilation cache (utils/jax_cache.py) after the first run.
    """
    return jax.jit(lambda k: init_fn(k, *args, **kwargs))(key)
