"""PixArt-α/Σ DiT backbone (cross-attention DiT with AdaLN-single).

TPU-native re-implementation of the model behind the reference's
``xfuser/model_executor/models/transformers/pixart_transformer_2d.py``
(a diffusers ``PixArtTransformer2DModel`` wrapper): patch embed + T5 caption
projection, N identical blocks of [AdaLN-single self-attention, cross-
attention to text, AdaLN-single GELU MLP], AdaLN final norm, linear head
predicting (noise, variance) per patch.

Layout: parameters for the N blocks are *stacked* (leading layer axis) and the
forward is a single ``lax.scan`` — one compiled block body regardless of
depth, with per-layer compression state threaded as scan xs/ys.  The sequence
axis may be sharded over (ring, ulysses) outside this function; everything
here is token-parallel except the self-attention, which goes through the
pluggable ``attn`` strategy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.attn_impl import SingleDeviceAttn
from compactfusion_tpu.ops.attention import sdpa


@dataclasses.dataclass(frozen=True)
class PixArtConfig:
    dim: int = 1152
    depth: int = 28
    heads: int = 16
    patch: int = 2
    in_channels: int = 4
    out_channels: int = 8  # 4 noise + 4 learned-variance
    text_dim: int = 4096  # T5-XXL
    ffn_mult: int = 4
    sample_size: int = 64  # latent H=W for 512px
    #: diffusers PixArt interpolation_scale (= sample_size // 64 for the
    #: published checkpoints); scales sincos positions with base_size
    interpolation_scale: float = 1.0
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.heads

    @property
    def base_size(self):
        return self.sample_size // self.patch


def pixart_alpha_512() -> PixArtConfig:
    return PixArtConfig()


def pixart_sigma_1024() -> PixArtConfig:
    return PixArtConfig(sample_size=128, interpolation_scale=2.0)


def pixart_sigma_2k() -> PixArtConfig:
    """PixArt-Sigma-XL-2-2K-MS (the reference's DiTFastAttn target,
    examples/run_fastditattn.sh)."""
    return PixArtConfig(sample_size=256, interpolation_scale=4.0)


def pixart_tiny() -> PixArtConfig:
    """Scaled-down config for tests."""
    return PixArtConfig(dim=64, depth=2, heads=4, text_dim=32, sample_size=8)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_block(key, cfg: PixArtConfig):
    ks = jax.random.split(key, 12)
    d, dt = cfg.dim, cfg.dtype
    return {
        "scale_shift_table": jnp.zeros((6, d), dt),
        "attn_qkv": cm.init_linear(ks[0], d, 3 * d, dtype=dt),
        "attn_out": cm.init_linear(ks[1], d, d, dtype=dt),
        "cross_q": cm.init_linear(ks[2], d, d, dtype=dt),
        "cross_kv": cm.init_linear(ks[3], d, 2 * d, dtype=dt),
        "cross_out": cm.init_linear(ks[4], d, d, dtype=dt),
        "ffn": cm.init_ffn(ks[5], d, cfg.ffn_mult * d, dtype=dt),
    }


def init_pixart(key, cfg: PixArtConfig):
    ks = jax.random.split(key, 8)
    d, dt = cfg.dim, cfg.dtype
    blocks = [init_block(k, cfg) for k in jax.random.split(ks[0], cfg.depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embed": cm.init_linear(
            ks[1], cfg.patch * cfg.patch * cfg.in_channels, d, dtype=dt
        ),
        "t_embed": cm.init_timestep_embedder(ks[2], 256, d, dtype=dt),
        "adaln_single": cm.init_linear(ks[3], d, 6 * d, dtype=dt),
        "caption_fc1": cm.init_linear(ks[4], cfg.text_dim, d, dtype=dt),
        "caption_fc2": cm.init_linear(ks[5], d, d, dtype=dt),
        "blocks": stacked,
        "final_scale_shift": jnp.zeros((2, d), dt),
        "proj_out": cm.init_linear(
            ks[6], d, cfg.patch * cfg.patch * cfg.out_channels, dtype=dt
        ),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _heads(x, h):
    b, s, d = x.shape
    return x.reshape(b, s, h, d // h)


def _unheads(x):
    b, s, h, dh = x.shape
    return x.reshape(b, s, h * dh)


def pixart_embed(params, x: jax.Array, pos_embed: jax.Array, cfg: PixArtConfig):
    """Patch-embed + positional table -> hidden tokens (B, S, dim)."""
    return cm.linear(params["patch_embed"], x) + pos_embed.astype(cfg.dtype)[None]


def pixart_head(params, x: jax.Array, temb: jax.Array, cfg: PixArtConfig):
    """Final AdaLN + projection (diffusers PixArt norm_out semantics)."""
    fin = params["final_scale_shift"][None] + temb[:, None, :].repeat(2, axis=1)
    shift, scale = fin[:, 0][:, None], fin[:, 1][:, None]
    x = cm.layernorm({}, x) * (1 + scale) + shift
    return cm.linear(params["proj_out"], x)


def precompute_text_kv(params, text: jax.Array) -> jax.Array:
    """Hoist the step-invariant text path out of the denoise loop.

    The caption MLP and every block's ``cross_kv`` projection depend only on
    the (constant-across-steps) text states, yet the reference recomputes
    them inside each denoise step (``pipeline_pixart_alpha.py`` calls the
    full transformer per step).  Computing them once per image removes
    ~36 GFLOP of fp32-promoted matmuls AND the per-step ``cross_kv`` weight
    reads (~149 MB/forward at 0.61B scale) from the compiled step scan.

    Returns (L, B, S_text, 2*dim) for :func:`pixart_forward`'s ``text_kv``;
    math is op-identical to the in-block path (a vmapped ``cm.linear``).
    """
    text = cm.linear(
        params["caption_fc2"], cm.gelu(cm.linear(params["caption_fc1"], text))
    )
    return jax.vmap(lambda p: cm.linear(p, text))(params["blocks"]["cross_kv"])


def pixart_forward(
    params,
    x: jax.Array,
    t: jax.Array,
    text: jax.Array,
    cfg: PixArtConfig,
    *,
    pos_embed: jax.Array,
    attn=SingleDeviceAttn(),
    attn_state=(),
    text_mask: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
    pp_stages: int = 1,
    cache_cfg=None,
    cache_state=None,
    cache_force=None,
    x_is_hidden: bool = False,
    return_hidden: bool = False,
    text_kv: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Any]:
    """Denoiser forward on (already patchified-shard) latent tokens.

    Args:
      x: (B, S_local, p*p*C) patchified latent tokens (local shard).
      t: (B,) timesteps in [0, 1000).
      text: (B, S_text, text_dim) T5 states, replicated across SP ranks.
      pos_embed: (S_local, dim) positional table for the local tokens.
      attn: self-attention strategy (see ``models/attn_impl.py``).
      attn_state: per-layer stacked compression state (leaves (L, ...)).
      text_mask: optional (B, S_text) bool; True = valid token.
      text_kv: optional (L, B, S_text, 2*dim) precomputed per-block cross
        K/V (:func:`precompute_text_kv`) — the text path is step-invariant,
        so pipelines hoist the caption MLP + per-block ``cross_kv``
        projections out of the denoise loop; ``text`` is ignored when given.

    Returns:
      (out, new_attn_state): out (B, S_local, p*p*out_channels).
    """
    d, h = cfg.dim, cfg.heads

    if not x_is_hidden:
        x = pixart_embed(params, x, pos_embed, cfg)

    temb = cm.timestep_embedder(params["t_embed"], t, 256)  # (B, d)
    mod6 = cm.linear(params["adaln_single"], cm.silu(temb))  # (B, 6d)
    mod6 = mod6.reshape(-1, 6, d)

    if text_kv is None:
        text = cm.linear(
            params["caption_fc2"], cm.gelu(cm.linear(params["caption_fc1"], text))
        )
    # text masks are contiguous padding prefixes (T5 tokenizer): reduce to a
    # per-batch length so cross-attention stays on the flash path (the bool
    # mask forced materialised fp32 scores)
    kv_lens = None
    if text_mask is not None:
        kv_lens = jnp.sum(text_mask, axis=-1).astype(jnp.int32)

    has_kv = text_kv is not None

    def make_block(attn_impl):
        def block(carry, xs):
            x = carry
            if has_kv:
                p, state, kv_pre = xs
            else:
                (p, state), kv_pre = xs, None
            table = p["scale_shift_table"][None] + mod6  # (B, 6, d)
            sh_a, sc_a, g_a, sh_m, sc_m, g_m = [
                table[:, i][:, None] for i in range(6)
            ]

            # self attention (AdaLN-single, diffusers BasicTransformerBlock)
            xn = cm.layernorm({}, x) * (1 + sc_a) + sh_a
            qkv = cm.linear(p["attn_qkv"], xn)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o, state = attn_impl(_heads(q, h), _heads(k, h), _heads(v, h), state)
            x = x + g_a * cm.linear(p["attn_out"], _unheads(o))

            # cross attention to text (queries local, text replicated)
            q = cm.linear(p["cross_q"], x)
            kv = cm.linear(p["cross_kv"], text) if kv_pre is None else kv_pre
            k, v = jnp.split(kv, 2, axis=-1)
            o = _cross_attn(
                _heads(q, h), _heads(k, h), _heads(v, h), None, kv_lens=kv_lens
            )
            x = x + cm.linear(p["cross_out"], _unheads(o))

            # mlp
            xn = cm.layernorm({}, x) * (1 + sc_m) + sh_m
            x = x + g_m * cm.ffn(p["ffn"], xn, tp_axis=tp_axis)
            return x, state

        return block

    block = make_block(attn if not isinstance(attn, (tuple, list)) else None)

    if cache_cfg is not None and cache_cfg.mode != "none":
        # TeaCache / FBCache: run block 0, decide, conditionally skip the rest
        # (reference cache/utils.py:76-249).  Requires a stateless attention
        # strategy — skipped blocks would desync compression EF caches.
        assert not jax.tree_util.tree_leaves(attn_state), (
            "cache acceleration is incompatible with compact EF state"
        )
        from compactfusion_tpu.cache.accel import (
            CacheAccelState,
            next_probe,
            should_skip,
        )

        p0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
        table0 = p0["scale_shift_table"][None] + mod6
        probe_in = (
            cm.layernorm({}, x) * (1 + table0[:, 1][:, None]) + table0[:, 0][:, None]
        )
        x1, _ = block(x, (p0, (), text_kv[0]) if has_kv else (p0, ()))
        # fbcache probes the first-block RESIDUAL (reference
        # get_modulated_inputs: block0(x) - x), not the raw block output
        probe = (x1 - x) if cache_cfg.mode == "fbcache" else probe_in
        skip, accum = should_skip(
            cache_cfg, cache_state, probe, force_compute=cache_force
        )

        p_rest = jax.tree_util.tree_map(lambda a: a[1:], params["blocks"])

        def run_rest(x1):
            xs = (p_rest, (), text_kv[1:]) if has_kv else (p_rest, ())
            xf, _ = jax.lax.scan(block, x1, xs)
            return xf, (xf - x1).astype(cache_state.residual.dtype)

        def replay(x1):
            return x1 + cache_state.residual.astype(x1.dtype), cache_state.residual

        x, residual = jax.lax.cond(skip, replay, run_rest, x1)
        new_cache = CacheAccelState(
            prev_probe=next_probe(cache_cfg, cache_state, probe, skip),
            residual=residual.astype(cache_state.residual.dtype),
            accum=accum,
            has_prev=jnp.ones((), jnp.int32),
            skips=cache_state.skips + skip.astype(jnp.int32),
        )
        new_state = attn_state
    elif pp_stages > 1:
        from compactfusion_tpu.parallel.pipefusion import pipefusion_blocks

        x, new_state = pipefusion_blocks(
            lambda h, st: jax.lax.scan(
                block,
                h,
                (params["blocks"], st, text_kv)
                if has_kv
                else (params["blocks"], st),
            ),
            x,
            attn_state,
            pp_stages,
        )
        new_cache = cache_state
    elif isinstance(attn, (tuple, list)):
        # per-layer compression plan: consecutive scans over contiguous
        # layer segments, one attention strategy (and EF state pytree) each
        # (reference compress_func(layer, step), compact/utils.py:51)
        new_state = []
        l0 = 0
        for (seg_attn, n_l), seg_state in zip(attn, attn_state):
            seg_params = jax.tree_util.tree_map(
                lambda a, _l0=l0, _n=n_l: a[_l0 : _l0 + _n], params["blocks"]
            )
            seg_xs = (
                (seg_params, seg_state, text_kv[l0 : l0 + n_l])
                if has_kv
                else (seg_params, seg_state)
            )
            x, st = jax.lax.scan(make_block(seg_attn), x, seg_xs)
            new_state.append(st)
            l0 += n_l
        assert l0 == cfg.depth, "layer segments must cover all blocks"
        new_state = tuple(new_state)
        new_cache = cache_state
    else:
        xs = (
            (params["blocks"], attn_state, text_kv)
            if has_kv
            else (params["blocks"], attn_state)
        )
        x, new_state = jax.lax.scan(block, x, xs)
        new_cache = cache_state

    out = x if return_hidden else pixart_head(params, x, temb, cfg)
    if cache_cfg is not None and cache_cfg.mode != "none":
        return out, new_state, new_cache
    return out, new_state


def _cross_attn(q, k, v, mask, kv_lens=None):
    """Cross-attention with optional key masking.

    ``kv_lens`` (B,) int32 covers the production case — T5/CLIP padding masks
    are contiguous prefixes — and routes through the flash kernel on TPU
    (scalar-prefetched length test in-kernel).  An arbitrary (B,1,1,Sk) bool
    ``mask`` falls back to materialised scores; matmuls stay in the input
    dtype (fp32 accumulate) so the MXU runs at full bf16 rate.
    """
    if kv_lens is not None:
        return sdpa(q, k, v, kv_lens=kv_lens)
    if mask is None:
        return sdpa(q, k, v)
    b, sq, h, dh = q.shape
    scale = dh**-0.5
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd",
        p.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
