"""HuggingFace checkpoint loading: safetensors IO + name/layout converters.

The reference gets all weights through ``diffusers.from_pretrained``
(``pipeline_flux.py:55-67``); here each backbone has an explicit converter
from the HF/diffusers state-dict naming to our parameter pytrees:

  * torch ``nn.Linear`` stores (out, in) — transposed to (in, out);
  * conv kernels (out, in, kh, kw) — transposed to HWIO;
  * the patch-embed conv becomes a linear over raster-ordered (kh, kw, c)
    patch vectors, matching ``models.common.patchify``;
  * separate to_q/to_k/to_v projections are fused into our qkv matrices;
  * per-layer tensors are stacked along a leading layer axis for lax.scan.

Converters are validated mechanically by round-trip tests
(``tests/io/test_hf.py``): a synthetic HF-named checkpoint generated from a
random param tree must convert back to it exactly.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.models.common import rope_half_perm


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Load one file or every ``*.safetensors`` shard in a directory."""
    from safetensors.numpy import load_file

    if os.path.isdir(path):
        state: Dict[str, np.ndarray] = {}
        for name in sorted(os.listdir(path)):
            if name.endswith(".safetensors"):
                state.update(load_file(os.path.join(path, name)))
        return state
    return load_file(path)


def save_safetensors(state: Dict[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, path)


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------


def _lin(state, name, dtype):
    """torch Linear -> {w (in,out), b?}."""
    p = {"w": jnp.asarray(state[f"{name}.weight"].T, dtype)}
    if f"{name}.bias" in state:
        p["b"] = jnp.asarray(state[f"{name}.bias"], dtype)
    return p


def _lin_nobias(state, name, dtype):
    return {"w": jnp.asarray(state[f"{name}.weight"].T, dtype)}


def _fused_qkv(state, q, k, v, dtype):
    w = np.concatenate(
        [state[f"{q}.weight"].T, state[f"{k}.weight"].T, state[f"{v}.weight"].T],
        axis=1,
    )
    p = {"w": jnp.asarray(w, dtype)}
    if f"{q}.bias" in state:
        b = np.concatenate(
            [state[f"{q}.bias"], state[f"{k}.bias"], state[f"{v}.bias"]]
        )
        p["b"] = jnp.asarray(b, dtype)
    return p


def _half_rope_qkv(p, heads):
    """Permute the q and k output columns of a fused qkv linear, per head,
    from the checkpoint's interleaved-pair rope layout to the rotate-half
    layout the FLUX-family scans run (``models/common.apply_rope_half``;
    new[j] = old[2j], new[D/2+j] = old[2j+1]).  Attention scores are
    invariant to a head-dim permutation applied to both q and k, so model
    outputs are unchanged — only the lane layout of the rope pass is."""
    d3 = p["w"].shape[-1]
    dh = d3 // 3 // heads
    perm = rope_half_perm(dh)

    def pq(a):
        shp = a.shape
        ar = a.reshape(*shp[:-1], 3, heads, dh)
        qk = ar[..., :2, :, :][..., perm]
        return jnp.concatenate([qk, ar[..., 2:, :, :]], axis=-3).reshape(shp)

    out = {"w": pq(p["w"])}
    if "b" in p:
        out["b"] = pq(p["b"])
    return out


def _half_rope_rms(p):
    """Matching permutation for per-head-dim qk-norm gains (rmsnorm's
    mean-square is permutation-invariant, the gain vector just relabels)."""
    return {"g": p["g"][..., rope_half_perm(p["g"].shape[-1])]}


def _half_rope_norm(p):
    """Same for LayerNorm qk-norms (CogVideoX family): mean and variance
    over the head dim are permutation-invariant; gain AND bias relabel."""
    perm = rope_half_perm(p["g"].shape[-1])
    return {"g": p["g"][..., perm], "b": p["b"][..., perm]}


def _fused_kv(state, k, v, dtype):
    w = np.concatenate([state[f"{k}.weight"].T, state[f"{v}.weight"].T], axis=1)
    p = {"w": jnp.asarray(w, dtype)}
    if f"{k}.bias" in state:
        p["b"] = jnp.asarray(
            np.concatenate([state[f"{k}.bias"], state[f"{v}.bias"]]), dtype
        )
    return p


def _conv(state, name, dtype):
    """torch conv (O,I,kh,kw) -> {w (kh,kw,I,O), b}."""
    return {
        "w": jnp.asarray(state[f"{name}.weight"].transpose(2, 3, 1, 0), dtype),
        "b": jnp.asarray(state[f"{name}.bias"], dtype),
    }


def _patch_conv_as_linear(state, name, dtype):
    """Patch-embed conv (D,C,p,p) -> linear over (p,p,C) raster patches."""
    w = state[f"{name}.weight"]  # (D, C, p, p)
    d, c, p, _ = w.shape
    w = w.transpose(2, 3, 1, 0).reshape(p * p * c, d)
    return {
        "w": jnp.asarray(w, dtype),
        "b": jnp.asarray(state[f"{name}.bias"], dtype),
    }


def _norm(state, name, dtype):
    return {
        "g": jnp.asarray(state[f"{name}.weight"], dtype),
        "b": jnp.asarray(state[f"{name}.bias"], dtype),
    }


def _rms(state, name, dtype):
    return {"g": jnp.asarray(state[f"{name}.weight"], dtype)}


def _stack(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _embedder(state, prefix, dtype):
    return {
        "fc1": _lin(state, f"{prefix}.linear_1", dtype),
        "fc2": _lin(state, f"{prefix}.linear_2", dtype),
    }


class _OverlayState:
    """Read-through view of a state dict with a few overriding entries.

    Converters that re-drive another converter (HunyuanVideo -> FLUX) use
    this instead of copying the dict so key reads stay visible on the
    underlying mapping (and nothing is duplicated)."""

    def __init__(self, base, extra):
        self._base, self._extra = base, extra

    def __getitem__(self, k):
        if k in self._extra:
            return self._extra[k]
        return self._base[k]

    def __contains__(self, k):
        return k in self._extra or k in self._base

    def get(self, k, default=None):
        return self[k] if k in self else default


# ---------------------------------------------------------------------------
# T5 encoder (google/t5-v1_1-xxl naming)
# ---------------------------------------------------------------------------


def convert_t5(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}"
        blocks.append(
            {
                "ln1": _rms(state, f"{p}.layer.0.layer_norm", dt),
                "q": _lin_nobias(state, f"{p}.layer.0.SelfAttention.q", dt),
                "k": _lin_nobias(state, f"{p}.layer.0.SelfAttention.k", dt),
                "v": _lin_nobias(state, f"{p}.layer.0.SelfAttention.v", dt),
                "o": _lin_nobias(state, f"{p}.layer.0.SelfAttention.o", dt),
                "ln2": _rms(state, f"{p}.layer.1.layer_norm", dt),
                "wi_0": _lin_nobias(state, f"{p}.layer.1.DenseReluDense.wi_0", dt),
                "wi_1": _lin_nobias(state, f"{p}.layer.1.DenseReluDense.wi_1", dt),
                "wo": _lin_nobias(state, f"{p}.layer.1.DenseReluDense.wo", dt),
            }
        )
    return {
        "embed": jnp.asarray(state["shared.weight"], dt),
        "rel_bias": jnp.asarray(
            state["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"],
            dt,
        ),
        "blocks": _stack(blocks),
        "final_ln": _rms(state, "encoder.final_layer_norm", dt),
    }


# ---------------------------------------------------------------------------
# CLIP text model (openai/clip-vit-large-patch14 naming)
# ---------------------------------------------------------------------------


def convert_clip(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    tm = "text_model"
    blocks = []
    for i in range(cfg.num_layers):
        p = f"{tm}.encoder.layers.{i}"
        blocks.append(
            {
                "ln1": _norm(state, f"{p}.layer_norm1", dt),
                "q": _lin(state, f"{p}.self_attn.q_proj", dt),
                "k": _lin(state, f"{p}.self_attn.k_proj", dt),
                "v": _lin(state, f"{p}.self_attn.v_proj", dt),
                "o": _lin(state, f"{p}.self_attn.out_proj", dt),
                "ln2": _norm(state, f"{p}.layer_norm2", dt),
                "fc1": _lin(state, f"{p}.mlp.fc1", dt),
                "fc2": _lin(state, f"{p}.mlp.fc2", dt),
            }
        )
    p = {
        "token_embed": jnp.asarray(
            state[f"{tm}.embeddings.token_embedding.weight"], dt
        ),
        "pos_embed": jnp.asarray(
            state[f"{tm}.embeddings.position_embedding.weight"], dt
        ),
        "blocks": _stack(blocks),
        "final_ln": _norm(state, f"{tm}.final_layer_norm", dt),
    }
    # CLIPTextModelWithProjection (SD3's CLIP-L/G): bias-free pooled proj
    if "text_projection.weight" in state:
        p["text_proj"] = {
            "w": jnp.asarray(state["text_projection.weight"], dt).T
        }
    return p


# ---------------------------------------------------------------------------
# PixArt (diffusers PixArtTransformer2DModel naming)
# ---------------------------------------------------------------------------


def convert_pixart(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    blocks = []
    for i in range(cfg.depth):
        p = f"transformer_blocks.{i}"
        blocks.append(
            {
                "scale_shift_table": jnp.asarray(
                    state[f"{p}.scale_shift_table"], dt
                ),
                "attn_qkv": _fused_qkv(
                    state, f"{p}.attn1.to_q", f"{p}.attn1.to_k", f"{p}.attn1.to_v", dt
                ),
                "attn_out": _lin(state, f"{p}.attn1.to_out.0", dt),
                "cross_q": _lin(state, f"{p}.attn2.to_q", dt),
                "cross_kv": _fused_kv(
                    state, f"{p}.attn2.to_k", f"{p}.attn2.to_v", dt
                ),
                "cross_out": _lin(state, f"{p}.attn2.to_out.0", dt),
                "ffn": {
                    "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff.net.2", dt),
                },
            }
        )
    return {
        "patch_embed": _patch_conv_as_linear(state, "pos_embed.proj", dt),
        "t_embed": _embedder(state, "adaln_single.emb.timestep_embedder", dt),
        "adaln_single": _lin(state, "adaln_single.linear", dt),
        "caption_fc1": _lin(state, "caption_projection.linear_1", dt),
        "caption_fc2": _lin(state, "caption_projection.linear_2", dt),
        "blocks": _stack(blocks),
        "final_scale_shift": jnp.asarray(state["scale_shift_table"], dt),
        "proj_out": _lin(state, "proj_out", dt),
    }


# ---------------------------------------------------------------------------
# FLUX (diffusers FluxTransformer2DModel naming)
# ---------------------------------------------------------------------------


def convert_flux(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    doubles = []
    for i in range(cfg.double_layers):
        p = f"transformer_blocks.{i}"
        doubles.append(
            {
                "img_mod": _lin(state, f"{p}.norm1.linear", dt),
                "txt_mod": _lin(state, f"{p}.norm1_context.linear", dt),
                "img_qkv": _half_rope_qkv(_fused_qkv(
                    state, f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v", dt
                ), cfg.heads),
                "txt_qkv": _half_rope_qkv(_fused_qkv(
                    state,
                    f"{p}.attn.add_q_proj",
                    f"{p}.attn.add_k_proj",
                    f"{p}.attn.add_v_proj",
                    dt,
                ), cfg.heads),
                "img_q_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_q", dt)),
                "img_k_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_k", dt)),
                "txt_q_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_added_q", dt)),
                "txt_k_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_added_k", dt)),
                "img_out": _lin(state, f"{p}.attn.to_out.0", dt),
                "txt_out": _lin(state, f"{p}.attn.to_add_out", dt),
                "img_ffn": {
                    "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff.net.2", dt),
                },
                "txt_ffn": {
                    "fc1": _lin(state, f"{p}.ff_context.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff_context.net.2", dt),
                },
            }
        )
    singles = []
    for i in range(cfg.single_layers):
        p = f"single_transformer_blocks.{i}"
        singles.append(
            {
                "mod": _lin(state, f"{p}.norm.linear", dt),
                "qkv": _half_rope_qkv(_fused_qkv(
                    state, f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v", dt
                ), cfg.heads),
                "q_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_q", dt)),
                "k_norm": _half_rope_rms(_rms(state, f"{p}.attn.norm_k", dt)),
                "mlp": {
                    "fc1": _lin(state, f"{p}.proj_mlp", dt),
                    # proj_out rows [d:] act on the gelu(mlp) half
                    "fc2": {
                        "w": jnp.asarray(
                            state[f"{p}.proj_out.weight"].T[cfg.dim :], dt
                        )
                    },
                },
                # proj_out rows [:d] act on the attention half; it carries
                # the shared bias
                "out_attn": {
                    "w": jnp.asarray(
                        state[f"{p}.proj_out.weight"].T[: cfg.dim], dt
                    ),
                    "b": jnp.asarray(state[f"{p}.proj_out.bias"], dt),
                },
            }
        )
    params = {
        "x_embedder": _lin(state, "x_embedder", dt),
        "context_embedder": _lin(state, "context_embedder", dt),
        "t_embed": _embedder(state, "time_text_embed.timestep_embedder", dt),
        "pooled_embed": _embedder(state, "time_text_embed.text_embedder", dt),
        "double_blocks": _stack(doubles),
        "single_blocks": _stack(singles),
        "norm_out_mod": _lin(state, "norm_out.linear", dt),
        "proj_out": _lin(state, "proj_out", dt),
    }
    if cfg.guidance_embeds:
        params["guidance_embed"] = _embedder(
            state, "time_text_embed.guidance_embedder", dt
        )
    return params


# ---------------------------------------------------------------------------
# HunyuanVideo (diffusers HunyuanVideoTransformer3DModel naming)
# ---------------------------------------------------------------------------


def convert_hunyuanvideo(state: Dict[str, np.ndarray], cfg) -> Any:
    """FLUX-style dual/single blocks + the token refiner.

    The double/single block tensors share the FLUX naming, so the FLUX
    converter handles them; x_embedder is a (1, 2, 2) Conv3d flattened to a
    linear over the (t, h, w, c) patch vector, and ``context_embedder.*`` is
    the HunyuanVideoTokenRefiner."""
    dt = cfg.dtype
    # x_embedder: Conv3d (O, I, 1, p, p) -> (p*p*I, O) linear
    w = state["x_embedder.proj.weight"]
    o, i_, kt, kh, kw = w.shape
    # conv flatten order is (I, kt, kh, kw); our patch vector is
    # (kt, kh, kw, I) raster — reorder
    wr = np.transpose(w, (0, 2, 3, 4, 1)).reshape(o, kt * kh * kw * i_)
    # overlay (NOT a copy): convert_flux reads specific keys only, so a
    # delegating view keeps reads visible to the caller's state object
    # (tests/io/test_real_keymaps.py tracks key consumption through it) and
    # shadows x_embedder + a placeholder context_embedder it expects
    flux_state = _OverlayState(
        state,
        {
            "context_embedder.weight": np.zeros(
                (cfg.dim, cfg.text_dim), np.float32
            ),
            "context_embedder.bias": np.zeros((cfg.dim,), np.float32),
            "x_embedder.weight": wr,
            "x_embedder.bias": state["x_embedder.proj.bias"],
        },
    )
    params = convert_flux(flux_state, cfg)
    del params["context_embedder"]

    ref = "context_embedder"
    blocks = []
    for i in range(cfg.refiner_layers):
        p = f"{ref}.token_refiner.refiner_blocks.{i}"
        blocks.append(
            {
                "norm1": _norm(state, f"{p}.norm1", dt),
                "attn_qkv": _fused_qkv(
                    state, f"{p}.attn.to_q", f"{p}.attn.to_k",
                    f"{p}.attn.to_v", dt,
                ),
                "attn_out": _lin(state, f"{p}.attn.to_out.0", dt),
                "norm2": _norm(state, f"{p}.norm2", dt),
                "ffn": {
                    "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff.net.2", dt),
                },
                "ada": _lin(state, f"{p}.norm_out.linear", dt),
            }
        )
    params["refiner"] = {
        "t_embed": _embedder(state, f"{ref}.time_text_embed.timestep_embedder", dt),
        "c_embed": _embedder(state, f"{ref}.time_text_embed.text_embedder", dt),
        "proj_in": _lin(state, f"{ref}.proj_in", dt),
        "blocks": _stack(blocks),
    }
    return params


# ---------------------------------------------------------------------------
# SD3 (diffusers SD3Transformer2DModel naming)
# ---------------------------------------------------------------------------


def convert_sd3(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    d = cfg.dim
    blocks = []
    for i in range(cfg.depth):
        p = f"transformer_blocks.{i}"
        # final block is context_pre_only: norm1_context is AdaLN-Continuous
        # with a (d -> 2d) linear emitting [scale, shift]; expand it into the
        # AdaLN-Zero 6d layout [shift, scale, gate=0, shift_mlp=0, scale_mlp=0,
        # gate_mlp=0] so the symmetric block math reproduces the continuous
        # norm and the (dead) text-stream updates are gated off
        w_ctx = np.asarray(state[f"{p}.norm1_context.linear.weight"]).T
        b_ctx = np.asarray(state[f"{p}.norm1_context.linear.bias"])
        if w_ctx.shape[1] == 2 * d:
            w_scale, w_shift = w_ctx[:, :d], w_ctx[:, d:]
            b_scale, b_shift = b_ctx[:d], b_ctx[d:]
            txt_mod = {
                "w": jnp.asarray(
                    np.concatenate(
                        [w_shift, w_scale, np.zeros((d, 4 * d), w_ctx.dtype)],
                        axis=1,
                    ),
                    dt,
                ),
                "b": jnp.asarray(
                    np.concatenate([b_shift, b_scale, np.zeros(4 * d, b_ctx.dtype)]),
                    dt,
                ),
            }
        else:
            txt_mod = _lin(state, f"{p}.norm1_context.linear", dt)
        blk = {
            "img_mod": _lin(state, f"{p}.norm1.linear", dt),
            "txt_mod": txt_mod,
            "img_qkv": _fused_qkv(
                state, f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v", dt
            ),
            "txt_qkv": _fused_qkv(
                state,
                f"{p}.attn.add_q_proj",
                f"{p}.attn.add_k_proj",
                f"{p}.attn.add_v_proj",
                dt,
            ),
            "img_out": _lin(state, f"{p}.attn.to_out.0", dt),
            "img_ffn": {
                "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                "fc2": _lin(state, f"{p}.ff.net.2", dt),
            },
        }
        # the final block is context_pre_only: no text out-proj / text FFN in
        # the checkpoint — fill with zeros (outputs are unused dead code)
        if f"{p}.attn.to_add_out.weight" in state:
            blk["txt_out"] = _lin(state, f"{p}.attn.to_add_out", dt)
            blk["txt_ffn"] = {
                "fc1": _lin(state, f"{p}.ff_context.net.0.proj", dt),
                "fc2": _lin(state, f"{p}.ff_context.net.2", dt),
            }
        else:
            zeros_lin = lambda i_, o_: {
                "w": jnp.zeros((i_, o_), dt),
                "b": jnp.zeros((o_,), dt),
            }
            blk["txt_out"] = zeros_lin(d, d)
            blk["txt_ffn"] = {
                "fc1": zeros_lin(d, cfg.mlp_ratio * d),
                "fc2": zeros_lin(cfg.mlp_ratio * d, d),
            }
        if cfg.qk_norm:
            blk["img_q_norm"] = _rms(state, f"{p}.attn.norm_q", dt)
            blk["img_k_norm"] = _rms(state, f"{p}.attn.norm_k", dt)
            blk["txt_q_norm"] = _rms(state, f"{p}.attn.norm_added_q", dt)
            blk["txt_k_norm"] = _rms(state, f"{p}.attn.norm_added_k", dt)
        blocks.append(blk)
    return {
        "patch_embed": _patch_conv_as_linear(state, "pos_embed.proj", dt),
        "context_embedder": _lin(state, "context_embedder", dt),
        "t_embed": _embedder(state, "time_text_embed.timestep_embedder", dt),
        "pooled_embed": _embedder(state, "time_text_embed.text_embedder", dt),
        "blocks": _stack(blocks),
        "norm_out_mod": _lin(state, "norm_out.linear", dt),
        "proj_out": _lin(state, "proj_out", dt),
    }


# ---------------------------------------------------------------------------
# HunyuanDiT (diffusers HunyuanDiT2DModel naming, v1.2: no style/size cond)
# ---------------------------------------------------------------------------


def convert_hunyuandit(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype

    def block(i, with_skip):
        p = f"blocks.{i}"
        out = {
            "mod_shift": _lin(state, f"{p}.norm1.linear", dt),
            "norm1": _norm(state, f"{p}.norm1.norm", dt),
            "attn_qkv": _fused_qkv(
                state, f"{p}.attn1.to_q", f"{p}.attn1.to_k",
                f"{p}.attn1.to_v", dt,
            ),
            "q_norm": _norm(state, f"{p}.attn1.norm_q", dt),
            "k_norm": _norm(state, f"{p}.attn1.norm_k", dt),
            "attn_out": _lin(state, f"{p}.attn1.to_out.0", dt),
            "norm2": _norm(state, f"{p}.norm2", dt),
            "cross_q": _lin(state, f"{p}.attn2.to_q", dt),
            "cross_kv": _fused_kv(
                state, f"{p}.attn2.to_k", f"{p}.attn2.to_v", dt
            ),
            "cross_q_norm": _norm(state, f"{p}.attn2.norm_q", dt),
            "cross_k_norm": _norm(state, f"{p}.attn2.norm_k", dt),
            "cross_out": _lin(state, f"{p}.attn2.to_out.0", dt),
            "norm3": _norm(state, f"{p}.norm3", dt),
            "ffn": {
                "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                "fc2": _lin(state, f"{p}.ff.net.2", dt),
            },
        }
        if with_skip:
            if f"{p}.skip_linear.weight" in state:
                out["skip_norm"] = _norm(state, f"{p}.skip_norm", dt)
                out["skip_proj"] = _lin(state, f"{p}.skip_linear", dt)
            else:
                # global block depth//2 (up slot 0): the checkpoint has
                # skip params only for layer > depth//2 — 19 of 40 blocks
                # (hunyuan_transformer_2d.py:176-196); slot 0's are dead
                # zeros, masked off in the forward (models/hunyuandit.py
                # _up_body)
                d = state[f"{p}.attn1.to_q.weight"].shape[0]
                out["skip_norm"] = {
                    "g": jnp.zeros((2 * d,), dt), "b": jnp.zeros((2 * d,), dt)
                }
                out["skip_proj"] = {
                    "w": jnp.zeros((2 * d, d), dt), "b": jnp.zeros((d,), dt)
                }
        return out

    half = cfg.depth // 2
    te = "time_extra_emb"
    return {
        "patch_embed": _patch_conv_as_linear(state, "pos_embed.proj", dt),
        "t_embed": _embedder(state, f"{te}.timestep_embedder", dt),
        "text_embedder": {
            "fc1": _lin(state, "text_embedder.linear_1", dt),
            "fc2": _lin(state, "text_embedder.linear_2", dt),
        },
        "text_pad": jnp.asarray(state["text_embedding_padding"], dt),
        "pooler": {
            "pos": jnp.asarray(state[f"{te}.pooler.positional_embedding"], dt),
            "q": _lin(state, f"{te}.pooler.q_proj", dt),
            "k": _lin(state, f"{te}.pooler.k_proj", dt),
            "v": _lin(state, f"{te}.pooler.v_proj", dt),
            "out": _lin(state, f"{te}.pooler.c_proj", dt),
        },
        "extra_embedder": {
            "fc1": _lin(state, f"{te}.extra_embedder.linear_1", dt),
            "fc2": _lin(state, f"{te}.extra_embedder.linear_2", dt),
        },
        "down_blocks": _stack([block(i, False) for i in range(half)]),
        "up_blocks": _stack(
            [block(i, True) for i in range(half, cfg.depth)]
        ),
        "norm_out_mod": _lin(state, "norm_out.linear", dt),
        "proj_out": _lin(state, "proj_out", dt),
    }


# ---------------------------------------------------------------------------
# Latte (diffusers LatteTransformer3DModel naming)
# ---------------------------------------------------------------------------


def convert_latte(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype

    def spatial(i):
        p = f"transformer_blocks.{i}"
        return {
            "scale_shift_table": jnp.asarray(state[f"{p}.scale_shift_table"], dt),
            "attn_qkv": _fused_qkv(
                state, f"{p}.attn1.to_q", f"{p}.attn1.to_k", f"{p}.attn1.to_v", dt
            ),
            "attn_out": _lin(state, f"{p}.attn1.to_out.0", dt),
            "cross_q": _lin(state, f"{p}.attn2.to_q", dt),
            "cross_kv": _fused_kv(state, f"{p}.attn2.to_k", f"{p}.attn2.to_v", dt),
            "cross_out": _lin(state, f"{p}.attn2.to_out.0", dt),
            "ffn": {
                "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                "fc2": _lin(state, f"{p}.ff.net.2", dt),
            },
        }

    def temporal(i):
        p = f"temporal_transformer_blocks.{i}"
        return {
            "scale_shift_table": jnp.asarray(state[f"{p}.scale_shift_table"], dt),
            "attn_qkv": _fused_qkv(
                state, f"{p}.attn1.to_q", f"{p}.attn1.to_k", f"{p}.attn1.to_v", dt
            ),
            "attn_out": _lin(state, f"{p}.attn1.to_out.0", dt),
            "ffn": {
                "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                "fc2": _lin(state, f"{p}.ff.net.2", dt),
            },
        }

    return {
        "patch_embed": _patch_conv_as_linear(state, "pos_embed.proj", dt),
        "t_embed": _embedder(state, "adaln_single.emb.timestep_embedder", dt),
        "adaln_single": _lin(state, "adaln_single.linear", dt),
        "caption_fc1": _lin(state, "caption_projection.linear_1", dt),
        "caption_fc2": _lin(state, "caption_projection.linear_2", dt),
        "spatial_blocks": _stack([spatial(i) for i in range(cfg.num_pairs)]),
        "temporal_blocks": _stack([temporal(i) for i in range(cfg.num_pairs)]),
        "final_scale_shift": jnp.asarray(state["scale_shift_table"], dt),
        "proj_out": _lin(state, "proj_out", dt),
    }


# ---------------------------------------------------------------------------
# CogVideoX (diffusers CogVideoXTransformer3DModel naming)
# ---------------------------------------------------------------------------


def convert_cogvideox(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype
    blocks = []
    for i in range(cfg.depth):
        p = f"transformer_blocks.{i}"
        blocks.append(
            {
                "mod_attn": _lin(state, f"{p}.norm1.linear", dt),
                "norm1": _norm(state, f"{p}.norm1.norm", dt),
                "mod_ff": _lin(state, f"{p}.norm2.linear", dt),
                "norm2": _norm(state, f"{p}.norm2.norm", dt),
                "qkv": _half_rope_qkv(_fused_qkv(
                    state, f"{p}.attn1.to_q", f"{p}.attn1.to_k",
                    f"{p}.attn1.to_v", dt,
                ), cfg.heads),
                "q_norm": _half_rope_norm(_norm(state, f"{p}.attn1.norm_q", dt)),
                "k_norm": _half_rope_norm(_norm(state, f"{p}.attn1.norm_k", dt)),
                "attn_out": _lin(state, f"{p}.attn1.to_out.0", dt),
                "ffn": {
                    "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff.net.2", dt),
                },
            }
        )
    if getattr(cfg, "patch_t", 1) > 1:
        # CogVideoX 1.5: patch_embed.proj is a LINEAR over (p_t, p, p, C)-
        # packed tokens (diffusers CogVideoXPatchEmbed patch_size_t branch) —
        # the same packing this model uses, so the weight maps directly.
        patch_embed = _lin(state, "patch_embed.proj", dt)
        # proj_out's output features are (C, p_t, p, p)-ordered in the
        # checkpoint (diffusers unpatchify does reshape(..., -1, p_t, p, p));
        # ours are (p_t, p, p, C) — permute the rows once at load.
        c, p_t, p = cfg.out_channels, cfg.patch_t, cfg.patch
        w = np.asarray(state["proj_out.weight"])  # (C*pt*p*p, D)
        b = np.asarray(state["proj_out.bias"])
        w = w.reshape(c, p_t, p, p, -1).transpose(1, 2, 3, 0, 4)
        proj_out = {
            "w": jnp.asarray(w.reshape(-1, w.shape[-1]).T, dt),
            "b": jnp.asarray(
                b.reshape(c, p_t, p, p).transpose(1, 2, 3, 0).reshape(-1), dt
            ),
        }
    else:
        patch_embed = _patch_conv_as_linear(state, "patch_embed.proj", dt)
        proj_out = _lin(state, "proj_out", dt)
    out = {
        "patch_embed": patch_embed,
        "text_proj": _lin(state, "patch_embed.text_proj", dt),
        "t_embed": _embedder(state, "time_embedding", dt),
        "blocks": _stack(blocks),
        "norm_final": _norm(state, "norm_final", dt),
        "norm_out_mod": _lin(state, "norm_out.linear", dt),
        "norm_out_norm": _norm(state, "norm_out.norm", dt),
        "proj_out": proj_out,
    }
    if getattr(cfg, "patch_t", 1) > 1:
        # 1.5: the ofs conditioning branch (constant 2.0 at inference)
        out["ofs_embed"] = _embedder(state, "ofs_embedding", dt)
    return out


# ---------------------------------------------------------------------------
# Step-Video (the reference's own vendored naming: customized/step_video_t2v)
# ---------------------------------------------------------------------------


def convert_stepvideo(state: Dict[str, np.ndarray], cfg) -> Any:
    """Step-Video-T2V checkpoint -> full-TP param tree.

    Block naming follows the reference's vendored model
    (``customized/step_video_t2v/blocks.py``): per-head-packed ``wqkv``
    (rows grouped (head, [q|k|v], head_dim)), bias-free projections, affine
    RMSNorm qk norms; top level uses the PixArt-style AdaLayerNormSingle +
    caption projection also vendored there (``normalization.py:252-313``).
    """
    dt = cfg.dtype
    d, h, hd = cfg.dim, cfg.heads, cfg.head_dim

    def qkv_from_packed(w, b=None):
        # torch (3d, d) rows grouped (h, 3, hd) -> (d, 3, h, hd)
        wj = np.transpose(
            np.asarray(w).reshape(h, 3, hd, d), (3, 1, 0, 2)
        )
        bj = (
            np.asarray(b).reshape(h, 3, hd).transpose(1, 0, 2)
            if b is not None
            else np.zeros((3, h, hd), np.float32)
        )
        return {"w": jnp.asarray(wj, dt), "b": jnp.asarray(bj, dt)}

    def q_only(name):
        # wq (d, d) rows grouped (h, hd) -> (d, 1, h, hd)
        w = np.asarray(state[f"{name}.weight"]).reshape(h, hd, d)
        return {
            "w": jnp.asarray(np.transpose(w, (2, 0, 1))[:, None], dt),
            "b": jnp.zeros((1, h, hd), dt),
        }

    def kv_only(name):
        # wkv (2d, d) rows grouped (h, 2, hd) -> (d, 2, h, hd)
        w = np.asarray(state[f"{name}.weight"]).reshape(h, 2, hd, d)
        kv = np.stack(
            [np.transpose(w[:, 0], (2, 0, 1)), np.transpose(w[:, 1], (2, 0, 1))],
            axis=1,
        )
        return {"w": jnp.asarray(kv, dt), "b": jnp.zeros((2, h, hd), dt)}

    def head_out(name):
        # wo (d, h*hd) cols grouped per head -> (h, hd, d)
        w = np.asarray(state[f"{name}.weight"]).reshape(d, h, hd)
        b = state.get(f"{name}.bias")
        return {
            "w": jnp.asarray(np.transpose(w, (1, 2, 0)), dt),
            "b": jnp.asarray(
                b if b is not None else np.zeros((d,), np.float32), dt
            ),
        }

    def rms(name):
        return {"g": jnp.asarray(state[f"{name}.weight"], dt)}

    blocks = []
    for i in range(cfg.depth):
        p = f"transformer_blocks.{i}"
        blocks.append(
            {
                "scale_shift_table": jnp.asarray(
                    state[f"{p}.scale_shift_table"], dt
                ),
                "norm1": _norm(state, f"{p}.norm1", dt),
                "qkv": qkv_from_packed(
                    state[f"{p}.attn1.wqkv.weight"],
                    state.get(f"{p}.attn1.wqkv.bias"),
                ),
                "q_norm": rms(f"{p}.attn1.q_norm"),
                "k_norm": rms(f"{p}.attn1.k_norm"),
                "attn_out": head_out(f"{p}.attn1.wo"),
                "cross_q": q_only(f"{p}.attn2.wq"),
                "cross_kv": kv_only(f"{p}.attn2.wkv"),
                "cross_q_norm": rms(f"{p}.attn2.q_norm"),
                "cross_k_norm": rms(f"{p}.attn2.k_norm"),
                "cross_out": head_out(f"{p}.attn2.wo"),
                "norm2": _norm(state, f"{p}.norm2", dt),
                "ffn": {
                    "fc1": _lin(state, f"{p}.ff.net.0.proj", dt),
                    "fc2": _lin(state, f"{p}.ff.net.2", dt),
                },
            }
        )
    return {
        "patch_embed": _patch_conv_as_linear(state, "pos_embed.proj", dt),
        "text_proj": {
            "fc1": _lin(state, "caption_projection.linear_1", dt),
            "fc2": _lin(state, "caption_projection.linear_2", dt),
        },
        "t_embed": _embedder(state, "adaln_single.emb.timestep_embedder", dt),
        "adaln": _lin(state, "adaln_single.linear", dt),
        "blocks": _stack(blocks),
        "final_scale_shift": jnp.asarray(state["scale_shift_table"], dt),
        "proj_out": _lin(state, "proj_out", dt),
    }


def convert_consisid(state: Dict[str, np.ndarray], cfg) -> Any:
    """ConsisID weights: the CogVideoX block naming plus the
    ``perceiver_cross_attention.{j}`` identity-injection modules (bias-free
    q/kv/out + LayerNorms).  When a checkpoint carries no perceiver tensors
    the out-projections are zeroed, making the loaded model EXACTLY
    CogVideoX.  (``local_facial_extractor.*`` runs outside the denoise
    scan and is not part of this tree.)
    """
    params = convert_cogvideox(state, cfg)
    dt = cfg.dtype
    d = cfg.dim
    n_ca = (cfg.depth + cfg.cross_attn_interval - 1) // cfg.cross_attn_interval
    pers = []
    for j in range(n_ca):
        p = f"perceiver_cross_attention.{j}"
        if f"{p}.to_q.weight" in state:
            pers.append(
                {
                    "norm1": _norm(state, f"{p}.norm1", dt),
                    "norm2": _norm(state, f"{p}.norm2", dt),
                    "q": _lin_nobias(state, f"{p}.to_q", dt),
                    "kv": _lin_nobias(state, f"{p}.to_kv", dt),
                    "out": _lin_nobias(state, f"{p}.to_out", dt),
                }
            )
        else:  # no identity weights: zero out-proj -> exact CogVideoX
            pers.append(
                {
                    "norm1": {
                        "g": jnp.ones((cfg.id_dim,), dt),
                        "b": jnp.zeros((cfg.id_dim,), dt),
                    },
                    "norm2": {"g": jnp.ones((d,), dt), "b": jnp.zeros((d,), dt)},
                    "q": {"w": jnp.zeros((d, d), dt)},
                    "kv": {"w": jnp.zeros((cfg.id_dim, 2 * d), dt)},
                    "out": {"w": jnp.zeros((d, d), dt)},
                }
            )
    params["perceiver"] = _stack(pers)
    return params


def convert_local_facial_extractor(
    state: Dict[str, np.ndarray], cfg, prefix: str = "local_facial_extractor."
) -> Any:
    """ConsisID face encoder (``models/face.py`` layout).

    ``prefix`` defaults to the module's position inside the
    ``ConsisIDTransformer3DModel`` state dict; pass ``""`` for a standalone
    extractor checkpoint.  ``latents``/``proj_out`` are raw parameters
    (already (in, out) — no transpose).
    """
    dt = cfg.dtype

    def mlp3(p):
        return {
            "fc1": _lin(state, f"{p}.0", dt),
            "ln1": _norm(state, f"{p}.1", dt),
            "fc2": _lin(state, f"{p}.3", dt),
            "ln2": _norm(state, f"{p}.4", dt),
            "fc3": _lin(state, f"{p}.6", dt),
        }

    layers = []
    for i in range(cfg.depth):
        p = f"{prefix}layers.{i}"
        layers.append(
            {
                "attn": {
                    "norm1": _norm(state, f"{p}.0.norm1", dt),
                    "norm2": _norm(state, f"{p}.0.norm2", dt),
                    "q": _lin_nobias(state, f"{p}.0.to_q", dt),
                    "kv": _lin_nobias(state, f"{p}.0.to_kv", dt),
                    "out": _lin_nobias(state, f"{p}.0.to_out", dt),
                },
                "ffn": {
                    "ln": _norm(state, f"{p}.1.0", dt),
                    "fc1": _lin_nobias(state, f"{p}.1.1", dt),
                    "fc2": _lin_nobias(state, f"{p}.1.3", dt),
                },
            }
        )
    return {
        "latents": jnp.asarray(state[f"{prefix}latents"], dt),
        "proj_out": jnp.asarray(state[f"{prefix}proj_out"], dt),
        "id_mapping": mlp3(f"{prefix}id_embedding_mapping"),
        "mappings": [mlp3(f"{prefix}mapping_{i}") for i in range(cfg.num_scale)],
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# 3D video VAE decoder (diffusers AutoencoderKLCogVideoX naming)
# ---------------------------------------------------------------------------


def _conv3(state, name, dtype):
    """torch Conv3d (O, I, T, H, W) -> (T, H, W, I, O); a 4D Conv2d weight
    (the CogVideoX upsampler is a per-frame nn.Conv2d) loads as T=1."""
    w = state[f"{name}.weight"]
    if w.ndim == 4:  # Conv2d (O, I, H, W) -> (1, H, W, I, O)
        w = w[:, :, None]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), dtype),
        "b": jnp.asarray(state[f"{name}.bias"], dtype),
    }


def convert_vae3d_decoder(state: Dict[str, np.ndarray], cfg) -> Any:
    """CogVideoX causal 3D VAE decoder (``models/vae3d.py`` layout)."""
    dt = cfg.dtype

    def spatial_norm(p):
        return {
            "norm": _norm(state, f"{p}.norm_layer", dt),
            "conv_y": _conv3(state, f"{p}.conv_y", dt),
            "conv_b": _conv3(state, f"{p}.conv_b", dt),
        }

    def resnet(p):
        out = {
            "norm1": spatial_norm(f"{p}.norm1"),
            "conv1": _conv3(state, f"{p}.conv1.conv", dt),
            "norm2": spatial_norm(f"{p}.norm2"),
            "conv2": _conv3(state, f"{p}.conv2.conv", dt),
        }
        if f"{p}.conv_shortcut.weight" in state:
            out["shortcut"] = _conv3(state, f"{p}.conv_shortcut", dt)
        return out

    mid = "decoder.mid_block"
    params = {
        "conv_in": _conv3(state, "decoder.conv_in.conv", dt),
        "mid_res1": resnet(f"{mid}.resnets.0"),
        "mid_res2": resnet(f"{mid}.resnets.1"),
        "norm_out": spatial_norm("decoder.norm_out"),
        "conv_out": _conv3(state, "decoder.conv_out.conv", dt),
    }
    up = []
    for i in range(len(cfg.block_out_channels)):
        p = f"decoder.up_blocks.{i}"
        blk = {
            "resnets": [
                resnet(f"{p}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"{p}.upsamplers.0.conv.weight" in state:
            blk["upsample_conv"] = _conv3(state, f"{p}.upsamplers.0.conv", dt)
        up.append(blk)
    params["up"] = up
    return params


def convert_hv_vae3d_decoder(state: Dict[str, np.ndarray], cfg) -> Any:
    """HunyuanVideo causal 3D VAE decoder (AutoencoderKLHunyuanVideo):
    plain GroupNorm resnets, causal convs everywhere (incl. shortcut and
    upsampler), causal-frame-masked mid attention."""
    dt = cfg.dtype

    def resnet(p):
        out = {
            "norm1": _norm(state, f"{p}.norm1", dt),
            "conv1": _conv3(state, f"{p}.conv1.conv", dt),
            "norm2": _norm(state, f"{p}.norm2", dt),
            "conv2": _conv3(state, f"{p}.conv2.conv", dt),
        }
        if f"{p}.conv_shortcut.conv.weight" in state:
            out["shortcut"] = _conv3(state, f"{p}.conv_shortcut.conv", dt)
        return out

    mid = "decoder.mid_block"
    params = {
        "conv_in": _conv3(state, "decoder.conv_in.conv", dt),
        "mid_res1": resnet(f"{mid}.resnets.0"),
        "mid_attn": {
            "norm": _norm(state, f"{mid}.attentions.0.group_norm", dt),
            "q": _lin(state, f"{mid}.attentions.0.to_q", dt),
            "k": _lin(state, f"{mid}.attentions.0.to_k", dt),
            "v": _lin(state, f"{mid}.attentions.0.to_v", dt),
            "out": _lin(state, f"{mid}.attentions.0.to_out.0", dt),
        },
        "mid_res2": resnet(f"{mid}.resnets.1"),
        "norm_out": _norm(state, "decoder.conv_norm_out", dt),
        "conv_out": _conv3(state, "decoder.conv_out.conv", dt),
    }
    up = []
    for i in range(len(cfg.block_out_channels)):
        p = f"decoder.up_blocks.{i}"
        blk = {
            "resnets": [
                resnet(f"{p}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"{p}.upsamplers.0.conv.conv.weight" in state:
            blk["upsample_conv"] = _conv3(state, f"{p}.upsamplers.0.conv.conv", dt)
        up.append(blk)
    params["up"] = up
    return params


# ---------------------------------------------------------------------------
# VAE decoder (diffusers AutoencoderKL naming)
# ---------------------------------------------------------------------------


def convert_vae_decoder(state: Dict[str, np.ndarray], cfg) -> Any:
    dt = cfg.dtype

    def resnet(p):
        out = {
            "norm1": _norm(state, f"{p}.norm1", dt),
            "conv1": _conv(state, f"{p}.conv1", dt),
            "norm2": _norm(state, f"{p}.norm2", dt),
            "conv2": _conv(state, f"{p}.conv2", dt),
        }
        if f"{p}.conv_shortcut.weight" in state:
            out["shortcut"] = _conv(state, f"{p}.conv_shortcut", dt)
        return out

    mid = "decoder.mid_block"
    params = {
        "post_quant_conv": _conv(state, "post_quant_conv", dt),
        "conv_in": _conv(state, "decoder.conv_in", dt),
        "mid_res1": resnet(f"{mid}.resnets.0"),
        "mid_attn": {
            "norm": _norm(state, f"{mid}.attentions.0.group_norm", dt),
            "q": _lin(state, f"{mid}.attentions.0.to_q", dt),
            "k": _lin(state, f"{mid}.attentions.0.to_k", dt),
            "v": _lin(state, f"{mid}.attentions.0.to_v", dt),
            "out": _lin(state, f"{mid}.attentions.0.to_out.0", dt),
        },
        "mid_res2": resnet(f"{mid}.resnets.1"),
        "norm_out": _norm(state, "decoder.conv_norm_out", dt),
        "conv_out": _conv(state, "decoder.conv_out", dt),
    }
    up = []
    n_up = len(cfg.block_out_channels)
    for i in range(n_up):
        p = f"decoder.up_blocks.{i}"
        blk = {
            "resnets": [
                resnet(f"{p}.resnets.{j}") for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"{p}.upsamplers.0.conv.weight" in state:
            blk["upsample_conv"] = _conv(state, f"{p}.upsamplers.0.conv", dt)
        up.append(blk)
    params["up"] = up
    return params
