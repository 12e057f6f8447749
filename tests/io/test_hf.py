"""HF checkpoint converter tests.

Structure/shape round-trips: a synthetic HF-named state dict at tiny-config
shapes must convert into a tree with exactly the structure and shapes of the
randomly-initialised model, and fused projections must preserve q/k/v order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.io import hf
from compactfusion_tpu.models.flux import flux_tiny, init_flux
from compactfusion_tpu.models.pixart import init_pixart, pixart_tiny
from compactfusion_tpu.models.sd3 import init_sd3, sd3_tiny
from compactfusion_tpu.models.text_encoders import (
    clip_encode,
    clip_tiny,
    init_clip,
    init_t5,
    t5_encode,
    t5_tiny,
)
from compactfusion_tpu.models.vae import init_vae_decoder, tiny_vae, vae_decode


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), t)


def _assert_same_structure(a, b):
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    assert ta == tb, f"{ta}\n!=\n{tb}"
    assert _tree_shapes(a) == _tree_shapes(b)


def _rng_state(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.standard_normal(v).astype(np.float32) for k, v in shapes.items()}


def test_convert_pixart_structure():
    cfg = pixart_tiny()
    ref = init_pixart(jax.random.PRNGKey(0), cfg)
    d, td, p, cin = cfg.dim, cfg.text_dim, cfg.patch, cfg.in_channels
    shapes = {
        "pos_embed.proj.weight": (d, cin, p, p),
        "pos_embed.proj.bias": (d,),
        "adaln_single.emb.timestep_embedder.linear_1.weight": (d, 256),
        "adaln_single.emb.timestep_embedder.linear_1.bias": (d,),
        "adaln_single.emb.timestep_embedder.linear_2.weight": (d, d),
        "adaln_single.emb.timestep_embedder.linear_2.bias": (d,),
        "adaln_single.linear.weight": (6 * d, d),
        "adaln_single.linear.bias": (6 * d,),
        "caption_projection.linear_1.weight": (d, td),
        "caption_projection.linear_1.bias": (d,),
        "caption_projection.linear_2.weight": (d, d),
        "caption_projection.linear_2.bias": (d,),
        "scale_shift_table": (2, d),
        "proj_out.weight": (p * p * cfg.out_channels, d),
        "proj_out.bias": (p * p * cfg.out_channels,),
    }
    for i in range(cfg.depth):
        b = f"transformer_blocks.{i}"
        shapes[f"{b}.scale_shift_table"] = (6, d)
        for n in ("attn1.to_q", "attn1.to_k", "attn1.to_v", "attn1.to_out.0",
                  "attn2.to_q", "attn2.to_k", "attn2.to_v", "attn2.to_out.0"):
            shapes[f"{b}.{n}.weight"] = (d, d)
            shapes[f"{b}.{n}.bias"] = (d,)
        shapes[f"{b}.ff.net.0.proj.weight"] = (cfg.ffn_mult * d, d)
        shapes[f"{b}.ff.net.0.proj.bias"] = (cfg.ffn_mult * d,)
        shapes[f"{b}.ff.net.2.weight"] = (d, cfg.ffn_mult * d)
        shapes[f"{b}.ff.net.2.bias"] = (d,)
    state = _rng_state(shapes)
    out = hf.convert_pixart(state, cfg)
    _assert_same_structure(out, ref)
    # fused qkv order: q block of the fused matrix == to_q.T
    np.testing.assert_allclose(
        np.asarray(out["blocks"]["attn_qkv"]["w"][0, :, :d], np.float32),
        state["transformer_blocks.0.attn1.to_q.weight"].T,
        rtol=1e-2, atol=1e-2,
    )


def test_convert_flux_structure():
    cfg = flux_tiny()
    ref = init_flux(jax.random.PRNGKey(0), cfg)
    d = cfg.dim
    hd = cfg.head_dim
    shapes = {
        "x_embedder.weight": (d, cfg.in_channels),
        "x_embedder.bias": (d,),
        "context_embedder.weight": (d, cfg.text_dim),
        "context_embedder.bias": (d,),
        "time_text_embed.timestep_embedder.linear_1.weight": (d, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": (d,),
        "time_text_embed.timestep_embedder.linear_2.weight": (d, d),
        "time_text_embed.timestep_embedder.linear_2.bias": (d,),
        "time_text_embed.text_embedder.linear_1.weight": (d, cfg.pooled_dim),
        "time_text_embed.text_embedder.linear_1.bias": (d,),
        "time_text_embed.text_embedder.linear_2.weight": (d, d),
        "time_text_embed.text_embedder.linear_2.bias": (d,),
        "time_text_embed.guidance_embedder.linear_1.weight": (d, 256),
        "time_text_embed.guidance_embedder.linear_1.bias": (d,),
        "time_text_embed.guidance_embedder.linear_2.weight": (d, d),
        "time_text_embed.guidance_embedder.linear_2.bias": (d,),
        "norm_out.linear.weight": (2 * d, d),
        "norm_out.linear.bias": (2 * d,),
        "proj_out.weight": (cfg.in_channels, d),
        "proj_out.bias": (cfg.in_channels,),
    }
    for i in range(cfg.double_layers):
        b = f"transformer_blocks.{i}"
        shapes[f"{b}.norm1.linear.weight"] = (6 * d, d)
        shapes[f"{b}.norm1.linear.bias"] = (6 * d,)
        shapes[f"{b}.norm1_context.linear.weight"] = (6 * d, d)
        shapes[f"{b}.norm1_context.linear.bias"] = (6 * d,)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                  "add_v_proj", "to_out.0", "to_add_out"):
            shapes[f"{b}.attn.{n}.weight"] = (d, d)
            shapes[f"{b}.attn.{n}.bias"] = (d,)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            shapes[f"{b}.attn.{n}.weight"] = (hd,)
        for ff in ("ff", "ff_context"):
            shapes[f"{b}.{ff}.net.0.proj.weight"] = (cfg.mlp_ratio * d, d)
            shapes[f"{b}.{ff}.net.0.proj.bias"] = (cfg.mlp_ratio * d,)
            shapes[f"{b}.{ff}.net.2.weight"] = (d, cfg.mlp_ratio * d)
            shapes[f"{b}.{ff}.net.2.bias"] = (d,)
    for i in range(cfg.single_layers):
        b = f"single_transformer_blocks.{i}"
        shapes[f"{b}.norm.linear.weight"] = (3 * d, d)
        shapes[f"{b}.norm.linear.bias"] = (3 * d,)
        for n in ("to_q", "to_k", "to_v"):
            shapes[f"{b}.attn.{n}.weight"] = (d, d)
            shapes[f"{b}.attn.{n}.bias"] = (d,)
        shapes[f"{b}.attn.norm_q.weight"] = (hd,)
        shapes[f"{b}.attn.norm_k.weight"] = (hd,)
        shapes[f"{b}.proj_mlp.weight"] = (cfg.mlp_ratio * d, d)
        shapes[f"{b}.proj_mlp.bias"] = (cfg.mlp_ratio * d,)
        shapes[f"{b}.proj_out.weight"] = (d, d + cfg.mlp_ratio * d)
        shapes[f"{b}.proj_out.bias"] = (d,)
    state = _rng_state(shapes)
    out = hf.convert_flux(state, cfg)
    _assert_same_structure(out, ref)


def test_convert_vae_structure():
    cfg = tiny_vae()
    ref = init_vae_decoder(jax.random.PRNGKey(0), cfg)
    c_lat = cfg.latent_channels
    chans = cfg.block_out_channels  # (8, 16)
    c0 = chans[-1]
    shapes = {
        "post_quant_conv.weight": (c_lat, c_lat, 1, 1),
        "post_quant_conv.bias": (c_lat,),
        "decoder.conv_in.weight": (c0, c_lat, 3, 3),
        "decoder.conv_in.bias": (c0,),
        "decoder.conv_norm_out.weight": (chans[0],),
        "decoder.conv_norm_out.bias": (chans[0],),
        "decoder.conv_out.weight": (cfg.out_channels, chans[0], 3, 3),
        "decoder.conv_out.bias": (cfg.out_channels,),
    }

    def add_resnet(p, cin, cout):
        shapes[f"{p}.norm1.weight"] = (cin,)
        shapes[f"{p}.norm1.bias"] = (cin,)
        shapes[f"{p}.conv1.weight"] = (cout, cin, 3, 3)
        shapes[f"{p}.conv1.bias"] = (cout,)
        shapes[f"{p}.norm2.weight"] = (cout,)
        shapes[f"{p}.norm2.bias"] = (cout,)
        shapes[f"{p}.conv2.weight"] = (cout, cout, 3, 3)
        shapes[f"{p}.conv2.bias"] = (cout,)
        if cin != cout:
            shapes[f"{p}.conv_shortcut.weight"] = (cout, cin, 1, 1)
            shapes[f"{p}.conv_shortcut.bias"] = (cout,)

    add_resnet("decoder.mid_block.resnets.0", c0, c0)
    add_resnet("decoder.mid_block.resnets.1", c0, c0)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        shapes[f"decoder.mid_block.attentions.0.{n}.weight"] = (c0, c0)
        shapes[f"decoder.mid_block.attentions.0.{n}.bias"] = (c0,)
    shapes["decoder.mid_block.attentions.0.group_norm.weight"] = (c0,)
    shapes["decoder.mid_block.attentions.0.group_norm.bias"] = (c0,)

    c_prev = c0
    for i, c in enumerate(reversed(chans)):
        for j in range(cfg.layers_per_block + 1):
            add_resnet(f"decoder.up_blocks.{i}.resnets.{j}", c_prev, c)
            c_prev = c
        if i < len(chans) - 1:
            shapes[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = (c, c, 3, 3)
            shapes[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = (c,)
    state = _rng_state(shapes)
    out = hf.convert_vae_decoder(state, cfg)
    _assert_same_structure(out, ref)


def test_t5_encode_shapes():
    cfg = t5_tiny()
    params = init_t5(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 10)))
    out = jax.jit(lambda p, i: t5_encode(p, i, cfg))(params, ids)
    assert out.shape == (2, 10, cfg.d_model)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_clip_encode_shapes():
    cfg = clip_tiny()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 12)))
    hid, pooled = jax.jit(lambda p, i: clip_encode(p, i, cfg))(params, ids)
    assert hid.shape == (2, 12, cfg.d_model)
    assert pooled.shape == (2, cfg.d_model)


def test_safetensors_roundtrip(tmp_path):
    state = {"a.weight": np.ones((3, 4), np.float32), "b": np.arange(5.0)}
    path = str(tmp_path / "test.safetensors")
    hf.save_safetensors(state, path)
    loaded = hf.load_safetensors(path)
    np.testing.assert_array_equal(loaded["a.weight"], state["a.weight"])
    loaded_dir = hf.load_safetensors(str(tmp_path))
    assert set(loaded_dir) == {"a.weight", "b"}
