"""Validate every HF converter against the official checkpoints' key inventories.

VERDICT r3 "What's missing" #1: the converters were only ever validated
against the in-repo torch references; a key-name or shape mismatch against an
*actual* HuggingFace checkpoint would pass every existing parity test.  The
reference never hits this class of bug because it loads through
``diffusers.from_pretrained`` (``xfuser/model_executor/pipelines/pipeline_flux.py:55-67``).

``tests/io/keymaps.py`` vendors the official checkpoints' key inventories
(names + shapes) at official *widths* but parametrizable depth.  Each test
here:

1. builds a fake state dict holding zeros at exactly the inventory shapes,
   wrapped so every ``__getitem__`` is recorded;
2. runs the converter at the official-width (reduced-depth) model config —
   a missing key raises ``KeyError``, a shape mismatch fails inside the
   converter's transpose/concat/reshape or in step 4;
3. asserts the converter consumed the WHOLE inventory (unread keys = the
   converter silently ignoring checkpoint weights);
4. asserts the converted tree has exactly the structure and shapes of the
   model's own ``init_*`` output (via ``jax.eval_shape`` — no compute).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.io import hf
from tests.io import keymaps


class TrackingState(dict):
    """State dict of zeros that records which keys the converter reads."""

    def __init__(self, shapes):
        # calloc-backed zeros: virtually free until touched
        super().__init__(
            {k: np.zeros(s, np.float32) for k, s in shapes.items()}
        )
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: tuple(a.shape), t)


def _check(inventory, convert, init, cfg, allowed_unread=()):
    state = TrackingState(inventory)
    out = convert(state, cfg)
    unread = set(state) - state.read - set(allowed_unread)
    assert not unread, (
        f"{len(unread)} checkpoint keys never consumed by the converter "
        f"(first 10): {sorted(unread)[:10]}"
    )
    ref = jax.eval_shape(lambda k: init(k, cfg), jax.random.PRNGKey(0))
    ts_out = jax.tree_util.tree_structure(out)
    ts_ref = jax.tree_util.tree_structure(ref)
    assert ts_out == ts_ref, f"converted structure != init structure"
    sh_out, sh_ref = _tree_shapes(out), _tree_shapes(ref)
    if sh_out != sh_ref:
        bad = [
            (p, a, b)
            for (p, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(sh_out),
                jax.tree_util.tree_leaves_with_path(sh_ref),
            )
            if a != b
        ]
        raise AssertionError(
            f"shape mismatches (converted vs init), first 10: {bad[:10]}"
        )


# --- image backbones -------------------------------------------------------


def test_pixart_official_keys():
    from compactfusion_tpu.models.pixart import init_pixart, pixart_alpha_512

    cfg = dataclasses.replace(pixart_alpha_512(), depth=2)
    _check(keymaps.pixart_keys(depth=2), hf.convert_pixart, init_pixart, cfg)


def test_flux_official_keys():
    from compactfusion_tpu.models.flux import flux_dev, init_flux

    cfg = dataclasses.replace(flux_dev(), double_layers=2, single_layers=2)
    _check(
        keymaps.flux_keys(double_layers=2, single_layers=2),
        hf.convert_flux, init_flux, cfg,
    )


def test_sd3_official_keys():
    from compactfusion_tpu.models.sd3 import init_sd3, sd3_medium

    cfg = dataclasses.replace(sd3_medium(), depth=2)
    _check(
        keymaps.sd3_keys(depth=2), hf.convert_sd3, init_sd3, cfg,
        # persisted COMPUTED 2D-sincos table (diffusers PatchEmbed with
        # pos_embed_max_size); the model re-derives it (+ the base_size
        # scaling and center crop) — pinned against torch in
        # tests/io/test_backbone_parity.py
        allowed_unread={"pos_embed.pos_embed"},
    )


def test_hunyuandit_official_keys():
    from compactfusion_tpu.models.hunyuandit import (
        hunyuandit_v12,
        init_hunyuandit,
    )

    # depth 4 = 2 down + 2 up so the skip_linear/skip_norm rows are exercised
    cfg = dataclasses.replace(hunyuandit_v12(), depth=4)
    _check(
        keymaps.hunyuandit_keys(depth=4),
        hf.convert_hunyuandit, init_hunyuandit, cfg,
    )


# --- video backbones -------------------------------------------------------


def test_latte_official_keys():
    from compactfusion_tpu.models.latte import init_latte, latte_1

    cfg = dataclasses.replace(latte_1(), num_pairs=1)
    _check(keymaps.latte_keys(pairs=1), hf.convert_latte, init_latte, cfg)


@pytest.mark.parametrize("variant", ["5b", "2b", "1.5-5b"])
def test_cogvideox_official_keys(variant):
    from compactfusion_tpu.models.cogvideox import (
        cogvideox_1_5_5b,
        cogvideox_2b,
        cogvideox_5b,
        init_cogvideox,
    )

    base = {
        "5b": cogvideox_5b, "2b": cogvideox_2b, "1.5-5b": cogvideox_1_5_5b
    }[variant]()
    cfg = dataclasses.replace(base, depth=2)
    inv = keymaps.cogvideox_keys(
        depth=2, dim=cfg.dim, patch_t=cfg.patch_t if cfg.patch_t > 1 else 0,
        learned_pos=not cfg.use_rotary,
    )
    _check(
        inv, hf.convert_cogvideox, init_cogvideox, cfg,
        # 2b: persisted COMPUTED 3D-sincos table at the sample geometry;
        # the model re-derives it for the actual request geometry
        allowed_unread={"patch_embed.pos_embedding"},
    )


def test_hunyuanvideo_official_keys():
    from compactfusion_tpu.models.hunyuanvideo import (
        hunyuanvideo_config,
        init_hunyuanvideo,
    )

    cfg = dataclasses.replace(
        hunyuanvideo_config(), double_layers=2, single_layers=2
    )
    _check(
        keymaps.hunyuanvideo_keys(double_layers=2, single_layers=2),
        hf.convert_hunyuanvideo, init_hunyuanvideo, cfg,
    )


def test_stepvideo_official_keys():
    from compactfusion_tpu.models.stepvideo import (
        init_stepvideo,
        stepvideo_t2v,
    )

    cfg = dataclasses.replace(stepvideo_t2v(), depth=2)
    _check(
        keymaps.stepvideo_keys(depth=2),
        hf.convert_stepvideo, init_stepvideo, cfg,
    )


# --- VAE decoder -----------------------------------------------------------


def test_sd_vae_decoder_official_keys():
    from compactfusion_tpu.models.vae import init_vae_decoder, sd_vae

    cfg = sd_vae()
    _check(
        keymaps.sd_vae_decoder_keys(),
        hf.convert_vae_decoder, init_vae_decoder, cfg,
    )


def test_flux_vae_decoder_official_keys():
    from compactfusion_tpu.models.vae import flux_vae, init_vae_decoder

    cfg = flux_vae()
    _check(
        keymaps.sd_vae_decoder_keys(z_ch=16),
        hf.convert_vae_decoder, init_vae_decoder, cfg,
    )


# --- text encoders (exact inventories from installed transformers) ---------


def test_t5_xxl_official_keys():
    from compactfusion_tpu.models.text_encoders import init_t5, t5_xxl

    cfg = dataclasses.replace(t5_xxl(), num_layers=2)
    _check(
        keymaps.t5_xxl_keys(num_layers=2), hf.convert_t5, init_t5, cfg,
        # tied duplicate of shared.weight in the HF state dict
        allowed_unread={"encoder.embed_tokens.weight"},
    )


def test_clip_l_official_keys():
    from compactfusion_tpu.models.text_encoders import clip_l, init_clip

    cfg = dataclasses.replace(clip_l(), num_layers=2)
    inv = {
        k: v for k, v in keymaps.clip_l_keys(num_layers=2).items()
        if not k.endswith("position_ids")  # buffer in older transformers
    }
    _check(inv, hf.convert_clip, init_clip, cfg)


def test_clip_g_official_keys():
    from compactfusion_tpu.models.text_encoders import clip_g, init_clip

    cfg = dataclasses.replace(clip_g(), num_layers=2)
    inv = {
        k: v for k, v in keymaps.clip_g_keys(num_layers=2).items()
        if not k.endswith("position_ids")
    }
    _check(inv, hf.convert_clip, init_clip, cfg)
