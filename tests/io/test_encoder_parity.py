"""Numerical parity of our T5/CLIP encoders vs HuggingFace transformers.

Ground-truth check no other test provides: instantiate tiny randomly-
initialised HF models (torch CPU), export their state dicts, convert with
``compactfusion_tpu.io.hf``, and require the JAX forward to match the torch
forward — validating the architecture re-implementation AND the converter
name/layout mapping end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compactfusion_tpu.io import hf
from compactfusion_tpu.models.text_encoders import (
    CLIPTextConfig,
    T5Config,
    clip_encode,
    t5_encode,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_t5_encoder_matches_transformers():
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        dropout_rate=0.0,
        feed_forward_proj="gated-gelu",
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=128, num_layers=2,
        num_heads=4, dtype=jnp.float32,
    )
    params = hf.convert_t5(state, cfg)

    ids = np.random.default_rng(1).integers(0, 128, (2, 10))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).last_hidden_state.numpy()
    out = np.asarray(t5_encode(params, jnp.asarray(ids), cfg), np.float32)
    assert rel_err(out, ref) < 1e-3, f"T5 parity failed: {rel_err(out, ref)}"


def test_clip_text_encoder_matches_transformers():
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFCLIPTextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
        eos_token_id=127,  # pool at the (highest-id) EOS, like clip_encode
        bos_token_id=126,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=128, d_model=64, num_layers=2, num_heads=4, max_len=16,
        dtype=jnp.float32,
    )
    params = hf.convert_clip(state, cfg)

    rng = np.random.default_rng(2)
    # CLIP pools at the highest token id (EOS); force a clean argmax
    ids = rng.integers(0, 100, (2, 12))
    ids[:, -1] = 127
    with torch.no_grad():
        ref = model(torch.tensor(ids))
        ref_h = ref.last_hidden_state.numpy()
        ref_p = ref.pooler_output.numpy()
    hid, pooled = clip_encode(params, jnp.asarray(ids), cfg)
    assert rel_err(np.asarray(hid), ref_h) < 1e-3, rel_err(np.asarray(hid), ref_h)
    assert rel_err(np.asarray(pooled), ref_p) < 1e-3


def test_clip_g_style_projection_matches_transformers():
    """SD3's CLIP-G shape: hidden_act='gelu' + CLIPTextModelWithProjection."""
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFCLIPTextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="gelu",
        projection_dim=48,
        attention_dropout=0.0,
        eos_token_id=127,
        bos_token_id=126,
    )
    torch.manual_seed(3)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=128, d_model=64, num_layers=2, num_heads=4, max_len=16,
        hidden_act="gelu", projection_dim=48, dtype=jnp.float32,
    )
    params = hf.convert_clip(state, cfg)
    assert "text_proj" in params

    rng = np.random.default_rng(4)
    ids = rng.integers(0, 100, (2, 12))
    ids[:, -1] = 127
    with torch.no_grad():
        ref = model(torch.tensor(ids))
        ref_h = ref.last_hidden_state.numpy()
        ref_p = ref.text_embeds.numpy()
    hid, pooled = clip_encode(params, jnp.asarray(ids), cfg)
    assert rel_err(np.asarray(hid), ref_h) < 1e-3
    assert pooled.shape == (2, 48)
    assert rel_err(np.asarray(pooled), ref_p) < 1e-3
