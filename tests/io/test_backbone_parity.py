"""Ground-truth numerical parity of the DiT backbones + VAE vs torch.

diffusers is not installed here, so the oracle is ``tests/torch_ref.py`` —
independent torch re-implementations of the diffusers modules with the real
state-dict naming.  Each test: random torch model (fp32) -> state_dict ->
``io/hf.py`` converter -> JAX forward must match the torch forward.  This
validates the model math AND the checkpoint converters end-to-end, the same
way ``test_encoder_parity.py`` does for T5/CLIP against transformers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from compactfusion_tpu.io import hf
from compactfusion_tpu.models import common as cm

torch = pytest.importorskip("torch")

from tests import torch_ref  # noqa: E402


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _state(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


# ---------------------------------------------------------------------------
# PixArt
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("interp", [1.0, 2.0])
def test_pixart_matches_torch(interp):
    from compactfusion_tpu.models.pixart import PixArtConfig, pixart_forward

    torch.manual_seed(0)
    ref = torch_ref.PixArtRef(
        dim=64, depth=2, heads=4, patch=2, in_channels=4, out_channels=8,
        text_dim=32, sample_size=8, interpolation_scale=interp,
    ).eval()
    cfg = PixArtConfig(
        dim=64, depth=2, heads=4, text_dim=32, sample_size=8,
        interpolation_scale=interp, dtype=jnp.float32,
    )
    params = hf.convert_pixart(_state(ref), cfg)

    rng = np.random.default_rng(1)
    lat = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([37.0, 551.0], np.float32)
    text = rng.standard_normal((2, 6, 32)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], bool)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(lat), torch.tensor(t), torch.tensor(text),
            text_mask=torch.tensor(mask),
        ).numpy()

    hp = wp = 4
    pos = cm.sincos_pos_embed_2d(
        cfg.dim, hp, wp, base_size=cfg.base_size,
        interpolation_scale=cfg.interpolation_scale,
    )
    x_tokens = cm.patchify(jnp.asarray(lat).transpose(0, 2, 3, 1), cfg.patch)
    out, _ = pixart_forward(
        params, x_tokens, jnp.asarray(t), jnp.asarray(text), cfg,
        pos_embed=pos, text_mask=jnp.asarray(mask),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# HunyuanDiT (U-ViT skips, text pool conditioning, rope'd cross queries)
# ---------------------------------------------------------------------------


def test_hunyuandit_matches_torch():
    import dataclasses

    from compactfusion_tpu.models.hunyuandit import (
        hunyuandit_condition,
        hunyuandit_forward,
        hunyuandit_positions,
        hunyuandit_tiny,
    )

    torch.manual_seed(16)
    ref = torch_ref.HunyuanDiTRef(
        dim=64, depth=4, heads=4, patch=2, in_channels=4, out_channels=8,
        text_dim=32, t5_dim=48, text_len=6, text_len_t5=8, ffn_hidden=128,
        rope_axes=(8, 8),
    ).eval()
    cfg = dataclasses.replace(hunyuandit_tiny(), dtype=jnp.float32)
    params = hf.convert_hunyuandit(_state(ref), cfg)

    rng = np.random.default_rng(17)
    hp = wp = 4
    lat = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([88.0, 619.0], np.float32)
    clip_text = rng.standard_normal((2, 6, 32)).astype(np.float32)
    t5_text = rng.standard_normal((2, 8, 48)).astype(np.float32)
    clip_mask = np.array([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]], bool)
    t5_mask = np.array(
        [[1, 1, 1, 1, 0, 0, 0, 0], [1, 1, 0, 0, 0, 0, 0, 0]], bool
    )
    ids = hunyuandit_positions(hp, wp)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(lat), torch.tensor(t), torch.tensor(clip_text),
            torch.tensor(t5_text), torch.tensor(clip_mask),
            torch.tensor(t5_mask), torch.tensor(np.asarray(ids)),
        ).numpy()

    text, extra = hunyuandit_condition(
        params, jnp.asarray(clip_text), jnp.asarray(t5_text),
        jnp.asarray(clip_mask), jnp.asarray(t5_mask), cfg,
    )
    tokens = cm.patchify(jnp.asarray(lat).transpose(0, 2, 3, 1), cfg.patch)
    out, _, _ = hunyuandit_forward(
        params, tokens, jnp.asarray(t), text, cfg,
        rope=cm.rope_frequencies(ids, cfg.rope_axes),
        temb_extra=extra,
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# Latte (spatial/temporal block pairs)
# ---------------------------------------------------------------------------


def test_latte_matches_torch():
    import dataclasses

    from compactfusion_tpu.models.latte import latte_tiny, latte_forward

    torch.manual_seed(14)
    ref = torch_ref.LatteRef(
        dim=64, num_pairs=2, heads=4, patch=2, in_channels=4, out_channels=8,
        text_dim=32, sample_size=8, max_frames=8,
    ).eval()
    cfg = dataclasses.replace(latte_tiny(), dtype=jnp.float32)
    params = hf.convert_latte(_state(ref), cfg)

    rng = np.random.default_rng(15)
    b, f, hp, wp = 2, 3, 4, 4
    lat = rng.standard_normal((b, f, 4, 8, 8)).astype(np.float32)
    t = np.array([123.0, 704.0], np.float32)
    text = rng.standard_normal((b, 6, 32)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(lat), torch.tensor(t), torch.tensor(text), f
        ).numpy()

    tokens = jnp.concatenate(
        [
            cm.patchify(jnp.asarray(lat[:, i]).transpose(0, 2, 3, 1), cfg.patch)
            for i in range(f)
        ],
        axis=1,
    )  # frame-major (B, F*S_sp, p*p*C)
    pos = cm.sincos_pos_embed_2d(cfg.dim, hp, wp)
    tpos = cm._sincos_embed_1d(jnp.arange(f, dtype=jnp.float32), cfg.dim)
    out, _ = latte_forward(
        params, tokens, jnp.asarray(t), jnp.asarray(text), cfg,
        frames_local=f, frames_total=f, spatial_tokens=hp * wp,
        pos_embed=pos, temporal_pos_embed=tpos,
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# FLUX
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("guidance", [True, False])
def test_flux_matches_torch(guidance):
    from compactfusion_tpu.models.flux import (
        FluxConfig,
        flux_forward,
        flux_image_positions,
    )

    torch.manual_seed(2)
    ref = torch_ref.FluxRef(
        dim=64, double_layers=2, single_layers=2, heads=4, in_channels=16,
        text_dim=32, pooled_dim=16, axes_dim=(4, 6, 6), guidance=guidance,
    ).eval()
    cfg = FluxConfig(
        dim=64, double_layers=2, single_layers=2, heads=4, in_channels=16,
        text_dim=32, pooled_dim=16, axes_dim=(4, 6, 6),
        guidance_embeds=guidance, dtype=jnp.float32,
    )
    params = hf.convert_flux(_state(ref), cfg)

    rng = np.random.default_rng(3)
    hp = wp = 4
    img = rng.standard_normal((2, hp * wp, 16)).astype(np.float32)
    txt = rng.standard_normal((2, 5, 32)).astype(np.float32)
    pooled = rng.standard_normal((2, 16)).astype(np.float32)
    t = np.array([311.0, 820.0], np.float32)
    g = np.array([3500.0, 3500.0], np.float32) if guidance else None

    img_pos = flux_image_positions(hp, wp)
    txt_pos = jnp.zeros((5, 3), jnp.int32)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(img), torch.tensor(txt), torch.tensor(pooled),
            torch.tensor(t),
            torch.tensor(g) if guidance else None,
            torch.tensor(np.asarray(img_pos)),
            torch.tensor(np.asarray(txt_pos)),
        ).numpy()

    out, _, _ = flux_forward(
        params, jnp.asarray(img), jnp.asarray(txt), jnp.asarray(pooled),
        jnp.asarray(t), jnp.asarray(g) if guidance else None, cfg,
        img_rope=cm.rope_frequencies(img_pos, cfg.axes_dim),
        txt_rope=cm.rope_frequencies(txt_pos, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# HunyuanVideo (token refiner + rope theta 256)
# ---------------------------------------------------------------------------


def test_hunyuanvideo_matches_torch():
    from compactfusion_tpu.models.hunyuanvideo import (
        hunyuanvideo_forward,
        hunyuanvideo_positions,
        hunyuanvideo_tiny,
    )
    import dataclasses

    torch.manual_seed(10)
    ref = torch_ref.HunyuanVideoRef(
        dim=64, double_layers=2, single_layers=2, heads=4, in_channels=16,
        text_dim=32, pooled_dim=16, axes_dim=(8, 4, 4), refiner_layers=2,
    ).eval()
    cfg = dataclasses.replace(hunyuanvideo_tiny(), dtype=jnp.float32)
    params = hf.convert_hunyuanvideo(_state(ref), cfg)

    rng = np.random.default_rng(11)
    f, hp, wp = 2, 4, 4
    vid = rng.standard_normal((2, f * hp * wp, 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    pooled = rng.standard_normal((2, 16)).astype(np.float32)
    t = np.array([212.0, 780.0], np.float32)
    g = np.array([6000.0, 6000.0], np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]], bool)

    vid_pos = hunyuanvideo_positions(f, hp, wp)
    txt_pos = jnp.zeros((6, 3), jnp.int32)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(pooled),
            torch.tensor(t), torch.tensor(g),
            torch.tensor(np.asarray(vid_pos)), torch.tensor(np.asarray(txt_pos)),
            torch.tensor(mask),
        ).numpy()

    out, _, _ = hunyuanvideo_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(pooled),
        jnp.asarray(t), jnp.asarray(g), cfg,
        video_rope=cm.rope_frequencies(vid_pos, cfg.axes_dim, theta=cfg.rope_theta),
        txt_rope=cm.rope_frequencies(txt_pos, cfg.axes_dim, theta=cfg.rope_theta),
        text_mask=jnp.asarray(mask),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# SD3 (incl. the context_pre_only final block of real checkpoints)
# ---------------------------------------------------------------------------


def test_sd3_matches_torch():
    from compactfusion_tpu.models.sd3 import sd3_tiny, sd3_forward
    import dataclasses

    torch.manual_seed(4)
    ref = torch_ref.SD3Ref(
        dim=64, depth=3, heads=4, patch=2, in_channels=4, text_dim=32,
        pooled_dim=16, sample_size=8, pos_embed_max_size=16, qk_norm=True,
    ).eval()
    cfg = dataclasses.replace(sd3_tiny(), depth=3, dtype=jnp.float32)
    params = hf.convert_sd3(_state(ref), cfg)

    rng = np.random.default_rng(5)
    lat = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([99.0, 640.0], np.float32)
    text = rng.standard_normal((2, 6, 32)).astype(np.float32)
    pooled = rng.standard_normal((2, 16)).astype(np.float32)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(lat), torch.tensor(t), torch.tensor(text),
            torch.tensor(pooled),
        ).numpy()

    hp = wp = 4
    pos = cm.cropped_pos_embed_2d(
        cfg.dim, hp, wp, cfg.pos_embed_max_size, cfg.base_size
    )
    x_tokens = cm.patchify(jnp.asarray(lat).transpose(0, 2, 3, 1), cfg.patch)
    out, _ = sd3_forward(
        params, x_tokens, jnp.asarray(text), jnp.asarray(pooled),
        jnp.asarray(t), cfg, pos_embed=pos,
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# CogVideoX (rotary path; ConsisID shares the block structure)
# ---------------------------------------------------------------------------


def test_cogvideox_matches_torch():
    import dataclasses

    from compactfusion_tpu.models.cogvideox import (
        cogvideox_tiny,
        cogvideox_forward,
        video_positions,
    )

    torch.manual_seed(12)
    ref = torch_ref.CogVideoXRef(
        dim=64, depth=2, heads=4, patch=2, in_channels=16, text_dim=32,
        time_embed_dim=32, axes_dim=(8, 4, 4),
    ).eval()
    cfg = dataclasses.replace(cogvideox_tiny(), dtype=jnp.float32)
    params = hf.convert_cogvideox(_state(ref), cfg)

    rng = np.random.default_rng(13)
    f, hp, wp = 2, 4, 4
    vid = rng.standard_normal((2, f * hp * wp, 4 * 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    t = np.array([44.0, 912.0], np.float32)
    pos = video_positions(f, hp, wp)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(t),
            torch.tensor(np.asarray(pos)),
        ).numpy()

    out, _ = cogvideox_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(t), cfg,
        video_rope=cm.rope_frequencies(pos, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


def test_cogvideox_1_5_matches_torch():
    """CogVideoX 1.5 (patch_size_t=2): Linear patch embed over
    (p_t, p, p, C)-packed tokens; the checkpoint's proj_out features are
    (C, p_t, p, p)-ordered (diffusers unpatchify) and the converter permutes
    them to this model's (p_t, p, p, C)."""
    import dataclasses

    from compactfusion_tpu.models.cogvideox import (
        cogvideox_tiny,
        cogvideox_forward,
        video_positions,
    )

    torch.manual_seed(21)
    ref = torch_ref.CogVideoXRef(
        dim=64, depth=2, heads=4, patch=2, in_channels=16, text_dim=32,
        time_embed_dim=32, axes_dim=(8, 4, 4), patch_t=2,
    ).eval()
    cfg = dataclasses.replace(cogvideox_tiny(patch_t=2), dtype=jnp.float32)
    params = hf.convert_cogvideox(_state(ref), cfg)

    rng = np.random.default_rng(22)
    ft, hp, wp = 2, 4, 4  # 2 temporal patch groups (4 latent frames)
    vid = rng.standard_normal((2, ft * hp * wp, 2 * 4 * 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    t = np.array([44.0, 912.0], np.float32)
    pos = video_positions(ft, hp, wp)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(t),
            torch.tensor(np.asarray(pos)),
        ).numpy()
    # torch-ref features are checkpoint-ordered (C, p_t, p, p): permute to
    # this model's (p_t, p, p, C) before comparing
    b, s, _ = out_ref.shape
    out_ref = (
        out_ref.reshape(b, s, 16, 2, 2, 2)
        .transpose(0, 1, 3, 4, 5, 2)
        .reshape(b, s, -1)
    )

    out, _ = cogvideox_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(t), cfg,
        video_rope=cm.rope_frequencies(pos, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


def test_stepvideo_matches_torch():
    """Full Step-Video forward vs the torch reference built from the
    reference's own vendored block/normalization code (per-head packed
    wqkv, half-split 3D rope, ungated raw cross-attention)."""
    import dataclasses

    from compactfusion_tpu.models.cogvideox import video_positions
    from compactfusion_tpu.models.stepvideo import (
        stepvideo_forward,
        stepvideo_rope_tables,
        stepvideo_tiny,
    )

    torch.manual_seed(20)
    ref = torch_ref.StepVideoRef(
        dim=64, depth=2, head_dim=16, ch_split=(8, 4, 4), in_channels=16,
        patch=2, text_dim=32,
    ).eval()
    cfg = dataclasses.replace(stepvideo_tiny(), dtype=jnp.float32)
    params = hf.convert_stepvideo(_state(ref), cfg)

    rng = np.random.default_rng(21)
    f, hp, wp = 2, 4, 4
    vid = rng.standard_normal((2, f * hp * wp, 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    t = np.array([451.0, 37.0], np.float32)
    mesh = np.asarray(video_positions(f, hp, wp))

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(t),
            torch.tensor(mesh),
        ).numpy()

    out, _ = stepvideo_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(t), cfg,
        video_rope=stepvideo_rope_tables(f, hp, wp, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


def test_consisid_with_identity_matches_torch():
    """Full ConsisID parity INCLUDING the perceiver identity injection."""
    import dataclasses

    from compactfusion_tpu.models.consisid import consisid_tiny, consisid_forward
    from compactfusion_tpu.models.cogvideox import video_positions

    torch.manual_seed(24)
    ref = torch_ref.ConsisIDRef(
        id_dim=16, interval=2, dim=64, depth=2, heads=4, patch=2,
        in_channels=16, text_dim=32, time_embed_dim=32, axes_dim=(8, 4, 4),
    ).eval()
    cfg = dataclasses.replace(consisid_tiny(), dtype=jnp.float32)
    params = hf.convert_consisid(ref.state_dict_flat(), cfg)

    rng = np.random.default_rng(25)
    f, hp, wp = 2, 4, 4
    vid = rng.standard_normal((2, f * hp * wp, 4 * 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    ids = rng.standard_normal((2, 5, 16)).astype(np.float32)
    t = np.array([230.0, 540.0], np.float32)
    pos = video_positions(f, hp, wp)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(t),
            torch.tensor(np.asarray(pos)), torch.tensor(ids),
        ).numpy()
    out, _ = consisid_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(ids),
        jnp.asarray(t), cfg,
        video_rope=cm.rope_frequencies(pos, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


def test_consisid_base_matches_cogvideox_torch():
    """convert_consisid on CogVideoX-named weights + zero ID gates must
    reproduce the torch CogVideoX forward exactly (ConsisID == CogVideoX
    when identity injection is off)."""
    import dataclasses

    from compactfusion_tpu.models.consisid import consisid_tiny, consisid_forward
    from compactfusion_tpu.models.cogvideox import video_positions

    torch.manual_seed(18)
    ref = torch_ref.CogVideoXRef(
        dim=64, depth=2, heads=4, patch=2, in_channels=16, text_dim=32,
        time_embed_dim=32, axes_dim=(8, 4, 4),
    ).eval()
    cfg = dataclasses.replace(consisid_tiny(), dtype=jnp.float32)
    params = hf.convert_consisid(_state(ref), cfg)

    rng = np.random.default_rng(19)
    f, hp, wp = 2, 4, 4
    vid = rng.standard_normal((2, f * hp * wp, 4 * 16)).astype(np.float32)
    txt = rng.standard_normal((2, 6, 32)).astype(np.float32)
    t = np.array([77.0, 333.0], np.float32)
    pos = video_positions(f, hp, wp)
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(vid), torch.tensor(txt), torch.tensor(t),
            torch.tensor(np.asarray(pos)),
        ).numpy()
    ids = jnp.asarray(
        rng.standard_normal((2, 5, cfg.id_dim)), jnp.float32
    )  # nonzero id states: zero gates must null them out
    out, _ = consisid_forward(
        params, jnp.asarray(vid), jnp.asarray(txt), ids, jnp.asarray(t), cfg,
        video_rope=cm.rope_frequencies(pos, cfg.axes_dim),
    )
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)


# ---------------------------------------------------------------------------
# AutoencoderKL decoder
# ---------------------------------------------------------------------------


def test_vae_decoder_matches_torch():
    from compactfusion_tpu.models.vae import VAEConfig, vae_decode

    torch.manual_seed(6)
    ref = torch_ref.VAEDecoderRef(
        latent_channels=4, out_channels=3, block_out_channels=(8, 16),
        layers_per_block=1, groups=4,
    ).eval()
    cfg = VAEConfig(
        block_out_channels=(8, 16), norm_num_groups=4, layers_per_block=1,
        scaling_factor=1.0, dtype=jnp.float32,
    )
    params = hf.convert_vae_decoder(_state(ref), cfg)

    rng = np.random.default_rng(7)
    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(z)).numpy()  # (B, 3, H, W)

    out = vae_decode(params, jnp.asarray(z).transpose(0, 2, 3, 1), cfg)
    assert rel_err(np.transpose(np.asarray(out), (0, 3, 1, 2)), out_ref) < 2e-4


# ---------------------------------------------------------------------------
# AutoencoderKLCogVideoX decoder (causal 3D video VAE)
# ---------------------------------------------------------------------------


def test_hv_vae3d_decoder_matches_torch():
    from compactfusion_tpu.models.vae3d import (
        VAE3DConfig,
        hv_vae3d_decode,
    )

    torch.manual_seed(22)
    ref = torch_ref.HunyuanVideoVAEDecoderRef(
        latent_channels=4, out_channels=3, block_out_channels=(8, 16),
        layers_per_block=1, groups=4, temporal_compress_levels=1,
    ).eval()
    cfg = VAE3DConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, temporal_compress_levels=1, scaling_factor=1.0,
        dtype=jnp.float32,
    )
    params = hf.convert_hv_vae3d_decoder(_state(ref), cfg)

    rng = np.random.default_rng(23)
    z = rng.standard_normal((1, 4, 3, 6, 6)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(z)).numpy()  # (B, 3, T, H, W)
    out = hv_vae3d_decode(params, jnp.asarray(z).transpose(0, 2, 3, 4, 1), cfg)
    got = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    assert got.shape == out_ref.shape
    assert rel_err(got, out_ref) < 2e-4, rel_err(got, out_ref)


def test_vae3d_decoder_matches_torch():
    from compactfusion_tpu.models.vae3d import VAE3DConfig, vae3d_decode

    torch.manual_seed(8)
    ref = torch_ref.CogVideoXVAEDecoderRef(
        latent_channels=4, out_channels=3, block_out_channels=(8, 16),
        layers_per_block=1, groups=4, temporal_compress_levels=1,
    ).eval()
    cfg = VAE3DConfig(
        latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
        norm_num_groups=4, temporal_compress_levels=1, scaling_factor=1.0,
        dtype=jnp.float32,
    )
    params = hf.convert_vae3d_decoder(_state(ref), cfg)

    rng = np.random.default_rng(9)
    # odd latent frame count, the CogVideoX rule: T_out = (3-1)*2 + 1 = 5
    z = rng.standard_normal((1, 4, 3, 6, 6)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(z)).numpy()  # (B, 3, T, H, W)
    assert out_ref.shape == (1, 3, 5, 12, 12)

    out = vae3d_decode(
        params, jnp.asarray(z).transpose(0, 2, 3, 4, 1), cfg
    )  # (B, T, H, W, 3)
    assert out.shape == (1, 5, 12, 12, 3)
    got = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    assert rel_err(got, out_ref) < 2e-4, rel_err(got, out_ref)


def test_local_facial_extractor_matches_torch():
    """ConsisID face encoder (id_cond + 5 ViT hiddens -> identity tokens)."""
    import dataclasses

    from compactfusion_tpu.models.face import lfe_tiny, lfe_forward

    torch.manual_seed(31)
    tcfg = lfe_tiny()
    ref = torch_ref.LocalFacialExtractorRef(
        id_dim=tcfg.id_dim, vit_dim=tcfg.vit_dim, depth=tcfg.depth,
        dim_head=tcfg.dim_head, heads=tcfg.heads,
        num_id_token=tcfg.num_id_token, num_queries=tcfg.num_queries,
        output_dim=tcfg.output_dim, ff_mult=tcfg.ff_mult,
        num_scale=tcfg.num_scale,
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = hf.convert_local_facial_extractor(state, tcfg, prefix="")

    rng = np.random.default_rng(32)
    id_cond = rng.standard_normal((2, tcfg.id_dim)).astype(np.float32)
    vits = [
        rng.standard_normal((2, 7, tcfg.vit_dim)).astype(np.float32)
        for _ in range(tcfg.num_scale)
    ]
    with torch.no_grad():
        out_ref = ref(
            torch.tensor(id_cond), [torch.tensor(v) for v in vits]
        ).numpy()
    out = lfe_forward(params, jnp.asarray(id_cond), [jnp.asarray(v) for v in vits], tcfg)
    assert out.shape == (2, tcfg.num_queries, tcfg.output_dim)
    assert rel_err(out, out_ref) < 2e-4, rel_err(out, out_ref)
