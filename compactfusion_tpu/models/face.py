"""ConsisID face encoder (``local_facial_extractor``).

TPU-native re-implementation of the perceiver resampler that the diffusers
``ConsisIDTransformer3DModel`` runs over the face features before the denoise
loop (reference wraps it via
``xfuser/model_executor/models/transformers/consisid_transformer_3d.py:60-68``:
``id_cond``/``id_vit_hidden`` are consumed by ``local_facial_extractor`` into
the identity tokens fed to the per-block perceiver cross-attention of
``models/consisid.py``).

Inputs:
  * ``id_cond`` (B, id_dim=1280) — the ArcFace global embedding concatenated
    with the CLIP-visual class embedding, produced by upstream preprocessing.
  * ``id_vit_hidden`` — ``num_scale`` (=5) intermediate CLIP-ViT hidden-state
    maps, each (B, S_vit, vit_dim=1024).

Output: (B, num_queries=32, output_dim=2048) identity tokens (``id_states``).

Architecture (diffusers ``LocalFacialExtractor``): learned latent queries are
concatenated with ``num_id_token`` tokens mapped from ``id_cond``; for each of
the 5 ViT scales, the mapped ViT features (+ the id tokens) form the
perceiver-attention context and ``depth/num_scale`` (attn, ffn) layers update
the latents.  Perceiver attention concatenates the latents into K/V and
scales q and k each by ``dim_head**-0.25`` before the fp32 softmax.

This runs ONCE per generation outside the denoise scan (like the text
encoders), so it is written as a plain loop over the 10 small layers rather
than a ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from compactfusion_tpu.models import common as cm


@dataclasses.dataclass(frozen=True)
class LFEConfig:
    id_dim: int = 1280
    vit_dim: int = 1024
    depth: int = 10
    dim_head: int = 64
    heads: int = 16
    num_id_token: int = 5
    num_queries: int = 32
    output_dim: int = 2048
    ff_mult: int = 4
    num_scale: int = 5
    dtype: Any = jnp.float32

    @property
    def inner_dim(self):
        return self.dim_head * self.heads

    @property
    def depth_per_scale(self):
        assert self.depth % self.num_scale == 0
        return self.depth // self.num_scale


def lfe_consisid() -> LFEConfig:
    """The published ConsisID-preview face encoder."""
    return LFEConfig()


def lfe_tiny() -> LFEConfig:
    return LFEConfig(
        id_dim=24, vit_dim=16, depth=10, dim_head=4, heads=4,
        num_id_token=3, num_queries=6, output_dim=20, ff_mult=2,
    )


def _init_mlp3(ks, d_in, d_mid, d_out, dt):
    """Linear -> LN -> LeakyReLU -> Linear -> LN -> LeakyReLU -> Linear."""
    return {
        "fc1": cm.init_linear(ks[0], d_in, d_mid, dtype=dt),
        "ln1": cm.init_layernorm(d_mid, dtype=dt),
        "fc2": cm.init_linear(ks[1], d_mid, d_mid, dtype=dt),
        "ln2": cm.init_layernorm(d_mid, dtype=dt),
        "fc3": cm.init_linear(ks[2], d_mid, d_out, dtype=dt),
    }


def _mlp3(p, x):
    x = _leaky(cm.layernorm(p["ln1"], cm.linear(p["fc1"], x), eps=1e-5))
    x = _leaky(cm.layernorm(p["ln2"], cm.linear(p["fc2"], x), eps=1e-5))
    return cm.linear(p["fc3"], x)


def _leaky(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)


def init_lfe(key, cfg: LFEConfig):
    dt = cfg.dtype
    v, inner = cfg.vit_dim, cfg.inner_dim
    ks = jax.random.split(key, 4 + cfg.depth + cfg.num_scale)
    scale = v**-0.5
    layers = []
    for i in range(cfg.depth):
        lk = jax.random.split(ks[4 + i], 5)
        layers.append(
            {
                "attn": {
                    "norm1": cm.init_layernorm(v, dtype=dt),
                    "norm2": cm.init_layernorm(v, dtype=dt),
                    "q": cm.init_linear(lk[0], v, inner, bias=False, dtype=dt),
                    "kv": cm.init_linear(lk[1], v, 2 * inner, bias=False, dtype=dt),
                    "out": cm.init_linear(lk[2], inner, v, bias=False, dtype=dt),
                },
                "ffn": {
                    "ln": cm.init_layernorm(v, dtype=dt),
                    "fc1": cm.init_linear(lk[3], v, cfg.ff_mult * v, bias=False, dtype=dt),
                    "fc2": cm.init_linear(lk[4], cfg.ff_mult * v, v, bias=False, dtype=dt),
                },
            }
        )
    mappings = [
        _init_mlp3(jax.random.split(ks[4 + cfg.depth + i], 3), v, v, v, dt)
        for i in range(cfg.num_scale)
    ]
    return {
        "latents": scale * jax.random.normal(ks[0], (1, cfg.num_queries, v), dt),
        "proj_out": scale * jax.random.normal(ks[1], (v, cfg.output_dim), dt),
        "id_mapping": _init_mlp3(
            jax.random.split(ks[2], 3),
            cfg.id_dim,
            v,
            v * cfg.num_id_token,
            dt,
        ),
        "mappings": mappings,
        "layers": layers,
    }


def _perceiver_attn(p, ctx, latents, cfg: LFEConfig):
    """Perceiver attention: latents query [ctx ; latents]; q,k each scaled by
    dim_head**-0.25, softmax in fp32 (diffusers ``PerceiverAttention``)."""
    b, s, _ = latents.shape
    h, dh = cfg.heads, cfg.dim_head
    x = cm.layernorm(p["norm1"], ctx, eps=1e-5)
    lat = cm.layernorm(p["norm2"], latents, eps=1e-5)
    q = cm.linear(p["q"], lat).reshape(b, s, h, dh)
    kv = cm.linear(p["kv"], jnp.concatenate([x, lat], axis=1))
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, -1, h, dh)
    v = v.reshape(b, -1, h, dh)
    scale = dh**-0.25
    w = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, h * dh)
    return cm.linear(p["out"], o)


def _lfe_ffn(p, x):
    xn = cm.layernorm(p["ln"], x, eps=1e-5)
    return cm.linear(p["fc2"], jax.nn.gelu(cm.linear(p["fc1"], xn), approximate=False))


def lfe_forward(
    params, id_cond: jax.Array, id_vit_hidden: Sequence[jax.Array], cfg: LFEConfig
) -> jax.Array:
    """(B, id_dim) + num_scale x (B, S_vit, vit_dim) -> (B, nq, output_dim)."""
    assert len(id_vit_hidden) == cfg.num_scale
    b = id_cond.shape[0]
    lat = jnp.broadcast_to(
        params["latents"], (b,) + params["latents"].shape[1:]
    )
    id_tok = _mlp3(params["id_mapping"], id_cond).reshape(
        b, cfg.num_id_token, cfg.vit_dim
    )
    lat = jnp.concatenate([lat, id_tok], axis=1)
    dps = cfg.depth_per_scale
    for i in range(cfg.num_scale):
        vit = _mlp3(params["mappings"][i], id_vit_hidden[i])
        ctx = jnp.concatenate([id_tok, vit], axis=1)
        for layer in params["layers"][i * dps : (i + 1) * dps]:
            lat = _perceiver_attn(layer["attn"], ctx, lat, cfg) + lat
            lat = _lfe_ffn(layer["ffn"], lat) + lat
    lat = lat[:, : cfg.num_queries]
    return lat @ params["proj_out"]


# ---------------------------------------------------------------------------
# Offline image -> face-feature stand-in (reference --img_file_path path)
# ---------------------------------------------------------------------------
# The reference derives ``id_cond`` from an ArcFace embedding and
# ``id_vit_hidden`` from intermediate CLIP-ViT hidden states of the face crop
# (``consisid/face_utils.process_face_embeddings``, which needs downloaded
# insightface + CLIP weights).  Neither model is available in this
# zero-egress environment, so these helpers produce DETERMINISTIC,
# image-dependent features of the right shapes from patch statistics +
# seeded random projections: distinct faces give distinct identity tokens
# and the full --img_file_path -> id_states -> gated-cross-attention path is
# exercisable end-to-end.  Swap in real ArcFace/CLIP features by calling
# ``lfe_forward`` directly when those embeddings are available.


def _load_image(path: str, size: int = 224) -> "np.ndarray":
    import numpy as np
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size))
    return np.asarray(img, np.float32) / 127.5 - 1.0  # (S, S, 3)


def _seeded_proj(d_in: int, d_out: int, seed: int) -> "np.ndarray":
    import numpy as np

    rng = np.random.default_rng(seed)
    # generate float32 DIRECTLY: the float64 default doubles a matrix that
    # can reach GBs (e.g. full-image projections) before the astype copy
    return rng.standard_normal((d_in, d_out), dtype=np.float32) / np.sqrt(
        np.float32(d_in)
    )


def image_face_features(path: str, cfg: LFEConfig):
    """Image file -> (id_cond (1, id_dim), [id_vit_hidden x num_scale]).

    Stand-in for ArcFace + CLIP-ViT preprocessing (see module note): one
    24x24 patch grid (the CLIP ViT-L/14@336 geometry) per scale, each scale
    using a DIFFERENT fixed seeded projection to ``vit_dim`` (same grid —
    no actual multi-resolution content; the perceiver only needs
    deterministic, image-dependent features at the right shapes); a global
    projection of a downsampled image gives ``id_cond``.
    """
    img = _load_image(path)
    s = img.shape[0]
    # project from a DOWNSAMPLED image: a full 224*224*3-input projection
    # matrix is ~1.5 GB for id_dim=1280 and >10 GB for id_states shapes
    small = _load_image(path, size=32)
    id_cond = jnp.asarray(
        small.reshape(1, -1) @ _seeded_proj(32 * 32 * 3, cfg.id_dim, seed=101)
    )
    hidden = []
    for i in range(cfg.num_scale):
        grid = 24  # CLIP ViT-L/14@336 token grid (577 incl. CLS; we use 576)
        p = s // grid
        patches = (
            img[: grid * p, : grid * p]
            .reshape(grid, p, grid, p, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(grid * grid, p * p * 3)
        )
        hidden.append(
            jnp.asarray(
                patches @ _seeded_proj(p * p * 3, cfg.vit_dim, seed=200 + i)
            )[None]
        )
    return id_cond, hidden


def image_to_id_states(path: str, id_tokens: int, id_dim: int) -> jax.Array:
    """Image file -> (1, id_tokens, id_dim) identity tokens directly, for
    pipelines built without face-encoder weights (random-init runs).

    Projects a DOWNSAMPLED (32x32) image: the full-resolution projection
    matrix would be (150528, id_tokens*id_dim) ~ 6+ GB."""
    small = _load_image(path, size=32)
    flat = small.reshape(1, -1)
    out = flat @ _seeded_proj(32 * 32 * 3, id_tokens * id_dim, seed=303)
    return jnp.asarray(out.reshape(1, id_tokens, id_dim))
