"""Prompt encoding: tokenizer + text-encoder bundles per model family.

The reference encodes prompts with transformers models inside each diffusers
pipeline (``pipeline_flux.py:246-259`` — CLIP pooled + T5 sequence states;
SD3 adds CLIP-G; PixArt/CogVideoX use T5 alone).  Here the prompt path is an
explicit object so pipelines stay pure latent-space functions:

    PromptEncoder.from_pretrained(root)   # diffusers-layout checkpoint dir
    PromptEncoder.random(key, ...)        # no checkpoint: byte-level
                                          # tokenizers + seeded random
                                          # encoder weights (REAL string ->
                                          # tokens -> embeddings path, just
                                          # untrained)

Encoding runs replicated outside the denoise scan, exactly like the
reference (prompts are tiny next to the backbone).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.io.tokenizers import (
    ClipBPETokenizer,
    UnigramTokenizer,
    load_clip_tokenizer,
    load_t5_tokenizer,
)
from compactfusion_tpu.models.text_encoders import (
    CLIPTextConfig,
    T5Config,
    clip_encode,
    init_clip,
    init_t5,
    t5_encode,
)


# ---------------------------------------------------------------------------
# built-in byte-level tokenizers (checkpoint-free path)
# ---------------------------------------------------------------------------


def byte_unigram_tokenizer() -> UnigramTokenizer:
    """Char-level unigram over printable ASCII: full coverage, no files.

    Vocabulary: <pad>=0, </s>=1, <unk>=2, then "▁" and printable ASCII.
    """
    pieces: List[Tuple[str, float]] = [
        ("<pad>", 0.0),
        ("</s>", 0.0),
        ("<unk>", 0.0),
        ("▁", -1.0),
    ]
    for code in range(33, 127):
        pieces.append((chr(code), -2.0))
    return UnigramTokenizer(pieces, unk_id=2, eos_id=1, pad_id=0,
                            control_ids={0, 1})


def byte_clip_tokenizer(max_len: int = 77) -> ClipBPETokenizer:
    """Char-level CLIP vocab (every byte symbol +/- </w>), no merges."""
    from compactfusion_tpu.io.tokenizers import _bytes_to_unicode

    symbols = list(_bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    for s in symbols:
        vocab[s + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return ClipBPETokenizer(vocab, [], model_max_length=max_len)


# ---------------------------------------------------------------------------
# the bundle
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class _T5Bundle:
    tokenizer: UnigramTokenizer
    params: Any
    cfg: T5Config


@dataclasses.dataclass
class _CLIPBundle:
    tokenizer: ClipBPETokenizer
    params: Any
    cfg: CLIPTextConfig


class PromptEncoder:
    """T5 and/or CLIP encoders with family-specific assembly methods.

    ``t5`` handles PixArt / CogVideoX / Latte / HunyuanDiT(-style) /
    Step-Video prompts; FLUX adds a CLIP-L pooled vector; SD3 uses
    CLIP-L + CLIP-G (+ optionally T5).
    """

    def __init__(
        self,
        t5: Optional[_T5Bundle] = None,
        clip_l: Optional[_CLIPBundle] = None,
        clip_g: Optional[_CLIPBundle] = None,
    ):
        self.t5 = t5
        self.clip_l = clip_l
        self.clip_g = clip_g
        self._jit_t5 = None
        self._jit_clip = {}

    # -- constructors -------------------------------------------------------

    @classmethod
    def random(
        cls,
        key: jax.Array,
        text_dim: int = 4096,
        pooled_dim: Optional[int] = None,
        clip_g_dim: Optional[int] = None,
        depth: int = 2,
    ) -> "PromptEncoder":
        """Byte-level tokenizers + seeded random encoder weights.

        The string -> tokens -> embeddings path is the real one (same
        encoders, same shapes); only the weights are untrained.  Used when
        no checkpoint directory is supplied, so every pipeline stays
        runnable end to end without downloads.
        """
        ks = jax.random.split(key, 3)
        t5_tok = byte_unigram_tokenizer()
        t5_cfg = T5Config(
            vocab_size=128,
            d_model=text_dim,
            d_kv=64,
            d_ff=2 * text_dim,
            num_layers=depth,
            num_heads=max(1, text_dim // 512),
            dtype=jnp.bfloat16,
        )
        t5 = _T5Bundle(t5_tok, init_t5(ks[0], t5_cfg), t5_cfg)
        clip_l = clip_g = None
        if pooled_dim is not None:
            c_cfg = CLIPTextConfig(
                vocab_size=byte_clip_tokenizer().encoder.__len__(),
                d_model=pooled_dim,
                num_layers=depth,
                num_heads=max(1, pooled_dim // 64),
                dtype=jnp.bfloat16,
            )
            clip_l = _CLIPBundle(
                byte_clip_tokenizer(), init_clip(ks[1], c_cfg), c_cfg
            )
        if clip_g_dim is not None:
            g_cfg = CLIPTextConfig(
                vocab_size=byte_clip_tokenizer().encoder.__len__(),
                d_model=clip_g_dim,
                num_layers=depth,
                num_heads=max(1, clip_g_dim // 64),
                hidden_act="gelu",
                projection_dim=clip_g_dim,
                dtype=jnp.bfloat16,
            )
            clip_g = _CLIPBundle(
                byte_clip_tokenizer(), init_clip(ks[2], g_cfg), g_cfg
            )
        return cls(t5, clip_l, clip_g)

    @classmethod
    def from_pretrained(
        cls,
        root: str,
        t5_cfg: Optional[T5Config] = None,
        clip_l_cfg: Optional[CLIPTextConfig] = None,
        clip_g_cfg: Optional[CLIPTextConfig] = None,
    ) -> "PromptEncoder":
        """Load from a diffusers-layout checkpoint directory.

        Expects the HF subdir convention the reference relies on
        (``base_pipeline.py`` loads the same dirs via from_pretrained):
        ``tokenizer/ text_encoder/`` (+ ``tokenizer_2/ text_encoder_2/``
        for CLIP-G, ``tokenizer_3/...`` or T5 under the primary slots
        depending on family — pass the configs for the slots present).
        """
        from compactfusion_tpu.io import hf

        t5 = clip_l = clip_g = None

        def _slot(i: int) -> Tuple[str, str]:
            sfx = "" if i == 1 else f"_{i}"
            return (
                os.path.join(root, f"tokenizer{sfx}"),
                os.path.join(root, f"text_encoder{sfx}"),
            )

        # probe each tokenizer slot and classify by vocab files present
        slots = [(_slot(i)) for i in (1, 2, 3)]
        clip_cfgs = [c for c in (clip_l_cfg, clip_g_cfg) if c is not None]
        for tok_dir, enc_dir in slots:
            if not os.path.isdir(tok_dir):
                continue
            if os.path.exists(os.path.join(tok_dir, "spiece.model")):
                cfg = t5_cfg or T5Config()
                state = hf.load_safetensors(enc_dir)
                t5 = _T5Bundle(
                    load_t5_tokenizer(tok_dir), hf.convert_t5(state, cfg), cfg
                )
            elif os.path.exists(os.path.join(tok_dir, "vocab.json")):
                cfg = clip_cfgs.pop(0) if clip_cfgs else CLIPTextConfig()
                state = hf.load_safetensors(enc_dir)
                bundle = _CLIPBundle(
                    load_clip_tokenizer(tok_dir),
                    hf.convert_clip(state, cfg),
                    cfg,
                )
                if clip_l is None:
                    clip_l = bundle
                else:
                    clip_g = bundle
        return cls(t5, clip_l, clip_g)

    # -- primitive encodes --------------------------------------------------

    def encode_t5(
        self, prompts: Sequence[str], max_length: int
    ) -> Tuple[jax.Array, jax.Array]:
        """(B, S, d_model) float32 states + (B, S) bool mask."""
        assert self.t5 is not None, "no T5 encoder in this bundle"
        ids, mask = self.t5.tokenizer(list(prompts), max_length=max_length)
        if self._jit_t5 is None:
            cfg = self.t5.cfg
            self._jit_t5 = jax.jit(
                lambda p, i, m: t5_encode(p, i, cfg, mask=m).astype(
                    jnp.float32
                )
            )
        out = self._jit_t5(self.t5.params, jnp.asarray(ids), jnp.asarray(mask))
        return out, jnp.asarray(mask)

    def _encode_clip(self, which: str, prompts: Sequence[str]):
        bundle = getattr(self, which)
        assert bundle is not None, f"no {which} encoder in this bundle"
        ids = bundle.tokenizer(list(prompts))
        if which not in self._jit_clip:
            cfg = bundle.cfg
            self._jit_clip[which] = jax.jit(
                lambda p, i: tuple(
                    x.astype(jnp.float32) for x in clip_encode(p, i, cfg)
                )
            )
        return self._jit_clip[which](bundle.params, jnp.asarray(ids))

    # -- family assemblies ---------------------------------------------------

    def encode_for_pixart(
        self,
        prompts: Sequence[str],
        negative: Optional[Sequence[str]] = None,
        max_length: int = 120,
    ) -> Tuple[jax.Array, jax.Array]:
        """(2, B, S, D) cond/uncond states + (2, B, S) mask."""
        negative = list(negative or [""] * len(prompts))
        cond, m_c = self.encode_t5(prompts, max_length)
        un, m_u = self.encode_t5(negative, max_length)
        return jnp.stack([cond, un]), jnp.stack([m_c, m_u])

    # T5-only video/DiT families share the PixArt shape
    encode_for_hunyuandit = encode_for_pixart

    def encode_for_video(
        self,
        prompts: Sequence[str],
        negative: Optional[Sequence[str]] = None,
        max_length: int = 226,
    ) -> jax.Array:
        """(2, B, S, D) cond/uncond states (CogVideoX/Latte convention:
        padded fixed length, no mask)."""
        txt, _ = self.encode_for_pixart(prompts, negative, max_length)
        return txt

    def encode_for_flux(
        self, prompts: Sequence[str], max_length: int = 512
    ) -> Tuple[jax.Array, jax.Array]:
        """T5 sequence states (B, S, D) + CLIP-L pooled (B, P).

        Reference ``pipeline_flux.py:246-259``: prompt_embeds from T5,
        pooled_prompt_embeds from CLIP's pooler (no projection).
        """
        txt, _ = self.encode_t5(prompts, max_length)
        _, pooled = self._encode_clip("clip_l", prompts)
        return txt, pooled

    def encode_for_sd3(
        self,
        prompts: Sequence[str],
        negative: Optional[Sequence[str]] = None,
        max_length: int = 256,
    ) -> Tuple[jax.Array, jax.Array]:
        """SD3 assembly: clip-l ++ clip-g hidden (channel concat, zero-pad
        to the T5 width) then T5 states appended along sequence; pooled =
        channel-concat of the two projected pooled vectors.

        Returns ((2, B, S, D) states, (2, B, P) pooled).
        """
        negative = list(negative or [""] * len(prompts))

        def one(batch):
            h_l, p_l = self._encode_clip("clip_l", batch)
            h_g, p_g = self._encode_clip("clip_g", batch)
            clip_h = jnp.concatenate([h_l, h_g], axis=-1)
            pooled = jnp.concatenate([p_l, p_g], axis=-1)
            if self.t5 is not None:
                t5_h, _ = self.encode_t5(batch, max_length)
                clip_h = jnp.pad(
                    clip_h,
                    ((0, 0), (0, 0), (0, t5_h.shape[-1] - clip_h.shape[-1])),
                )
                states = jnp.concatenate([clip_h, t5_h], axis=1)
            else:
                states = clip_h
            return states, pooled

        s_c, p_c = one(list(prompts))
        s_u, p_u = one(negative)
        return jnp.stack([s_c, s_u]), jnp.stack([p_c, p_u])
