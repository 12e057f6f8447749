"""Independent PyTorch reference models for ground-truth backbone parity.

diffusers is NOT installed in this environment (zero egress), so these are
faithful re-implementations of the diffusers module math and state-dict
naming — ``PixArtTransformer2DModel``, ``FluxTransformer2DModel``,
``SD3Transformer2DModel``, ``AutoencoderKL`` (decoder) — written directly
from the upstream architecture definitions.  They serve the role the
reference repo gets from diffusers itself (all model math is delegated
there, SURVEY.md §2.4): an ORACLE that the JAX models + safetensors
converters must match numerically.

State-dict keys match the real checkpoints, so ``io/hf.py`` converters
consume ``ref.state_dict()`` unchanged.  Everything runs fp32/eval.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# shared embedding layers (diffusers.models.embeddings)
# ---------------------------------------------------------------------------


def timesteps_proj(t: torch.Tensor, dim: int = 256,
                   flip_sin_to_cos: bool = True,
                   downscale_freq_shift: float = 0.0) -> torch.Tensor:
    """diffusers ``Timesteps`` / get_timestep_embedding."""
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2 (diffusers TimestepEmbedding)."""

    def __init__(self, in_dim: int, dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class PixArtAlphaTextProjection(nn.Module):
    """linear_1 -> act -> linear_2 (act: gelu_tanh or silu)."""

    def __init__(self, in_dim: int, dim: int, act: str = "gelu_tanh",
                 hidden: Optional[int] = None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden or dim)
        self.linear_2 = nn.Linear(hidden or dim, dim)
        self.act = act

    def forward(self, x):
        h = self.linear_1(x)
        h = F.gelu(h, approximate="tanh") if self.act == "gelu_tanh" else F.silu(h)
        return self.linear_2(h)


def get_2d_sincos_pos_embed(
    dim: int,
    grid_h: int,
    grid_w: int,
    base_size: Optional[int] = None,
    interpolation_scale: float = 1.0,
) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed: NOTE the first half of the channel
    dim embeds the COLUMN (w) coordinate (grid[0] of meshgrid(w, h))."""
    ys = np.arange(grid_h, dtype=np.float64)
    xs = np.arange(grid_w, dtype=np.float64)
    if base_size is not None:
        ys = ys / (grid_h / base_size) / interpolation_scale
        xs = xs / (grid_w / base_size) / interpolation_scale
    gx, gy = np.meshgrid(xs, ys)  # each (H, W)

    def embed_1d(pos, d):
        omega = np.arange(d // 2, dtype=np.float64) / (d / 2.0)
        omega = 1.0 / 10000.0**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate(
        [embed_1d(gx, dim // 2), embed_1d(gy, dim // 2)], axis=1
    ).astype(np.float32)


class PatchEmbed(nn.Module):
    """diffusers PatchEmbed: conv proj + flatten + sincos pos table, with
    optional max-size center-cropping (SD3) or interpolation (PixArt)."""

    def __init__(
        self,
        height: int,
        width: int,
        patch: int,
        in_channels: int,
        dim: int,
        interpolation_scale: float = 1.0,
        pos_embed_max_size: Optional[int] = None,
    ):
        super().__init__()
        self.patch = patch
        self.proj = nn.Conv2d(in_channels, dim, patch, stride=patch)
        self.base_size = height // patch
        self.interpolation_scale = interpolation_scale
        self.pos_embed_max_size = pos_embed_max_size
        grid = pos_embed_max_size or (height // patch)
        pe = get_2d_sincos_pos_embed(
            dim, grid, grid, base_size=self.base_size,
            interpolation_scale=interpolation_scale,
        )
        self.register_buffer(
            "pos_embed_table",
            torch.from_numpy(pe).reshape(grid, grid, dim),
            persistent=False,
        )

    def forward(self, x):  # (B, C, H, W)
        hp, wp = x.shape[-2] // self.patch, x.shape[-1] // self.patch
        x = self.proj(x).flatten(2).transpose(1, 2)  # (B, S, dim) raster
        if self.pos_embed_max_size is not None:
            top = (self.pos_embed_max_size - hp) // 2
            left = (self.pos_embed_max_size - wp) // 2
            pe = self.pos_embed_table[top : top + hp, left : left + wp]
        else:
            pe = self.pos_embed_table[:hp, :wp]
        return x + pe.reshape(1, hp * wp, -1)


class FeedForward(nn.Module):
    """diffusers FeedForward(activation_fn='gelu-approximate')."""

    def __init__(self, dim: int, mult: int = 4, bias: bool = True):
        super().__init__()

        class GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, mult * dim, bias=bias)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList(
            [GELUProj(), nn.Identity(), nn.Linear(mult * dim, dim, bias=bias)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class RMSNorm(nn.Module):
    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        x32 = x.float()
        y = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


class AdaLayerNormZero(nn.Module):
    """linear(silu(emb)) chunk 6 -> (normed x, gate, shift_mlp, scale_mlp, gate_mlp)."""

    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        sh, sc, g, sh_m, sc_m, g_m = self.linear(F.silu(emb)).chunk(6, dim=1)
        return (
            self.norm(x) * (1 + sc[:, None]) + sh[:, None],
            g, sh_m, sc_m, g_m,
        )


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 3 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        sh, sc, g = self.linear(F.silu(emb)).chunk(3, dim=1)
        return self.norm(x) * (1 + sc[:, None]) + sh[:, None], g


class AdaLayerNormContinuous(nn.Module):
    """linear(silu(cond)) chunk 2 -> SCALE first, then shift."""

    def __init__(self, dim: int, cond_dim: int):
        super().__init__()
        self.linear = nn.Linear(cond_dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        scale, shift = self.linear(F.silu(emb)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


def _sdpa(q, k, v):  # (B, H, S, D)
    return F.scaled_dot_product_attention(q, k, v)


# ---------------------------------------------------------------------------
# PixArt
# ---------------------------------------------------------------------------


class _PixArtAttention(nn.Module):
    def __init__(self, dim: int, heads: int, kv_dim: Optional[int] = None):
        super().__init__()
        self.heads = heads
        kv_dim = kv_dim or dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(kv_dim, dim)
        self.to_v = nn.Linear(kv_dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])

    def forward(self, x, context=None, mask=None):
        context = x if context is None else context
        b, s, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, d // h).transpose(1, 2)
        k = self.to_k(context).view(b, -1, h, d // h).transpose(1, 2)
        v = self.to_v(context).view(b, -1, h, d // h).transpose(1, 2)
        if mask is not None:
            bias = torch.where(
                mask[:, None, None, :], 0.0, torch.finfo(torch.float32).min
            )
            o = F.scaled_dot_product_attention(q, k, v, attn_mask=bias)
        else:
            o = _sdpa(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class _PixArtBlock(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn1 = _PixArtAttention(dim, heads)
        self.attn2 = _PixArtAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)

    def forward(self, x, text, t6, text_mask=None):
        b = x.shape[0]
        sh, sc, g, sh_m, sc_m, g_m = (
            self.scale_shift_table[None] + t6.reshape(b, 6, -1)
        ).chunk(6, dim=1)
        xn = self.norm1(x) * (1 + sc) + sh
        x = x + g * self.attn1(xn)
        x = x + self.attn2(x, context=text, mask=text_mask)
        xn = self.norm2(x) * (1 + sc_m) + sh_m
        return x + g_m * self.ff(xn)


class AdaLayerNormSingle(nn.Module):
    """diffusers AdaLayerNormSingle (no additional conditions)."""

    def __init__(self, dim: int):
        super().__init__()

        class Emb(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TimestepEmbedding(256, dim)

            def forward(self, t):
                return self.timestep_embedder(timesteps_proj(t))

        self.emb = Emb()
        self.linear = nn.Linear(dim, 6 * dim)

    def forward(self, t):
        emb = self.emb(t)
        return self.linear(F.silu(emb)), emb


class PixArtRef(nn.Module):
    """PixArtTransformer2DModel equivalent (token-space output)."""

    def __init__(self, dim=64, depth=2, heads=4, patch=2, in_channels=4,
                 out_channels=8, text_dim=32, sample_size=8,
                 interpolation_scale=1.0):
        super().__init__()
        self.patch = patch
        self.out_channels = out_channels
        self.pos_embed = PatchEmbed(
            sample_size, sample_size, patch, in_channels, dim,
            interpolation_scale=interpolation_scale,
        )
        self.adaln_single = AdaLayerNormSingle(dim)
        self.caption_projection = PixArtAlphaTextProjection(text_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [_PixArtBlock(dim, heads) for _ in range(depth)]
        )
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim) / dim**0.5)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = nn.Linear(dim, patch * patch * out_channels)

    def forward(self, latents, t, text, text_mask=None):
        """latents (B, C, H, W); t (B,); text (B, S, text_dim)."""
        x = self.pos_embed(latents)
        t6, emb = self.adaln_single(t)
        text = self.caption_projection(text)
        for blk in self.transformer_blocks:
            x = blk(x, text, t6, text_mask)
        shift, scale = (
            self.scale_shift_table[None] + emb[:, None]
        ).chunk(2, dim=1)
        x = self.norm_out(x) * (1 + scale) + shift
        return self.proj_out(x)  # (B, S, p*p*out_channels)


# ---------------------------------------------------------------------------
# Latte (alternating spatial / temporal PixArt-style blocks)
# ---------------------------------------------------------------------------


class _LatteTemporalBlock(nn.Module):
    """BasicTransformerBlock(ada_norm_single) WITHOUT cross attention."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.attn1 = _PixArtAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)

    def forward(self, x, t6):
        b = x.shape[0]
        sh, sc, g, sh_m, sc_m, g_m = (
            self.scale_shift_table[None] + t6.reshape(b, 6, -1)
        ).chunk(6, dim=1)
        xn = self.norm1(x) * (1 + sc) + sh
        x = x + g * self.attn1(xn)
        xn = self.norm2(x) * (1 + sc_m) + sh_m
        return x + g_m * self.ff(xn)


class LatteRef(nn.Module):
    """LatteTransformer3DModel equivalent (token-space in/out).

    Takes frame-major video tokens (B, F*S_sp, p*p*C); the temporal pos
    table is sin-first 1D sincos added before the first temporal block."""

    def __init__(self, dim=64, num_pairs=2, heads=4, patch=2, in_channels=4,
                 out_channels=8, text_dim=32, sample_size=8, max_frames=8):
        super().__init__()
        self.patch = patch
        self.pos_embed = PatchEmbed(
            sample_size, sample_size, patch, in_channels, dim
        )
        self.adaln_single = AdaLayerNormSingle(dim)
        self.caption_projection = PixArtAlphaTextProjection(text_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [_PixArtBlock(dim, heads) for _ in range(num_pairs)]
        )
        self.temporal_transformer_blocks = nn.ModuleList(
            [_LatteTemporalBlock(dim, heads) for _ in range(num_pairs)]
        )
        # 1D sincos (sin first), like diffusers get_1d_sincos_pos_embed
        omega = 1.0 / 10000.0 ** (
            np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        )
        ang = np.arange(max_frames)[:, None] * omega[None]
        tpe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
        self.register_buffer(
            "temp_pos_embed", torch.tensor(tpe, dtype=torch.float32),
            persistent=False,
        )
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim) / dim**0.5)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = nn.Linear(dim, patch * patch * out_channels)

    def forward(self, latents, t, text, frames):
        # latents (B, F, C, H, W)
        b, f = latents.shape[:2]
        x = self.pos_embed(latents.flatten(0, 1))  # (B*F, S_sp, D)
        s_sp = x.shape[1]
        t6, emb = self.adaln_single(t)
        text = self.caption_projection(text)
        d = x.shape[-1]
        for i, (sp, tb) in enumerate(
            zip(self.transformer_blocks, self.temporal_transformer_blocks)
        ):
            t6_s = t6.repeat_interleave(f, dim=0)
            text_s = text.repeat_interleave(f, dim=0)
            x = sp(x, text_s, t6_s)
            # to temporal: (B*F, S, D) -> (B*S, F, D)
            xt = x.view(b, f, s_sp, d).permute(0, 2, 1, 3).reshape(
                b * s_sp, f, d
            )
            if i == 0:
                xt = xt + self.temp_pos_embed[:f][None]
            t6_t = t6.repeat_interleave(s_sp, dim=0)
            xt = tb(xt, t6_t)
            x = xt.view(b, s_sp, f, d).permute(0, 2, 1, 3).reshape(
                b * f, s_sp, d
            )
        shift, scale = (
            self.scale_shift_table[None]
            + emb.repeat_interleave(f, dim=0)[:, None]
        ).chunk(2, dim=1)
        x = self.norm_out(x) * (1 + scale) + shift
        x = self.proj_out(x)
        return x.view(b, f * s_sp, -1)


# ---------------------------------------------------------------------------
# FLUX
# ---------------------------------------------------------------------------


def flux_rope(ids: torch.Tensor, axes_dim: Sequence[int], theta=10000.0):
    """(S, n_axes) -> (cos, sin) each (S, head_dim) with per-pair duplication
    (diffusers FluxPosEmbed semantics)."""
    cos_l, sin_l = [], []
    for i, d in enumerate(axes_dim):
        pos = ids[:, i].float()
        freqs = 1.0 / theta ** (
            torch.arange(0, d, 2, dtype=torch.float32) / d
        )
        ang = pos[:, None] * freqs[None]
        cos_l.append(torch.cos(ang).repeat_interleave(2, dim=1))
        sin_l.append(torch.sin(ang).repeat_interleave(2, dim=1))
    return torch.cat(cos_l, -1), torch.cat(sin_l, -1)


def apply_rope_torch(x, cos, sin):
    """x (B, H, S, D); interleaved-pair rotation (use_real_unbind_dim=-1)."""
    xr, xi = x.float().reshape(*x.shape[:-1], -1, 2).unbind(-1)
    rot = torch.stack([-xi, xr], dim=-1).flatten(-2)
    return (x.float() * cos + rot * sin).to(x.dtype)


class _FluxJointAttention(nn.Module):
    """Double-block attention: text stream projected via add_*_proj, concat
    order [text, image] (diffusers FluxAttnProcessor2_0)."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(hd)
        self.norm_k = RMSNorm(hd)
        self.norm_added_q = RMSNorm(hd)
        self.norm_added_k = RMSNorm(hd)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])
        self.to_add_out = nn.Linear(dim, dim)

    def forward(self, img, txt, rope):
        b, si, d = img.shape
        st = txt.shape[1]
        h = self.heads

        def split(x, proj):
            return proj(x).view(b, -1, h, d // h).transpose(1, 2)

        q = self.norm_q(split(img, self.to_q))
        k = self.norm_k(split(img, self.to_k))
        v = split(img, self.to_v)
        tq = self.norm_added_q(split(txt, self.add_q_proj))
        tk = self.norm_added_k(split(txt, self.add_k_proj))
        tv = split(txt, self.add_v_proj)
        q = torch.cat([tq, q], dim=2)
        k = torch.cat([tk, k], dim=2)
        v = torch.cat([tv, v], dim=2)
        cos, sin = rope
        q = apply_rope_torch(q, cos, sin)
        k = apply_rope_torch(k, cos, sin)
        o = _sdpa(q, k, v).transpose(1, 2).reshape(b, st + si, d)
        txt_o, img_o = o[:, :st], o[:, st:]
        return self.to_out[0](img_o), self.to_add_out(txt_o)


class _FluxSingleAttention(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(hd)
        self.norm_k = RMSNorm(hd)

    def forward(self, x, rope):
        b, s, d = x.shape
        h = self.heads
        q = self.norm_q(self.to_q(x).view(b, s, h, d // h).transpose(1, 2))
        k = self.norm_k(self.to_k(x).view(b, s, h, d // h).transpose(1, 2))
        v = self.to_v(x).view(b, s, h, d // h).transpose(1, 2)
        cos, sin = rope
        q = apply_rope_torch(q, cos, sin)
        k = apply_rope_torch(k, cos, sin)
        return _sdpa(q, k, v).transpose(1, 2).reshape(b, s, d)


class _FluxDoubleBlock(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = _FluxJointAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        self.ff_context = FeedForward(dim)

    def forward(self, img, txt, temb, rope):
        img_n, g, sh_m, sc_m, g_m = self.norm1(img, temb)
        txt_n, cg, csh_m, csc_m, cg_m = self.norm1_context(txt, temb)
        img_o, txt_o = self.attn(img_n, txt_n, rope)
        img = img + g[:, None] * img_o
        txt = txt + cg[:, None] * txt_o
        img_n = self.norm2(img) * (1 + sc_m[:, None]) + sh_m[:, None]
        img = img + g_m[:, None] * self.ff(img_n)
        txt_n = self.norm2_context(txt) * (1 + csc_m[:, None]) + csh_m[:, None]
        txt = txt + cg_m[:, None] * self.ff_context(txt_n)
        return img, txt


class _FluxSingleBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mult: int = 4):
        super().__init__()
        self.norm = AdaLayerNormZeroSingle(dim)
        self.proj_mlp = nn.Linear(dim, mult * dim)
        self.attn = _FluxSingleAttention(dim, heads)
        self.proj_out = nn.Linear(dim + mult * dim, dim)

    def forward(self, x, temb, rope):
        res = x
        xn, gate = self.norm(x, temb)
        mlp = F.gelu(self.proj_mlp(xn), approximate="tanh")
        attn = self.attn(xn, rope)
        return res + gate[:, None] * self.proj_out(torch.cat([attn, mlp], -1))


class FluxTimeTextEmbed(nn.Module):
    def __init__(self, dim: int, pooled_dim: int, guidance: bool):
        super().__init__()
        self.timestep_embedder = TimestepEmbedding(256, dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_dim, dim, "silu")
        if guidance:
            self.guidance_embedder = TimestepEmbedding(256, dim)

    def forward(self, t, guidance, pooled):
        emb = self.timestep_embedder(timesteps_proj(t))
        if guidance is not None:
            emb = emb + self.guidance_embedder(timesteps_proj(guidance))
        return emb + self.text_embedder(pooled)


class FluxRef(nn.Module):
    """FluxTransformer2DModel equivalent.  Takes PRE-SCALED timesteps
    (the diffusers model multiplies by 1000 internally; callers here pass
    the already-scaled value used by the JAX model)."""

    def __init__(self, dim=64, double_layers=2, single_layers=2, heads=4,
                 in_channels=16, text_dim=32, pooled_dim=16,
                 axes_dim=(4, 6, 6), guidance=True):
        super().__init__()
        self.axes_dim = axes_dim
        self.x_embedder = nn.Linear(in_channels, dim)
        self.context_embedder = nn.Linear(text_dim, dim)
        self.time_text_embed = FluxTimeTextEmbed(dim, pooled_dim, guidance)
        self.transformer_blocks = nn.ModuleList(
            [_FluxDoubleBlock(dim, heads) for _ in range(double_layers)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [_FluxSingleBlock(dim, heads) for _ in range(single_layers)]
        )
        self.norm_out = AdaLayerNormContinuous(dim, dim)
        self.proj_out = nn.Linear(dim, in_channels)

    def forward(self, img, txt, pooled, t, guidance, img_ids, txt_ids):
        img = self.x_embedder(img)
        txt = self.context_embedder(txt)
        temb = self.time_text_embed(t, guidance, pooled)
        ids = torch.cat([txt_ids, img_ids], dim=0)
        rope = flux_rope(ids, self.axes_dim)
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, rope)
        x = torch.cat([txt, img], dim=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, temb, rope)
        img = x[:, txt.shape[1] :]
        img = self.norm_out(img, temb)
        return self.proj_out(img)


# ---------------------------------------------------------------------------
# HunyuanVideo (FLUX-style blocks + token refiner, rope theta 256)
# ---------------------------------------------------------------------------


class _RefinerSelfAttention(nn.Module):
    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])

    def forward(self, x, mask):  # mask (B, 1, S, S) bool
        b, s, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, s, h, d // h).transpose(1, 2)
        k = self.to_k(x).view(b, s, h, d // h).transpose(1, 2)
        v = self.to_v(x).view(b, s, h, d // h).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        return self.to_out[0](o.transpose(1, 2).reshape(b, s, d))


class _RefinerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mult: int = 4):
        super().__init__()

        class FFLinearSilu(nn.Module):
            """FeedForward(activation_fn='linear-silu') naming."""

            def __init__(self):
                super().__init__()

                class Proj(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.proj = nn.Linear(dim, mult * dim)

                    def forward(self, x):
                        return F.silu(self.proj(x))

                self.net = nn.ModuleList(
                    [Proj(), nn.Identity(), nn.Linear(mult * dim, dim)]
                )

            def forward(self, x):
                for m in self.net:
                    x = m(x)
                return x

        class AdaNorm(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(dim, 2 * dim)

            def forward(self, temb):
                g = self.linear(F.silu(temb))
                ga, gf = g.chunk(2, dim=1)
                return ga[:, None], gf[:, None]

        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _RefinerSelfAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.ff = FFLinearSilu()
        self.norm_out = AdaNorm()

    def forward(self, x, temb, mask):
        ga, gf = self.norm_out(temb)
        x = x + ga * self.attn(self.norm1(x), mask)
        x = x + gf * self.ff(self.norm2(x))
        return x


class _TokenRefiner(nn.Module):
    def __init__(self, text_dim: int, dim: int, heads: int, layers: int):
        super().__init__()

        class TimeText(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TimestepEmbedding(256, dim)
                self.text_embedder = PixArtAlphaTextProjection(
                    text_dim, dim, "silu"
                )

            def forward(self, t, pooled):
                return self.timestep_embedder(
                    timesteps_proj(t)
                ) + self.text_embedder(pooled)

        class Inner(nn.Module):
            def __init__(self):
                super().__init__()
                self.refiner_blocks = nn.ModuleList(
                    [_RefinerBlock(dim, heads) for _ in range(layers)]
                )

        self.time_text_embed = TimeText()
        self.proj_in = nn.Linear(text_dim, dim)
        self.token_refiner = Inner()

    def forward(self, text, t, mask):  # text (B, S, text_dim); mask (B, S)
        m = mask.float()
        pooled = (text * m[..., None]).sum(1) / (
            m.sum(1, keepdim=True) + 1e-6
        )
        temb = self.time_text_embed(t, pooled)
        x = self.proj_in(text)
        attn_mask = (m[:, None, :, None] * m[:, None, None, :]).bool()
        attn_mask[:, :, :, 0] = True
        for blk in self.token_refiner.refiner_blocks:
            x = blk(x, temb, attn_mask)
        return x


class HunyuanVideoRef(nn.Module):
    """HunyuanVideoTransformer3DModel equivalent (token-space in/out)."""

    def __init__(self, dim=64, double_layers=2, single_layers=2, heads=4,
                 in_channels=16, text_dim=32, pooled_dim=16,
                 axes_dim=(8, 4, 4), refiner_layers=2, theta=256.0):
        super().__init__()
        self.axes_dim = axes_dim
        self.theta = theta

        class XEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                # Conv3d over (1, 2, 2) patches; tokens here arrive already
                # packed, so forward reshapes the patch vector back
                self.proj = nn.Conv3d(in_channels // 4, dim, (1, 2, 2),
                                      stride=(1, 2, 2))

            def forward(self, tokens):  # (B, S, p*p*c) raster (ph, pw, c)
                b, s, pc = tokens.shape
                c = in_channels // 4
                x = tokens.view(b * s, 2, 2, c).permute(0, 3, 1, 2)[
                    :, :, None
                ]  # (B*S, c, 1, 2, 2)
                y = self.proj(x).view(b, s, dim)
                return y

        self.x_embedder = XEmbed()
        self.context_embedder = _TokenRefiner(
            text_dim, dim, heads, refiner_layers
        )
        self.time_text_embed = FluxTimeTextEmbed(dim, pooled_dim, True)
        self.transformer_blocks = nn.ModuleList(
            [_FluxDoubleBlock(dim, heads) for _ in range(double_layers)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [_FluxSingleBlock(dim, heads) for _ in range(single_layers)]
        )
        self.norm_out = AdaLayerNormContinuous(dim, dim)
        self.proj_out = nn.Linear(dim, in_channels)

    def forward(self, video, text, pooled, t, guidance, vid_ids, txt_ids,
                text_mask):
        img = self.x_embedder(video)
        txt = self.context_embedder(text, t, text_mask)
        temb = self.time_text_embed(t, guidance, pooled)
        ids = torch.cat([txt_ids, vid_ids], dim=0)
        rope = flux_rope(ids, self.axes_dim, theta=self.theta)
        for blk in self.transformer_blocks:
            img, txt = blk(img, txt, temb, rope)
        x = torch.cat([txt, img], dim=1)
        for blk in self.single_transformer_blocks:
            x = blk(x, temb, rope)
        img = x[:, txt.shape[1]:]
        img = self.norm_out(img, temb)
        return self.proj_out(img)


# ---------------------------------------------------------------------------
# SD3
# ---------------------------------------------------------------------------


class _SD3JointAttention(nn.Module):
    """Joint attention, concat order [image, text]; context_pre_only drops
    the text out-projection (diffusers JointAttnProcessor2_0)."""

    def __init__(self, dim: int, heads: int, qk_norm: bool,
                 context_pre_only: bool):
        super().__init__()
        self.heads = heads
        self.context_pre_only = context_pre_only
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])
        if not context_pre_only:
            self.to_add_out = nn.Linear(dim, dim)
        if qk_norm:
            self.norm_q = RMSNorm(hd)
            self.norm_k = RMSNorm(hd)
            self.norm_added_q = RMSNorm(hd)
            self.norm_added_k = RMSNorm(hd)

    def forward(self, img, txt):
        b, si, d = img.shape
        st = txt.shape[1]
        h = self.heads

        def split(x, proj):
            return proj(x).view(b, -1, h, d // h).transpose(1, 2)

        q, k, v = split(img, self.to_q), split(img, self.to_k), split(img, self.to_v)
        tq = split(txt, self.add_q_proj)
        tk = split(txt, self.add_k_proj)
        tv = split(txt, self.add_v_proj)
        if hasattr(self, "norm_q"):
            q, k = self.norm_q(q), self.norm_k(k)
            tq, tk = self.norm_added_q(tq), self.norm_added_k(tk)
        q = torch.cat([q, tq], dim=2)
        k = torch.cat([k, tk], dim=2)
        v = torch.cat([v, tv], dim=2)
        o = _sdpa(q, k, v).transpose(1, 2).reshape(b, si + st, d)
        img_o, txt_o = o[:, :si], o[:, si:]
        img_o = self.to_out[0](img_o)
        if self.context_pre_only:
            return img_o, None
        return img_o, self.to_add_out(txt_o)


class _SD3JointBlock(nn.Module):
    def __init__(self, dim: int, heads: int, qk_norm: bool,
                 context_pre_only: bool):
        super().__init__()
        self.context_pre_only = context_pre_only
        self.norm1 = AdaLayerNormZero(dim)
        if context_pre_only:
            self.norm1_context = AdaLayerNormContinuous(dim, dim)
        else:
            self.norm1_context = AdaLayerNormZero(dim)
        self.attn = _SD3JointAttention(dim, heads, qk_norm, context_pre_only)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim)
        if not context_pre_only:
            self.norm2_context = nn.LayerNorm(
                dim, elementwise_affine=False, eps=1e-6
            )
            self.ff_context = FeedForward(dim)

    def forward(self, img, txt, temb):
        img_n, g, sh_m, sc_m, g_m = self.norm1(img, temb)
        if self.context_pre_only:
            txt_n = self.norm1_context(txt, temb)
        else:
            txt_n, cg, csh_m, csc_m, cg_m = self.norm1_context(txt, temb)
        img_o, txt_o = self.attn(img_n, txt_n)
        img = img + g[:, None] * img_o
        img_n = self.norm2(img) * (1 + sc_m[:, None]) + sh_m[:, None]
        img = img + g_m[:, None] * self.ff(img_n)
        if self.context_pre_only:
            return img, None
        txt = txt + cg[:, None] * txt_o
        txt_n = self.norm2_context(txt) * (1 + csc_m[:, None]) + csh_m[:, None]
        txt = txt + cg_m[:, None] * self.ff_context(txt_n)
        return img, txt


class SD3TimeTextEmbed(nn.Module):
    def __init__(self, dim: int, pooled_dim: int):
        super().__init__()
        self.timestep_embedder = TimestepEmbedding(256, dim)
        self.text_embedder = PixArtAlphaTextProjection(pooled_dim, dim, "silu")

    def forward(self, t, pooled):
        return self.timestep_embedder(timesteps_proj(t)) + self.text_embedder(
            pooled
        )


class SD3Ref(nn.Module):
    """SD3Transformer2DModel equivalent (token-space output); the final
    block is context_pre_only like the real checkpoint."""

    def __init__(self, dim=64, depth=2, heads=4, patch=2, in_channels=4,
                 text_dim=32, pooled_dim=16, sample_size=8,
                 pos_embed_max_size=16, qk_norm=True):
        super().__init__()
        self.patch = patch
        self.pos_embed = PatchEmbed(
            sample_size, sample_size, patch, in_channels, dim,
            pos_embed_max_size=pos_embed_max_size,
        )
        self.time_text_embed = SD3TimeTextEmbed(dim, pooled_dim)
        self.context_embedder = nn.Linear(text_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [
                _SD3JointBlock(dim, heads, qk_norm, i == depth - 1)
                for i in range(depth)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(dim, dim)
        self.proj_out = nn.Linear(dim, patch * patch * in_channels)

    def forward(self, latents, t, text, pooled):
        x = self.pos_embed(latents)
        temb = self.time_text_embed(t, pooled)
        txt = self.context_embedder(text)
        for blk in self.transformer_blocks:
            x, txt = blk(x, txt, temb)
        x = self.norm_out(x, temb)
        return self.proj_out(x)


# ---------------------------------------------------------------------------
# HunyuanDiT (U-ViT with long skips, rope'd cross-attn queries, text pool)
# ---------------------------------------------------------------------------


class _HunyuanAttention(nn.Module):
    """Attention with per-head affine-LN qk norm; rope on q always, on k
    only for self-attention (diffusers HunyuanAttnProcessor2_0)."""

    def __init__(self, dim: int, heads: int, kv_dim=None):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        kv_dim = kv_dim or dim
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(kv_dim, dim)
        self.to_v = nn.Linear(kv_dim, dim)
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])

    def forward(self, x, rope, context=None):
        is_cross = context is not None
        context = x if context is None else context
        b, s, d = x.shape
        h = self.heads
        q = self.norm_q(self.to_q(x).view(b, s, h, d // h)).transpose(1, 2)
        k = self.norm_k(
            self.to_k(context).view(b, -1, h, d // h)
        ).transpose(1, 2)
        v = self.to_v(context).view(b, -1, h, d // h).transpose(1, 2)
        if rope is not None:
            cos, sin = rope
            q = apply_rope_torch(q, cos, sin)
            if not is_cross:
                k = apply_rope_torch(k, cos, sin)
        o = _sdpa(q, k, v).transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class _HunyuanBlock(nn.Module):
    def __init__(self, dim: int, heads: int, kv_dim: int, ffn_hidden: int,
                 with_skip: bool):
        super().__init__()

        class AdaShift(nn.Module):
            def __init__(self):
                super().__init__()
                self.norm = nn.LayerNorm(dim, eps=1e-6)
                self.linear = nn.Linear(dim, dim)

            def forward(self, x, temb):
                return self.norm(x) + self.linear(F.silu(temb))[:, None]

        class FF(nn.Module):
            def __init__(self):
                super().__init__()

                class Proj(nn.Module):
                    def __init__(self):
                        super().__init__()
                        self.proj = nn.Linear(dim, ffn_hidden)

                    def forward(self, x):
                        return F.gelu(self.proj(x), approximate="tanh")

                self.net = nn.ModuleList(
                    [Proj(), nn.Identity(), nn.Linear(ffn_hidden, dim)]
                )

            def forward(self, x):
                for m in self.net:
                    x = m(x)
                return x

        self.norm1 = AdaShift()
        self.attn1 = _HunyuanAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn2 = _HunyuanAttention(dim, heads, kv_dim=kv_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.ff = FF()
        if with_skip:
            self.skip_norm = nn.LayerNorm(2 * dim, eps=1e-6)
            self.skip_linear = nn.Linear(2 * dim, dim)

    def forward(self, x, text, temb, rope, skip=None):
        if skip is not None:
            x = self.skip_linear(self.skip_norm(torch.cat([x, skip], -1)))
        x = x + self.attn1(self.norm1(x, temb), rope)
        x = x + self.attn2(self.norm2(x), rope, context=text)
        x = x + self.ff(self.norm3(x))
        return x


class HunyuanDiTRef(nn.Module):
    """HunyuanDiT2DModel equivalent (v1.2: no style/size conditioning)."""

    def __init__(self, dim=64, depth=4, heads=4, patch=2, in_channels=4,
                 out_channels=8, text_dim=32, t5_dim=48, text_len=6,
                 text_len_t5=8, ffn_hidden=128, rope_axes=(8, 8)):
        super().__init__()
        self.rope_axes = rope_axes
        self.patch = patch

        class PE(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(in_channels, dim, patch, stride=patch)

            def forward(self, x):
                return self.proj(x).flatten(2).transpose(1, 2)

        class Pooler(nn.Module):
            def __init__(self):
                super().__init__()
                self.positional_embedding = nn.Parameter(
                    torch.randn(text_len_t5 + 1, t5_dim) / t5_dim**0.5
                )
                self.q_proj = nn.Linear(t5_dim, t5_dim)
                self.k_proj = nn.Linear(t5_dim, t5_dim)
                self.v_proj = nn.Linear(t5_dim, t5_dim)
                self.c_proj = nn.Linear(t5_dim, text_dim)

            def forward(self, x):  # (B, L, C)
                x = torch.cat([x.mean(1, keepdim=True), x], dim=1)
                x = x + self.positional_embedding[None]
                b, s, c = x.shape
                h = 8
                q = self.q_proj(x[:, :1]).view(b, 1, h, c // h).transpose(1, 2)
                k = self.k_proj(x).view(b, s, h, c // h).transpose(1, 2)
                v = self.v_proj(x).view(b, s, h, c // h).transpose(1, 2)
                o = _sdpa(q, k, v).transpose(1, 2).reshape(b, 1, c)
                return self.c_proj(o)[:, 0]

        class TimeExtra(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = TimestepEmbedding(256, dim)
                self.pooler = Pooler()
                self.extra_embedder = PixArtAlphaTextProjection(
                    text_dim, dim, "silu", hidden=4 * dim
                )

            def forward(self, t, t5_states):
                temb = self.timestep_embedder(timesteps_proj(t))
                pooled = self.pooler(t5_states)
                # extra_embedder in diffusers is a 2-layer silu MLP with its
                # own hidden size; PixArtAlphaTextProjection(hidden=4*dim)
                return temb + self.extra_embedder(pooled)

        self.pos_embed = PE()
        self.time_extra_emb = TimeExtra()
        self.text_embedder = PixArtAlphaTextProjection(
            t5_dim, text_dim, "silu", hidden=4 * t5_dim
        )
        self.text_embedding_padding = nn.Parameter(
            torch.randn(text_len + text_len_t5, text_dim) * 0.02
        )
        # skip channels only for layer > depth//2 — 19 of 40, not a
        # symmetric half (diffusers HunyuanDiT2DModel; the reference's copy
        # pops at hunyuan_transformer_2d.py:179, pushes at :195)
        half = depth // 2
        self.blocks = nn.ModuleList(
            [
                _HunyuanBlock(dim, heads, text_dim, ffn_hidden, i > half)
                for i in range(depth)
            ]
        )
        self.norm_out = AdaLayerNormContinuous(dim, dim)
        self.proj_out = nn.Linear(dim, patch * patch * out_channels)

    def forward(self, latents, t, clip_text, t5_text, clip_mask, t5_mask,
                img_ids):
        x = self.pos_embed(latents)
        temb = self.time_extra_emb(t, t5_text)
        t5_proj = self.text_embedder(t5_text)
        text = torch.cat([clip_text, t5_proj], dim=1)
        mask = torch.cat([clip_mask, t5_mask], dim=1)
        text = torch.where(
            mask[..., None], text, self.text_embedding_padding[None]
        )
        rope = flux_rope(img_ids, self.rope_axes)
        half = len(self.blocks) // 2
        skips = []
        for i, blk in enumerate(self.blocks):
            skip = skips.pop() if i > half else None
            x = blk(x, text, temb, rope, skip=skip)
            if i < half - 1:
                skips.append(x)
        x = self.norm_out(x, temb)
        return self.proj_out(x)


# ---------------------------------------------------------------------------
# CogVideoX (joint text+video blocks with shared weights)
# ---------------------------------------------------------------------------


class _CogLayerNormZero(nn.Module):
    """CogVideoXLayerNormZero: affine LN + 6-way modulation for BOTH
    streams (video shift/scale/gate first, then text)."""

    def __init__(self, cond_dim: int, dim: int):
        super().__init__()
        self.linear = nn.Linear(cond_dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, hidden, encoder, temb):
        sh, sc, g, esh, esc, eg = self.linear(F.silu(temb)).chunk(6, dim=1)
        hidden = self.norm(hidden) * (1 + sc[:, None]) + sh[:, None]
        encoder = self.norm(encoder) * (1 + esc[:, None]) + esh[:, None]
        return hidden, encoder, g[:, None], eg[:, None]


class _CogAttention(nn.Module):
    """Single qkv over the [text, video] concat, per-head LayerNorm qk norm
    (eps 1e-6), rope on the video part only."""

    def __init__(self, dim: int, heads: int):
        super().__init__()
        self.heads = heads
        hd = dim // heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.norm_q = nn.LayerNorm(hd, eps=1e-6)
        self.norm_k = nn.LayerNorm(hd, eps=1e-6)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])

    def forward(self, x, s_txt, rope):  # x = cat([text, video])
        b, s, d = x.shape
        h = self.heads
        q = self.norm_q(self.to_q(x).view(b, s, h, d // h)).transpose(1, 2)
        k = self.norm_k(self.to_k(x).view(b, s, h, d // h)).transpose(1, 2)
        v = self.to_v(x).view(b, s, h, d // h).transpose(1, 2)
        if rope is not None:
            cos, sin = rope
            q = torch.cat(
                [q[:, :, :s_txt], apply_rope_torch(q[:, :, s_txt:], cos, sin)],
                dim=2,
            )
            k = torch.cat(
                [k[:, :, :s_txt], apply_rope_torch(k[:, :, s_txt:], cos, sin)],
                dim=2,
            )
        o = _sdpa(q, k, v).transpose(1, 2).reshape(b, s, d)
        return self.to_out[0](o)


class _CogBlock(nn.Module):
    def __init__(self, cond_dim: int, dim: int, heads: int):
        super().__init__()
        self.norm1 = _CogLayerNormZero(cond_dim, dim)
        self.attn1 = _CogAttention(dim, heads)
        self.norm2 = _CogLayerNormZero(cond_dim, dim)
        self.ff = FeedForward(dim)

    def forward(self, vid, txt, temb, rope):
        s_txt = txt.shape[1]
        vid_n, txt_n, g, eg = self.norm1(vid, txt, temb)
        attn = self.attn1(torch.cat([txt_n, vid_n], dim=1), s_txt, rope)
        txt = txt + eg * attn[:, :s_txt]
        vid = vid + g * attn[:, s_txt:]
        vid_n, txt_n, g, eg = self.norm2(vid, txt, temb)
        ff = self.ff(torch.cat([txt_n, vid_n], dim=1))
        txt = txt + eg * ff[:, :s_txt]
        vid = vid + g * ff[:, s_txt:]
        return vid, txt


class CogVideoXRef(nn.Module):
    """CogVideoXTransformer3DModel equivalent (rotary path, token-space).

    ``patch_t > 1`` (CogVideoX 1.5) switches to the checkpoint's Linear
    patch embed over (p_t, p, p, C)-packed tokens and a ``proj_out`` whose
    output features are (C, p_t, p, p)-ordered (diffusers unpatchify
    ``reshape(..., -1, p_t, p, p)``)."""

    def __init__(self, dim=64, depth=2, heads=4, patch=2, in_channels=16,
                 text_dim=32, time_embed_dim=32, axes_dim=(8, 4, 4),
                 patch_t=1):
        super().__init__()
        self.axes_dim = axes_dim
        self.patch = patch
        self.patch_t = patch_t

        class PatchEmbedCog(nn.Module):
            def __init__(self):
                super().__init__()
                if patch_t > 1:
                    self.proj = nn.Linear(
                        patch_t * patch * patch * in_channels, dim
                    )
                else:
                    self.proj = nn.Conv2d(
                        in_channels, dim, patch, stride=patch
                    )
                self.text_proj = nn.Linear(text_dim, dim)

            def forward(self, tokens, text):
                if patch_t > 1:
                    return self.proj(tokens), self.text_proj(text)
                # tokens (B, S, p*p*C) raster (ph, pw, c): run the conv on
                # each packed patch
                b, s, pc = tokens.shape
                x = tokens.view(b * s, patch, patch, in_channels).permute(
                    0, 3, 1, 2
                )
                vid = self.proj(x).view(b, s, dim)
                return vid, self.text_proj(text)

        class TimeEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(dim, time_embed_dim)
                self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

            def forward(self, t):
                e = timesteps_proj(t, dim)
                return self.linear_2(F.silu(self.linear_1(e)))

        class AdaNormOut(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(time_embed_dim, 2 * dim)
                self.norm = nn.LayerNorm(dim, eps=1e-5)

            def forward(self, x, temb):
                shift, scale = self.linear(F.silu(temb)).chunk(2, dim=1)
                return self.norm(x) * (1 + scale[:, None]) + shift[:, None]

        class OfsEmb(nn.Module):
            # CogVideoX 1.5 ofs branch: Timesteps(time_embed_dim) ->
            # TimestepEmbedding(time_embed_dim, time_embed_dim); the T2V
            # pipeline feeds the constant 2.0
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(time_embed_dim, time_embed_dim)
                self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

            def forward(self, ofs):
                e = timesteps_proj(ofs, time_embed_dim)
                return self.linear_2(F.silu(self.linear_1(e)))

        self.patch_embed = PatchEmbedCog()
        self.time_embedding = TimeEmb()
        if patch_t > 1:
            self.ofs_embedding = OfsEmb()
        self.transformer_blocks = nn.ModuleList(
            [_CogBlock(time_embed_dim, dim, heads) for _ in range(depth)]
        )
        self.norm_final = nn.LayerNorm(dim, eps=1e-5)
        self.norm_out = AdaNormOut()
        self.proj_out = nn.Linear(
            dim, patch_t * patch * patch * in_channels
        )

    def forward(self, video_tokens, text, t, vid_ids):
        vid, txt = self.patch_embed(video_tokens, text)
        temb = self.time_embedding(t)
        if hasattr(self, "ofs_embedding"):
            ofs = torch.full_like(t, 2.0)
            temb = temb + self.ofs_embedding(ofs)
        rope = flux_rope(vid_ids, self.axes_dim)
        for blk in self.transformer_blocks:
            vid, txt = blk(vid, txt, temb, rope)
        s_txt = txt.shape[1]
        joint = self.norm_final(torch.cat([txt, vid], dim=1))
        vid = joint[:, s_txt:]
        vid = self.norm_out(vid, temb)
        return self.proj_out(vid)


# ---------------------------------------------------------------------------
# ConsisID = CogVideoX + interval perceiver identity cross-attention
# ---------------------------------------------------------------------------


class _PerceiverCA(nn.Module):
    """PerceiverAttentionCA: LN'd face tokens -> K/V, LN'd latents -> Q,
    bias-free projections."""

    def __init__(self, dim: int, heads: int, id_dim: int):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(id_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_kv = nn.Linear(id_dim, 2 * dim, bias=False)
        self.to_out = nn.Linear(dim, dim, bias=False)

    def forward(self, x, latents):
        b, s, d = latents.shape
        h = self.heads
        x = self.norm1(x)
        lat = self.norm2(latents)
        q = self.to_q(lat).view(b, s, h, d // h).transpose(1, 2)
        k, v = self.to_kv(x).chunk(2, dim=-1)  # [k | v] full-dim layout
        k = k.view(b, -1, h, d // h).transpose(1, 2)
        v = v.view(b, -1, h, d // h).transpose(1, 2)
        o = _sdpa(q, k, v).transpose(1, 2).reshape(b, s, d)
        return self.to_out(o)


class ConsisIDRef(nn.Module):
    """CogVideoXRef blocks + identity injection after every
    cross_attn_interval-th block."""

    def __init__(self, id_dim=16, interval=2, **kw):
        super().__init__()
        self.base = CogVideoXRef(**kw)
        self.interval = interval
        depth = len(self.base.transformer_blocks)
        dim = self.base.proj_out.in_features
        heads = self.base.transformer_blocks[0].attn1.heads
        n_ca = (depth + interval - 1) // interval
        self.perceiver_cross_attention = nn.ModuleList(
            [_PerceiverCA(dim, heads, id_dim) for _ in range(n_ca)]
        )

    def state_dict_flat(self):
        out = {}
        for k, v in self.base.state_dict().items():
            out[k] = v.detach().numpy()
        for k, v in self.named_parameters():
            if k.startswith("perceiver_cross_attention"):
                out[k] = v.detach().numpy()
        return out

    def forward(self, video_tokens, text, t, vid_ids, id_states):
        b = video_tokens.shape[0]
        base = self.base
        vid, txt = base.patch_embed(video_tokens, text)
        temb = base.time_embedding(t)
        rope = flux_rope(vid_ids, base.axes_dim)
        ca_idx = 0
        for i, blk in enumerate(base.transformer_blocks):
            vid, txt = blk(vid, txt, temb, rope)
            if i % self.interval == 0:
                vid = vid + self.perceiver_cross_attention[ca_idx](
                    id_states, vid
                )
                ca_idx += 1
        s_txt = txt.shape[1]
        joint = base.norm_final(torch.cat([txt, vid], dim=1))
        vid = joint[:, s_txt:]
        vid = base.norm_out(vid, temb)
        return base.proj_out(vid)


# ---------------------------------------------------------------------------
# Step-Video transformer block (reference blocks.py semantics: per-head
# packed wqkv, affine RMSNorm qk, half-split 3D rope, ungated raw cross-attn)
# ---------------------------------------------------------------------------


def _rope_half_1d(x, pos, dax):
    """x (..., S, H, dax); reference RoPE1D: duplicated freqs + rotate_half."""
    inv = 1.0 / 1e4 ** (torch.arange(0, dax, 2, dtype=torch.float32) / dax)
    ang = pos.float()[:, None] * inv[None]
    ang = torch.cat([ang, ang], dim=-1)  # (S, dax)
    cos = ang.cos()[None, :, None, :]
    sin = ang.sin()[None, :, None, :]
    x1, x2 = x[..., : dax // 2], x[..., dax // 2 :]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def rope3d_half(x, mesh, ch_split):
    """x (B, S, H, D); mesh (S, 3) (f, h, w) positions."""
    outs = []
    off = 0
    for i, dax in enumerate(ch_split):
        outs.append(_rope_half_1d(x[..., off : off + dax], mesh[:, i], dax))
        off += dax
    return torch.cat(outs, dim=-1)


class _TorchRMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        x32 = x.float()
        y = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + 1e-6)
        return (y * self.weight).to(x.dtype)


class StepVideoBlockRef(nn.Module):
    """One StepVideoTransformerBlock (reference blocks.py:196-290)."""

    def __init__(self, dim: int, head_dim: int, ch_split):
        super().__init__()
        self.dim = dim
        self.head_dim = head_dim
        self.heads = dim // head_dim
        self.ch_split = ch_split

        class SelfAttn(nn.Module):
            def __init__(s):
                super().__init__()
                s.wqkv = nn.Linear(dim, 3 * dim, bias=False)
                s.wo = nn.Linear(dim, dim, bias=False)
                s.q_norm = _TorchRMSNorm(head_dim)
                s.k_norm = _TorchRMSNorm(head_dim)

            def forward(s, x, mesh):
                b, sq, d = x.shape
                h = d // head_dim
                qkv = s.wqkv(x).view(b, sq, h, 3 * head_dim)
                q, k, v = torch.split(qkv, head_dim, dim=-1)
                q, k = s.q_norm(q), s.k_norm(k)
                q = rope3d_half(q, mesh, ch_split)
                k = rope3d_half(k, mesh, ch_split)
                o = _sdpa(
                    q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
                ).transpose(1, 2).reshape(b, sq, d)
                return s.wo(o)

        class CrossAttn(nn.Module):
            def __init__(s):
                super().__init__()
                s.wq = nn.Linear(dim, dim, bias=False)
                s.wkv = nn.Linear(dim, 2 * dim, bias=False)
                s.wo = nn.Linear(dim, dim, bias=False)
                s.q_norm = _TorchRMSNorm(head_dim)
                s.k_norm = _TorchRMSNorm(head_dim)

            def forward(s, x, enc):
                b, sq, d = x.shape
                h = d // head_dim
                q = s.q_norm(s.wq(x).view(b, sq, h, head_dim))
                kv = s.wkv(enc).view(b, -1, h, 2 * head_dim)
                k, v = torch.split(kv, head_dim, dim=-1)
                k = s.k_norm(k)
                o = _sdpa(
                    q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
                ).transpose(1, 2).reshape(b, sq, d)
                return s.wo(o)

        # eps 1e-5 (the vendored block keeps nn.LayerNorm's default,
        # blocks.py:242-246) and bias-free FFN (ff_bias=False)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = SelfAttn()
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = CrossAttn()
        self.ff = FeedForward(dim, bias=False)
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, q, kv, timestep, mesh):
        sh, sc, g, sh_m, sc_m, g_m = (
            self.scale_shift_table[None] + timestep.reshape(-1, 6, self.dim)
        ).chunk(6, dim=1)
        x = self.norm1(q) * (1 + sc) + sh
        q = g * self.attn1(x, mesh) + q
        q = self.attn2(q, kv) + q
        x = self.norm2(q) * (1 + sc_m) + sh_m
        return g_m * self.ff(x) + q


class StepVideoRef(nn.Module):
    """Full Step-Video model: vendored blocks + PixArt-style top level
    (AdaLayerNormSingle / caption projection, normalization.py:252-313)."""

    def __init__(self, dim=64, depth=2, head_dim=16, ch_split=(8, 4, 4),
                 in_channels=16, patch=2, text_dim=32):
        super().__init__()
        self.dim = dim
        latent_c = in_channels // (patch * patch)

        class PE(nn.Module):
            def __init__(s):
                super().__init__()
                s.proj = nn.Conv2d(latent_c, dim, patch, stride=patch)

            def forward(s, tokens):  # (B, S, p*p*c) raster (ph, pw, c)
                b, sq, pc = tokens.shape
                x = tokens.view(b * sq, patch, patch, latent_c).permute(
                    0, 3, 1, 2
                )
                return s.proj(x).view(b, sq, dim)

        self.pos_embed = PE()
        self.adaln_single = AdaLayerNormSingle(dim)
        self.caption_projection = PixArtAlphaTextProjection(text_dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [StepVideoBlockRef(dim, head_dim, ch_split) for _ in range(depth)]
        )
        self.scale_shift_table = nn.Parameter(torch.randn(2, dim) / dim**0.5)
        self.norm_out = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.proj_out = nn.Linear(dim, in_channels)

    def forward(self, video_tokens, text, t, mesh):
        x = self.pos_embed(video_tokens)
        t6, emb = self.adaln_single(t)
        txt = self.caption_projection(text)
        for blk in self.transformer_blocks:
            x = blk(x, txt, t6, mesh)
        shift, scale = (
            self.scale_shift_table[None] + emb[:, None]
        ).chunk(2, dim=1)
        x = self.norm_out(x) * (1 + scale) + shift
        return self.proj_out(x)


# ---------------------------------------------------------------------------
# AutoencoderKL decoder
# ---------------------------------------------------------------------------


class _VAEResnet(nn.Module):
    def __init__(self, c_in: int, c_out: int, groups: int):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-6)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-6)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _VAEAttention(nn.Module):
    """Single-head attention with GroupNorm + residual (diffusers Attention
    as used in the VAE mid block)."""

    def __init__(self, c: int, groups: int):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Identity()])

    def forward(self, x):  # (B, C, H, W)
        b, c, hh, ww = x.shape
        y = self.group_norm(x).flatten(2).transpose(1, 2)  # (B, S, C)
        q = self.to_q(y)[:, None]
        k = self.to_k(y)[:, None]
        v = self.to_v(y)[:, None]
        o = _sdpa(q, k, v)[:, 0]
        o = self.to_out[0](o).transpose(1, 2).reshape(b, c, hh, ww)
        return x + o


class _VAEMid(nn.Module):
    def __init__(self, c: int, groups: int):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VAEResnet(c, c, groups), _VAEResnet(c, c, groups)]
        )
        self.attentions = nn.ModuleList([_VAEAttention(c, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEUpBlock(nn.Module):
    def __init__(self, c_in: int, c_out: int, layers: int, groups: int,
                 upsample: bool):
        super().__init__()
        res = []
        for i in range(layers + 1):
            res.append(_VAEResnet(c_in if i == 0 else c_out, c_out, groups))
        self.resnets = nn.ModuleList(res)
        if upsample:

            class Up(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.conv = nn.Conv2d(c_out, c_out, 3, padding=1)

                def forward(self, x):
                    return self.conv(
                        F.interpolate(x, scale_factor=2.0, mode="nearest")
                    )

            self.upsamplers = nn.ModuleList([Up()])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class VAEDecoderRef(nn.Module):
    """AutoencoderKL post_quant_conv + Decoder equivalent."""

    def __init__(self, latent_channels=4, out_channels=3,
                 block_out_channels=(8, 16), layers_per_block=1, groups=4):
        super().__init__()

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                chans = list(reversed(block_out_channels))
                self.conv_in = nn.Conv2d(latent_channels, chans[0], 3, padding=1)
                self.mid_block = _VAEMid(chans[0], groups)
                ups = []
                c_prev = chans[0]
                for i, c in enumerate(chans):
                    ups.append(
                        _VAEUpBlock(
                            c_prev, c, layers_per_block, groups,
                            upsample=i < len(chans) - 1,
                        )
                    )
                    c_prev = c
                self.up_blocks = nn.ModuleList(ups)
                self.conv_norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6)
                self.conv_out = nn.Conv2d(chans[-1], out_channels, 3, padding=1)

            def forward(self, z):
                x = self.conv_in(z)
                x = self.mid_block(x)
                for up in self.up_blocks:
                    x = up(x)
                return self.conv_out(F.silu(self.conv_norm_out(x)))

        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)
        self.decoder = Decoder()

    def forward(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# AutoencoderKLCogVideoX decoder (causal 3D video VAE)
# ---------------------------------------------------------------------------


class _CausalConv3d(nn.Module):
    """CogVideoXCausalConv3d: first-frame-replicate temporal pad + zero
    spatial pad; the conv itself lives under ``.conv``."""

    def __init__(self, c_in: int, c_out: int, k: int = 3):
        super().__init__()
        self.k = k
        self.conv = nn.Conv3d(c_in, c_out, k)

    def forward(self, x):  # (B, C, T, H, W)
        if self.k > 1:
            front = x[:, :, :1].repeat(1, 1, self.k - 1, 1, 1)
            x = torch.cat([front, x], dim=2)
            p = (self.k - 1) // 2
            x = F.pad(x, (p, p, p, p))  # W, H zero pad
        return self.conv(x)


class _SpatialNorm3D(nn.Module):
    """CogVideoXSpatialNorm3D: groupnorm(f) * conv_y(zq) + conv_b(zq)."""

    def __init__(self, c: int, zq_c: int, groups: int):
        super().__init__()
        self.norm_layer = nn.GroupNorm(groups, c, eps=1e-6)
        self.conv_y = nn.Conv3d(zq_c, c, 1)
        self.conv_b = nn.Conv3d(zq_c, c, 1)

    def forward(self, f, zq):
        if f.shape[2] > 1 and f.shape[2] % 2 == 1:
            zf, zr = zq[:, :, :1], zq[:, :, 1:]
            zf = F.interpolate(zf, size=(1,) + f.shape[-2:])
            zr = F.interpolate(zr, size=(f.shape[2] - 1,) + f.shape[-2:])
            zq = torch.cat([zf, zr], dim=2)
        else:
            zq = F.interpolate(zq, size=f.shape[-3:])
        return self.norm_layer(f) * self.conv_y(zq) + self.conv_b(zq)


class _CogResnet3D(nn.Module):
    def __init__(self, c_in: int, c_out: int, zq_c: int, groups: int):
        super().__init__()
        self.norm1 = _SpatialNorm3D(c_in, zq_c, groups)
        self.conv1 = _CausalConv3d(c_in, c_out)
        self.norm2 = _SpatialNorm3D(c_out, zq_c, groups)
        self.conv2 = _CausalConv3d(c_out, c_out)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv3d(c_in, c_out, 1)

    def forward(self, x, zq):
        h = self.conv1(F.silu(self.norm1(x, zq)))
        h = self.conv2(F.silu(self.norm2(h, zq)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _CogUpsample3D(nn.Module):
    """CogVideoXUpsample3D: nearest 2x; compress_time keeps frame 0
    un-doubled when T is odd; PER-FRAME 2D conv (diffusers nn.Conv2d —
    real checkpoints ship 4D upsampler weights)."""

    def __init__(self, c: int, compress_time: bool):
        super().__init__()
        self.compress_time = compress_time
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        if self.compress_time:
            if x.shape[2] > 1 and x.shape[2] % 2 == 1:
                first, rest = x[:, :, :1], x[:, :, 1:]
                first = F.interpolate(
                    first.squeeze(2), scale_factor=2.0
                ).unsqueeze(2)
                rest = F.interpolate(rest, scale_factor=2.0)
                x = torch.cat([first, rest], dim=2)
            elif x.shape[2] > 1:
                x = F.interpolate(x, scale_factor=2.0)
            else:
                x = F.interpolate(x.squeeze(2), scale_factor=2.0).unsqueeze(2)
        else:
            b, c, t, h, w = x.shape
            x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
            x = F.interpolate(x, scale_factor=2.0)
            x = x.reshape(b, t, c, 2 * h, 2 * w).permute(0, 2, 1, 3, 4)
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv(x)
        return x.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------
# AutoencoderKLHunyuanVideo decoder (replicate-padded causal convs, plain
# GroupNorms, causal-frame-masked mid attention)
# ---------------------------------------------------------------------------


class _HVCausalConv3d(nn.Module):
    def __init__(self, c_in: int, c_out: int, k: int = 3):
        super().__init__()
        self.k = k
        self.conv = nn.Conv3d(c_in, c_out, k)

    def forward(self, x):  # (B, C, T, H, W)
        p = (self.k - 1) // 2
        x = F.pad(x, (p, p, p, p, self.k - 1, 0), mode="replicate")
        return self.conv(x)


class _HVResnet(nn.Module):
    def __init__(self, c_in, c_out, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-6)
        self.conv1 = _HVCausalConv3d(c_in, c_out)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-6)
        self.conv2 = _HVCausalConv3d(c_out, c_out)
        if c_in != c_out:
            self.conv_shortcut = _HVCausalConv3d(c_in, c_out, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _HVMidAttn(nn.Module):
    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c), nn.Identity()])

    def forward(self, x):  # (B, C, T, H, W)
        b, c, t, hh, ww = x.shape
        y = self.group_norm(x).flatten(2).transpose(1, 2)  # (B, T*H*W, C)
        frame = torch.arange(t).repeat_interleave(hh * ww)
        mask = (frame[:, None] >= frame[None, :])[None, None]
        q = self.to_q(y)[:, None]
        k = self.to_k(y)[:, None]
        v = self.to_v(y)[:, None]
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)[:, 0]
        o = self.to_out[0](o).transpose(1, 2).reshape(b, c, t, hh, ww)
        return x + o


class HunyuanVideoVAEDecoderRef(nn.Module):
    """AutoencoderKLHunyuanVideo decoder equivalent (takes UNscaled z)."""

    def __init__(self, latent_channels=4, out_channels=3,
                 block_out_channels=(8, 16), layers_per_block=1, groups=4,
                 temporal_compress_levels=1):
        super().__init__()

        class Mid(nn.Module):
            def __init__(self, c):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [_HVResnet(c, c, groups), _HVResnet(c, c, groups)]
                )
                self.attentions = nn.ModuleList([_HVMidAttn(c, groups)])

            def forward(self, x):
                x = self.resnets[0](x)
                x = self.attentions[0](x)
                return self.resnets[1](x)

        class Up(nn.Module):
            def __init__(self, c, temporal):
                super().__init__()
                self.temporal = temporal

                class Wrap(nn.Module):
                    def __init__(s):
                        super().__init__()
                        s.conv = _HVCausalConv3d(c, c)

                    def forward(s, x):
                        first, rest = x[:, :, :1], x[:, :, 1:]
                        first = F.interpolate(
                            first.squeeze(2), scale_factor=2.0
                        ).unsqueeze(2)
                        if rest.shape[2] > 0:
                            sf = (2.0, 2.0, 2.0) if temporal else (1.0, 2.0, 2.0)
                            rest = F.interpolate(rest, scale_factor=sf)
                            x = torch.cat([first, rest], dim=2)
                        else:
                            x = first
                        return s.conv(x)

                self.mod = Wrap()

            def forward(self, x):
                return self.mod(x)

        class UpBlock(nn.Module):
            def __init__(self, c_in, c_out, upsample, temporal):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [
                        _HVResnet(c_in if j == 0 else c_out, c_out, groups)
                        for j in range(layers_per_block + 1)
                    ]
                )
                if upsample:
                    self.upsamplers = nn.ModuleList([Up(c_out, temporal).mod])

            def forward(self, x):
                for r in self.resnets:
                    x = r(x)
                if hasattr(self, "upsamplers"):
                    x = self.upsamplers[0](x)
                return x

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                chans = list(reversed(block_out_channels))
                self.conv_in = _HVCausalConv3d(latent_channels, chans[0])
                self.mid_block = Mid(chans[0])
                ups = []
                c_prev = chans[0]
                for i, c in enumerate(chans):
                    ups.append(
                        UpBlock(
                            c_prev, c, upsample=i < len(chans) - 1,
                            # diffusers/HY: time upsample at the LAST
                            # `levels` non-final up blocks
                            temporal=i >= len(chans) - 1
                            - temporal_compress_levels,
                        )
                    )
                    c_prev = c
                self.up_blocks = nn.ModuleList(ups)
                self.conv_norm_out = nn.GroupNorm(groups, chans[-1], eps=1e-6)
                self.conv_out = _HVCausalConv3d(chans[-1], out_channels)

            def forward(self, z):
                x = self.conv_in(z)
                x = self.mid_block(x)
                for up in self.up_blocks:
                    x = up(x)
                return self.conv_out(F.silu(self.conv_norm_out(x)))

        self.decoder = Decoder()

    def forward(self, z):  # (B, C, T, H, W)
        return self.decoder(z)


class CogVideoXVAEDecoderRef(nn.Module):
    """AutoencoderKLCogVideoX decoder equivalent (takes UNscaled z)."""

    def __init__(self, latent_channels=4, out_channels=3,
                 block_out_channels=(8, 16), layers_per_block=1, groups=4,
                 temporal_compress_levels=1):
        super().__init__()

        class Mid(nn.Module):
            def __init__(self, c):
                super().__init__()
                self.resnets = nn.ModuleList(
                    [
                        _CogResnet3D(c, c, latent_channels, groups),
                        _CogResnet3D(c, c, latent_channels, groups),
                    ]
                )

            def forward(self, x, zq):
                for r in self.resnets:
                    x = r(x, zq)
                return x

        class UpBlock(nn.Module):
            def __init__(self, c_in, c_out, upsample, compress_time):
                super().__init__()
                res = []
                for i in range(layers_per_block + 1):
                    res.append(
                        _CogResnet3D(
                            c_in if i == 0 else c_out, c_out,
                            latent_channels, groups,
                        )
                    )
                self.resnets = nn.ModuleList(res)
                if upsample:
                    self.upsamplers = nn.ModuleList(
                        [_CogUpsample3D(c_out, compress_time)]
                    )

            def forward(self, x, zq):
                for r in self.resnets:
                    x = r(x, zq)
                if hasattr(self, "upsamplers"):
                    x = self.upsamplers[0](x)
                return x

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                chans = list(reversed(block_out_channels))
                self.conv_in = _CausalConv3d(latent_channels, chans[0])
                self.mid_block = Mid(chans[0])
                ups = []
                c_prev = chans[0]
                for i, c in enumerate(chans):
                    ups.append(
                        UpBlock(
                            c_prev, c,
                            upsample=i < len(chans) - 1,
                            compress_time=i < temporal_compress_levels,
                        )
                    )
                    c_prev = c
                self.up_blocks = nn.ModuleList(ups)
                self.norm_out = _SpatialNorm3D(
                    chans[-1], latent_channels, groups
                )
                self.conv_out = _CausalConv3d(chans[-1], out_channels)

            def forward(self, z):
                x = self.conv_in(z)
                x = self.mid_block(x, z)
                for up in self.up_blocks:
                    x = up(x, z)
                x = F.silu(self.norm_out(x, z))
                return self.conv_out(x)

        self.decoder = Decoder()

    def forward(self, z):  # (B, C, T, H, W)
        return self.decoder(z)


# ---------------------------------------------------------------------------
# ConsisID LocalFacialExtractor (diffusers consisid_transformer_3d.py): the
# perceiver resampler turning (id_cond, 5x ViT hiddens) into identity tokens
# ---------------------------------------------------------------------------


class _LFEPerceiverAttention(nn.Module):
    """diffusers ConsisID ``PerceiverAttention``: latents query the
    concatenation [ctx ; latents]; q and k each scaled by dim_head**-0.25."""

    def __init__(self, dim: int, dim_head: int, heads: int):
        super().__init__()
        self.dim_head, self.heads = dim_head, heads
        inner = dim_head * heads
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, inner * 2, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, image_embeds, latents):
        image_embeds = self.norm1(image_embeds)
        latents = self.norm2(latents)
        b, s, _ = latents.shape
        h, dh = self.heads, self.dim_head
        q = self.to_q(latents).view(b, s, h, dh).transpose(1, 2)
        kv_input = torch.cat((image_embeds, latents), dim=-2)
        k, v = self.to_kv(kv_input).chunk(2, dim=-1)
        k = k.view(b, -1, h, dh).transpose(1, 2)
        v = v.view(b, -1, h, dh).transpose(1, 2)
        scale = 1 / math.sqrt(math.sqrt(dh))
        w = (q * scale) @ (k * scale).transpose(-2, -1)
        w = torch.softmax(w.float(), dim=-1).type(w.dtype)
        o = (w @ v).permute(0, 2, 1, 3).reshape(b, s, h * dh)
        return self.to_out(o)


def _lfe_ff(dim: int, mult: int) -> nn.Sequential:
    inner = dim * mult
    return nn.Sequential(
        nn.LayerNorm(dim),
        nn.Linear(dim, inner, bias=False),
        nn.GELU(),
        nn.Linear(inner, dim, bias=False),
    )


def _lfe_mlp3(d_in: int, d_mid: int, d_out: int) -> nn.Sequential:
    return nn.Sequential(
        nn.Linear(d_in, d_mid),
        nn.LayerNorm(d_mid),
        nn.LeakyReLU(),
        nn.Linear(d_mid, d_mid),
        nn.LayerNorm(d_mid),
        nn.LeakyReLU(),
        nn.Linear(d_mid, d_out),
    )


class LocalFacialExtractorRef(nn.Module):
    """diffusers ``LocalFacialExtractor`` (state-dict naming preserved)."""

    def __init__(self, id_dim=1280, vit_dim=1024, depth=10, dim_head=64,
                 heads=16, num_id_token=5, num_queries=32, output_dim=2048,
                 ff_mult=4, num_scale=5):
        super().__init__()
        self.num_id_token = num_id_token
        self.vit_dim = vit_dim
        self.num_queries = num_queries
        assert depth % num_scale == 0
        self.depth = depth // num_scale
        self.num_scale = num_scale
        scale = vit_dim**-0.5
        self.latents = nn.Parameter(torch.randn(1, num_queries, vit_dim) * scale)
        self.proj_out = nn.Parameter(scale * torch.randn(vit_dim, output_dim))
        self.layers = nn.ModuleList([])
        for _ in range(depth):
            self.layers.append(nn.ModuleList([
                _LFEPerceiverAttention(vit_dim, dim_head, heads),
                _lfe_ff(vit_dim, ff_mult),
            ]))
        for i in range(num_scale):
            setattr(self, f"mapping_{i}", _lfe_mlp3(vit_dim, vit_dim, vit_dim))
        self.id_embedding_mapping = _lfe_mlp3(
            id_dim, vit_dim, vit_dim * num_id_token
        )

    def forward(self, id_embeds, vit_hidden_states):
        latents = self.latents.repeat(id_embeds.size(0), 1, 1)
        x = self.id_embedding_mapping(id_embeds)
        x = x.reshape(-1, self.num_id_token, self.vit_dim)
        latents = torch.cat((latents, x), dim=1)
        for i in range(self.num_scale):
            vit_feature = getattr(self, f"mapping_{i}")(vit_hidden_states[i])
            ctx_feature = torch.cat((x, vit_feature), dim=1)
            for attn, ff in self.layers[i * self.depth:(i + 1) * self.depth]:
                latents = attn(ctx_feature, latents) + latents
                latents = ff(latents) + latents
        latents = latents[:, : self.num_queries]
        return latents @ self.proj_out


# ---------------------------------------------------------------------------
# InceptionV3 trunk (torchvision inception_v3 naming) — FID feature oracle
# ---------------------------------------------------------------------------


class _BasicConv2d(nn.Module):
    def __init__(self, c_in, c_out, **kw):
        super().__init__()
        self.conv = nn.Conv2d(c_in, c_out, bias=False, **kw)
        self.bn = nn.BatchNorm2d(c_out, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _IncA(nn.Module):
    def __init__(self, c_in, pool):
        super().__init__()
        self.branch1x1 = _BasicConv2d(c_in, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(c_in, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(c_in, pool, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class _IncB(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3 = _BasicConv2d(c_in, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(c_in, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class _IncC(nn.Module):
    def __init__(self, c_in, c7):
        super().__init__()
        self.branch1x1 = _BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(c_in, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _IncD(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(c_in, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(c_in, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(
            self.branch7x7x3_2(self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class _IncE(nn.Module):
    def __init__(self, c_in):
        super().__init__()
        self.branch1x1 = _BasicConv2d(c_in, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(c_in, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(c_in, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConv2d(c_in, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class InceptionV3Ref(nn.Module):
    """torchvision ``inception_v3`` trunk -> 2048-d pool features."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _IncA(192, 32)
        self.Mixed_5c = _IncA(256, 64)
        self.Mixed_5d = _IncA(288, 64)
        self.Mixed_6a = _IncB(288)
        self.Mixed_6b = _IncC(768, 128)
        self.Mixed_6c = _IncC(768, 160)
        self.Mixed_6d = _IncC(768, 160)
        self.Mixed_6e = _IncC(768, 192)
        self.Mixed_7a = _IncD(768)
        self.Mixed_7b = _IncE(1280)
        self.Mixed_7c = _IncE(2048)

    def forward(self, x):  # (B, 3, H, W) in [-1, 1]
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                  self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                  self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        return x.mean(dim=(2, 3))


# ---------------------------------------------------------------------------
# I3D (pytorch-i3d naming, TF-SAME padding) — FVD feature oracle
# ---------------------------------------------------------------------------


def _tf_same_pad(size, kernel, stride):
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - (size % stride), 0)
    return pad // 2, pad - pad // 2


class _MaxPool3dSame(nn.Module):
    def __init__(self, kernel, stride):
        super().__init__()
        self.kernel, self.stride = kernel, stride

    def forward(self, x):
        b, c, t, h, w = x.shape
        pads = []
        for size, k, s in zip((w, h, t), reversed(self.kernel), reversed(self.stride)):
            pads.extend(_tf_same_pad(size, k, s))
        x = F.pad(x, pads, value=float("-inf"))
        return F.max_pool3d(x, self.kernel, self.stride)


class _Unit3D(nn.Module):
    """Conv3d (TF-SAME) + BatchNorm3d(eps=1e-3) + ReLU (piergiaj Unit3D)."""

    def __init__(self, c_in, c_out, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, activation=True, bias=False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = nn.Conv3d(c_in, c_out, kernel, stride, bias=bias)
        self.bn = nn.BatchNorm3d(c_out, eps=0.001) if use_bn else None
        self.activation = activation

    def forward(self, x):
        b, c, t, h, w = x.shape
        pads = []
        for size, k, s in zip((w, h, t), reversed(self.kernel), reversed(self.stride)):
            pads.extend(_tf_same_pad(size, k, s))
        x = self.conv3d(F.pad(x, pads))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.activation else x


class _I3DInceptionModule(nn.Module):
    def __init__(self, c_in, ch):
        super().__init__()
        self.b0 = _Unit3D(c_in, ch[0])
        self.b1a = _Unit3D(c_in, ch[1])
        self.b1b = _Unit3D(ch[1], ch[2], (3, 3, 3))
        self.b2a = _Unit3D(c_in, ch[3])
        self.b2b = _Unit3D(ch[3], ch[4], (3, 3, 3))
        self.b3 = _MaxPool3dSame((3, 3, 3), (1, 1, 1))
        self.b3b = _Unit3D(c_in, ch[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
            self.b3b(self.b3(x)),
        ], 1)


class I3DRef(nn.Module):
    """InceptionI3d trunk -> 400-d averaged Kinetics logits."""

    def __init__(self):
        super().__init__()
        self.Conv3d_1a_7x7 = _Unit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = _Unit3D(64, 64)
        self.Conv3d_2c_3x3 = _Unit3D(64, 192, (3, 3, 3))
        self.pool2a = _MaxPool3dSame((1, 3, 3), (1, 2, 2))
        self.pool3a = _MaxPool3dSame((1, 3, 3), (1, 2, 2))
        self.pool4a = _MaxPool3dSame((3, 3, 3), (2, 2, 2))
        self.pool5a = _MaxPool3dSame((2, 2, 2), (2, 2, 2))
        self.Mixed_3b = _I3DInceptionModule(192, (64, 96, 128, 16, 32, 32))
        self.Mixed_3c = _I3DInceptionModule(256, (128, 128, 192, 32, 96, 64))
        self.Mixed_4b = _I3DInceptionModule(480, (192, 96, 208, 16, 48, 64))
        self.Mixed_4c = _I3DInceptionModule(512, (160, 112, 224, 24, 64, 64))
        self.Mixed_4d = _I3DInceptionModule(512, (128, 128, 256, 24, 64, 64))
        self.Mixed_4e = _I3DInceptionModule(512, (112, 144, 288, 32, 64, 64))
        self.Mixed_4f = _I3DInceptionModule(528, (256, 160, 320, 32, 128, 128))
        self.Mixed_5b = _I3DInceptionModule(832, (256, 160, 320, 32, 128, 128))
        self.Mixed_5c = _I3DInceptionModule(832, (384, 192, 384, 48, 128, 128))
        self.logits = _Unit3D(1024, 400, use_bn=False, activation=False, bias=True)

    def forward(self, x):  # (B, 3, T, 224, 224) in [-1, 1]
        x = self.pool2a(self.Conv3d_1a_7x7(x))
        x = self.pool3a(self.Conv3d_2c_3x3(self.Conv3d_2b_1x1(x)))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = self.pool4a(x)
        for m in (self.Mixed_4b, self.Mixed_4c, self.Mixed_4d, self.Mixed_4e,
                  self.Mixed_4f):
            x = m(x)
        x = self.pool5a(x)
        x = self.Mixed_5c(self.Mixed_5b(x))
        x = F.avg_pool3d(x, (2, 7, 7), stride=1)
        x = self.logits(x)
        return x.mean(dim=(2, 3, 4))
