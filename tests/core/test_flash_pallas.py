"""Pallas flash attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse


def _qkv(b, sq, sk, h, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, sk, h, d)), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "b,sq,sk,h,d",
    [
        (1, 256, 256, 2, 128),
        (2, 512, 512, 4, 64),
        (1, 256, 1024, 2, 128),
    ],
)
def test_flash_matches_reference(b, sq, sk, h, d):
    q, k, v = _qkv(b, sq, sk, h, d)
    ref_o, ref_l = attn_with_lse(q, k, v, impl="xla")
    out, lse = flash_attn_with_lse(q, k, v, block_q=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_l), atol=2e-4)


def test_flash_unaligned_kv_masked():
    """Sk not a multiple of block_k exercises the masked kernel variant."""
    q, k, v = _qkv(1, 128, 384 + 64, h=2, d=64, seed=1)
    ref_o, ref_l = attn_with_lse(q, k, v, impl="xla")
    out, lse = flash_attn_with_lse(q, k, v, block_q=128, block_k=384, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_l), atol=2e-4)


def test_flash_bf16():
    q, k, v = _qkv(1, 256, 256, 2, 128, seed=2, dtype=jnp.bfloat16)
    ref_o, _ = attn_with_lse(q, k, v, impl="xla")
    out, _ = flash_attn_with_lse(q, k, v, block_q=128, block_k=128, interpret=True)
    assert out.dtype == jnp.bfloat16
    err = np.linalg.norm(
        np.asarray(out, np.float64) - np.asarray(ref_o, np.float64)
    ) / np.linalg.norm(np.asarray(ref_o, np.float64))
    assert err < 2e-2


def test_flash_kv_lens_prefix_mask():
    """Per-batch KV prefix lengths (text padding masks) in-kernel."""
    q, k, v = _qkv(2, 128, 384, h=2, d=64, seed=3)
    lens = jnp.asarray([100, 384], jnp.int32)
    ref_o, ref_l = attn_with_lse(q, k, v, impl="xla", kv_lens=lens)
    out, lse = flash_attn_with_lse(
        q, k, v, block_q=128, block_k=128, interpret=True, kv_lens=lens
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_l), atol=2e-4)


def test_flash_kv_lens_with_ragged_tail():
    """kv_lens combined with Sk % block_k != 0 padding."""
    q, k, v = _qkv(2, 64, 120, h=2, d=64, seed=4)
    lens = jnp.asarray([120, 77], jnp.int32)
    ref_o, _ = attn_with_lse(q, k, v, impl="xla", kv_lens=lens)
    out, _ = flash_attn_with_lse(
        q, k, v, block_q=64, block_k=128, interpret=True, kv_lens=lens
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-4)


def test_flash_exp_bf16():
    """Opt-in bf16 softmax exp (VPU relief at small head dims): output within
    bf16 rounding of the fp32-exp path, LSE still fp32-accurate for merging."""
    q, k, v = _qkv(1, 256, 256, h=2, d=72, seed=5)
    ref_o, ref_l = attn_with_lse(q, k, v, impl="xla")
    out, lse = flash_attn_with_lse(
        q, k, v, block_q=128, block_k=128, interpret=True, exp_bf16=True
    )
    scale = float(np.max(np.abs(np.asarray(ref_o, np.float32))))
    err = float(np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref_o, np.float32))))
    assert err / scale < 0.02, err / scale
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_l), atol=5e-3)


def test_flash_head_batched():
    """heads_per>1 (one program computes several heads) matches the
    single-head kernel and the XLA reference, incl. kv_lens masking."""
    q, k, v = _qkv(2, 256, 256, h=4, d=72, seed=6)
    lens = jnp.asarray([100, 256], jnp.int32)
    ref_o, ref_l = attn_with_lse(q, k, v, impl="xla", kv_lens=lens)
    for hp in (2, 4):
        out, lse = flash_attn_with_lse(
            q, k, v, block_q=128, block_k=128, interpret=True,
            heads_per=hp, kv_lens=lens,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_o), atol=2e-4)
        np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_l), atol=2e-4)


@pytest.mark.parametrize("window", [None, 96])
def test_flash_fuse_sum_on_off(window):
    """MXU-fused rowsum (ones-columns in v) == separate VPU sum-reduce.

    d=72 is the PixArt head dim whose lane padding makes the fusion free;
    the ragged Sk tail exercises masked columns (p == 0 must not perturb
    the fused l), and the window case the banded kernel's fused path.
    """
    sk = 256 if window is not None else 320  # window requires Sq == Sk
    q, k, v = _qkv(1, 256, sk, h=2, d=72, seed=7)
    kw = dict(block_q=128, block_k=128, interpret=True, window=window)
    out_f, lse_f = flash_attn_with_lse(q, k, v, fuse_sum=True, **kw)
    out_u, lse_u = flash_attn_with_lse(q, k, v, fuse_sum=False, **kw)
    # identical math modulo the bf16 cast of p feeding l in the fused path
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse_f), np.asarray(lse_u), atol=2e-4)
    if window is None:
        ref_o, ref_l = attn_with_lse(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_o), atol=2e-4)
        np.testing.assert_allclose(np.asarray(lse_f), np.asarray(ref_l), atol=2e-4)


@pytest.mark.parametrize("single_block", [False, True])
def test_flash_bhsd_io_layout(single_block):
    """bhsd_io=True takes/returns the kernel (B, H, S, D) layout directly;
    must match the default (B, S, H, D) path exactly (same kernel, no
    relayout error), including the single_block fastpath."""
    sk = 256 if single_block else 512
    q, k, v = _qkv(1, 256, sk, h=2, d=64, seed=7)
    kw = dict(block_q=128, block_k=256, interpret=True,
              single_block=single_block)
    ref_o, ref_l = flash_attn_with_lse(q, k, v, **kw)
    qt, kt, vt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    out, lse = flash_attn_with_lse(qt, kt, vt, bhsd_io=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))), np.asarray(ref_o)
    )
    np.testing.assert_array_equal(np.asarray(lse), np.asarray(ref_l))
