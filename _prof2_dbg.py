"""Per-component ablation of the PixArt-512 block on the real chip.

Tunnel-latency-immune design: params are generated INSIDE the jit, the
28-block forward runs in a device-side fori_loop, and per-iteration time is
(t(N_HI) - t(N_LO)) / (N_HI - N_LO) — constant dispatch overhead and the
param-gen cost cancel in the subtraction.  All compiles hit the persistent
cache on retries.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.utils import jax_cache

jax_cache.enable()

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.pixart import pixart_alpha_512
from compactfusion_tpu.ops.attention import attn_with_lse, sdpa
from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

cfg = pixart_alpha_512()
d, h, L = cfg.dim, cfg.heads, cfg.depth
B, S, St = 2, 1024, 120
N_LO, N_HI = 20, 120


def make_params(key):
    ks = iter(jax.random.split(key, 16))

    def nrm(shape, scale):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(
            jnp.bfloat16
        )

    def lin(i, o):
        return {"w": nrm((L, i, o), i**-0.5), "b": jnp.zeros((L, o), jnp.bfloat16)}

    return {
        "scale_shift_table": nrm((L, 6, d), 0.02),
        "attn_qkv": lin(d, 3 * d),
        "attn_out": lin(d, d),
        "cross_q": lin(d, d),
        "cross_kv": lin(d, 2 * d),
        "cross_out": lin(d, d),
        "ffn": {"fc1": lin(d, 4 * d), "fc2": lin(4 * d, d)},
    }


def _heads(x):
    b, s, dd = x.shape
    return x.reshape(b, s, h, dd // h)


def _unheads(x):
    b, s, hh, dh = x.shape
    return x.reshape(b, s, hh * dh)


def _plumb(q, k, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, hh, dh = q.shape
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    def kern(q_ref, k_ref, v_ref, o_ref):
        o_ref[0, 0] = q_ref[0, 0] + k_ref[0, 0] + v_ref[0, 0]

    out = pl.pallas_call(
        kern,
        grid=(b, hh, 1, 1),
        in_specs=[pl.BlockSpec((1, 1, s, dh), lambda b, h, qi, ki: (b, h, qi, 0))] * 3,
        out_specs=pl.BlockSpec((1, 1, s, dh), lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hh, s, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3 + ("arbitrary",),
        ),
    )(qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))


def _splash(q, k, v):
    """jax.experimental splash-attention head-to-head (VERDICT r3 #1).

    Splash applies no softmax scale internally — fold it into q."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    b, s, hh, dh = q.shape
    mask = sm.MultiHeadMask([sm.FullMask((s, s)) for _ in range(hh)])
    kernel = sk.make_splash_mha_single_device(mask=mask)
    qt = jnp.transpose((q * dh**-0.5).astype(q.dtype), (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = jax.vmap(kernel)(qt, kt, vt)
    return jnp.transpose(out, (0, 2, 1, 3))


def make_fwd(self_attn=True, cross=True, ffn=True, modulate=True,
             cross_impl="auto", self_kw=None):
    """28-block forward as a scan; text/mod inputs generated in-jit."""

    def fwd(params, x, text_d, mod6, lens):
        def block(carry, p):
            x = carry
            table = p["scale_shift_table"][None] + mod6
            sh_a, sc_a, g_a, sh_m, sc_m, g_m = [
                table[:, i][:, None] for i in range(6)
            ]
            if modulate:
                xn = cm.layernorm({}, x) * (1 + sc_a) + sh_a
            else:
                xn = x
            if self_attn and self_kw == "bhsd_io":
                # kernel-layout I/O: qkv is produced straight into
                # (B,H,S,Dh) by einsum (XLA can fuse the relayout into the
                # matmul epilogue) and attn_out consumes (B,H,S,Dh) directly
                # — measures whether the explicit transpose copies around
                # the pallas call are removable
                dh = d // h
                w3 = p["attn_qkv"]["w"].reshape(d, 3, h, dh)
                b3 = p["attn_qkv"]["b"].reshape(3, h, dh)
                qkv3 = (
                    jnp.einsum("bsd,dthc->tbhsc", xn, w3)
                    + b3[:, None, :, None, :]
                ).astype(jnp.bfloat16)
                o, _ = flash_attn_with_lse(
                    qkv3[0], qkv3[1], qkv3[2], bhsd_io=True
                )
                wo = p["attn_out"]["w"].reshape(h, dh, d)
                attn_o = (
                    jnp.einsum("bhsc,hcd->bsd", o, wo) + p["attn_out"]["b"]
                ).astype(jnp.bfloat16)
                x = x + g_a * attn_o
                q = None  # signal: attention already applied
            else:
                qkv = cm.linear(p["attn_qkv"], xn)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            if self_attn and self_kw == "bhsd_io":
                pass  # attention + residual already applied above
            elif self_attn:
                if self_kw == "splash_probe":
                    o = _splash(_heads(q), _heads(k), _heads(v))
                elif self_kw == "plumb_probe":
                    # everything flash costs in-model EXCEPT the S^2 math:
                    # same (B,S,H,D)->(B,H,S,D) transposes, same BlockSpecs,
                    # a kernel that reads q/k/v blocks and writes one out
                    o = _plumb(_heads(q), _heads(k), _heads(v))
                elif self_kw == "transpose_probe":
                    # cost of the kernel-layout round trip alone:
                    # (B,S,H,D) -> (B,H,S,D) -> back, barriers stop fusion
                    qt = jnp.transpose(_heads(q), (0, 2, 1, 3))
                    qt = jax.lax.optimization_barrier(qt)
                    o = jnp.transpose(qt, (0, 2, 1, 3))
                elif self_kw is not None:
                    o, _ = flash_attn_with_lse(
                        _heads(q), _heads(k), _heads(v), **self_kw
                    )
                else:
                    o = sdpa(_heads(q), _heads(k), _heads(v))
            else:
                o = _heads(q)
            if not (self_attn and self_kw == "bhsd_io"):
                x = x + g_a * cm.linear(p["attn_out"], _unheads(o))
            if cross:
                q = cm.linear(p["cross_q"], x)
                kv = cm.linear(p["cross_kv"], text_d)
                k2, v2 = jnp.split(kv, 2, axis=-1)
                if cross_impl == "xla":
                    o, _ = attn_with_lse(
                        _heads(q), _heads(k2), _heads(v2), impl="xla",
                        kv_lens=lens,
                    )
                else:
                    o = sdpa(_heads(q), _heads(k2), _heads(v2), kv_lens=lens)
                x = x + cm.linear(p["cross_out"], _unheads(o))
            if ffn:
                if modulate:
                    xn = cm.layernorm({}, x) * (1 + sc_m) + sh_m
                else:
                    xn = x
                x = x + g_m * cm.ffn(p["ffn"], xn)
            return x, None

        x, _ = jax.lax.scan(block, x, params)
        return x

    return fwd


def make_runner(n, **kw):
    fwd = make_fwd(**kw)

    @jax.jit
    def run(key):
        params = make_params(key)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
        x0 = jax.random.normal(k1, (B, S, d), jnp.bfloat16)
        text_d = jax.random.normal(k2, (B, St, d), jnp.bfloat16)
        mod6 = jax.random.normal(k3, (B, 6, d), jnp.bfloat16)
        lens = jnp.full((B,), St, jnp.int32)

        def body(i, x):
            # fold the step in so XLA cannot hoist the loop body
            return fwd(params, x + (i * 0.0), text_d, mod6, lens)

        x = jax.lax.fori_loop(0, n, body, x0)
        return jnp.sum(x.astype(jnp.float32))

    return run


def timed(run, key):
    t0 = time.time()
    v = float(np.asarray(run(key)))
    return time.time() - t0, v


variants = [
    ("full", {}),
    ("no_self_attn", {"self_attn": False}),
    ("no_cross", {"cross": False}),
    ("no_ffn", {"ffn": False}),
    ("no_modulation", {"modulate": False}),
    ("cross_xla", {"cross_impl": "xla"}),
    ("self_bq512", {"self_kw": {"block_q": 512}}),
    ("self_bf16exp", {"self_kw": {"exp_bf16": True}}),
    ("self_fuseoff", {"self_kw": {"fuse_sum": False}}),
    ("self_fuseon", {"self_kw": {"fuse_sum": True}}),
    ("self_fuse_bf16exp", {"self_kw": {"fuse_sum": True, "exp_bf16": True}}),
    ("self_bq512_bf16exp", {"self_kw": {"block_q": 512, "exp_bf16": True}}),
    ("self_transpose", {"self_kw": "transpose_probe"}),
    ("self_hp2", {"self_kw": {"heads_per": 2}}),
    ("self_hp4", {"self_kw": {"heads_per": 4}}),
    ("self_hp2_bq512", {"self_kw": {"heads_per": 2, "block_q": 512}}),
    ("self_hp4_bq256", {"self_kw": {"heads_per": 4, "block_q": 256}}),
    ("self_plumb", {"self_kw": "plumb_probe"}),
    ("self_splash", {"self_kw": "splash_probe"}),
    ("self_bhsd_io", {"self_kw": "bhsd_io"}),
    # round 4: attack the S^2 VPU chain (scale, max, sub, exp, astype)
    ("self_singleoff", {"self_kw": {"single_block": False}}),
    ("self_singleon", {"self_kw": {"single_block": True}}),
    ("self_fold", {"self_kw": {"fold_scale": True}}),
    ("self_sbf16", {"self_kw": {"score_bf16": True}}),
    ("self_fold_sbf16", {"self_kw": {"fold_scale": True, "score_bf16": True}}),
    ("self_fold_sbf16_bq512",
     {"self_kw": {"fold_scale": True, "score_bf16": True, "block_q": 512}}),
]
if len(sys.argv) > 1:
    variants = [v for v in variants if v[0] in sys.argv[1:]]

key = jax.random.PRNGKey(0)
for name, kw in variants:
    lo, hi = make_runner(N_LO, **kw), make_runner(N_HI, **kw)
    t_lo, v = timed(lo, key)  # compile+run
    t_lo2, _ = timed(lo, key)
    t_hi, _ = timed(hi, key)  # compile+run
    t_hi2, _ = timed(hi, key)
    per_iter = (t_hi2 - t_lo2) / (N_HI - N_LO) * 1e3
    print(
        f"{name:16s} {per_iter:8.3f} ms/fwd   "
        f"(lo {t_lo2:6.2f}s hi {t_hi2:6.2f}s, compiles {t_lo:5.1f}/{t_hi:5.1f}s, "
        f"chk {v:.3e})",
        flush=True,
    )
