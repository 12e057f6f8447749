"""Per-component ablation of the FLUX-1024 double/single blocks on v5e.

Same dispatch-immune design as _prof2_dbg.py (PixArt): params generated
INSIDE the jit, a depth-N block scan inside a device-side fori_loop,
per-iteration time = (t(N_HI) - t(N_LO)) / (N_HI - N_LO).

Real shapes: B1, img 4096 tokens + txt 512 (1024px), dim 3072, 24 heads of
128.  BENCH_FLUX.json puts the forward at 59.8% MFU; FLOP accounting says
matmuls ~1044 GFLOP/double-block at ~86% + attention ~261 GFLOP leaves
~2.5 ms/block of VPU/glue (rope, qk-norm, layernorms, kernel layout) —
this harness attributes it.

    python _prof_flux.py                 # all double-block variants
    python _prof_flux.py full attn_bk768 # a subset
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.utils import jax_cache

jax_cache.enable()

from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.flux import flux_image_positions
from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

B = 1
D = 3072
H = 24
DH = 128
S_IMG = 4096  # 1024px, patch 2
S_TXT = 512
DEPTH = 4
N_LO, N_HI = 8, 40


def make_double_params(key):
    ks = iter(jax.random.split(key, 12))

    def nrm(shape, scale):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(
            jnp.bfloat16
        )

    def lin(i, o):
        return {
            "w": nrm((DEPTH, i, o), i**-0.5),
            "b": jnp.zeros((DEPTH, o), jnp.bfloat16),
        }

    return {
        "img_mod": lin(D, 6 * D),
        "txt_mod": lin(D, 6 * D),
        "img_qkv": lin(D, 3 * D),
        "txt_qkv": lin(D, 3 * D),
        "img_out": lin(D, D),
        "txt_out": lin(D, D),
        "img_ffn": {"fc1": lin(D, 4 * D), "fc2": lin(4 * D, D)},
        "txt_ffn": {"fc1": lin(D, 4 * D), "fc2": lin(4 * D, D)},
        "qg": jnp.ones((DEPTH, DH), jnp.bfloat16),
        "kg": jnp.ones((DEPTH, DH), jnp.bfloat16),
    }


def make_single_params(key):
    ks = iter(jax.random.split(key, 8))

    def nrm(shape, scale):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(
            jnp.bfloat16
        )

    def lin(i, o):
        return {
            "w": nrm((DEPTH, i, o), i**-0.5),
            "b": jnp.zeros((DEPTH, o), jnp.bfloat16),
        }

    return {
        "mod": lin(D, 3 * D),
        "qkv": lin(D, 3 * D),
        "mlp": {"fc1": lin(D, 4 * D), "fc2": lin(4 * D, D)},
        "out_attn": lin(D, D),
        "qg": jnp.ones((DEPTH, DH), jnp.bfloat16),
        "kg": jnp.ones((DEPTH, DH), jnp.bfloat16),
    }


def _heads(x):
    b, s, dd = x.shape
    return x.reshape(b, s, H, DH)


def _unheads(x):
    b, s, hh, dh = x.shape
    return x.reshape(b, s, hh * dh)


def _rope_half(x, cos_f, sin_f):
    """Rotate-half (NeoX) rope: pair (i, i+D/2) instead of (2i, 2i+1).
    Score-equivalent to interleaved rope after permuting Wq/Wk columns; the
    half-swap is one 64-lane rotation instead of a stride-2 interleave."""
    x32 = x.astype(jnp.float32)
    d2 = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., d2:], x32[..., :d2]], axis=-1)
    c = cos_f[None, :, None, :]
    s = sin_f[None, :, None, :]
    return (x32 * c + rot * s).astype(x.dtype)


def make_double_fwd(attn=True, ffn=True, rope=True, qknorm=True,
                    modulate=True, rope_impl="interleave", attn_kw=None):
    # fused_half fuses qk-norm INTO the rope pass, so it cannot compose with
    # the no_qknorm / no_rope ablations (it would silently measure both on)
    assert rope_impl != "fused_half" or (rope and qknorm), (
        "rope_impl='fused_half' requires rope=True and qknorm=True"
    )
    attn_kw = dict(attn_kw or {})

    def fwd(params, img, txt, temb, ropes):
        cos_i, sin_i, cos_t, sin_t = ropes

        def block(carry, p):
            img, txt = carry
            if modulate:
                i_m = jnp.split(
                    (cm.silu(temb) @ p["img_mod"]["w"] + p["img_mod"]["b"])[
                        :, None, :
                    ], 6, -1,
                )
                t_m = jnp.split(
                    (cm.silu(temb) @ p["txt_mod"]["w"] + p["txt_mod"]["b"])[
                        :, None, :
                    ], 6, -1,
                )
            else:
                i_m = t_m = [jnp.zeros((B, 1, D), jnp.bfloat16)] * 6
            img_n = cm.layernorm({}, img) * (1 + i_m[1]) + i_m[0]
            txt_n = cm.layernorm({}, txt) * (1 + t_m[1]) + t_m[0]

            iq, ik, iv = [
                _heads(x)
                for x in jnp.split(cm.linear(p["img_qkv"], img_n), 3, -1)
            ]
            tq, tk, tv = [
                _heads(x)
                for x in jnp.split(cm.linear(p["txt_qkv"], txt_n), 3, -1)
            ]
            if rope_impl == "fused_half":
                # ONE f32 round trip: rmsnorm + rotate-half rope fused
                def nr(x, g, c, s):
                    x32 = x.astype(jnp.float32)
                    y = x32 * jax.lax.rsqrt(
                        jnp.mean(x32 * x32, axis=-1, keepdims=True) + 1e-6
                    ) * g.astype(jnp.float32)
                    d2 = y.shape[-1] // 2
                    rot = jnp.concatenate([-y[..., d2:], y[..., :d2]], -1)
                    return (
                        y * c[None, :, None, :] + rot * s[None, :, None, :]
                    ).astype(x.dtype)

                ch_i = jnp.concatenate([cos_i, cos_i], -1)
                sh_i = jnp.concatenate([sin_i, sin_i], -1)
                ch_t = jnp.concatenate([cos_t, cos_t], -1)
                sh_t = jnp.concatenate([sin_t, sin_t], -1)
                iq, ik = nr(iq, p["qg"], ch_i, sh_i), nr(ik, p["kg"], ch_i, sh_i)
                tq, tk = nr(tq, p["qg"], ch_t, sh_t), nr(tk, p["kg"], ch_t, sh_t)
            else:
                if qknorm:
                    iq, ik = cm.rmsnorm({"g": p["qg"]}, iq), cm.rmsnorm({"g": p["kg"]}, ik)
                    tq, tk = cm.rmsnorm({"g": p["qg"]}, tq), cm.rmsnorm({"g": p["kg"]}, tk)
                if rope and rope_impl == "half":
                    ch_i = jnp.concatenate([cos_i, cos_i], -1)
                    sh_i = jnp.concatenate([sin_i, sin_i], -1)
                    ch_t = jnp.concatenate([cos_t, cos_t], -1)
                    sh_t = jnp.concatenate([sin_t, sin_t], -1)
                    iq, ik = _rope_half(iq, ch_i, sh_i), _rope_half(ik, ch_i, sh_i)
                    tq, tk = _rope_half(tq, ch_t, sh_t), _rope_half(tk, ch_t, sh_t)
                elif rope:
                    iq, ik = cm.apply_rope(iq, cos_i, sin_i), cm.apply_rope(ik, cos_i, sin_i)
                    tq, tk = cm.apply_rope(tq, cos_t, sin_t), cm.apply_rope(tk, cos_t, sin_t)
            q = jnp.concatenate([tq, iq], axis=1)
            k = jnp.concatenate([tk, ik], axis=1)
            v = jnp.concatenate([tv, iv], axis=1)
            if attn:
                o, _ = flash_attn_with_lse(q, k, v, **attn_kw)
            else:
                o = q
            txt_o, img_o = o[:, :S_TXT], o[:, S_TXT:]
            img = img + i_m[2] * cm.linear(p["img_out"], _unheads(img_o))
            txt = txt + t_m[2] * cm.linear(p["txt_out"], _unheads(txt_o))
            if ffn:
                img_n = cm.layernorm({}, img) * (1 + i_m[4]) + i_m[3]
                img = img + i_m[5] * cm.ffn(p["img_ffn"], img_n)
                txt_n = cm.layernorm({}, txt) * (1 + t_m[4]) + t_m[3]
                txt = txt + t_m[5] * cm.ffn(p["txt_ffn"], txt_n)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(block, (img, txt), params)
        return img, txt

    return fwd


def make_single_fwd(attn=True, ffn=True, rope=True, qknorm=True,
                    fused_carry=False, attn_kw=None):
    """fused_carry=True keeps the (txt|img) stream concatenated across the
    scan (one concat before, one split after) instead of re-concatenating
    and re-splitting the 28 MB stream EVERY block, as the production
    single_block does for the attn-strategy call shape."""
    attn_kw = dict(attn_kw or {})

    def fwd(params, img, txt, temb, ropes):
        cos_i, sin_i, cos_t, sin_t = ropes

        def body(x, p):
            m = jnp.split(
                (cm.silu(temb) @ p["mod"]["w"] + p["mod"]["b"])[:, None, :],
                3, -1,
            )
            xn = cm.layernorm({}, x) * (1 + m[1]) + m[0]
            q, k, v = [
                _heads(y) for y in jnp.split(cm.linear(p["qkv"], xn), 3, -1)
            ]
            if qknorm:
                q, k = cm.rmsnorm({"g": p["qg"]}, q), cm.rmsnorm({"g": p["kg"]}, k)
            if rope:
                tq, iq = q[:, :S_TXT], q[:, S_TXT:]
                tk, ik = k[:, :S_TXT], k[:, S_TXT:]
                iq, ik = cm.apply_rope(iq, cos_i, sin_i), cm.apply_rope(ik, cos_i, sin_i)
                tq, tk = cm.apply_rope(tq, cos_t, sin_t), cm.apply_rope(tk, cos_t, sin_t)
                q = jnp.concatenate([tq, iq], axis=1)
                k = jnp.concatenate([tk, ik], axis=1)
            if attn:
                o, _ = flash_attn_with_lse(q, k, v, **attn_kw)
            else:
                o = q
            y = cm.linear(p["out_attn"], _unheads(o))
            if ffn:
                y = y + cm.ffn(p["mlp"], xn)
            return x + m[2] * y

        if fused_carry:
            x = jnp.concatenate([txt, img], axis=1)

            def block(x, p):
                return body(x, p), None

            x, _ = jax.lax.scan(block, x, params)
            return x[:, S_TXT:], x[:, :S_TXT]

        def block(carry, p):
            img, txt = carry
            x = jnp.concatenate([txt, img], axis=1)
            x = body(x, p)
            return (x[:, S_TXT:], x[:, :S_TXT]), None

        (img, txt), _ = jax.lax.scan(block, (img, txt), params)
        return img, txt

    return fwd


def make_runner(n, family, **kw):
    fwd = (make_double_fwd if family == "double" else make_single_fwd)(**kw)
    make_params = (
        make_double_params if family == "double" else make_single_params
    )
    hp = wp = 64  # 1024px -> 128 latent (vae /8) -> 64x64 patch-2 tokens
    pos_img = flux_image_positions(hp, wp)
    cos_i, sin_i = cm.rope_frequencies(pos_img, (16, 56, 56))
    pos_txt = jnp.stack(
        [jnp.zeros((S_TXT,), jnp.int32)] * 3, axis=-1
    ).at[:, 0].set(0)
    cos_t, sin_t = cm.rope_frequencies(pos_txt, (16, 56, 56))

    @jax.jit
    def run(key):
        params = make_params(key)
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 1), 3)
        img0 = jax.random.normal(k1, (B, S_IMG, D), jnp.bfloat16)
        txt0 = jax.random.normal(k2, (B, S_TXT, D), jnp.bfloat16)
        temb = jax.random.normal(k3, (B, D), jnp.bfloat16)
        ropes = (cos_i, sin_i, cos_t, sin_t)

        def body(i, carry):
            img, txt = carry
            return fwd(params, img + (i * 0.0), txt, temb, ropes)

        img, txt = jax.lax.fori_loop(0, n, body, (img0, txt0))
        return jnp.sum(img.astype(jnp.float32)) + jnp.sum(
            txt.astype(jnp.float32)
        )

    return run


def timed(run, key):
    t0 = time.time()
    v = float(np.asarray(run(key)))
    return time.time() - t0, v


variants = [
    ("full", "double", {}),
    ("no_attn", "double", {"attn": False}),
    ("no_ffn", "double", {"ffn": False}),
    ("no_rope", "double", {"rope": False}),
    ("no_qknorm", "double", {"qknorm": False}),
    ("no_mod", "double", {"modulate": False}),
    # rope layout: score-equivalent rotate-half (after a Wq/Wk column
    # permutation) replaces the stride-2 pair interleave with one 64-lane
    # rotation; fused_half additionally merges qk-norm + rope into one f32
    # round trip (timing-representative; checksum differs from full)
    ("rope_half", "double", {"rope_impl": "half"}),
    ("fused_norm_rope", "double", {"rope_impl": "fused_half"}),
    # K padding: sk=4608 with block_k=1024 pads to 5120 (11% wasted attn
    # FLOPs in masked-out blocks); 768 divides 4608 exactly
    ("attn_bk768", "double", {"attn_kw": {"block_k": 768}}),
    ("attn_bk512", "double", {"attn_kw": {"block_k": 512}}),
    ("attn_bq1024_bk768", "double",
     {"attn_kw": {"block_q": 1024, "block_k": 768}}),
    ("s_full", "single", {}),
    ("s_no_attn", "single", {"attn": False}),
    ("s_no_ffn", "single", {"ffn": False}),
    ("s_fused_carry", "single", {"fused_carry": True}),
    ("s_bk768", "single", {"attn_kw": {"block_k": 768}}),
    ("s_fused_bk768", "single",
     {"fused_carry": True, "attn_kw": {"block_k": 768}}),
]
if len(sys.argv) > 1:
    variants = [v for v in variants if v[0] in sys.argv[1:]]

key = jax.random.PRNGKey(0)
for name, family, kw in variants:
    lo, hi = make_runner(N_LO, family, **kw), make_runner(N_HI, family, **kw)
    t_lo, v = timed(lo, key)
    t_lo2, _ = timed(lo, key)
    t_hi, _ = timed(hi, key)
    t_hi2, _ = timed(hi, key)
    per_iter = (t_hi2 - t_lo2) / (N_HI - N_LO) * 1e3
    per_block = per_iter / DEPTH
    print(
        f"{name:20s} {per_iter:8.3f} ms/scan4  {per_block:7.3f} ms/block  "
        f"(compiles {t_lo:5.1f}/{t_hi:5.1f}s, chk {v:.3e})",
        flush=True,
    )
