"""Where does the flash kernel's time go at PixArt shapes? (B2 H16 S1024 d72)

Doctored copies of the single-block kernel with individual stages disabled
(DCE removes the stage and its inputs), timed dispatch-immune: the kernel
runs inside a device-side fori_loop, per-call time = (t(120) - t(20)) / 100.
The delta vs "full" is that stage's cost.  Pure probe — production kernel in
compactfusion_tpu/ops/flash_pallas.py is untouched.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compactfusion_tpu.utils import jax_cache

jax_cache.enable()

B, H, S, D = 2, 16, 1024, 72
SCALE = D**-0.5
N_LO, N_HI = 20, 120


def kernel(q_ref, k_ref, v_ref, o_ref, *, parts):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if not parts:  # dma_only: same blocks in/out, no S^2 work
        o_ref[0, 0] = q + k + v
        return
    if "qk" in parts:
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # S^2 block without the matmul (one cheap broadcast)
        s = jnp.broadcast_to(q[:, :1].astype(jnp.float32), (S, S))
    if "scale" in parts:
        s = s * SCALE
    if "max" in parts:
        m = jnp.max(s, axis=-1, keepdims=True)
    else:
        m = jnp.float32(0.0)
    if "exp" in parts:
        p = jnp.exp(s - m)
    else:
        p = s - m
    if "av" in parts:
        ones = jnp.ones((v.shape[0], 8), v.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), jnp.concatenate([v, ones], axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = pv[:, D : D + 1]
        acc = pv[:, :D]
    else:
        l = jnp.sum(p[:, :8], axis=-1, keepdims=True, dtype=jnp.float32)
        acc = p[:, :D].astype(jnp.float32)
    o_ref[0, 0] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def build(parts):
    f = pl.pallas_call(
        functools.partial(kernel, parts=parts),
        grid=(B, H, 1, 1),
        in_specs=[
            pl.BlockSpec((1, 1, S, D), lambda b, h, qi, ki: (b, h, qi, 0))
        ] * 3,
        out_specs=pl.BlockSpec((1, 1, S, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * 3 + ("arbitrary",),
        ),
    )

    @jax.jit
    def run(key, n):
        q = jax.random.normal(key, (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, S, D), jnp.bfloat16)

        def body(i, x):
            return f(q + x[0, 0, 0, 0] * 0, k, v)

        x = jax.lax.fori_loop(0, n, body, q)
        return jnp.sum(x.astype(jnp.float32))

    return run


def build_real():
    """The PRODUCTION kernel (flash_attn_with_lse, auto single_block +
    fuse_sum, includes the (B,S,H,D)->(B,H,S,D) transposes and the LSE
    output) in the same dispatch-immune harness, for a floor-vs-real
    comparison against the doctored variants above."""
    from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse

    @jax.jit
    def run(key, n):
        q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, S, H, D), jnp.bfloat16)

        def body(i, x):
            o, _ = flash_attn_with_lse(q + x[0, 0, 0, 0] * 0, k, v)
            return o

        x = jax.lax.fori_loop(0, n, body, q)
        return jnp.sum(x.astype(jnp.float32))

    return run


ALL = ("qk", "scale", "max", "exp", "av")
variants = [
    ("full", ALL),
    ("dma_only", ()),  # reads q,k,v, writes (no S^2 block at all)
    ("no_scale", ("qk", "max", "exp", "av")),
    ("no_max", ("qk", "scale", "exp", "av")),
    ("no_exp", ("qk", "scale", "max", "av")),
    ("no_qk", ("scale", "max", "exp", "av")),
    ("no_av", ("qk", "scale", "max", "exp")),
    ("matmuls_only", ("qk", "av")),
    ("real", None),  # production flash_attn_with_lse (see build_real)
]
if len(sys.argv) > 1:
    variants = [v for v in variants if v[0] in sys.argv[1:]]

REPS = 3
key = jax.random.PRNGKey(0)
for name, parts in variants:
    run = build_real() if name == "real" else build(parts)
    for n in (N_LO, N_HI):
        float(np.asarray(run(key, n)))  # compile
    t_lo, t_hi = [], []
    for _ in range(REPS):  # tunnel throughput varies run to run: take mins
        t0 = time.time(); float(np.asarray(run(key, N_LO))); t_lo.append(time.time() - t0)
        t0 = time.time(); float(np.asarray(run(key, N_HI))); t_hi.append(time.time() - t0)
    per_call = (min(t_hi) - min(t_lo)) / (N_HI - N_LO) * 1e6
    per_prog = per_call / (B * H)
    print(f"{name:14s} {per_call:9.1f} us/call  {per_prog:7.2f} us/program", flush=True)
