"""Where do the 21 ms/forward go? matmul floor vs attention vs elementwise.

Times on the real chip:
  1. full PixArt forward (28 blocks, B=2, S=1024)
  2. the bare matmul chain of one block x28 (no LN/modulation/softmax)
  3. flash attention alone x28
  4. forward with depth 14 (slope -> per-block cost)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.models.pixart import (
    init_pixart, pixart_alpha_512, pixart_forward,
)
from compactfusion_tpu.models import common as cm

cfg = pixart_alpha_512()
params = init_pixart(jax.random.PRNGKey(0), cfg)
B, S, St, d = 2, 1024, 120, cfg.dim
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, S, cfg.patch**2 * cfg.in_channels)), jnp.bfloat16)
text = jnp.asarray(rng.standard_normal((B, St, cfg.text_dim)), jnp.float32)
t = jnp.asarray([500.0, 500.0], jnp.float32)
pos = jnp.asarray(rng.standard_normal((S, d)), jnp.float32)

checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

def timeit(f, *a, n=20):
    r = f(*a)
    float(np.asarray(checksum(jax.tree_util.tree_leaves(r)[0])))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    float(np.asarray(checksum(jax.tree_util.tree_leaves(r)[0])))
    return (time.perf_counter() - t0) / n * 1e3

fwd = jax.jit(lambda p, x, t, tx: pixart_forward(p, x, t, tx, cfg, pos_embed=pos)[0])
t_full = timeit(fwd, params, x, t, text)

# bare matmul chain of one block (qkv, attn_out, cross_q, cross_kv(text), cross_out, ffn1, ffn2) x 28
bp = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
def matmul_chain(bp, x, txt):
    def body(h, p):
        qkv = h @ p["attn_qkv"]["w"]
        o = qkv[:, :, :d] @ p["attn_out"]["w"]
        h = h + o
        q = h @ p["cross_q"]["w"]
        kv = txt @ p["cross_kv"]["w"]
        h = h + q @ p["cross_out"]["w"] + jnp.sum(kv) * 0
        f1 = h @ p["ffn"]["fc1"]["w"]
        h = h + f1 @ p["ffn"]["fc2"]["w"]
        return h, None
    h, _ = jax.lax.scan(body, x, params["blocks"])
    return h

txt_d = jnp.asarray(rng.standard_normal((B, St, d)), jnp.bfloat16)
xh = jnp.asarray(rng.standard_normal((B, S, d)), jnp.bfloat16)
mm = jax.jit(lambda bp, x, txt: matmul_chain(bp, x, txt))
t_mm = timeit(mm, bp, xh, txt_d)

# flash attention x28
from compactfusion_tpu.ops.attention import sdpa
q = jnp.asarray(rng.standard_normal((B, S, cfg.heads, cfg.head_dim)), jnp.bfloat16)
def attn28(q):
    def body(h, _):
        o = sdpa(h, h, h)
        return o, None
    h, _ = jax.lax.scan(body, q, None, length=28)
    return h
at = jax.jit(attn28)
t_at = timeit(at, q)

# depth-14 forward for slope
import dataclasses
cfg14 = dataclasses.replace(cfg, depth=14)
p14 = dict(params)
p14["blocks"] = jax.tree_util.tree_map(lambda a: a[:14], params["blocks"])
fwd14 = jax.jit(lambda p, x, t, tx: pixart_forward(p, x, t, tx, cfg14, pos_embed=pos)[0])
t_14 = timeit(fwd14, p14, x, t, text)

per_block = (t_full - t_14) / 14
print(f"full fwd 28:      {t_full:8.3f} ms")
print(f"fwd 14:           {t_14:8.3f} ms")
print(f"per-block:        {per_block:8.3f} ms  -> 28 blocks = {per_block*28:.3f} ms, overhead = {t_full-per_block*28:.3f} ms")
print(f"matmul chain x28: {t_mm:8.3f} ms")
print(f"self-attn x28:    {t_at:8.3f} ms")
