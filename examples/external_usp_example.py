"""Plug compactfusion-tpu's USP into YOUR OWN JAX model.

The reference ships a functional ``USP()`` exactly for this (external
projects that are not diffusers pipelines — ``xfuser/model_executor/layers/
usp.py:137-158`` and the ``*_usp_example.py`` scripts).  The TPU-native
analog is :func:`compactfusion_tpu.parallel.usp.usp_attention`: a pure
function over per-device shards inside ``shard_map`` — no engine, no
registry, no wrapper classes.

This script builds a toy transformer block from scratch (NOT a bundled
model), shards its sequence over ulysses x ring, swaps plain attention for
``usp_attention``, and checks the result against the single-device block.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/external_usp_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon plugin force-appends itself; pin CPU only when CPU was asked
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from compactfusion_tpu.parallel.usp import usp_attention

B, S, H, D = 1, 256, 8, 32
ULYSSES, RING = 2, 2


def my_block(params, x, attn_fn):
    """Your model's attention block — any code; only attn_fn is swapped."""
    qkv = x @ params["qkv"]
    q, k, v = jnp.split(qkv.reshape(B, -1, H, 3 * D), 3, axis=-1)
    o = attn_fn(q, k, v)
    return x + o.reshape(B, -1, H * D) @ params["out"]


def main():
    rng = np.random.default_rng(0)
    params = {
        "qkv": jnp.asarray(rng.standard_normal((H * D, 3 * H * D)) * 0.05, jnp.float32),
        "out": jnp.asarray(rng.standard_normal((H * D, H * D)) * 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((B, S, H * D)), jnp.float32)

    # single-device reference: plain softmax attention
    def plain_attn(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * D**-0.5
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    ref = my_block(params, x, plain_attn)

    # USP: sequence sharded over (ring, ulysses); ONE line changes
    devs = np.array(jax.devices()[: ULYSSES * RING]).reshape(RING, ULYSSES)
    mesh = Mesh(devs, ("ring", "ulysses"))

    def usp_attn(q, k, v):
        return usp_attention(
            q, k, v, ulysses_size=ULYSSES, ring_size=RING,
            ulysses_axis="ulysses", ring_axis="ring",
        )

    sharded = jax.jit(
        jax.shard_map(
            lambda p, x: my_block(p, x, usp_attn),
            mesh=mesh,
            in_specs=(P(), P(None, ("ring", "ulysses"), None)),
            out_specs=P(None, ("ring", "ulysses"), None),
            check_vma=False,
        )
    )
    out = sharded(params, x)

    err = float(
        jnp.linalg.norm(out - ref) / (jnp.linalg.norm(ref) + 1e-12)
    )
    print(f"usp (ulysses={ULYSSES} x ring={RING}) vs single-device rel err: {err:.2e}")
    assert err < 2e-5, err
    print("EXTERNAL USP OK")


if __name__ == "__main__":
    main()
