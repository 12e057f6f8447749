"""Fused ring flash attention (RDMA + flash in one Pallas kernel) vs the
ppermute reference path, on the interpret-mode multi-device emulator."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.ops.ring_flash_pallas import ring_flash_attn_with_lse
from tests.helpers import rel_err


def _mesh(ring):
    devs = np.array(jax.devices()[:ring])
    return Mesh(devs, ("ring",))


@pytest.mark.parametrize("ring", [2, 4])
def test_fused_ring_matches_full_attention(ring):
    b, s, h, d = 1, 64 * ring, 2, 16
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)

    ref, ref_lse = attn_with_lse(q, k, v)

    mesh = _mesh(ring)
    fused = functools.partial(
        ring_flash_attn_with_lse,
        axis_name="ring",
        ring_size=ring,
        mesh_axes=(("ring", ring),),
        block_q=32,
        block_k=32,
        interpret=pltpu.InterpretParams(dma_execution_mode="eager"),
    )
    out, lse = jax.jit(
        jax.shard_map(
            fused,
            mesh=mesh,
            in_specs=(P(None, "ring"), P(None, "ring"), P(None, "ring")),
            out_specs=(P(None, "ring"), P(None, None, "ring")),
            check_vma=False,
        )
    )(q, k, v)

    assert rel_err(out, ref) < 2e-5, rel_err(out, ref)
    assert rel_err(lse, ref_lse) < 2e-5, rel_err(lse, ref_lse)


def test_fused_ring_ragged_tail():
    """Shard length not divisible by block_k: padded keys must be masked."""
    ring, b, h, d = 2, 1, 2, 16
    s = 40 * ring  # 40 per shard, block_k 32 -> ragged
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    ref, _ = attn_with_lse(q, k, v)
    mesh = _mesh(ring)
    fused = functools.partial(
        ring_flash_attn_with_lse,
        axis_name="ring",
        ring_size=ring,
        mesh_axes=(("ring", ring),),
        block_q=32,
        block_k=32,
        interpret=pltpu.InterpretParams(dma_execution_mode="eager"),
    )
    out, _ = jax.jit(
        jax.shard_map(
            fused,
            mesh=mesh,
            in_specs=(P(None, "ring"), P(None, "ring"), P(None, "ring")),
            out_specs=(P(None, "ring"), P(None, None, "ring")),
            check_vma=False,
        )
    )(q, k, v)
    assert rel_err(out, ref) < 2e-5, rel_err(out, ref)


def test_fused_ring_with_joint_text():
    """ring_attention(fused=...) path incl. the replicated joint (text)
    block merged after the ring kernel."""
    from compactfusion_tpu.parallel.ring import ring_attention

    ring, b, h, d, sj = 4, 1, 2, 16, 24
    s = 32 * ring
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    jk = jnp.asarray(rng.standard_normal((b, sj, h, d)), jnp.float32)
    jv = jnp.asarray(rng.standard_normal((b, sj, h, d)), jnp.float32)

    mesh = _mesh(ring)

    def run(fused):
        f = functools.partial(
            ring_attention,
            axis_name="ring",
            ring_size=ring,
            joint_strategy="rear",
            fused=fused,
        )
        return jax.jit(
            jax.shard_map(
                lambda q, k, v, jk, jv: f(q, k, v, joint_k=jk, joint_v=jv),
                mesh=mesh,
                in_specs=(P(None, "ring"), P(None, "ring"), P(None, "ring"),
                          P(), P()),
                out_specs=P(None, "ring"),
                check_vma=False,
            )
        )(q, k, v, jk, jv)

    ref = run(False)
    out = run("interpret")
    assert rel_err(out, ref) < 2e-5, rel_err(out, ref)
