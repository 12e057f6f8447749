"""Ring attention vs single-device reference.

Analog of reference ``tests/core/test_ring_flash_attn.py`` (ring output must
match a full single-device flash attention), but on the fake 8-CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.ops.merge import merge_out_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING, make_mesh
from compactfusion_tpu.parallel.ring import ring_attention

B, S, H, D = 2, 64, 4, 32


def _qkv(seed=0, s=S):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    return mk(), mk(), mk()


def _run_ring(q, k, v, ring_size, causal=False, joint=None, joint_strategy="none"):
    mesh = make_mesh(ParallelConfig(ring_degree=ring_size))
    spec = P(None, AXIS_RING, None, None)
    jk = jv = None
    in_specs = [spec, spec, spec]
    args = [q, k, v]
    if joint is not None:
        jk, jv = joint
        in_specs += [P(), P()]
        args += [jk, jv]

    def body(q, k, v, *j):
        jk, jv = j if j else (None, None)
        return ring_attention(
            q,
            k,
            v,
            axis_name=AXIS_RING,
            ring_size=ring_size,
            causal=causal,
            joint_k=jk,
            joint_v=jv,
            joint_strategy=joint_strategy,
        )

    f = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs), out_specs=spec)
    return f(*args)


@pytest.mark.parametrize("ring_size", [1, 2, 4, 8])
def test_ring_matches_full_attention(ring_size):
    q, k, v = _qkv(0)
    ref, _ = attn_with_lse(q, k, v)
    out = _run_ring(q, k, v, ring_size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("ring_size", [2, 4])
def test_causal_ring(ring_size):
    q, k, v = _qkv(1)
    ref, _ = attn_with_lse(q, k, v, causal=True)
    out = _run_ring(q, k, v, ring_size, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("joint_strategy", ["front", "rear"])
def test_ring_with_joint_kv(joint_strategy):
    """Replicated joint (text) K/V must contribute exactly once."""
    ring_size, sj = 4, 16
    q, k, v = _qkv(2)
    rng = np.random.default_rng(3)
    jk = jnp.asarray(rng.standard_normal((B, sj, H, D)), jnp.float32)
    jv = jnp.asarray(rng.standard_normal((B, sj, H, D)), jnp.float32)
    if joint_strategy == "front":
        k_full = jnp.concatenate([jk, k], axis=1)
        v_full = jnp.concatenate([jv, v], axis=1)
    else:
        k_full = jnp.concatenate([k, jk], axis=1)
        v_full = jnp.concatenate([v, jv], axis=1)
    ref, _ = attn_with_lse(q, k_full, v_full)
    out = _run_ring(
        q, k, v, ring_size, joint=(jk, jv), joint_strategy=joint_strategy
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_merge_out_lse_is_exact():
    """Merging two disjoint KV blocks == attention over the concatenation."""
    q, k, v = _qkv(4)
    k1, k2 = k[:, :32], k[:, 32:]
    v1, v2 = v[:, :32], v[:, 32:]
    o1, l1 = attn_with_lse(q, k1, v1)
    o2, l2 = attn_with_lse(q, k2, v2)
    out, lse = merge_out_lse(None, None, o1, l1)
    out, lse = merge_out_lse(out, lse, o2, l2)
    ref, ref_lse = attn_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=2e-5)
