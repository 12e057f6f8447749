"""Hybrid ulysses x ring (USP) attention vs single-device reference.

Analog of reference ``tests/core/test_xfuser_attn.py`` (sp=8 split into
ulysses x ring combinations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES, make_mesh
from compactfusion_tpu.parallel.usp import usp_attention

B, S, H, D = 2, 64, 8, 16
SEQ_SPEC = P(None, (AXIS_RING, AXIS_ULYSSES), None, None)


def _qkv(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("u,r", [(8, 1), (1, 8), (2, 4), (4, 2), (2, 2), (1, 1)])
def test_usp_matches_full_attention(u, r):
    q, k, v = _qkv(u * 10 + r)
    mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))
    f = jax.shard_map(
        lambda q, k, v: usp_attention(q, k, v, ulysses_size=u, ring_size=r),
        mesh=mesh,
        in_specs=(SEQ_SPEC, SEQ_SPEC, SEQ_SPEC),
        out_specs=SEQ_SPEC,
    )
    out = f(q, k, v)
    ref, _ = attn_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("u,r", [(2, 4), (4, 2), (2, 2)])
def test_usp_with_joint_tensors(u, r):
    """Joint (text) q/k/v replicated across SP ranks, appended 'rear'.

    Per-device output carries the joint rows; strip them inside the body
    (like the reference pipelines slice off the encoder tokens) and check
    image rows against full attention over [image; text] keys.
    """
    sj = 8
    q, k, v = _qkv(5)
    rng = np.random.default_rng(6)
    mk = lambda s: jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    jq, jk, jv = mk(sj), mk(sj), mk(sj)
    mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))

    def body(q, k, v, jq, jk, jv):
        out = usp_attention(
            q,
            k,
            v,
            ulysses_size=u,
            ring_size=r,
            joint_q=jq,
            joint_k=jk,
            joint_v=jv,
            joint_strategy="rear",
        )
        return out[:, : q.shape[1]]  # strip joint rows

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(SEQ_SPEC, SEQ_SPEC, SEQ_SPEC, P(), P(), P()),
        out_specs=SEQ_SPEC,
    )
    out = f(q, k, v, jq, jk, jv)
    k_full = jnp.concatenate([k, jk], axis=1)
    v_full = jnp.concatenate([v, jv], axis=1)
    ref, _ = attn_with_lse(q, k_full, v_full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_usp_joint_rows_output(u=2, r=2):
    """The joint output rows themselves must equal full attention of jq."""
    sj = 8
    q, k, v = _qkv(7)
    rng = np.random.default_rng(8)
    mk = lambda s: jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    jq, jk, jv = mk(sj), mk(sj), mk(sj)
    mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))

    def body(q, k, v, jq, jk, jv):
        out = usp_attention(
            q, k, v,
            ulysses_size=u, ring_size=r,
            joint_q=jq, joint_k=jk, joint_v=jv, joint_strategy="rear",
        )
        return out[:, q.shape[1] :]  # joint rows only (replicated per rank)

    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(SEQ_SPEC, SEQ_SPEC, SEQ_SPEC, P(), P(), P()),
        out_specs=P(None, None, None, None),
        check_vma=False,
    )
    out = f(q, k, v, jq, jk, jv)
    k_full = jnp.concatenate([k, jk], axis=1)
    v_full = jnp.concatenate([v, jv], axis=1)
    ref, _ = attn_with_lse(jq, k_full, v_full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
