"""Patch-parallel / DistriFusion attention tests.

Mirrors the reference patchpara semantics (compact/patchpara/fwd.py): sync
gather is exact; compressed gather tracks with EF and stays consistent;
async (DistriFusion) uses one-step-stale remote KV — exact at warmup, close
on slowly drifting activations afterwards.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING, make_mesh
from compactfusion_tpu.parallel.patch import PatchParallelAttn

B, S, H, D = 1, 64, 4, 16
W = 4


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _drift(n_steps, drift=0.03, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, H, D))
    k = rng.standard_normal((B, S, H, D))
    v = rng.standard_normal((B, S, H, D))
    out = []
    for _ in range(n_steps):
        q = q + drift * rng.standard_normal(q.shape)
        k = k + drift * rng.standard_normal(k.shape)
        v = v + drift * rng.standard_normal(v.shape)
        out.append(tuple(jnp.asarray(x, jnp.float32) for x in (q, k, v)))
    return out


@functools.lru_cache(maxsize=None)
def _runner(impl: PatchParallelAttn):
    mesh = make_mesh(ParallelConfig(ring_degree=W))
    spec = P(None, AXIS_RING, None, None)
    state_spec = P(AXIS_RING)

    def body(q, k, v, state):
        state = jax.tree_util.tree_map(lambda a: a[0], state)
        # single "layer": strip the layer axis
        state_l = jax.tree_util.tree_map(lambda a: a[0], state)
        out, ns = impl(q, k, v, state_l)
        ns = jax.tree_util.tree_map(lambda a: a[None], ns)
        return out, jax.tree_util.tree_map(lambda a: a[None], ns)

    return jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, state_spec),
            out_specs=(spec, state_spec),
        )
    )


def _state_stack(impl):
    one = impl.init_state(1, B, S // W, H, D, jnp.float32)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (W,) + a.shape), one
    )


def test_sync_gather_exact():
    impl = PatchParallelAttn(mode="sync", world=W)
    f = _runner(impl)
    (q, k, v), = _drift(1)
    out, _ = f(q, k, v, ())
    ref, _ = attn_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_compact_gather_tracks():
    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, warmup_steps=2,
    )
    state = None
    errs = []
    for step, (q, k, v) in enumerate(_drift(7, seed=1)):
        m = cfg.type_at(0, step)
        impl = PatchParallelAttn(cfg=cfg, method=m, mode="compact", world=W)
        if state is None:
            state = _state_stack(impl)
        f = _runner(impl)
        out, state = f(q, k, v, state)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
        # all devices agree on the caches
        for leaf in jax.tree_util.tree_leaves(state):
            arr = np.asarray(leaf)
            for dev in range(1, W):
                np.testing.assert_array_equal(arr[dev], arr[0])
    assert errs[0] < 1e-5 and errs[1] < 1e-5
    assert errs[-1] < 0.05


def test_distrifusion_stale_gather():
    state = None
    errs = []
    for step, (q, k, v) in enumerate(_drift(6, drift=0.02, seed=2)):
        m = CompressType.WARMUP if step < 2 else CompressType.IDENTITY
        impl = PatchParallelAttn(mode="async", method=m, world=W)
        if state is None:
            state = _state_stack(impl)
        f = _runner(impl)
        out, state = f(q, k, v, state)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
    # warmup steps exact (fresh gather)
    assert errs[0] < 1e-5 and errs[1] < 1e-5
    # stale steps: small error proportional to per-step drift, no blowup
    assert 0 < errs[-1] < 0.1
