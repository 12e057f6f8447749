"""Compressed ring attention tests.

Checks (mirroring the reference's distributed invariants):
  * warmup steps are exact (== uncompressed ring == full attention);
  * all ring base slots stay consistent across devices (the
    CompactCache.check_consistency oracle, compact/utils.py:164-196);
  * with error feedback over a drifting K/V sequence, compressed ring output
    tracks the exact output and does not diverge;
  * packed-payload mode == simulate mode semantics.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.compact.ring import (
    CompactRingState,
    compact_ring_attention,
    compact_usp_attention,
    init_ring_state,
)
from compactfusion_tpu.config import CompactConfig, CompressType, ParallelConfig
from compactfusion_tpu.ops.attention import attn_with_lse
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES, make_mesh

B, S, H, D = 1, 64, 4, 16
SEQ_SPEC = P(None, (AXIS_RING, AXIS_ULYSSES), None, None)


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _drift_qkv(n_steps, drift=0.05, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, H, D))
    k = rng.standard_normal((B, S, H, D))
    v = rng.standard_normal((B, S, H, D))
    seq = []
    for _ in range(n_steps):
        q = q + drift * rng.standard_normal(q.shape)
        k = k + drift * rng.standard_normal(k.shape)
        v = v + drift * rng.standard_normal(v.shape)
        seq.append(tuple(jnp.asarray(x, jnp.float32) for x in (q, k, v)))
    return seq


@functools.lru_cache(maxsize=None)
def _make_runner(ring_size, cfg, method):
    """shard_map'd single compact-ring call; state sharded over ring axis.

    Each device keeps its own full (R, N, C) cache stack, so the state specs
    use the ring axis as a *batch* axis via per-device replication: we give
    the state a leading device axis outside and strip it inside.
    """
    mesh = make_mesh(ParallelConfig(ring_degree=ring_size))
    spec = P(None, AXIS_RING, None, None)
    state_spec = P(AXIS_RING)  # stacked per-device states

    def body(q, k, v, state):
        state = jax.tree_util.tree_map(lambda a: a[0], state)
        out, new_state = compact_ring_attention(
            q, k, v, state, cfg=cfg, method=method,
            axis_name=AXIS_RING, ring_size=ring_size,
        )
        return out, jax.tree_util.tree_map(lambda a: a[None], new_state)

    return mesh, jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec, spec, spec, state_spec),
            out_specs=(spec, state_spec),
        )
    )


def _init_state_stack(ring_size, residual=1):
    n, c = B * (S // ring_size), H * D
    one = init_ring_state(ring_size, n, c, jnp.float32, residual)
    # leading device axis: every device starts with the same zero cache
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (ring_size,) + a.shape), one
    )


def test_warmup_exact():
    ring = 4
    cfg = CompactConfig(enabled=True, residual=1, error_feedback=True, warmup_steps=1)
    mesh, f = _make_runner(ring, cfg, CompressType.WARMUP)
    (q, k, v), = _drift_qkv(1)
    out, _ = f(q, k, v, _init_state_stack(ring))
    ref, _ = attn_with_lse(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("method", [CompressType.BINARY, CompressType.INT2])
@pytest.mark.parametrize("simulate", [True, False])
def test_compact_ring_tracks_exact_and_stays_consistent(method, simulate):
    ring = 4
    cfg = CompactConfig(
        enabled=True,
        compress_type=method,
        residual=1,
        error_feedback=True,
        simulate=simulate,
        warmup_steps=2,
    )
    state = _init_state_stack(ring)
    steps = _drift_qkv(7, drift=0.03, seed=1)
    errs = []
    for step, (q, k, v) in enumerate(steps):
        m = cfg.type_at(0, step)
        mesh, f = _make_runner(ring, cfg, m)
        out, state = f(q, k, v, state)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
        # cross-device cache consistency: slot j identical on every device
        for leaf in jax.tree_util.tree_leaves(state):
            arr = np.asarray(leaf)  # (R_devices, R_slots, N, C)
            for dev in range(1, ring):
                np.testing.assert_array_equal(arr[dev], arr[0])
    # warmup steps exact
    assert errs[0] < 1e-5 and errs[1] < 1e-5
    # compressed steps track within a few percent and do not blow up
    assert errs[-1] < 0.05
    assert np.mean(errs[-3:]) < 0.08


@pytest.mark.parametrize(
    "method", [CompressType.LOW_RANK, CompressType.LOW_RANK_AWL]
)
def test_low_rank_ring_tracks_and_stays_consistent(method):
    """LOW_RANK(_AWL) through the compressed ring: EF caches bit-identical
    across devices (AWL's sender-side row weighting must not leak into the
    receiver state) and the output tracks the exact attention."""
    ring = 4
    cfg = CompactConfig(
        enabled=True, compress_type=method, comp_rank=4,
        residual=1, error_feedback=True, warmup_steps=2,
    )
    state = _init_state_stack(ring)
    steps = _drift_qkv(6, drift=0.03, seed=3)
    errs = []
    for step, (q, k, v) in enumerate(steps):
        m = cfg.type_at(0, step)
        mesh, f = _make_runner(ring, cfg, m)
        out, state = f(q, k, v, state)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
        for leaf in jax.tree_util.tree_leaves(state):
            arr = np.asarray(leaf)
            for dev in range(1, ring):
                np.testing.assert_array_equal(arr[dev], arr[0])
    assert errs[0] < 1e-5 and errs[1] < 1e-5
    assert errs[-1] < 0.08
    assert errs[-1] > 1e-6  # compression actually engaged


@pytest.mark.parametrize(
    "method", [CompressType.BINARY, CompressType.LOW_RANK_AWL]
)
def test_sim_ring_matches_real_ring(method):
    """SimRingAttn (single-device ring-topology emulation, used by the
    real-scale quality bench) must reproduce the REAL compressed ring's
    output — same EF state machine, same exact-own/reconstructed-rest K/V
    mix — across a multi-step drifting sequence."""
    from compactfusion_tpu.models.attn_impl import SimRingAttn

    ring = 4
    cfg = CompactConfig(
        enabled=True, compress_type=method,
        comp_rank=4 if "rank" in method.value else -1,
        residual=1, error_feedback=True, warmup_steps=1, fastpath=False,
    )
    # sign-based binary is bit-stable across compilation layouts; the
    # low-rank subspace iteration (QR) is numerically sensitive to XLA
    # fusion differences between the shard_map'd ring and the single-device
    # emulation, so it gets looser (still far below codec error) tolerances
    out_tol, cache_atol = (
        (5e-5, 1e-5) if method == CompressType.BINARY else (2e-3, 2e-2)
    )
    real_state = _init_state_stack(ring)
    steps = _drift_qkv(4, drift=0.05, seed=11)

    sim = None
    sim_state = None
    for step, (q, k, v) in enumerate(steps):
        m = cfg.type_at(0, step)
        mesh, f = _make_runner(ring, cfg, m)
        out_real, real_state = f(q, k, v, real_state)

        sim = SimRingAttn(cfg=cfg, method=m, ring_size=ring)
        if sim_state is None:
            stacked = sim.init_state(1, B, S, H, D, jnp.float32)
            sim_state = jax.tree_util.tree_map(lambda a: a[0], stacked)
        out_sim, sim_state = sim(q, k, v, sim_state)

        err = rel_err(out_sim, out_real)
        assert err < out_tol, (step, err)
        # the emulated EF caches equal the real ring's (any device's copy)
        for ls, lr in zip(
            jax.tree_util.tree_leaves(sim_state),
            jax.tree_util.tree_leaves(real_state),
        ):
            np.testing.assert_allclose(
                np.asarray(ls), np.asarray(lr)[0], atol=cache_atol
            )


def test_packed_equals_simulate_binary():
    """Packed payload path must be numerically close to simulate mode (same
    algorithm, scales travel as bf16)."""
    ring = 2
    steps = _drift_qkv(6, drift=0.05, seed=2)

    def run(simulate):
        cfg = CompactConfig(
            enabled=True,
            compress_type=CompressType.BINARY,
            residual=1,
            error_feedback=True,
            simulate=simulate,
            warmup_steps=2,
        )
        state = _init_state_stack(ring)
        outs = []
        for step, (q, k, v) in enumerate(steps):
            m = cfg.type_at(0, step)
            _, f = _make_runner(ring, cfg, m)
            out, state = f(q, k, v, state)
            outs.append(out)
        return outs

    outs_p = run(False)
    outs_s = run(True)
    for a, b in zip(outs_p, outs_s):
        assert rel_err(a, b) < 2e-2


def test_compact_usp():
    """Full USP wrapper with compression, u=2 x r=2, vs exact attention."""
    u = r = 2
    cfg = CompactConfig(
        enabled=True,
        compress_type=CompressType.INT2,
        residual=1,
        error_feedback=True,
        warmup_steps=2,
    )
    mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))
    n, c = B * (S // r), (H // u) * D
    one = init_ring_state(r, n, c, jnp.float32, 1)
    state = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (u * r,) + a.shape), one
    )
    state_spec = P((AXIS_RING, AXIS_ULYSSES))

    @functools.lru_cache(maxsize=None)
    def make(mth):
        def body(q, k, v, state):
            state = jax.tree_util.tree_map(lambda a: a[0], state)
            out, ns = compact_usp_attention(
                q, k, v, state, cfg=cfg, method=mth, ulysses_size=u, ring_size=r
            )
            return out, jax.tree_util.tree_map(lambda a: a[None], ns)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(SEQ_SPEC, SEQ_SPEC, SEQ_SPEC, state_spec),
                out_specs=(SEQ_SPEC, state_spec),
            )
        )

    errs = []
    for step, (q, k, v) in enumerate(_drift_qkv(6, drift=0.03, seed=3)):
        m = cfg.type_at(0, step)
        out, state = make(m)(q, k, v, state)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
    assert errs[0] < 1e-5
    assert errs[-1] < 0.05


def test_runtime_consistency_oracle():
    """cfg.check_consistency runs the all-reduce oracle inside the ring."""
    ring = 4
    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, warmup_steps=1, check_consistency=True,
    )
    state = _init_state_stack(ring)
    (q, k, v), = _drift_qkv(1)
    _, f = _make_runner(ring, cfg, CompressType.WARMUP)
    out, state = f(q, k, v, state)
    jax.effects_barrier()  # oracle callback must not raise
    _, f2 = _make_runner(ring, cfg, CompressType.BINARY)
    out, state = f2(q, k, v, state)
    jax.effects_barrier()
    assert np.isfinite(np.asarray(out, np.float32)).all()
