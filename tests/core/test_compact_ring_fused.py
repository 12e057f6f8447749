"""Fused COMPRESSED ring kernel (packed payload RDMA + in-kernel dequant +
EF base update + flash) vs the ppermute compact ring, on the interpret-mode
multi-device emulator (SURVEY §7 stage 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from compactfusion_tpu.compact.ring import (
    CompactRingState,
    compact_ring_attention,
    init_ring_state,
)
from compactfusion_tpu.config import CompactConfig, CompressType
from compactfusion_tpu.ops.ring_flash_pallas import compact_binary_ring_flash
from tests.helpers import rel_err


def _mesh(ring):
    return Mesh(np.array(jax.devices()[:ring]), ("ring",))


def _drift(n_steps, b, s, h, d, seed=0, drift=0.05):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, s, h, d))
    k = rng.standard_normal((b, s, h, d))
    v = rng.standard_normal((b, s, h, d))
    seq = []
    for _ in range(n_steps):
        q = q + drift * rng.standard_normal(q.shape)
        k = k + drift * rng.standard_normal(k.shape)
        v = v + drift * rng.standard_normal(v.shape)
        seq.append(tuple(jnp.asarray(x, jnp.float32) for x in (q, k, v)))
    return seq


@pytest.mark.parametrize("ring", [2, 4])
@pytest.mark.parametrize(
    "codec,comp_rank,b",
    [
        ("binary", -1, 1),
        ("binary", 2, 1),
        ("int2", -1, 1),
        ("lowrank", 2, 1),
        # b=2 exercises the per-batch re-seed of the persistent u-row
        # slots (the head-invariant factors rotate only in each batch's
        # first head grid cell; the next batch must overwrite them)
        ("lowrank", 2, 2),
    ],
)
def test_fused_compact_ring_matches_ppermute_path(ring, codec, comp_rank, b):
    """Multi-step: outputs AND EF base stacks of the fused kernel must track
    the unfused compact ring (binary/int2/lowrank, residual=1, EF, bf16
    scales)."""
    h, d = 2, 16
    s_local = 32
    s = s_local * ring
    n, c = b * s_local, h * d
    mesh = _mesh(ring)
    method = {
        "binary": CompressType.BINARY,
        "int2": CompressType.INT2,
        "lowrank": CompressType.LOW_RANK,
    }[codec]

    cfg = CompactConfig(
        enabled=True, compress_type=method,
        comp_rank=comp_rank, residual=1, error_feedback=True,
        warmup_steps=0, fastpath=False,
    )

    spec = P(None, "ring", None, None)
    state_spec = P("ring")

    def ref_body(q, k, v, state):
        state = jax.tree_util.tree_map(lambda a: a[0], state)
        out, new_state = compact_ring_attention(
            q, k, v, state, cfg=cfg, method=method,
            axis_name="ring", ring_size=ring,
        )
        return out, jax.tree_util.tree_map(lambda a: a[None], new_state)

    ref_fn = jax.jit(jax.shard_map(
        ref_body, mesh=mesh, in_specs=(spec, spec, spec, state_spec),
        out_specs=(spec, state_spec), check_vma=False,
    ))

    def fused_body(q, k, v, kb, vb):
        out, lse, kb2, vb2 = compact_binary_ring_flash(
            q, k, v, kb[0], vb[0],
            axis_name="ring", ring_size=ring, mesh_axes=(("ring", ring),),
            comp_rank=comp_rank, block_q=32, block_k=32, codec=codec,
            interpret=pltpu.InterpretParams(dma_execution_mode="eager"),
        )
        return out, kb2[None], vb2[None]

    fused_fn = jax.jit(jax.shard_map(
        fused_body, mesh=mesh,
        in_specs=(spec, spec, spec, state_spec, state_spec),
        out_specs=(spec, state_spec, state_spec), check_vma=False,
    ))

    def stack(x):
        return jnp.broadcast_to(x[None], (ring,) + x.shape)

    ref_state = jax.tree_util.tree_map(
        stack, init_ring_state(ring, n, c, jnp.float32, 1)
    )
    kb = stack(jnp.zeros((ring, n, c), jnp.float32))
    vb = stack(jnp.zeros((ring, n, c), jnp.float32))

    for step, (q, k, v) in enumerate(_drift(3, b, s, h, d, seed=3)):
        ref_out, ref_state = ref_fn(q, k, v, ref_state)
        out, kb, vb = fused_fn(q, k, v, kb, vb)

        err = rel_err(out, ref_out)
        assert err < 5e-5, (step, err)
        # EF base stacks bit-track the unfused codecs (bf16-scale math)
        for fused_b, ref_b in ((kb, ref_state.k.base), (vb, ref_state.v.base)):
            assert rel_err(fused_b, ref_b) < 1e-6, step
        # and are identical across devices (consistency invariant)
        for dev in range(1, ring):
            np.testing.assert_array_equal(
                np.asarray(kb)[dev], np.asarray(kb)[0]
            )


@pytest.mark.parametrize(
    "method",
    [
        CompressType.BINARY,
        CompressType.INT2,
        CompressType.LOW_RANK,
        CompressType.LOW_RANK_AWL,
    ],
)
def test_fused_flag_through_compact_usp_with_joint(method):
    """The opt-in routing (CompactUSPAttn.fused_ring -> compact_ring_attention
    fused=...) must match the ppermute path including the replicated joint
    (text) block, which the fused path merges after the kernel."""
    from compactfusion_tpu.compact.ring import compact_usp_attention

    ring, b, h, d, sj = 4, 1, 2, 16, 8
    s_local = 32
    s = s_local * ring
    n, c = b * s_local, h * d
    mesh = _mesh(ring)
    comp_rank = -1 if method in (CompressType.BINARY, CompressType.INT2) else 2
    cfg = CompactConfig(
        enabled=True, compress_type=method, comp_rank=comp_rank,
        residual=1, error_feedback=True, warmup_steps=0, fastpath=False,
    )
    spec = P(None, "ring", None, None)
    state_spec = P("ring")

    def run(fused):
        def body(q, k, v, jk, jv, state):
            state = jax.tree_util.tree_map(lambda a: a[0], state)
            out, new_state = compact_usp_attention(
                q, k, v, state, cfg=cfg, method=method,
                ulysses_size=1, ring_size=ring, ring_axis="ring",
                joint_k=jk, joint_v=jv, joint_strategy="rear",
                fused=fused,
            )
            return out, jax.tree_util.tree_map(lambda a: a[None], new_state)

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(spec, spec, spec, P(), P(), state_spec),
            out_specs=(spec, state_spec), check_vma=False,
        ))

    rng = np.random.default_rng(9)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        for _ in range(3)
    )
    jk, jv = (
        jnp.asarray(rng.standard_normal((b, sj, h, d)), jnp.float32)
        for _ in range(2)
    )

    def stack():
        one = init_ring_state(ring, n, c, jnp.float32, 1)
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (ring,) + a.shape), one
        )

    # note: the fused path only stores `base` (delta_base None) — structures
    # already match for residual=1
    out_ref, st_ref = run(False)(q, k, v, jk, jv, stack())
    out_fused, st_fused = run("interpret")(q, k, v, jk, jv, stack())
    assert rel_err(out_fused, out_ref) < 5e-5
    assert rel_err(st_fused.k.base, st_ref.k.base) < 1e-6


@pytest.mark.parametrize(
    "ring,h,steps",
    [(4, 2, 3), (8, 1, 2)],  # interpret cost ~ ring^2 * h * steps
)
@pytest.mark.parametrize("codec,comp_rank", [("binary", -1), ("lowrank", 2)])
def test_fused_compact_ring_hostile_dma(ring, h, steps, codec, comp_rank):
    """RDMA/barrier hardening (VERDICT r3 #4): ``on_wait`` interpret mode
    defers every DMA to its wait point — the most ordering-hostile schedule
    the emulator offers — with larger rings, multi-step EF, and an
    off-default geometry (s_local=48, one 48-row block per shard, d=24:
    grid edges that differ from every other test).  The fused kernel must
    still track the ppermute compact ring step for step.

    Real multi-chip hardware is unavailable (single-chip tunnel), so hostile
    interpret scheduling is the only available stress for the double-buffer
    and barrier logic in ``ops/ring_flash_pallas.py``.  Shapes are kept
    lean: the interpreter executes every grid cell in Python, so cost
    scales with ring^2 * heads * steps * (s_local/block)^2."""
    b, d = 1, 24
    s_local = 48
    s = s_local * ring
    n, c = b * s_local, h * d
    if ring > len(jax.devices()):
        pytest.skip("needs more emulated devices")
    mesh = _mesh(ring)
    method = {
        "binary": CompressType.BINARY, "lowrank": CompressType.LOW_RANK
    }[codec]
    cfg = CompactConfig(
        enabled=True, compress_type=method, comp_rank=comp_rank,
        residual=1, error_feedback=True, warmup_steps=0, fastpath=False,
    )
    spec = P(None, "ring", None, None)
    state_spec = P("ring")

    def ref_body(q, k, v, state):
        state = jax.tree_util.tree_map(lambda a: a[0], state)
        out, new_state = compact_ring_attention(
            q, k, v, state, cfg=cfg, method=method,
            axis_name="ring", ring_size=ring,
        )
        return out, jax.tree_util.tree_map(lambda a: a[None], new_state)

    ref_fn = jax.jit(jax.shard_map(
        ref_body, mesh=mesh, in_specs=(spec, spec, spec, state_spec),
        out_specs=(spec, state_spec), check_vma=False,
    ))

    def fused_body(q, k, v, kb, vb):
        out, lse, kb2, vb2 = compact_binary_ring_flash(
            q, k, v, kb[0], vb[0],
            axis_name="ring", ring_size=ring, mesh_axes=(("ring", ring),),
            comp_rank=comp_rank, block_q=48, block_k=48, codec=codec,
            interpret=pltpu.InterpretParams(dma_execution_mode="on_wait"),
        )
        return out, kb2[None], vb2[None]

    fused_fn = jax.jit(jax.shard_map(
        fused_body, mesh=mesh,
        in_specs=(spec, spec, spec, state_spec, state_spec),
        out_specs=(spec, state_spec, state_spec), check_vma=False,
    ))

    def stack(x):
        return jnp.broadcast_to(x[None], (ring,) + x.shape)

    ref_state = jax.tree_util.tree_map(
        stack, init_ring_state(ring, n, c, jnp.float32, 1)
    )
    kb = stack(jnp.zeros((ring, n, c), jnp.float32))
    vb = stack(jnp.zeros((ring, n, c), jnp.float32))

    for step, (q, k, v) in enumerate(_drift(steps, b, s, h, d, seed=11)):
        ref_out, ref_state = ref_fn(q, k, v, ref_state)
        out, kb, vb = fused_fn(q, k, v, kb, vb)
        assert rel_err(out, ref_out) < 5e-5, step
        assert rel_err(kb, ref_state.k.base) < 1e-6, step
        assert rel_err(vb, ref_state.v.base) < 1e-6, step
        for dev in range(1, ring):
            np.testing.assert_array_equal(
                np.asarray(kb)[dev], np.asarray(kb)[0]
            )


def test_fused_uncompressed_ring_hostile_dma():
    """Same hostile schedule for the UNCOMPRESSED fused RDMA ring
    (``ring_flash_attn_with_lse``) at ring=8 — vs the lossless ppermute
    ring."""
    from compactfusion_tpu.ops.ring_flash_pallas import ring_flash_attn_with_lse
    from compactfusion_tpu.parallel.ring import ring_attention

    ring = 8
    if ring > len(jax.devices()):
        pytest.skip("needs more emulated devices")
    b, h, d = 1, 1, 16
    s_local = 48
    s = s_local * ring
    mesh = _mesh(ring)
    spec = P(None, "ring", None, None)

    def fused_body(q, k, v):
        out, _ = ring_flash_attn_with_lse(
            q, k, v, axis_name="ring", ring_size=ring,
            mesh_axes=(("ring", ring),), block_q=48, block_k=48,
            interpret=pltpu.InterpretParams(dma_execution_mode="on_wait"),
        )
        return out

    def ref_body(q, k, v):
        return ring_attention(q, k, v, axis_name="ring", ring_size=ring)

    fused_fn = jax.jit(jax.shard_map(
        fused_body, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
        check_vma=False,
    ))
    ref_fn = jax.jit(jax.shard_map(
        ref_body, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
        check_vma=False,
    ))
    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        for _ in range(3)
    )
    assert rel_err(fused_fn(q, k, v), ref_fn(q, k, v)) < 5e-5


def test_fused_compact_ring_converges_with_ef():
    """Error feedback through the fused kernel: compressed output error vs
    exact attention must shrink over a drifting sequence."""
    from compactfusion_tpu.ops.attention import attn_with_lse

    ring, b, h, d = 2, 1, 2, 16
    s_local = 32
    s = s_local * ring
    n, c = b * s_local, h * d
    mesh = _mesh(ring)
    spec = P(None, "ring", None, None)
    state_spec = P("ring")

    def fused_body(q, k, v, kb, vb):
        out, lse, kb2, vb2 = compact_binary_ring_flash(
            q, k, v, kb[0], vb[0],
            axis_name="ring", ring_size=ring, mesh_axes=(("ring", ring),),
            comp_rank=-1, block_q=32, block_k=32,
            interpret=pltpu.InterpretParams(dma_execution_mode="eager"),
        )
        return out, kb2[None], vb2[None]

    fn = jax.jit(jax.shard_map(
        fused_body, mesh=mesh,
        in_specs=(spec, spec, spec, state_spec, state_spec),
        out_specs=(spec, state_spec, state_spec), check_vma=False,
    ))

    def stack(x):
        return jnp.broadcast_to(x[None], (ring,) + x.shape)

    kb = stack(jnp.zeros((ring, n, c), jnp.float32))
    vb = stack(jnp.zeros((ring, n, c), jnp.float32))
    errs = []
    for q, k, v in _drift(6, b, s, h, d, seed=4, drift=0.02):
        out, kb, vb = fn(q, k, v, kb, vb)
        ref, _ = attn_with_lse(q, k, v)
        errs.append(rel_err(out, ref))
    # from a ZERO base with no warmup steps, EF still contracts the error
    # every step (measured trajectory ~0.47 -> 0.09 over six steps)
    assert errs[-1] < errs[0] * 0.3, errs
    assert errs[-1] < 0.12, errs


@pytest.mark.parametrize("ring", [2, 4])
@pytest.mark.parametrize("codec,comp_rank", [("binary", -1), ("lowrank", 2)])
def test_fused_compact_ring_quantized_cache(ring, codec, comp_rank):
    """int8 EF caches ride the fused kernel (VERDICT r4 next #6): with
    ``quantized_cache=True`` the kernel dequantizes each base slot on read
    and requantizes after its EF update, matching the jnp path's
    encode_int8/decode_int8 semantics bit-tightly — so the gate no longer
    silently drops video-HBM configs to the ppermute path at B == 1."""
    b, h, d = 1, 2, 16
    s_local = 32
    s = s_local * ring
    n, c = b * s_local, h * d
    mesh = _mesh(ring)
    method = (
        CompressType.BINARY if codec == "binary" else CompressType.LOW_RANK
    )

    cfg = CompactConfig(
        enabled=True, compress_type=method,
        comp_rank=comp_rank, residual=1, error_feedback=True,
        warmup_steps=0, fastpath=False, quantized_cache=True,
    )

    spec = P(None, "ring", None, None)
    state_spec = P("ring")

    def body(fused):
        def run(q, k, v, state):
            state = jax.tree_util.tree_map(lambda a: a[0], state)
            out, new_state = compact_ring_attention(
                q, k, v, state, cfg=cfg, method=method,
                axis_name="ring", ring_size=ring, fused=fused,
            )
            return out, jax.tree_util.tree_map(lambda a: a[None], new_state)

        return jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=(spec, spec, spec, state_spec),
            out_specs=(spec, state_spec), check_vma=False,
        ))

    ref_fn = body(False)
    fused_fn = body("interpret")

    def stack(x):
        return jnp.broadcast_to(x[None], (ring,) + x.shape)

    state0 = jax.tree_util.tree_map(
        stack, init_ring_state(ring, n, c, jnp.float32, 1, quantized=True)
    )
    ref_state = fused_state = state0
    engaged = False
    for step, (q, k, v) in enumerate(_drift(3, b, s, h, d, seed=7)):
        ref_out, ref_state = ref_fn(q, k, v, ref_state)
        out, fused_state = fused_fn(q, k, v, fused_state)
        err = rel_err(out, ref_out)
        assert err < 5e-5, (step, err)
        # int8 cache payloads must track the jnp path's bit-for-bit: the
        # requant arithmetic is the consistency-critical piece
        for fb, rb in (
            (fused_state.k.base, ref_state.k.base),
            (fused_state.v.base, ref_state.v.base),
        ):
            np.testing.assert_array_equal(np.asarray(fb.q), np.asarray(rb.q))
            assert rel_err(fb.scale.astype(np.float32),
                           rb.scale.astype(np.float32)) < 1e-6
            assert rel_err(fb.minv.astype(np.float32),
                           rb.minv.astype(np.float32)) < 1e-6
        # the caches must actually be int8 (the point of the config)
        assert np.asarray(fused_state.k.base.q).dtype == np.uint8
        engaged = True
    assert engaged
