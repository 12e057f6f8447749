"""Fused ring attention: RDMA KV rotation + flash attention in ONE kernel.

The reference overlaps ring communication with attention compute by hand
(yunchang ``RingComm`` NCCL isend/irecv around flash-attn calls,
``xfuser/core/long_ctx_attention/ring/ring_flash_attn.py:16-137``).  The
XLA-level analog (``parallel/ring.py``: ``lax.ppermute`` + flash per step)
leaves the overlap to the XLA scheduler; this kernel makes it structural —
each ring step's ``make_async_remote_copy`` of the K/V block to the next
neighbor is issued BEFORE the flash compute on the current block, so the ICI
transfer rides under the MXU work (boom guide §16 pattern).

Per (batch, head) grid cell:
  * the local K/V shard is copied into slot 0 of a double-buffered VMEM
    scratch ``(2, 2, Sk, D)``;
  * ring step s: start RDMA of slot ``s%2`` into the neighbor's slot
    ``(s+1)%2``, flash-accumulate the current block into fp32 out/m/l
    scratch, wait the DMAs, then barrier with both ring neighbors (the
    barrier makes the double buffer safe: a slot is only overwritten one
    full step after its consumer finished reading it);
  * after N steps the accumulator covers the whole sequence; out + lse are
    written once.

Joint (text) K/V and the compressed ring stay outside — callers merge those
blocks via ``ops/merge.py`` exactly like the unfused path.

Runs inside ``shard_map``; neighbor addressing uses flattened logical mesh
ids passed as scalar prefetch (computed from every mesh axis, so the ring
axis may sit anywhere in a larger dp/cfg/ulysses/tp mesh).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# cache/wire dtype for int8-base scale rows — must match codecs.SCALE_DTYPE
SCALE_DT = jnp.bfloat16


def _entry_barrier(ids_ref):
    """Kernel-ENTRY barrier with both ring neighbors (first grid cell only).

    A step-0 RDMA may not land in a neighbor that has not entered the
    kernel yet — its comm scratch is not allocated until launch (on
    silicon: a write into unowned VMEM; in interpret mode: the KeyError
    this barrier was added to fix).  The collective barrier semaphore is
    the ONE semaphore that is safe to signal before the peer has entered
    (it is allocated per collective_id, outside kernel lifetime), so it is
    reserved exclusively for this: exactly one signal per neighbor per
    launch, consumed by exactly one wait(2).
    """
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=ids_ref[1],
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=ids_ref[2],
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(barrier, 2)


def _neighbor_fence(ids_ref, fence_sem):
    """Fence with BOTH ring neighbors on per-neighbor counting semaphores.

    fence_sem is a REGULAR (2,) scratch semaphore: slot 0 counts signals
    from the prev neighbor, slot 1 from the next.  Waiting each slot
    separately is what makes this a real pairwise fence — a single shared
    counter (the old get_barrier_semaphore protocol) lets wait(2) be
    satisfied by TWO signals from the same fast neighbor, so a device
    could run a full ring step ahead of its slow neighbor and overwrite a
    double-buffer slot still being read (and, at kernel end, exit while
    that neighbor still had an in-flight RDMA into its scratch — caught by
    the hostile-interpret dryrun as a ~1-in-3 shared-memory KeyError).
    Regular semaphores are safe here because the entry barrier guarantees
    every neighbor is inside the kernel, and the per-neighbor counts
    guarantee every signal is consumed before its target exits.
    """
    # I am my prev neighbor's NEXT (their slot 1) and my next's PREV (0)
    pltpu.semaphore_signal(
        fence_sem.at[1], inc=1, device_id=ids_ref[1],
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    pltpu.semaphore_signal(
        fence_sem.at[0], inc=1, device_id=ids_ref[2],
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    pltpu.semaphore_wait(fence_sem.at[0], 1)
    pltpu.semaphore_wait(fence_sem.at[1], 1)


def _ring_kernel(
    ids_ref,  # scalar prefetch: [send_to, prev, nxt] flattened logical ids
    q_ref,  # (1, 1, Sq, D) VMEM
    k_ref,  # (1, 1, Sk, D) VMEM (local shard)
    v_ref,
    o_ref,  # (1, 1, Sq, D)
    lse_ref,  # (1, 1, Sq, 8) fp32
    kv_buf,  # VMEM (2, 2, Sk, D) double-buffered comm scratch
    m_scr,  # VMEM (Sq, 128) fp32
    l_scr,
    acc_scr,  # VMEM (Sq, D) fp32
    send_sem,  # DMA (2,)
    recv_sem,  # DMA (2,)
    fence_sem,  # REGULAR (2,): per-neighbor step/trailing fences
    *,
    scale: float,
    ring_size: int,
    block_q: int,
    block_k: int,
    valid_k: int,
):
    sq = q_ref.shape[2]
    sk = k_ref.shape[2]
    n_qb = sq // block_q
    n_kb = sk // block_k

    if ring_size > 1:
        _entry_barrier(ids_ref)

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)
    # local shard -> comm slot 0 (uniform RDMA source for every step)
    kv_buf[0, 0] = k_ref[0, 0]
    kv_buf[0, 1] = v_ref[0, 0]

    def flash_block(qi, slot):
        q0 = pl.multiple_of(qi * block_q, block_q)
        q = q_ref[0, 0, pl.ds(q0, block_q), :]

        def kv_body(ki, _):
            k0 = pl.multiple_of(ki * block_k, block_k)
            k = kv_buf[slot, 0, pl.ds(k0, block_k), :]
            v = kv_buf[slot, 1, pl.ds(k0, block_k), :]
            s = (
                lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            if valid_k % block_k != 0:
                col = k0 + lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < valid_k, s, NEG_INF)
            m_prev = m_scr[pl.ds(q0, block_q), :1]
            l_prev = l_scr[pl.ds(q0, block_q), :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            pv = lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[pl.ds(q0, block_q), :] = (
                acc_scr[pl.ds(q0, block_q), :] * alpha + pv
            )
            m_scr[pl.ds(q0, block_q), :1] = m_new
            l_scr[pl.ds(q0, block_q), :1] = l_new
            return 0

        lax.fori_loop(0, n_kb, kv_body, 0, unroll=True)

    def _rdma(slot, nxt):
        return pltpu.make_async_remote_copy(
            src_ref=kv_buf.at[slot],
            dst_ref=kv_buf.at[nxt],
            send_sem=send_sem.at[slot],
            recv_sem=recv_sem.at[nxt],
            device_id=ids_ref[0],
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def step_body(s, _):
        slot = lax.rem(s, 2)
        nxt = lax.rem(s + 1, 2)
        is_comm = s < ring_size - 1

        # ring_size is STATIC: gate the comm ops out of the trace entirely in
        # the degenerate single-chip ring — the fori_loop body is traced once
        # with a TRACED ``is_comm`` predicate, so a pl.when alone would still
        # emit the barrier/RDMA ops and tpu_custom_call rejects any kernel
        # containing a barrier semaphore without a collective_id (which the
        # wrapper correctly drops at ring_size=1)
        if ring_size > 1:

            @pl.when(is_comm)
            def _():
                _rdma(slot, nxt).start()

        def q_body(qi, _):
            flash_block(qi, slot)
            return 0

        lax.fori_loop(0, n_qb, q_body, 0, unroll=True)

        if ring_size > 1:

            @pl.when(is_comm)
            def _():
                # our send finished + the inbound block for step s+1 arrived
                _rdma(slot, nxt).wait()
                # slot-reuse safety: neighbors must have finished reading the
                # slot our NEXT send will overwrite (they did, this step)
                _neighbor_fence(ids_ref, fence_sem)

        return 0

    lax.fori_loop(0, ring_size, step_body, 0)

    if ring_size > 1:
        # Trailing neighbor barrier: the NEXT grid cell's step-0 RDMA writes
        # the neighbor's kv_buf slot 1 — the very slot the neighbor reads on
        # its final ring step whenever ring_size is even.  The per-step
        # barrier above only covers steps < ring_size-1, so without this
        # fence a device that advances to the next (batch, head) cell can
        # overwrite KV the neighbor is still flash-computing on (silent
        # output corruption on silicon; invisible in interpret mode where
        # DMAs are eager).  Two-sided NCCL isend/irecv gives the reference
        # this ordering for free; one-sided RDMA needs the explicit barrier.
        _neighbor_fence(ids_ref, fence_sem)

    l_final = l_scr[:, :1]
    l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
    o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(
        m_scr[:, :1] + jnp.log(l_safe), lse_ref.shape[2:]
    )


def _flat_ids(axis_names: Sequence[str], axis_sizes: Sequence[int], ring_axis: str, shift: int):
    """Flattened logical mesh id of the device ``shift`` hops along the ring."""
    flat = jnp.int32(0)
    for name, size in zip(axis_names, axis_sizes):
        coord = lax.axis_index(name)
        if name == ring_axis:
            coord = lax.rem(coord + shift + size, size)
        flat = flat * size + coord
    return flat


@functools.partial(
    jax.jit,
    static_argnames=(
        "axis_name", "ring_size", "mesh_axes", "scale", "block_q",
        "block_k", "interpret", "collective_id",
    ),
)
def ring_flash_attn_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    ring_size: int,
    mesh_axes: Tuple[Tuple[str, int], ...],
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret=False,
    collective_id: int = 7,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ring flash attention (non-causal), inside shard_map.

    q: (B, Sq, H, D) local queries; k, v: (B, Sk, H, D) local KV shard
    (same Sk on every ring rank).  mesh_axes: ((name, size), ...) for the
    FULL mesh in order — used to compute flattened logical neighbor ids.
    Returns (out (B, Sq, H, D), lse (B, H, Sq)) — lse feeds ops/merge for
    joint-tensor blocks.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = d**-0.5

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 128))

    # VMEM: double-buffered KV in k.dtype + fp32 acc/m/l + score block
    kv_itemsize = jnp.dtype(k.dtype).itemsize
    q_itemsize = jnp.dtype(q.dtype).itemsize

    def _vmem_bytes(bq, bk):
        return (
            4 * sk * d * kv_itemsize  # kv_buf (2, 2, Sk, D)
            + 4 * sq * (d + 128 + 128)  # acc, m, l
            + 4 * bq * bk  # scores
            + (sq * q_itemsize + 2 * sk * kv_itemsize) * d  # q/k/v inputs
        )

    while _vmem_bytes(block_q, block_k) > 10 * 1024 * 1024 and (
        block_q > 8 or block_k > 128
    ):
        if block_q >= block_k and block_q > 8:
            block_q = max(8, block_q // 2)
        elif block_k > 128:
            block_k = max(128, block_k // 2)
        else:
            break

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if sq_p != sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))

    names = tuple(n for n, _ in mesh_axes)
    sizes = tuple(s for _, s in mesh_axes)
    ids = jnp.stack(
        [
            _flat_ids(names, sizes, axis_name, +1),  # send target
            _flat_ids(names, sizes, axis_name, -1),  # barrier: prev
            _flat_ids(names, sizes, axis_name, +1),  # barrier: next
        ]
    )

    kernel = functools.partial(
        _ring_kernel,
        scale=scale,
        ring_size=ring_size,
        block_q=block_q,
        block_k=block_k,
        valid_k=sk,
    )

    out, lse8 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, sq_p, d), lambda b, h, ids: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, sk_p, d), lambda b, h, ids: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, sk_p, d), lambda b, h, ids: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, sq_p, d), lambda b, h, ids: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, sq_p, 8), lambda b, h, ids: (b, h, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, sk_p, d), k.dtype),
                pltpu.VMEM((sq_p, 128), jnp.float32),
                pltpu.VMEM((sq_p, 128), jnp.float32),
                pltpu.VMEM((sq_p, d), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # at ring_size=1 the kernel statically omits every RDMA/barrier
            # op (see step_body); tpu_custom_call rejects a collective_id
            # when no barrier is present
            collective_id=collective_id if ring_size > 1 else None,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(ids, qt, kt, vt)

    out = jnp.transpose(out[:, :, :sq, :], (0, 2, 1, 3))
    lse = lse8[:, :, :sq, 0]
    return out, lse


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Fused COMPRESSED ring: rotate packed 1-bit/2-bit payloads, dequant + EF
# base update + flash accumulate in ONE kernel (SURVEY §7 stage 5's end
# state; reference semantics = compact/ring.py ppermute path + fastpath.py
# kernels — the reference fuses BOTH a binary and an int2 Triton pair,
# fastpath.py:12-120 and :485-811 — fused here so compressed bytes never
# round-trip HBM between hops).
# ---------------------------------------------------------------------------
#
# Payload layout (fused-path-specific, per (batch, head) grid cell):
#   packed: (S, D/8) uint8 for 1-bit — grouped bits WITHIN the head slice
#           (bit i of byte j = channel i*(D/8)+j); (S, D/4) uint8 for int2
#           (crumb i of byte j = channel i*(D/4)+j), vs the unfused wire
#           format which groups over the full C = H*D; both ends of the
#           fused ring use this kernel, so the formats interoperate
#           end-to-end.
#   u: (S, K) bf16 per-token scale rows; v: (K, D) per-head scale columns
#      (the rank-K scale model of the 1-bit codec, computed OUTSIDE from
#      |delta| like the reference fastpath wrapper, fastpath.py:123-228;
#      int2 uses the mean scale, K=1, like the reference sim_int2).
# EF base caches: (B, H, R, S, D) fp32, input/output-aliased — slot
# src = (my - s) % R is updated in-kernel from the payload each hop, so the
# sender (s=0, src=my) and every receiver derive bit-identical bases.


def _cring_kernel(
    ids_ref,  # scalar prefetch: [send_to, prev, nxt, my]
    *refs,
    scale: float,
    ring_size: int,
    block_q: int,
    block_k: int,
    codec: str,
    quantized: bool = False,
):
    # Ref layout depends on the codec: binary/int2 carry packed code planes
    # (pk/pv) alongside the scale factors; lowrank's payload IS the (u, v)
    # factor pair, so the packed planes (and their DMA channels) vanish.
    #   inputs:  q, k, v, [pk, pv,] uk, uv, vk, vv, <bases>
    #   outputs: o, lse, <bases out>
    #   scratch: [pk_buf, pv_buf,] uk_buf, uv_buf, vk_buf, vv_buf,
    #            m_scr, l_scr, acc_scr, send_sems, recv_sems
    # <bases> is (kbase, vbase) fp32 when raw, or the int8-quantized cache
    # triplets (codes, scale, min) x (k, v) when ``quantized`` (reference
    # ``quantized_cache``: int8 bases halve EF cache HBM — the kernel
    # dequantizes on read and requantizes after each slot's EF update,
    # matching codecs.encode_int8/decode_int8 semantics).
    n_payload = 4 if codec == "lowrank" else 6
    n_base = 6 if quantized else 2
    q_ref, k_ref, v_ref = refs[0:3]
    pos = 3
    if codec != "lowrank":
        pk_ref, pv_ref = refs[3:5]
        pos = 5
    else:
        pk_ref = pv_ref = None
    uk_ref, uv_ref, vk_ref, vv_ref = refs[pos : pos + 4]
    base_in = refs[pos + 4 : pos + 4 + n_base]
    pos += 4 + n_base
    o_ref, lse_ref = refs[pos : pos + 2]
    base_out = refs[pos + 2 : pos + 2 + n_base]
    pos += 2 + n_base
    if codec != "lowrank":
        pk_buf, pv_buf = refs[pos : pos + 2]
        pos += 2
    else:
        pk_buf = pv_buf = None
    (
        uk_buf, uv_buf, vk_buf, vv_buf,
        m_scr, l_scr, acc_scr, send_sems, recv_sems, fence_sem,
    ) = refs[pos:]
    if quantized:
        kbase_refs, vbase_refs = base_in[0:3], base_in[3:6]
        kbase_outs, vbase_outs = base_out[0:3], base_out[3:6]
    else:
        kbase_refs, vbase_refs = base_in[0:1], base_in[1:2]
        kbase_outs, vbase_outs = base_out[0:1], base_out[1:2]

    sq = q_ref.shape[2]
    sk = k_ref.shape[2]
    d = q_ref.shape[3]
    n_qb = sq // block_q
    n_kb = sk // block_k
    my = ids_ref[3]  # this device's ring coordinate (host-computed)
    hi = pl.program_id(1)  # head grid coordinate (h iterates fastest)

    if ring_size > 1:
        _entry_barrier(ids_ref)

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)
    # own payload -> comm slot 0 (scales stay in the bf16 wire dtype: the
    # scale matmul is then exact on the MXU — bf16 products accumulate in
    # fp32 — so Mosaic and the XLA codecs agree bit-tightly; an fp32 buffer
    # invites a lossy re-truncation at DEFAULT matmul precision)
    if codec != "lowrank":
        pk_buf[0] = pk_ref[0, 0]
        pv_buf[0] = pv_ref[0, 0]

    @pl.when(hi == 0)
    def _():
        # u rows are HEAD-INVARIANT: only the first head cell of each batch
        # seeds and ring-rotates them — into per-step slots of a persistent
        # (R, Sk, K) scratch — and the later head cells replay the persisted
        # slots without any RDMA.  Rotating them in every cell would send
        # the same rows H times (for the lowrank codec the u factor IS the
        # dominant payload, so that would inflate wire bytes ~Hx past the
        # unfused ppermute path's accounting).
        uk_buf[0] = uk_ref[0]
        uv_buf[0] = uv_ref[0]

    vk_buf[0] = vk_ref[0]
    vv_buf[0] = vv_ref[0]

    def dequant_update(slot, s, src, packed_buf, u_buf, v_buf, base_refs, base_outs):
        """codes + scales + base[src] -> reconstructed block; EF-update base.

        ``slot``: double-buffer slot of the per-head planes (packed codes,
        v columns); ``s``: ring step = persistent slot of the u rows.
        ``base_refs``/``base_outs``: (base,) fp32, or the int8 cache
        triplet (codes, scale, min) when ``quantized``.
        """
        if codec == "binary":
            packed = packed_buf[slot].astype(jnp.int32)  # (Sk, D/8)
            parts = [(packed >> i) & 1 for i in range(8)]
            bits = jnp.concatenate(parts, axis=1)  # (Sk, D), grouped layout
            val = bits.astype(jnp.float32) * 2.0 - 1.0  # sign
        elif codec == "int2":  # sign+magnitude 4-level (codecs._int2_values)
            packed = packed_buf[slot].astype(jnp.int32)  # (Sk, D/4)
            parts = [(packed >> (2 * i)) & 3 for i in range(4)]
            codes = jnp.concatenate(parts, axis=1)  # (Sk, D)
            sign = jnp.where(codes >= 2, 1.0, -1.0)
            mag = jnp.where((codes & 1) == 1, 2.0, 0.5)
            val = sign * mag
        else:  # lowrank: u @ v IS the reconstruction (codecs.decode_low_rank)
            val = None
        # bf16 x bf16 -> fp32: every product is exact, so this matches the
        # unfused codecs' decode (which casts the bf16 wire scales to fp32)
        s_ = jax.lax.dot_general(
            u_buf[s], v_buf[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Sk, D)
        if quantized:
            bq_ref, bs_ref, bm_ref = base_refs
            bq_out, bs_out, bm_out = base_outs
            # decode_int8: codes * scale + min, bf16 wire scales -> fp32
            base = (
                bq_ref[0, 0, src].astype(jnp.float32)
                * bs_ref[0, 0, src].astype(jnp.float32)
                + bm_ref[0, 0, src].astype(jnp.float32)
            )
        else:
            base = base_refs[0][0, 0, src]
        blk = base + (s_ if val is None else val * s_)
        if quantized:
            # encode_int8 (_affine_encode axis=0): per-channel min-max over
            # the token axis, fp32 scale for the codes, bf16 on the "wire"
            # (the cache).  The batch grid is restricted to B==1 by the
            # wrapper so per-(head, channel) stats equal the unfused path's
            # per-channel-over-N stats.
            mn = jnp.min(blk, axis=0, keepdims=True)
            mx = jnp.max(blk, axis=0, keepdims=True)
            sc = (mx - mn + 1e-6) / 255.0
            bq_out[0, 0, src] = jnp.clip(
                jnp.round((blk - mn) / sc), 0, 255
            ).astype(jnp.uint8)
            bs_out[0, 0, src] = sc.astype(SCALE_DT)
            bm_out[0, 0, src] = mn.astype(SCALE_DT)
        else:
            base_outs[0][0, 0, src] = blk
        return blk

    def flash_block(q0, k_blk, v_blk):
        # q0, k0 are STATIC (python-unrolled loops): the kv blocks are
        # in-register values, not refs, so slicing must be static.
        # Dots run in the INPUT dtype with fp32 accumulation, the same op
        # sequence as ops/flash_pallas.py — bf16 inputs hit the MXU at full
        # rate and the two kernels agree bit-tightly
        q = q_ref[0, 0, q0 : q0 + block_q, :]
        for ki in range(n_kb):
            k0 = ki * block_k
            k = k_blk[k0 : k0 + block_k, :]
            v = v_blk[k0 : k0 + block_k, :]
            s = (
                lax.dot_general(
                    q, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_prev = m_scr[q0 : q0 + block_q, :1]
            l_prev = l_scr[q0 : q0 + block_q, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            pv_ = lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[q0 : q0 + block_q, :] = (
                acc_scr[q0 : q0 + block_q, :] * alpha + pv_
            )
            m_scr[q0 : q0 + block_q, :1] = m_new
            l_scr[q0 : q0 + block_q, :1] = l_new

    def _rdma(buf, src_i, dst_i, sem_i, sem_src, sem_dst):
        return pltpu.make_async_remote_copy(
            src_ref=buf.at[src_i],
            dst_ref=buf.at[dst_i],
            send_sem=send_sems.at[sem_i, sem_src],
            recv_sem=recv_sems.at[sem_i, sem_dst],
            device_id=ids_ref[0],
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    # per-head planes rotate in every grid cell (double-buffered);
    # head-invariant u rows rotate only in the hi==0 cell (per-step slots)
    if codec == "lowrank":
        cell_bufs = (vk_buf, vv_buf)
    else:
        cell_bufs = (pk_buf, pv_buf, vk_buf, vv_buf)
    u_bufs = (uk_buf, uv_buf)
    n_cell = len(cell_bufs)

    for s in range(ring_size):
        slot = s % 2
        nxt = (s + 1) % 2
        src = lax.rem(my - s + ring_size, ring_size)
        if s < ring_size - 1:
            for i, buf in enumerate(cell_bufs):
                _rdma(buf, slot, nxt, i, slot, nxt).start()

            @pl.when(hi == 0)
            def _(s=s, slot=slot, nxt=nxt):
                for j, buf in enumerate(u_bufs):
                    _rdma(buf, s, s + 1, n_cell + j, slot, nxt).start()

        # EF base update for slot `src` from the payload in hand (sender at
        # s=0 where src==my, receivers at s>0 — identical bit path)
        k_rec = dequant_update(slot, s, src, pk_buf, uk_buf, vk_buf, kbase_refs, kbase_outs)
        v_rec = dequant_update(slot, s, src, pv_buf, uv_buf, vv_buf, vbase_refs, vbase_outs)

        if s == 0:
            # step 0 attends the local EXACT shard (compact/ring.py:178-180)
            flash_block_kv = (k_ref[0, 0], v_ref[0, 0])
        else:
            # reconstructions are rounded to the activation dtype before the
            # flash partial, exactly like the unfused path's
            # ``x_k.reshape(kv_shape).astype(k.dtype)`` (compact/ring.py:251)
            flash_block_kv = (
                k_rec.astype(k_ref.dtype), v_rec.astype(v_ref.dtype)
            )

        for qi in range(n_qb):
            flash_block(qi * block_q, flash_block_kv[0], flash_block_kv[1])

        if s < ring_size - 1:
            for i, buf in enumerate(cell_bufs):
                _rdma(buf, slot, nxt, i, slot, nxt).wait()

            @pl.when(hi == 0)
            def _(s=s, slot=slot, nxt=nxt):
                for j, buf in enumerate(u_bufs):
                    _rdma(buf, s, s + 1, n_cell + j, slot, nxt).wait()

            _neighbor_fence(ids_ref, fence_sem)

    if ring_size > 1:
        # trailing fence: the next grid cell's step-0 RDMA writes slot 1,
        # which the neighbor reads on its final step when ring_size is even
        _neighbor_fence(ids_ref, fence_sem)

    l_final = l_scr[:, :1]
    l_safe = jnp.where(l_final == 0.0, 1.0, l_final)
    o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(
        m_scr[:, :1] + jnp.log(l_safe), lse_ref.shape[2:]
    )


def pack_bits_per_head(bits: jax.Array) -> jax.Array:
    """(B, H, S, D) {0,1} -> (B, H, S, D/8) uint8, grouped within the head:
    bit i of byte j = channel i*(D/8)+j (the fused-ring payload layout)."""
    b, h, s, d = bits.shape
    g = d // 8
    r = bits.astype(jnp.int32).reshape(b, h, s, 8, g)
    out = r[..., 0, :]
    for i in range(1, 8):
        out = out | (r[..., i, :] << i)
    return out.astype(jnp.uint8)


def pack_2bit_per_head(codes: jax.Array) -> jax.Array:
    """(B, H, S, D) codes in [0,3] -> (B, H, S, D/4) uint8, grouped within
    the head: crumb i of byte j = channel i*(D/4)+j."""
    b, h, s, d = codes.shape
    g = d // 4
    r = codes.astype(jnp.int32).reshape(b, h, s, 4, g)
    out = r[..., 0, :]
    for i in range(1, 4):
        out = out | (r[..., i, :] << (2 * i))
    return out.astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "axis_name", "ring_size", "mesh_axes", "comp_rank", "scale",
        "block_q", "block_k", "interpret", "collective_id", "codec",
        "quantized",
    ),
)
def compact_binary_ring_flash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_base: jax.Array,
    v_base: jax.Array,
    *,
    axis_name: str,
    ring_size: int,
    mesh_axes: Tuple[Tuple[str, int], ...],
    comp_rank: int = -1,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret=False,
    collective_id: int = 8,
    codec: str = "binary",
    awl_k: Optional[jax.Array] = None,
    quantized: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused compressed (residual-1, EF) ring flash attention.

    Inside shard_map.  q: (B, Sq, H, D); k, v: (B, Sk, H, D) local shard;
    k_base, v_base: (R, B*Sk, H*D) fp32 EF base stacks (the unfused
    ``CompactRingState`` layout — reshaped internally to the per-head kernel
    layout), or ``codecs.Int8Payload`` triplets with leading ring axis when
    ``quantized`` (the reference's ``quantized_cache``: int8 bases halve EF
    cache HBM; the kernel dequantizes each slot on read and requantizes
    after its EF update with codecs.encode_int8 semantics).  ``quantized``
    requires B == 1 so the kernel's per-(head, channel) min-max over its
    token rows equals the unfused path's per-channel-over-N stats (under
    CFG/dp parallel each device already sees B == 1).  ``codec``: "binary" (1-bit sign, rank-K scale), "int2"
    (sign+magnitude 4-level, mean scale — the reference fuses the same pair,
    fastpath.py:12-120 binary and :485-811 int2), or "lowrank" (the payload
    IS the signed rank-``comp_rank`` (u, v) factor pair — the north-star
    >=100x configuration; no packed plane travels, in-kernel reconstruction
    is one small matmul).  ``awl_k``: optional (B*Sk,) row-importance
    weights for the K fit (AWL, codecs.encode_low_rank_awl — wire-identical
    payload, sender-only change).  Returns
    (out, lse, new_k_base, new_v_base).

    The sender-side scale model (mean or rank-K subspace over |delta|) runs
    outside the kernel like the reference fastpath wrapper; packed codes +
    scale factors are the ONLY inter-chip traffic, rotated by in-kernel RDMA
    with dequant + EF base update fused before each flash partial.  The
    head-invariant u rows rotate ONCE per batch (the first head grid cell
    rotates them into per-step slots of a persistent scratch; later head
    cells replay the slots), so fused wire bytes match the unfused payload
    accounting — per-head planes (packed codes, v columns) rotate per cell.
    """
    from compactfusion_tpu.compact import codecs

    b, sq, h, d = q.shape
    sk = k.shape[1]
    assert d % 8 == 0 and sq % 8 == 0
    assert codec in ("binary", "int2", "lowrank"), codec
    if codec == "lowrank":
        assert comp_rank >= 1, "lowrank codec needs an explicit comp_rank"
    if scale is None:
        scale = d**-0.5
    R = ring_size

    my = lax.axis_index(axis_name)
    # ---- sender-side compression (outside kernel, like fastpath wrapper)
    k_nc = k.reshape(b * sk, h * d).astype(jnp.float32)
    v_nc = v.reshape(b * sk, h * d).astype(jnp.float32)
    if quantized:
        assert b == 1, "quantized fused ring requires B == 1 (see docstring)"

        def _decode_my(p):
            return (
                jnp.take(p.q, my, axis=0).astype(jnp.float32)
                * jnp.take(p.scale, my, axis=0).astype(jnp.float32)
                + jnp.take(p.minv, my, axis=0).astype(jnp.float32)
            )

        base_k_my = _decode_my(k_base)
        base_v_my = _decode_my(v_base)
    else:
        base_k_my = jnp.take(k_base, my, axis=0).astype(jnp.float32)
        base_v_my = jnp.take(v_base, my, axis=0).astype(jnp.float32)
    dk = k_nc - base_k_my
    dv = v_nc - base_v_my
    if codec == "int2":
        # int2 always uses the mean rank-1 scale (codecs.encode_int2)
        uk, vk = codecs._mean_scale_uv(dk)
        uv_, vv_ = codecs._mean_scale_uv(dv)
    elif codec == "lowrank":
        # SIGNED factors of the delta itself (codecs.encode_low_rank /
        # encode_low_rank_awl) — not the |delta| scale model
        if awl_k is not None:
            s_row = awl_k.astype(jnp.float32)[:, None]
            u_w, vk, _ = codecs.subspace_iter(dk * s_row, comp_rank, num_iters=2)
            uk = u_w / s_row
        else:
            uk, vk, _ = codecs.subspace_iter(dk, comp_rank, num_iters=2)
        uv_, vv_, _ = codecs.subspace_iter(dv, comp_rank, num_iters=2)
    else:
        uk, vk = codecs._scale_uv(dk, comp_rank)
        uv_, vv_ = codecs._scale_uv(dv, comp_rank)
    # scales travel bf16 on the wire (codecs.SCALE_DTYPE) and ENTER THE
    # KERNEL in that dtype: an fp32 round-trip here lets XLA/Mosaic re-round
    # differently on each side, while true-bf16 payloads make the in-kernel
    # scale matmul exact (bf16 products accumulate losslessly in fp32)
    uk_w = uk.astype(codecs.SCALE_DTYPE)
    vk_w = vk.astype(codecs.SCALE_DTYPE)
    uv_w = uv_.astype(codecs.SCALE_DTYPE)
    vv_w = vv_.astype(codecs.SCALE_DTYPE)
    kk = max(1, uk_w.shape[1])

    def to_bhsd(x_nc):
        return x_nc.reshape(b, sk, h, d).transpose(0, 2, 1, 3)

    if codec == "int2":
        # codes threshold on the FP32 scale (codecs.encode_int2 semantics);
        # the kernel reconstructs with the bf16 wire scales, matching
        # decode_int2 on the receiver bit-for-bit
        pk = pack_2bit_per_head(to_bhsd(codecs._int2_codes(dk, uk * vk)))
        pv = pack_2bit_per_head(to_bhsd(codecs._int2_codes(dv, uv_ * vv_)))
    elif codec == "lowrank":
        pk = pv = None
    else:
        pk = pack_bits_per_head((to_bhsd(dk) >= 0).astype(jnp.uint8))
        pv = pack_bits_per_head((to_bhsd(dv) >= 0).astype(jnp.uint8))
    uk, vk, uv_, vv_ = uk_w, vk_w, uv_w, vv_w
    # u rows are shared across heads: (B, Sk, K); v cols per head: (H, K, D)
    uk_r = uk.reshape(b, sk, kk)
    uv_r = uv_.reshape(b, sk, kk)
    vk_r = vk.reshape(kk, h, d).transpose(1, 0, 2)
    vv_r = vv_.reshape(kk, h, d).transpose(1, 0, 2)

    # EF bases to kernel layout (B, H, R, Sk, D)
    def base_to_kernel(x, rows=None, dt=jnp.float32):
        return (
            x.astype(dt)
            .reshape(R, b, rows or sk, h, d)
            .transpose(1, 3, 0, 2, 4)
        )

    if quantized:
        base_inputs = [
            base_to_kernel(k_base.q, dt=jnp.uint8),
            base_to_kernel(k_base.scale, rows=1, dt=SCALE_DT),
            base_to_kernel(k_base.minv, rows=1, dt=SCALE_DT),
            base_to_kernel(v_base.q, dt=jnp.uint8),
            base_to_kernel(v_base.scale, rows=1, dt=SCALE_DT),
            base_to_kernel(v_base.minv, rows=1, dt=SCALE_DT),
        ]
    else:
        base_inputs = [base_to_kernel(k_base), base_to_kernel(v_base)]

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    names = tuple(n for n, _ in mesh_axes)
    sizes = tuple(s for _, s in mesh_axes)
    ids = jnp.stack(
        [
            _flat_ids(names, sizes, axis_name, +1),
            _flat_ids(names, sizes, axis_name, -1),
            _flat_ids(names, sizes, axis_name, +1),
            my.astype(jnp.int32),
        ]
    )

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 8))
    # the kernel's static block loops cover exactly n_blocks * block; a
    # non-divisible size would silently DROP the tail, so fall back to one
    # whole-array block (sq includes prepended joint rows and is rarely a
    # block multiple then; VMEM still fits the target shard sizes)
    if sq % block_q:
        block_q = sq
    if sk % block_k:
        block_k = sk
    # packed payload width (codes plane absent entirely for lowrank)
    pw = {"binary": d // 8, "int2": d // 4, "lowrank": 0}[codec]

    # VMEM budget: EF base blocks (2 x R x Sk x D fp32) dominate — counted
    # TWICE because the kbase_out/vbase_out output windows coexist with the
    # input blocks in VMEM (input_output_aliases alias the HBM buffers, not
    # the VMEM windows); fail loud with the actionable knobs instead of a
    # Mosaic scoped-vmem error
    base_b = 1 if quantized else 4  # int8 codes vs fp32 bases
    vmem = (
        2 * 2 * base_b * R * sk * d  # k/v base blocks, input + aliased output
        + (2 * 2 * 2 * 2 * R * d if quantized else 0)  # scale/min planes
        + 2 * (sq + 2 * sk) * d  # q/k/v inputs (bf16-ish)
        + 2 * sq * d + 4 * sq * 8  # o/lse output blocks
        # payload bufs: packed planes + per-head v cols double-buffered,
        # head-invariant u rows in R per-step bf16 slots
        + 2 * 2 * sk * pw + 2 * 2 * R * sk * kk + 2 * 2 * 2 * kk * d
        + 4 * sq * (d + 256)  # acc/m/l
        + 4 * block_q * block_k  # scores
    )
    assert vmem < 14 * 1024 * 1024, (
        f"fused compressed ring needs ~{vmem/1e6:.0f} MB VMEM "
        f"(R={R}, Sk={sk}, D={d}); shrink the shard (more ring/ulysses "
        "degree) or use the unfused ppermute path"
    )

    kernel = functools.partial(
        _cring_kernel,
        scale=scale,
        ring_size=R,
        block_q=block_q,
        block_k=block_k,
        codec=codec,
        quantized=quantized,
    )

    cell = lambda bi, hi, ids: (bi, hi, 0, 0)
    cell3 = lambda bi, hi, ids: (bi, 0, 0)
    cell5 = lambda bi, hi, ids: (bi, hi, 0, 0, 0)
    n_bufs = 4 if codec == "lowrank" else 6  # rotated payload components
    packed_in_specs = [
        pl.BlockSpec((1, 1, sk, pw), cell),
        pl.BlockSpec((1, 1, sk, pw), cell),
    ] if pw else []
    packed_scratch = [
        pltpu.VMEM((2, sk, pw), jnp.uint8),
        pltpu.VMEM((2, sk, pw), jnp.uint8),
    ] if pw else []
    packed_inputs = [pk, pv] if pw else []
    if quantized:
        base_specs = [
            pl.BlockSpec((1, 1, R, sk, d), cell5),
            pl.BlockSpec((1, 1, R, 1, d), cell5),
            pl.BlockSpec((1, 1, R, 1, d), cell5),
        ] * 2
        base_shapes = [
            jax.ShapeDtypeStruct((b, h, R, sk, d), jnp.uint8),
            jax.ShapeDtypeStruct((b, h, R, 1, d), SCALE_DT),
            jax.ShapeDtypeStruct((b, h, R, 1, d), SCALE_DT),
        ] * 2
    else:
        base_specs = [pl.BlockSpec((1, 1, R, sk, d), cell5)] * 2
        base_shapes = [
            jax.ShapeDtypeStruct((b, h, R, sk, d), jnp.float32)
        ] * 2
    base_idx0 = 4 + len(packed_inputs) + 4  # ids + q/k/v + packed + scales
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[
                pl.BlockSpec((1, 1, sq, d), cell),
                pl.BlockSpec((1, 1, sk, d), cell),
                pl.BlockSpec((1, 1, sk, d), cell),
                *packed_in_specs,
                pl.BlockSpec((1, sk, kk), cell3),
                pl.BlockSpec((1, sk, kk), cell3),
                pl.BlockSpec((1, kk, d), lambda bi, hi, ids: (hi, 0, 0)),
                pl.BlockSpec((1, kk, d), lambda bi, hi, ids: (hi, 0, 0)),
                *base_specs,
            ],
            out_specs=[
                pl.BlockSpec((1, 1, sq, d), cell),
                pl.BlockSpec((1, 1, sq, 8), cell),
                *base_specs,
            ],
            scratch_shapes=[
                *packed_scratch,
                # u rows: PER-STEP slots, persisted across the head grid
                # cells of a batch (rotated once by the hi==0 cell — they
                # are head-invariant, so re-rotating per cell would send
                # them H times over the wire)
                pltpu.VMEM((R, sk, kk), codecs.SCALE_DTYPE),
                pltpu.VMEM((R, sk, kk), codecs.SCALE_DTYPE),
                pltpu.VMEM((2, kk, d), codecs.SCALE_DTYPE),
                pltpu.VMEM((2, kk, d), codecs.SCALE_DTYPE),
                pltpu.VMEM((sq, 128), jnp.float32),
                pltpu.VMEM((sq, 128), jnp.float32),
                pltpu.VMEM((sq, d), jnp.float32),
                pltpu.SemaphoreType.DMA((n_bufs, 2)),
                pltpu.SemaphoreType.DMA((n_bufs, 2)),
                pltpu.SemaphoreType.REGULAR((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 8), jnp.float32),
            *base_shapes,
        ],
        # EF base stacks are donated in-place: at production scale they
        # dominate HBM (R x Sk x C fp32 per K and V per layer), and the
        # kernel writes every slot it reads, so aliasing halves both the
        # footprint and the stack's HBM traffic.  Operand indices count the
        # scalar-prefetch ids + q/k/v (+ packed planes when present) + the
        # four scale factors; kb/vb are the last two inputs.
        input_output_aliases={
            base_idx0 + i: 2 + i for i in range(len(base_shapes))
        },
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # see ring_flash_attn_with_lse: no barrier traced at ring_size=1
            collective_id=collective_id if ring_size > 1 else None,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(ids, qt, kt, vt, *packed_inputs, uk_r, uv_r, vk_r, vv_r, *base_inputs)
    out, lse8 = outs[0], outs[1]
    base_outs = outs[2:]

    out = jnp.transpose(out, (0, 2, 1, 3))
    lse = lse8[:, :, :, 0]

    # kernel layout back to the CompactRingState layout (R, B*Sk, H*D)
    def base_from_kernel(x, rows=None):
        return x.transpose(2, 0, 3, 1, 4).reshape(
            R, b * (rows or sk), h * d
        )

    if quantized:
        kb_new = codecs.Int8Payload(
            base_from_kernel(base_outs[0]),
            base_from_kernel(base_outs[1], rows=1),
            base_from_kernel(base_outs[2], rows=1),
        )
        vb_new = codecs.Int8Payload(
            base_from_kernel(base_outs[3]),
            base_from_kernel(base_outs[4], rows=1),
            base_from_kernel(base_outs[5], rows=1),
        )
    else:
        kb_new = base_from_kernel(base_outs[0])
        vb_new = base_from_kernel(base_outs[1])
    return out, lse, kb_new, vb_new
