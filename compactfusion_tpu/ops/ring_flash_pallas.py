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

        @pl.when(is_comm)
        def _():
            _rdma(slot, nxt).start()

        def q_body(qi, _):
            flash_block(qi, slot)
            return 0

        lax.fori_loop(0, n_qb, q_body, 0, unroll=True)

        @pl.when(is_comm)
        def _():
            # our send finished + the inbound block for step s+1 arrived
            _rdma(slot, nxt).wait()
            # slot-reuse safety: neighbors must have finished reading the
            # slot our NEXT send will overwrite (they did, this step)
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
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, 8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=collective_id,
            has_side_effects=True,
        ),
        interpret=interpret,
    )(ids, qt, kt, vt)

    out = jnp.transpose(out[:, :, :sq, :], (0, 2, 1, 3))
    lse = lse8[:, :, :sq, 0]
    return out, lse


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m
