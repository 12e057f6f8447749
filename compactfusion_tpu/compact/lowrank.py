"""Low-rank approximation via subspace iteration.

Reference semantics: ``subspace_iter`` (``xfuser/compact/compress_lowrank.py:
14-62``): given A (m, n), return U (m, k), V (k, n) with A ≈ U @ V, computed by
a few rounds of ``Q <- qr(Aᵀ(AQ))`` followed by ``U = qr(AQ)``, ``V = UᵀA``,
all in fp32.  Used both as the LOW_RANK codec and as the rank-k scale model of
the 1-bit codec.

TPU notes: ``jnp.linalg.qr`` on a (C, k) panel is tiny but serial; we keep
``num_iters`` low (2, like the reference) and support passing a cached ``q``
from the previous denoising step (the reference's ``init_q`` hook) so steady
state can drop to one iteration — the delta subspace moves slowly across
steps, which is the whole CompactFusion premise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _init_q(n: int, rank: int, dtype=jnp.float32) -> jax.Array:
    """Deterministic pseudo-random orthonormal init (trace-static).

    The reference draws a fresh ``torch.randn`` every call; under jit we use a
    fixed-seed draw instead — subspace iteration converges for any init that
    is not orthogonal to the top subspace, and a fixed draw keeps the program
    pure (no PRNG threading through the hot path).
    """
    q = jax.random.normal(jax.random.PRNGKey(0), (n, rank), dtype=dtype)
    q, _ = jnp.linalg.qr(q)
    return q


def subspace_iter(
    a: jax.Array,
    rank: int,
    num_iters: int = 2,
    init_q: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-``rank`` approximation ``a ≈ u @ v``.

    Args:
      a: (m, n) matrix, any float dtype (compute happens in fp32).
      rank: target rank k.
      num_iters: subspace iteration count.
      init_q: optional (n, k) warm-start basis (e.g. from the previous step).

    Returns:
      (u, v, q): u (m, k) orthonormal, v (k, n), q (n, k) final basis — feed
      ``q`` back as ``init_q`` next step to warm-start.
    """
    dtype = a.dtype
    m, n = a.shape
    a32 = a.astype(jnp.float32)
    q = _init_q(n, rank) if init_q is None else init_q.astype(jnp.float32)

    # static unrolled loop (the fori_loop equivalent ran with unroll=True, so
    # the compiled code is identical; a Python loop additionally avoids the
    # replicated-init vs device-varying-carry type clash under shard_map's
    # varying-manual-axes checking)
    for _ in range(num_iters):
        z = a32.T @ (a32 @ q)
        q, _ = jnp.linalg.qr(z)
    u, _ = jnp.linalg.qr(a32 @ q)
    v = u.T @ a32
    return u.astype(dtype), v.astype(dtype), q.astype(dtype)


def svd_lowrank(a: jax.Array, rank: int) -> Tuple[jax.Array, jax.Array]:
    """Exact truncated SVD (reference ``svd``, ``compress_lowrank.py:5``)."""
    u, s, vh = jnp.linalg.svd(a.astype(jnp.float32), full_matrices=False)
    u = u[:, :rank] * s[:rank][None, :]
    return u.astype(a.dtype), vh[:rank, :].astype(a.dtype)
