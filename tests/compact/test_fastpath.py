"""Fused Pallas fastpath kernels vs the jnp slowpath.

Analog of reference ``tests/compact/compress_fastpath_test.py:45-162``:
packed bits must match the slowpath exactly; reconstructed bases match within
float tolerance (scale matmul tiling differs), for ranks {-1, 1, 4} and both
codecs.  Runs the kernels in interpreter mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.compact import codecs
from compactfusion_tpu.compact.packing import pack_2bit, pack_bits
from compactfusion_tpu.ops import quant_pallas as qp


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _data(n=100, c=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    base = jnp.asarray(rng.standard_normal((n, c)) * 0.9, jnp.float32)
    return x, base


@pytest.mark.parametrize("rank", [-1, 1, 4])
@pytest.mark.parametrize("shape", [(100, 256), (256, 1024)])
def test_binary_fastpath_matches_slowpath(rank, shape):
    x, base = _data(*shape, seed=shape[0] + rank)
    delta32 = x - base
    u, v = codecs._scale_uv(delta32, rank)
    u = u.astype(codecs.SCALE_DTYPE)
    v = v.astype(codecs.SCALE_DTYPE)

    packed, new_base = qp.binary_quant_fastpath(x, base, u, v, interpret=True)
    # packed bits exact vs slowpath packing of the same delta
    ref_packed = pack_bits((delta32 >= 0).astype(jnp.uint8))
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(ref_packed))
    # EF base update matches slowpath base + sign*scale
    scale = u.astype(jnp.float32) @ v.astype(jnp.float32)
    ref_base = base + jnp.where(delta32 >= 0, 1.0, -1.0) * scale
    assert rel_err(new_base, ref_base) < 1e-5

    # dequant fastpath reproduces the sender's base (consistency invariant)
    x_hat = qp.binary_dequant_fastpath(packed, base, u, v, interpret=True)
    assert rel_err(x_hat, new_base) < 1e-6


@pytest.mark.parametrize("shape", [(100, 256), (256, 1024)])
def test_int2_fastpath_matches_slowpath(shape):
    x, base = _data(*shape, seed=7)
    delta32 = x - base
    u, v = codecs._mean_scale_uv(delta32)
    u = u.astype(codecs.SCALE_DTYPE)
    v = v.astype(codecs.SCALE_DTYPE)

    packed, new_base = qp.int2_quant_fastpath(x, base, u, v, interpret=True)
    s = u.astype(jnp.float32) @ v.astype(jnp.float32)
    pos = delta32 >= 0
    mag = jnp.where(pos, delta32 > s, delta32 < -s)
    ref_codes = (2 * pos.astype(jnp.uint8) + mag.astype(jnp.uint8)).astype(jnp.uint8)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(pack_2bit(ref_codes)))

    ref_base = base + jnp.where(pos, 1.0, -1.0) * jnp.where(mag, 2.0, 0.5) * s
    assert rel_err(new_base, ref_base) < 1e-5

    x_hat = qp.int2_dequant_fastpath(packed, base, u, v, interpret=True)
    assert rel_err(x_hat, new_base) < 1e-6


def test_fastpath_payload_decodable_by_jnp_codec():
    """Wire compat: a fastpath payload must decode with the jnp codec."""
    x, base = _data(64, 256, seed=9)
    delta32 = x - base
    u, v = codecs._scale_uv(delta32, -1)
    u = u.astype(codecs.SCALE_DTYPE)
    v = v.astype(codecs.SCALE_DTYPE)
    packed, new_base = qp.binary_quant_fastpath(x, base, u, v, interpret=True)
    payload = codecs.BinaryPayload(packed, u, v)
    recon = base + codecs.decode_binary(payload)
    assert rel_err(recon, new_base) < 1e-5
