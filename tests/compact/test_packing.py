"""Bit-packing roundtrip tests (analog of reference kernel-vs-sim exactness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.compact.packing import (
    pack_2bit,
    pack_4bit,
    pack_bits,
    unpack_2bit,
    unpack_4bit,
    unpack_bits,
)


@pytest.mark.parametrize("shape", [(4, 8), (16, 64), (33, 256)])
def test_pack_bits_roundtrip(shape):
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, size=shape), dtype=jnp.uint8)
    packed = pack_bits(bits)
    assert packed.shape == (shape[0], shape[1] // 8)
    assert packed.dtype == jnp.uint8
    np.testing.assert_array_equal(unpack_bits(packed), bits)


def test_pack_bits_bit_order():
    # grouped layout: bit i of byte j is channel i*(C/8)+j
    c = 16
    bits = jnp.zeros((1, c), dtype=jnp.uint8).at[0, 3 * (c // 8)].set(1)
    assert int(pack_bits(bits)[0, 0]) == 8


@pytest.mark.parametrize("shape", [(4, 8), (7, 128)])
def test_pack_2bit_roundtrip(shape):
    rng = np.random.default_rng(1)
    codes = jnp.asarray(rng.integers(0, 4, size=shape), dtype=jnp.uint8)
    packed = pack_2bit(codes)
    assert packed.shape == (shape[0], shape[1] // 4)
    np.testing.assert_array_equal(unpack_2bit(packed), codes)


@pytest.mark.parametrize("shape", [(4, 8), (5, 130)])
def test_pack_4bit_roundtrip(shape):
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.integers(0, 16, size=shape), dtype=jnp.uint8)
    packed = pack_4bit(codes)
    assert packed.shape == (shape[0], shape[1] // 2)
    np.testing.assert_array_equal(unpack_4bit(packed), codes)


def test_packing_jittable():
    f = jax.jit(lambda b: unpack_bits(pack_bits(b)))
    bits = jnp.ones((8, 32), dtype=jnp.uint8)
    np.testing.assert_array_equal(f(bits), bits)
