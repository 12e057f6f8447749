"""Mesh construction tests (analog of reference parallel_state wiring checks)."""

import jax
import numpy as np
import pytest

from compactfusion_tpu.config import ParallelConfig, validate_against_device_count
from compactfusion_tpu.parallel.mesh import (
    AXIS_RING,
    AXIS_ULYSSES,
    MESH_AXIS_ORDER,
    make_mesh,
    make_vae_mesh,
    sp_axes,
)


def test_mesh_axes_and_shape():
    p = ParallelConfig(ulysses_degree=2, ring_degree=2, cfg_degree=2)
    mesh = make_mesh(p)
    assert mesh.axis_names == MESH_AXIS_ORDER
    assert mesh.shape[AXIS_ULYSSES] == 2
    assert mesh.shape[AXIS_RING] == 2
    assert mesh.shape["cfg"] == 2
    assert p.world_size == 8


def test_ulysses_neighbours_are_adjacent_devices():
    # ulysses (and tp) are the fastest-varying axes -> consecutive device ids.
    p = ParallelConfig(ring_degree=2, ulysses_degree=4)
    mesh = make_mesh(p)
    arr = np.asarray(mesh.devices).reshape(2, 4)  # (ring, ulysses)
    ids = np.vectorize(lambda d: d.id)(arr)
    assert list(ids[0]) == [0, 1, 2, 3]
    assert list(ids[1]) == [4, 5, 6, 7]


def test_vae_tail_devices():
    p = ParallelConfig(ulysses_degree=2, ring_degree=2, vae_parallel_size=2)
    mesh = make_mesh(p)
    vae_mesh = make_vae_mesh(p)
    dit_ids = {d.id for d in mesh.devices.flat}
    vae_ids = {d.id for d in vae_mesh.devices.flat}
    assert not dit_ids & vae_ids
    assert len(vae_ids) == 2


def test_validation_errors():
    with pytest.raises(ValueError):
        ParallelConfig(cfg_degree=3)
    with pytest.raises(ValueError):
        ParallelConfig(dp_degree=0)
    with pytest.raises(ValueError):
        validate_against_device_count(
            ParallelConfig(ulysses_degree=4, ring_degree=4), len(jax.devices())
        )


def test_sp_axes():
    p = ParallelConfig(ring_degree=2, ulysses_degree=2)
    assert sp_axes(make_mesh(p)) == (AXIS_RING, AXIS_ULYSSES)
    p = ParallelConfig(ulysses_degree=4)
    assert sp_axes(make_mesh(p)) == (AXIS_ULYSSES,)
