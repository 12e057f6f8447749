"""Latte spatial/temporal DiT tests: sharded forward == single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.latte import init_latte, latte_forward, latte_tiny
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES, make_mesh


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


@pytest.mark.parametrize("u,r", [(1, 4), (2, 2), (1, 1)])
def test_latte_forward_sharded_matches_single(u, r):
    mcfg = latte_tiny()
    params = init_latte(jax.random.PRNGKey(0), mcfg)
    b, frames, hp, wp = 1, 8, 4, 4
    s_sp = hp * wp
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((b, frames * s_sp, mcfg.patch**2 * mcfg.in_channels)),
        jnp.float32,
    )
    t = jnp.full((b,), 500.0)
    text = jnp.asarray(rng.standard_normal((b, 8, mcfg.text_dim)), jnp.float32)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, hp, wp)
    tpos = cm._sincos_embed_1d(jnp.arange(frames, dtype=jnp.float32), mcfg.dim)

    def fwd(x, frames_local, sp_axes):
        out, _ = latte_forward(
            params,
            x.astype(mcfg.dtype),
            t,
            text.astype(mcfg.dtype),
            mcfg,
            frames_local=frames_local,
            frames_total=frames,
            spatial_tokens=s_sp,
            pos_embed=pos,
            temporal_pos_embed=tpos,
            sp_axes=sp_axes,
        )
        return out

    ref = jax.jit(lambda x: fwd(x, frames, ()))(x)
    if u * r == 1:
        out = ref
    else:
        mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))
        spec = P(None, (AXIS_RING, AXIS_ULYSSES), None)
        sp_axes = (AXIS_RING, AXIS_ULYSSES)
        f = jax.jit(
            jax.shard_map(
                lambda x: fwd(x, frames // (u * r), sp_axes),
                mesh=mesh,
                in_specs=(spec,),
                out_specs=spec,
                check_vma=False,
            )
        )
        out = f(x)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    assert rel_err(out, ref) < 5e-4  # bf16 reduction-order noise
