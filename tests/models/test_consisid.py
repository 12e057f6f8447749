"""ConsisID tests: ID injection semantics + sharded parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.cogvideox import video_positions
from compactfusion_tpu.models.consisid import (
    consisid_forward,
    consisid_tiny,
    init_consisid,
)
from compactfusion_tpu.models.attn_impl import USPAttn
from compactfusion_tpu.parallel.mesh import AXIS_RING, AXIS_ULYSSES, make_mesh
from compactfusion_tpu.pipelines import base
from tests.helpers import rel_err, spice_params


@pytest.fixture(scope="module")
def setup():
    mcfg = consisid_tiny()
    params = spice_params(init_consisid(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(1)
    b, f, hp, wp = 1, 2, 4, 4
    s = f * hp * wp
    video = jnp.asarray(
        rng.standard_normal((b, s, mcfg.patch**2 * mcfg.in_channels)), jnp.float32
    )
    txt = jnp.asarray(rng.standard_normal((b, 8, mcfg.text_dim)), jnp.float32)
    ids = jnp.asarray(rng.standard_normal((b, 4, mcfg.id_dim)), jnp.float32)
    t = jnp.full((b,), 500.0)
    rope = cm.rope_frequencies(video_positions(f, hp, wp), mcfg.axes_dim)
    return mcfg, params, video, txt, ids, t, rope


def test_zero_id_tokens_match_unconditioned(setup):
    """All-zero face tokens inject exactly nothing (bias-free perceiver:
    K=V=0 -> uniform softmax over zero values -> zero out-projection), so
    the output equals the id_states=None CogVideoX path."""
    mcfg, params, video, txt, ids, t, rope = setup
    out_id, _ = consisid_forward(
        params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype),
        jnp.zeros_like(ids), t, mcfg, video_rope=rope,
    )
    out_no, _ = consisid_forward(
        params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), None, t, mcfg,
        video_rope=rope,
    )
    np.testing.assert_allclose(
        np.asarray(out_id, np.float32), np.asarray(out_no, np.float32), atol=1e-2
    )
    assert rel_err(out_id, out_no) < 1e-2


def test_identity_tokens_inject(setup):
    mcfg, params, video, txt, ids, t, rope = setup
    out_id, _ = consisid_forward(
        params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), ids, t, mcfg,
        video_rope=rope,
    )
    out_other, _ = consisid_forward(
        params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), ids * 3.0, t,
        mcfg, video_rope=rope,
    )
    assert rel_err(out_id, out_other) > 1e-3  # identity actually conditions


def test_sharded_matches_single(setup):
    mcfg, params, video, txt, ids, t, rope = setup
    params2 = params
    ref, _ = consisid_forward(
        params2, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), ids, t, mcfg,
        video_rope=rope,
    )
    u = r = 2
    mesh = make_mesh(ParallelConfig(ulysses_degree=u, ring_degree=r))
    spec = P(None, (AXIS_RING, AXIS_ULYSSES), None)
    attn = USPAttn(ulysses_size=u, ring_size=r)

    def body(video):
        rl = (
            base.slice_local_tokens(rope[0], u, r),
            base.slice_local_tokens(rope[1], u, r),
        )
        out, _ = consisid_forward(
            params2, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), ids, t,
            mcfg, video_rope=rl, attn=attn,
        )
        return out

    f = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
    )
    out = f(video)
    assert rel_err(out, ref) < 2e-2


def test_consisid_sync_pipefusion_exact(setup):
    """pp=2 sync PipeFusion must reproduce the single-device pipeline
    EXACTLY, including the interval perceiver injection whose repeated
    per-layer params/flags are sliced per stage."""
    from compactfusion_tpu.pipelines.consisid import (
        ConsisIDPipeline,
        ConsisIDPipelineConfig,
    )

    mcfg, params, video, txt, ids, t, rope = setup
    rng = np.random.default_rng(7)
    txt2 = jnp.asarray(
        np.stack([
            rng.standard_normal((1, 8, mcfg.text_dim)),
            np.zeros((1, 8, mcfg.text_dim)),
        ]),
        jnp.float32,
    )
    key = jax.random.PRNGKey(9)

    def cfg_for(parallel):
        return ConsisIDPipelineConfig(
            model=mcfg, parallel=parallel, num_steps=3,
            height=4 * 16, width=4 * 16, num_frames=5,
            id_tokens=ids.shape[1],
        )

    c1 = cfg_for(ParallelConfig())
    ref = ConsisIDPipeline(
        params, c1, make_mesh(c1.parallel, devices=jax.devices()[:1])
    )(txt2, key, id_states=ids)
    cP = cfg_for(ParallelConfig(pp_degree=2))
    out = ConsisIDPipeline(params, cP, make_mesh(cP.parallel))(
        txt2, key, id_states=ids
    )
    assert rel_err(out, ref) < 1e-5
