"""StepVideo full-TP tests: tp-sharded forward must equal the serial model.

Analog of the reference's step-video TP applicator checks
(customized/step_video_t2v/tp_applicator.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.config import ParallelConfig
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.cogvideox import video_positions
from compactfusion_tpu.models.stepvideo import (
    init_stepvideo,
    stepvideo_rope_tables,
    stepvideo_forward,
    stepvideo_param_specs,
    stepvideo_tiny,
)
from compactfusion_tpu.parallel.mesh import AXIS_TP, make_mesh
from tests.helpers import rel_err, spice_params


@pytest.mark.parametrize("tp", [2, 4])
def test_full_tp_matches_serial(tp):
    mcfg = stepvideo_tiny()
    params = spice_params(init_stepvideo(jax.random.PRNGKey(0), mcfg))
    rng = np.random.default_rng(1)
    b, f, hp, wp = 1, 2, 4, 4
    s = f * hp * wp
    video = jnp.asarray(rng.standard_normal((b, s, mcfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((b, 8, mcfg.text_dim)), jnp.float32)
    t = jnp.full((b,), 500.0)
    rope = stepvideo_rope_tables(f, hp, wp, mcfg.axes_dim)

    ref, _ = stepvideo_forward(
        params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), t, mcfg,
        video_rope=rope,
    )

    mesh = make_mesh(ParallelConfig(tp_degree=tp))
    specs = stepvideo_param_specs(mcfg)

    def body(params, video, txt):
        out, _ = stepvideo_forward(
            params, video.astype(mcfg.dtype), txt.astype(mcfg.dtype), t, mcfg,
            video_rope=rope, tp_axis=AXIS_TP,
        )
        return out

    f_tp = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(specs, P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = f_tp(params, video, txt)
    assert rel_err(out, ref) < 2e-2  # bf16 reduction-order noise


def test_tp_memory_sharding():
    """Each device must hold only heads/tp of the attention weights."""
    mcfg = stepvideo_tiny()
    params = init_stepvideo(jax.random.PRNGKey(0), mcfg)
    tp = 4
    mesh = make_mesh(ParallelConfig(tp_degree=tp))
    specs = stepvideo_param_specs(mcfg)
    from jax.sharding import NamedSharding

    qkv_w = jax.device_put(
        params["blocks"]["qkv"]["w"],
        NamedSharding(mesh, specs["blocks"]["qkv"]["w"]),
    )
    shard = qkv_w.addressable_shards[0]
    assert shard.data.shape[3] == mcfg.heads // tp
