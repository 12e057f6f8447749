"""Multi-controller worker: one PROCESS of a 2-process x 4-device CPU run.

Executes the real multi-host bootstrap path
(``parallel.mesh.init_distributed_environment`` — the analog of the
reference's torchrun/NCCL init, ``parallel_state.py:192-238``) and then the
same SPMD compressed-ring FLUX pipeline as the single-process test, over a
GLOBAL 8-device mesh whose devices live in two OS processes (gloo
collectives).  Per-host IO gating is exercised through the repo's own paths:
the collector names files by ``jax.process_index()``
(``utils/collector.py:92``) and the final latents are saved only by process
0 (the ``parallel_api.py:945`` pattern).

Usage: python -m tests.core.mp_worker <pid> <nproc> <port> <outdir>
(spawned by tests/core/test_multiprocess.py and dryrun topology 11).
"""

import os
import sys


def pipeline_config():
    """The exact (model, compact, parallel, pipeline) config both the
    2-process workers and the single-process reference run."""
    import jax

    from compactfusion_tpu.config import (
        CompactConfig,
        CompressType,
        ParallelConfig,
    )
    from compactfusion_tpu.models.flux import flux_tiny, init_flux
    from compactfusion_tpu.models.vae import tiny_vae
    from compactfusion_tpu.pipelines.flux import FluxPipelineConfig
    from tests.helpers import spice_params

    mcfg = flux_tiny()
    params = spice_params(init_flux(jax.random.PRNGKey(0), mcfg))
    compact = CompactConfig(
        enabled=True,
        compress_type=CompressType.BINARY,
        warmup_steps=2,
        residual=1,
        error_feedback=True,
    )
    par = ParallelConfig(ulysses_degree=2, ring_degree=4)
    cfg = FluxPipelineConfig(
        model=mcfg,
        vae=tiny_vae(),
        parallel=par,
        compact=compact,
        num_steps=6,
        height=4 * 16,
        width=8 * 16,
    )
    return mcfg, params, par, cfg


def run_pipeline(mcfg, params, par, cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.flux import FluxPipeline

    mesh = make_mesh(par)
    pipe = FluxPipeline(params, None, cfg, mesh)
    rng = np.random.default_rng(1)
    txt = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, mcfg.pooled_dim)), jnp.float32)
    return pipe(txt, pooled, jax.random.PRNGKey(4), decode=False)


def run_single_process_reference():
    """The same program on THIS process's 8-device mesh -> np latents."""
    import numpy as np

    return np.asarray(run_pipeline(*pipeline_config()), np.float32)


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    from compactfusion_tpu.parallel.mesh import init_distributed_environment

    n = init_distributed_environment(f"127.0.0.1:{port}", nproc, pid)
    assert n == 8, f"expected 8 global devices, got {n}"
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    out = run_pipeline(*pipeline_config())
    # the result's sharding spans BOTH processes — gather the global value
    from jax.experimental import multihost_utils

    out = np.asarray(multihost_utils.process_allgather(out, tiled=True), np.float32)

    # per-host IO gating (reference: rank-0-only save, parallel_api.py:945)
    if jax.process_index() == 0:
        np.save(os.path.join(outdir, "latents.npy"), out)

    # collector gating (utils/collector.py:92): rank defaults to
    # jax.process_index(), so each PROCESS writes its own r{pid} file.
    # (Enabled only for this host-side call: in-jit debug-callback taps do
    # not compose with multi-process CPU collectives in current JAX.)
    os.environ["CFTPU_COLLECT_DIR"] = os.path.join(outdir, "collect")
    from compactfusion_tpu.utils import collector

    collector.collect(jnp.zeros((2, 2)), "latents", step=0, layer=0)
    del os.environ["CFTPU_COLLECT_DIR"]
    # every process records that it ran and what it saw
    with open(os.path.join(outdir, f"proc{pid}.ok"), "w") as f:
        f.write(f"{jax.process_index()} {len(jax.devices())}\n")


if __name__ == "__main__":
    main()
