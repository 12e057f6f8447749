"""Profiler / stats / logger / collector tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.compact import codecs
from compactfusion_tpu.compact.stats import (
    StatsLogger,
    compression_metrics,
    log_inside_jit,
)
from compactfusion_tpu.utils.logger import init_logger
from compactfusion_tpu.utils.prof import Profiler


def test_profiler_scopes_and_summary():
    Profiler.reset()
    with Profiler.scope("total"):
        with Profiler.scope("inner"):
            jnp.ones((64, 64)) @ jnp.ones((64, 64))

    @Profiler.prof_func("decorated")
    def f():
        return 1

    f()
    s = Profiler.summary()
    assert "inner" in s and "decorated" in s and "total" in s
    assert Profiler.instance().counts["decorated"] == 1


def test_compression_metrics_and_logger():
    StatsLogger.reset()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 128)), jnp.float32)
    x_hat = x + 0.1
    m = compression_metrics(x, x_hat)
    assert 0 < float(m["rel_err"]) < 0.2
    assert float(m["cos_sim"]) > 0.99

    log = StatsLogger.instance()
    log.log("0-0-k", 5, {k: float(v) for k, v in m.items()})
    payload = codecs.encode_binary(x, -1)
    log.log_volume(payload, x)
    assert log.compression_ratio > 10
    assert "0-0-k" in log.summary() and "ratio" in log.summary()


def test_log_inside_jit():
    StatsLogger.reset()

    @jax.jit
    def f(x):
        m = compression_metrics(x, x * 0.9)
        log_inside_jit("jit-key", 3, m)
        return x

    x = jnp.ones((8, 8))
    np.asarray(f(x))
    recs = StatsLogger.instance().records["jit-key"]
    assert len(recs) == 1 and recs[0][0] == 3


def test_spectrum_and_analysis_dumps(tmp_path):
    """Eigenvalue spectra + err-vs-step JSON dumps (reference
    ``stats.py:683-762`` analysis tooling)."""
    import json

    from compactfusion_tpu.compact.stats import (
        log_spectrum_inside_jit,
        spectrum,
    )

    # exact rank-2 input: spectrum must have exactly 2 nonzero values
    rng = np.random.default_rng(1)
    u = rng.standard_normal((32, 2))
    v = rng.standard_normal((2, 16))
    x = jnp.asarray(u @ v, jnp.float32)
    sv = np.asarray(spectrum(x, top_k=8))
    assert sv.shape == (8,)
    assert sv[0] >= sv[1] > 1e-3 and (sv[2:] < 1e-3).all()

    StatsLogger.reset()

    @jax.jit
    def f(x):
        log_spectrum_inside_jit("act", x, top_k=4)
        m = compression_metrics(x, x * 0.9)
        log_inside_jit("k", -1, m, ordered=True)
        return x

    for _ in range(4):  # 2 "steps" x depth 2
        np.asarray(f(x))
    jax.effects_barrier()
    log = StatsLogger.instance()
    assert len(log.spectra["act"]) == 4 and len(log.spectra["act"][0]) == 4

    eig = log.dump_eigenvalues(str(tmp_path / "eig.json"), depth=2)
    assert len(eig["act"]) == 2 and len(eig["act"][0]) == 2  # [step][layer]
    errs = log.dump_err_vs_steps(str(tmp_path / "err.json"), depth=2)
    assert len(errs["k"]) == 2  # layer-averaged per step
    assert abs(errs["k"][0]["rel_err"] - 0.1) < 1e-3
    assert json.load(open(tmp_path / "eig.json"))  # valid JSON on disk


def test_ring_log_stats_wiring():
    """cfg.log_stats inside the compressed ring ships ordered records whose
    count reshapes by depth (one per layer per compressed step)."""
    from compactfusion_tpu.compact.engine import EFState
    from compactfusion_tpu.compact.ring import compact_ring_attention
    from compactfusion_tpu.config import CompactConfig, CompressType
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.config import ParallelConfig
    from jax.sharding import PartitionSpec as P

    StatsLogger.reset()
    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, fastpath=False, log_stats=True,
    )
    b, s, h, d = 1, 16, 2, 8
    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        for _ in range(3)
    )
    state = EFState(base=jnp.zeros((1, b * s, h * d), jnp.float32), delta_base=None)
    from compactfusion_tpu.compact.ring import CompactRingState

    st = CompactRingState(k=state, v=state)
    mesh = make_mesh(ParallelConfig(), devices=jax.devices()[:1])

    def body(q, k, v, st):
        return compact_ring_attention(
            q, k, v, st, cfg=cfg, method=CompressType.BINARY,
            ring_size=1,
        )

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    ))
    out, _ = f(q, k, v, st)
    out.block_until_ready()
    jax.effects_barrier()
    log = StatsLogger.instance()
    assert len(log.records["k"]) == 1 and len(log.records["v"]) == 1
    assert len(log.spectra["k-activation"]) == 1
    assert len(log.spectra["k-delta"]) == 1
    # base was zero: first delta == activation, identical spectra
    np.testing.assert_allclose(
        log.spectra["k-activation"][0], log.spectra["k-delta"][0], rtol=1e-5
    )


def test_collector(tmp_path, monkeypatch):
    import importlib

    monkeypatch.setenv("CFTPU_COLLECT_DIR", str(tmp_path))
    from compactfusion_tpu.utils import collector

    importlib.reload(collector)
    x = jnp.ones((4, 4))
    collector.collect(x, "q", 2, 7)
    jax.effects_barrier()
    files = list(tmp_path.glob("q_s2_l7_r0.npy"))
    assert len(files) == 1
    np.testing.assert_array_equal(np.load(files[0]), np.ones((4, 4)))


def test_collector_ring_taps(tmp_path, monkeypatch):
    """The compressed ring taps q/k/v and the post-EF bases when collection
    is enabled (reference hybrid/attn_layer.py:181-188, compact/utils.py:
    140-143), using auto-sequenced ordered callbacks from inside shard_map."""
    import importlib

    monkeypatch.setenv("CFTPU_COLLECT_DIR", str(tmp_path))
    from compactfusion_tpu.utils import collector

    importlib.reload(collector)
    from compactfusion_tpu.compact.engine import EFState
    from compactfusion_tpu.compact.ring import (
        CompactRingState,
        compact_ring_attention,
    )
    from compactfusion_tpu.config import CompactConfig, CompressType
    from compactfusion_tpu.config import ParallelConfig
    from compactfusion_tpu.parallel.mesh import make_mesh
    from jax.sharding import PartitionSpec as P

    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, fastpath=False,
    )
    b, s, h, d = 1, 16, 2, 8
    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
        for _ in range(3)
    )
    ef = EFState(base=jnp.zeros((1, b * s, h * d), jnp.float32), delta_base=None)
    st = CompactRingState(k=ef, v=ef)
    mesh = make_mesh(ParallelConfig(), devices=jax.devices()[:1])

    def body(q, k, v, st):
        return compact_ring_attention(
            q, k, v, st, cfg=cfg, method=CompressType.BINARY, ring_size=1,
        )

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    ))
    out, new_st = f(q, k, v, st)
    out.block_until_ready()
    jax.effects_barrier()
    for name in ("q", "k", "v", "kbase", "vbase"):
        files = list(tmp_path.glob(f"{name}_n*_r0.npy"))
        assert len(files) == 1, (name, list(tmp_path.iterdir()))
    np.testing.assert_array_equal(
        np.load(tmp_path / "q_n00000_r0.npy"), np.asarray(q)
    )
    # the dumped base is the post-EF sender cache
    np.testing.assert_allclose(
        np.load(tmp_path / "kbase_n00000_r0.npy"),
        np.asarray(new_st.k.base[0]),
        rtol=1e-6,
    )


def test_logger_level(monkeypatch):
    logger = init_logger("compactfusion_tpu.test")
    logger.info("hello")  # should not raise


def test_envs_registry(monkeypatch):
    """Lazy env registry + capability probing (reference envs.py:22-129)."""
    from compactfusion_tpu import envs

    monkeypatch.setenv("CFTPU_LOGGING_LEVEL", "DEBUG")
    assert envs.CFTPU_LOGGING_LEVEL == "DEBUG"
    monkeypatch.delenv("CFTPU_LOGGING_LEVEL")
    monkeypatch.setenv("XDIT_LOGGING_LEVEL", "WARNING")  # reference fallback
    assert envs.CFTPU_LOGGING_LEVEL == "WARNING"
    monkeypatch.setenv("PROCESS_ID", "3")
    assert envs.PROCESS_ID == 3

    info = envs.PACKAGES_CHECKER.get_env_info()
    assert info["device_count"] >= 1
    assert info["platform"] in ("cpu", "tpu")
    assert info["has_pallas_tpu"] == (info["platform"] == "tpu")
    assert envs.PACKAGES_CHECKER.check_platform(info["platform"])

    with __import__("pytest").raises(AttributeError):
        envs.NOT_A_VAR


def test_collector_ring_taps_multidevice(tmp_path, monkeypatch):
    """Collection on a REAL multi-rank ring: ordered callbacks cannot lower
    on >1 device, so the auto-sequence taps must downgrade to unordered
    per-rank streams (regression: this was a hard ValueError at lowering)."""
    import importlib

    monkeypatch.setenv("CFTPU_COLLECT_DIR", str(tmp_path))
    from compactfusion_tpu.utils import collector

    importlib.reload(collector)
    from jax.sharding import Mesh, PartitionSpec as P

    from compactfusion_tpu.compact.engine import EFState
    from compactfusion_tpu.compact.ring import (
        CompactRingState,
        compact_ring_attention,
    )
    from compactfusion_tpu.config import CompactConfig, CompressType

    ring = 4
    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, fastpath=False,
    )
    b, s_local, h, d = 1, 16, 2, 8
    rng = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(
            rng.standard_normal((b, s_local * ring, h, d)), jnp.float32
        )
        for _ in range(3)
    )
    ef = EFState(
        base=jnp.zeros((ring, ring, b * s_local, h * d), jnp.float32),
        delta_base=None,
    )
    st = CompactRingState(k=ef, v=ef)
    mesh = Mesh(np.array(jax.devices()[:ring]), ("ring",))
    spec = P(None, "ring", None, None)

    def body(q, k, v, st):
        st = jax.tree_util.tree_map(lambda a: a[0], st)
        out, new = compact_ring_attention(
            q, k, v, st, cfg=cfg, method=CompressType.BINARY,
            ring_size=ring,
        )
        return out, jax.tree_util.tree_map(lambda a: a[None], new)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, P("ring")),
        out_specs=(spec, P("ring")), check_vma=False,
    ))
    out, _ = f(q, k, v, st)
    out.block_until_ready()
    jax.effects_barrier()
    # every rank dumped its own q/k/v shard + post-EF bases
    for name in ("q", "k", "v", "kbase", "vbase"):
        for r in range(ring):
            files = list(tmp_path.glob(f"{name}_n*_r{r}.npy"))
            assert len(files) == 1, (name, r, list(tmp_path.iterdir()))
    np.testing.assert_array_equal(
        np.load(tmp_path / "q_n00000_r1.npy"),
        np.asarray(q[:, s_local : 2 * s_local]),
    )


def test_ring_log_stats_multidevice(tmp_path, monkeypatch):
    """log_stats on a real multi-rank ring: ordered stats callbacks downgrade
    to unordered rank-tagged records instead of failing to lower."""
    from jax.sharding import Mesh, PartitionSpec as P

    from compactfusion_tpu.compact.engine import EFState
    from compactfusion_tpu.compact.ring import (
        CompactRingState,
        compact_ring_attention,
    )
    from compactfusion_tpu.compact.stats import StatsLogger
    from compactfusion_tpu.config import CompactConfig, CompressType

    StatsLogger.reset()
    ring = 2
    cfg = CompactConfig(
        enabled=True, compress_type=CompressType.BINARY, residual=1,
        error_feedback=True, fastpath=False, log_stats=True,
    )
    b, s_local, h, d = 1, 16, 2, 8
    rng = np.random.default_rng(6)
    q, k, v = (
        jnp.asarray(
            rng.standard_normal((b, s_local * ring, h, d)), jnp.float32
        )
        for _ in range(3)
    )
    ef = EFState(
        base=jnp.zeros((ring, ring, b * s_local, h * d), jnp.float32),
        delta_base=None,
    )
    st = CompactRingState(k=ef, v=ef)
    mesh = Mesh(np.array(jax.devices()[:ring]), ("ring",))
    spec = P(None, "ring", None, None)

    def body(q, k, v, st):
        st = jax.tree_util.tree_map(lambda a: a[0], st)
        out, new = compact_ring_attention(
            q, k, v, st, cfg=cfg, method=CompressType.BINARY,
            ring_size=ring,
        )
        return out, jax.tree_util.tree_map(lambda a: a[None], new)

    f = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, P("ring")),
        out_specs=(spec, P("ring")), check_vma=False,
    ))
    out, _ = f(q, k, v, st)
    out.block_until_ready()
    jax.effects_barrier()
    log = StatsLogger.instance()
    for key in ("k@r0", "k@r1", "v@r0", "v@r1"):
        assert key in log.records, sorted(log.records)
        assert log.records[key][0][1]["rel_err"] >= 0
    for key in ("k-activation@r0", "k-delta@r1"):
        assert key in log.spectra, sorted(log.spectra)
