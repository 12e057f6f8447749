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


def test_logger_level(monkeypatch):
    logger = init_logger("compactfusion_tpu.test")
    logger.info("hello")  # should not raise
