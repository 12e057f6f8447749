"""Serving resilience under device/tunnel loss (VERDICT r4 next #8).

``GET /health`` must answer 503 (not hang) when the chip is unreachable, and
a ``/generate`` stuck behind a dead device must surface as 503 after the
request timeout.  The device probe is mocked down — no real backend needed.
"""

import json
import threading
import time
import urllib.request
import urllib.error

import pytest

from entrypoints.launch import Engine, make_handler


def _engine_stub(probe):
    """An Engine with __init__ bypassed: only the health/serving plumbing."""
    eng = Engine.__new__(Engine)
    eng._health_cache = (0.0, True)
    eng._probe_thread = None
    eng._health_probe_s = 0.5
    eng._health_max_age_s = 0.2
    eng._device_probe = probe
    eng.stats = {"requests": 0, "batches": 0, "max_packed": 0}
    eng.batch_size = 1
    import queue

    eng._queue = queue.Queue()
    return eng


def test_health_ok_when_probe_answers():
    eng = _engine_stub(lambda: None)
    assert eng.health() is True


def test_health_503_when_probe_raises():
    def dead():
        raise RuntimeError("backend unreachable")

    eng = _engine_stub(dead)
    assert eng.health() is False


def test_health_503_when_probe_hangs_and_does_not_stack():
    hang = threading.Event()

    def hung():
        hang.wait(10)

    eng = _engine_stub(hung)
    t0 = time.time()
    assert eng.health() is False  # bounded by _health_probe_s
    assert time.time() - t0 < 5
    # a second call while the probe thread is stuck must not spawn another
    eng._health_cache = (0.0, False)  # expire the cache
    prev = eng._probe_thread
    assert eng.health() is False
    assert eng._probe_thread is prev
    hang.set()


def test_http_health_and_generate_timeout():
    from http.server import ThreadingHTTPServer

    def dead():
        raise RuntimeError("backend unreachable")

    eng = _engine_stub(dead)
    eng.request_timeout_s = 0.3  # generate: nothing drains the queue
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health")
        assert ei.value.code == 503
        assert json.load(ei.value)["status"] == "unavailable"

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "a cat"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 503
        assert "timed out" in json.load(ei.value)["error"]
    finally:
        srv.shutdown()
        srv.server_close()
