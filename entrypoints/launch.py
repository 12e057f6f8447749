"""HTTP generation service.

Reference: ``entrypoints/launch.py:44-214`` — a FastAPI app backed by Ray
actors (one GPU each) exposing ``POST /generate`` with base64/png output.

TPU-native version: a single SPMD host process drives the whole mesh (no Ray
— multi-controller JAX replaces actor placement; run one process per host on
multi-host slices), and the HTTP layer is stdlib ``http.server`` since the
image ships no fastapi.  Same endpoint shape:

    POST /generate {"prompt": "...", "num_inference_steps": 20, ...}
      -> {"images": ["<base64 png>"], "latency_s": ...}   (image models)
      -> {"output": "<base64 npy>", ...}                  (video/latents)
    GET  /health -> {"status": "ok"}

Launch:  python entrypoints/launch.py --model pixart --ulysses_degree 2 ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.logger import init_logger

logger = init_logger(__name__)


class Engine:
    def __init__(self, args: xFuserArgs):
        self.args = args
        engine_config, input_config = args.create_config()
        self.runner = xDiTParallel(engine_config, input_config)
        # ThreadingHTTPServer handles each request on its own thread, but
        # generate() mutates runner.input_config and the chip is single-
        # tenant anyway — serialize requests or concurrent POSTs could swap
        # prompts mid-flight
        self._lock = threading.Lock()
        #: pristine launch-time request config (per-request overrides must
        #: not mutate server state)
        self._base_input = self.runner.input_config
        # warmup compile (prepare_run forces device execution — a bare
        # dispatch returns immediately under the axon tunnel)
        self.runner.prepare_run()

    def generate(self, request: dict) -> dict:
        with self._lock:
            return self._generate(request)

    def _generate(self, request: dict) -> dict:
        import dataclasses

        # request overrides apply to THIS request only: derive from the
        # pristine launch-time config and restore it afterwards, or one
        # client's prompt/seed would leak into every later request
        inp = self._base_input
        # only fields that take effect at request time on the compiled
        # pipeline; size/steps/frames are baked into the jitted program at
        # startup (change them by relaunching) — unlike the reference's
        # eager pipelines, silently accepting them would do nothing
        runtime_fields = {"prompt", "negative_prompt", "seed"}
        overrides = {k: v for k, v in request.items() if k in runtime_fields}
        ignored = sorted(
            k
            for k in request
            if k in {f.name for f in dataclasses.fields(inp)}
            and k not in runtime_fields
        )
        for k in ("prompt", "negative_prompt"):
            if isinstance(overrides.get(k), str):
                overrides[k] = (overrides[k],)
        self.runner.input_config = dataclasses.replace(inp, **overrides)
        try:
            t0 = time.time()
            out = np.asarray(self.runner(), np.float32)
            latency = time.time() - t0
        finally:
            self.runner.input_config = self._base_input
        if out.ndim == 4 and out.shape[-1] == 3:
            # (B, H, W, 3) in [0, 1] -> base64 PNG per image (reference
            # contract: entrypoints/launch.py:165-214 returns png bytes)
            from PIL import Image

            from compactfusion_tpu.utils.image import to_uint8

            # image pipelines return clip(img*0.5+0.5) in [0, 1]
            img8 = to_uint8(out)
            save_dir = request.get("save_disk_path")
            if save_dir:
                # reference contract (entrypoints/launch.py:114-126): write
                # PNGs under the requested directory, return the paths
                os.makedirs(save_dir, exist_ok=True)
                stamp = time.strftime("%Y%m%d-%H%M%S")
                paths = []
                for i in range(img8.shape[0]):
                    p = os.path.join(save_dir, f"generated_image_{stamp}_{i}.png")
                    Image.fromarray(img8[i]).save(p)
                    paths.append(p)
                resp = {
                    "message": "Image generated successfully",
                    "output": paths if len(paths) > 1 else paths[0],
                    "save_to_disk": True,
                    "shape": list(out.shape),
                    "latency_s": round(latency, 3),
                }
                if ignored:
                    resp["ignored_fields"] = ignored
                return resp
            images = []
            for i in range(img8.shape[0]):
                buf = io.BytesIO()
                Image.fromarray(img8[i]).save(buf, format="PNG")
                images.append(base64.b64encode(buf.getvalue()).decode())
            resp = {
                "images": images,
                "media_type": "image/png",
                "shape": list(out.shape),
                "latency_s": round(latency, 3),
            }
            if ignored:
                resp["ignored_fields"] = ignored
            return resp
        buf = io.BytesIO()
        np.save(buf, out)
        resp = {
            "output": base64.b64encode(buf.getvalue()).decode(),
            "media_type": "application/x-npy",
            "shape": list(out.shape),
            "latency_s": round(latency, 3),
        }
        if ignored:
            resp["ignored_fields"] = ignored
        return resp


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._send(400, {"error": "malformed Content-Length"})
                return
            try:
                request = json.loads(self.rfile.read(length) or b"{}")
                self._send(200, engine.generate(request))
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

        def log_message(self, *a):
            pass

    return Handler


def main():
    from compactfusion_tpu.utils import jax_cache

    jax_cache.enable()
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=6000)
    ns = parser.parse_args()
    args = xFuserArgs.from_cli_args(ns)
    engine = Engine(args)
    server = ThreadingHTTPServer((ns.host, ns.port), make_handler(engine))
    logger.info("serving on %s:%d", ns.host, ns.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
