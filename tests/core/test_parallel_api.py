"""xDiTParallel one-call API + HTTP service tests (tiny configs, fake mesh)."""

import dataclasses
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.config import EngineConfig, InputConfig, ModelConfig
from compactfusion_tpu.parallel_api import resolve_family, xDiTParallel


def test_registry_resolution():
    assert resolve_family("PixArt-alpha/PixArt-XL-2-512x512").name == "pixart"
    assert resolve_family("black-forest-labs/FLUX.1-dev").name == "flux"
    assert resolve_family("stabilityai/stable-diffusion-3-medium").name == "sd3"
    assert resolve_family("THUDM/CogVideoX-2b").name == "cogvideox"
    assert resolve_family("Tencent-Hunyuan/HunyuanDiT").name == "hunyuandit"
    assert resolve_family("tencent/HunyuanVideo").name == "hunyuanvideo"
    assert resolve_family("BestWishYsh/ConsisID-preview").name == "consisid"
    with pytest.raises(ValueError):
        resolve_family("unknown/model")


@pytest.fixture(scope="module")
def tiny_runner():
    # monkeypatch the pixart family to a tiny config for CPU-mesh testing
    import compactfusion_tpu.parallel_api as api
    from compactfusion_tpu.models.pixart import init_pixart, pixart_tiny
    from compactfusion_tpu.models.vae import init_vae_decoder, tiny_vae
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )

    def tiny_build(engine, inp, checkpoint=None):
        mcfg = pixart_tiny()
        vcfg = tiny_vae()
        pcfg = PixArtPipelineConfig(
            model=mcfg, vae=vcfg, parallel=engine.parallel_config,
            compact=engine.compact_config,
            num_steps=inp.num_inference_steps,
            guidance_scale=inp.guidance_scale,
            height=inp.height, width=inp.width,
        )
        mesh = make_mesh(engine.parallel_config)
        params = init_pixart(jax.random.PRNGKey(0), mcfg)
        vae_params = init_vae_decoder(jax.random.PRNGKey(1), vcfg)
        return PixArtPipeline(params, vae_params, pcfg, mesh), pcfg

    orig = api._REGISTRY["pixart"].build
    api._REGISTRY["pixart"].build = tiny_build
    yield
    api._REGISTRY["pixart"].build = orig


def _engine_inp(**kw):
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    argv = ["--model", "pixart-tiny", "--height", "64", "--width", "64",
            "--num_inference_steps", "3", "--max_sequence_length", "8",
            "--prompt", "a cat"]
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    args = xFuserArgs.from_cli_args(parser.parse_args(argv))
    return args.create_config()

def test_one_call_api(tiny_runner):
    engine, inp = _engine_inp(ulysses_degree=2, ring_degree=2)
    runner = xDiTParallel(engine, inp)
    out = runner(decode=False)
    arr = np.asarray(out, np.float32)
    assert arr.shape[0] == 1 and np.isfinite(arr).all()


def test_prompt_string_reaches_image(tiny_runner):
    """e2e: string -> tokenizer -> T5 -> denoise -> VAE image; the prompt
    must actually steer the output (no pseudo-embeddings)."""
    engine, inp = _engine_inp()
    runner = xDiTParallel(engine, inp)
    img_a = np.asarray(runner(), np.float32)
    assert img_a.ndim == 4 and img_a.shape[-1] == 3
    assert np.isfinite(img_a).all()
    # same prompt -> identical image (deterministic path)
    img_a2 = np.asarray(runner(), np.float32)
    np.testing.assert_array_equal(img_a, img_a2)
    # different prompt -> different image (embeddings depend on the string)
    runner.input_config = dataclasses.replace(
        runner.input_config, prompt=("a very different dog",)
    )
    img_b = np.asarray(runner(), np.float32)
    assert np.abs(img_a - img_b).max() > 0


def test_output_type_latent_and_prepare_run(tiny_runner):
    """--output_type latent skips the VAE in the default call path, and
    prepare_run warms the compiled path (reference xDiTParallel.prepare_run,
    xfuser/parallel.py:38-44)."""
    engine, inp = _engine_inp(output_type="latent")
    assert inp.output_type == "latent"
    runner = xDiTParallel(engine, inp).prepare_run()
    lat = np.asarray(runner(), np.float32)  # decode defaulted by output_type
    assert not (lat.ndim == 4 and lat.shape[-1] == 3)  # latents, not pixels
    img = np.asarray(runner(decode=True), np.float32)
    assert img.ndim == 4 and img.shape[-1] == 3  # explicit decode overrides


def test_save_png(tiny_runner, tmp_path):
    from PIL import Image

    engine, inp = _engine_inp()
    runner = xDiTParallel(engine, inp)
    path = runner.save(str(tmp_path))
    assert path.endswith(".png")
    img = Image.open(path)
    # tiny_vae has 2 up blocks -> 2x upscale of the 8x8 latent
    assert img.size == (16, 16)
    # the PNG must use the full 8-bit range: pipelines return [0, 1], so the
    # writer maps round(x*255) (a [-1, 1] mapping would squeeze pixels into
    # [128, 255]; truncation instead of rounding would bias every pixel low)
    from compactfusion_tpu.utils.image import to_uint8

    arr = np.asarray(runner(), np.float32)
    np.testing.assert_array_equal(np.asarray(img), to_uint8(arr[0]))
    np.testing.assert_array_equal(
        to_uint8(np.asarray([0.999, 0.003])), np.asarray([255, 1])
    )


def test_http_service(tiny_runner):
    from entrypoints.launch import Engine, make_handler
    from http.server import ThreadingHTTPServer

    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(
        parser.parse_args(
            ["--model", "pixart-tiny", "--height", "64", "--width", "64",
             "--num_inference_steps", "2", "--max_sequence_length", "8",
             "--prompt", "x"]
        )
    )
    engine = Engine(args)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "a dog"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        assert "images" in payload and payload["latency_s"] > 0
        # the service must return a decodable PNG (reference contract)
        import base64
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(payload["images"][0])))
        assert img.format == "PNG" and img.size == (16, 16)
        # compile-time-static fields are reported as ignored, not silently
        # accepted (the jitted program is baked at startup)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(
                {"prompt": "a dog", "seed": 7, "num_inference_steps": 9,
                 "height": 128}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            payload = json.load(r)
        assert payload["ignored_fields"] == ["height", "num_inference_steps"]
        # save_disk_path: write the PNG server-side, return its path
        # (reference contract: entrypoints/launch.py:114-126)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps({"prompt": "a dog", "save_disk_path": d}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                payload = json.load(r)
            assert payload["save_to_disk"] is True
            img = Image.open(payload["output"])
            assert img.format == "PNG" and img.size == (16, 16)
    finally:
        server.shutdown()
        engine.close()


def test_http_service_concurrent_batching(tiny_runner):
    """Overlapping POSTs are queued and packed into the dp batch of ONE
    pipeline call (VERDICT r3 #9; reference serves concurrency via a Ray
    actor pool, entrypoints/launch.py:44-57).  serve_batch=4 -> with 8
    clients in flight at least one call must pack >= 2 requests, every
    client gets its own slot's image, and distinct prompts give distinct
    pixels."""
    from http.server import ThreadingHTTPServer

    from entrypoints.launch import Engine, make_handler

    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(
        parser.parse_args(
            ["--model", "pixart-tiny", "--height", "64", "--width", "64",
             "--num_inference_steps", "2", "--max_sequence_length", "8",
             "--prompt", "x"]
        )
    )
    engine = Engine(args, serve_batch=4)
    assert engine.batch_size == 4
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    results = {}

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": f"prompt number {i}", "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            results[i] = json.load(r)

    try:
        threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(results) == 8
        assert all(len(p["images"]) == 1 for p in results.values())
        assert engine.stats["requests"] == 8
        assert engine.stats["max_packed"] >= 2
        assert engine.stats["batches"] < 8  # strictly fewer calls than clients
        # distinct prompts in one packed batch -> distinct slot outputs
        import base64 as b64

        blobs = {p["images"][0] for p in results.values()}
        assert len(blobs) > 1
        for p in results.values():
            assert b64.b64decode(p["images"][0])[:4] == b"\x89PNG"
    finally:
        server.shutdown()
        engine.close()


# ---------------------------------------------------------------------------
# '-tiny' model names route the REAL registry builders to smoke-test configs
# (no monkeypatching — exercises each family's actual build function)
# ---------------------------------------------------------------------------


def _run_family(model, sp=2, **extra):
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    argv = ["--model", model, "--height", "64", "--width", "64",
            "--num_inference_steps", "2", "--max_sequence_length", "8",
            "--ulysses_degree", str(sp), "--prompt", "a cat"]
    for k, v in extra.items():
        argv += [f"--{k}", str(v)]
    args = xFuserArgs.from_cli_args(parser.parse_args(argv))
    engine, inp = args.create_config()
    runner = xDiTParallel(engine, inp)
    out = runner(decode=False)
    arr = np.asarray(out, np.float32)
    assert np.isfinite(arr).all()
    return arr


def test_registry_tiny_flux():
    assert _run_family("flux-tiny").ndim == 3


def test_registry_tiny_sd3():
    assert _run_family("sd3-tiny").ndim == 3


def test_image_families_decode_to_pixels():
    """Every image family decodes to (B, H, W, 3) in [0, 1] through the
    one-call API (FLUX/SD3/HunyuanDiT previously had no VAE wired and
    crashed or fell back on default decode); Latte decodes per-frame video."""
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)

    def run(model, **extra):
        argv = ["--model", model, "--height", "64", "--width", "64",
                "--num_inference_steps", "2", "--max_sequence_length", "8",
                "--prompt", "a cat"]
        for k, v in extra.items():
            argv += [f"--{k}", str(v)]
        args = xFuserArgs.from_cli_args(parser.parse_args(argv))
        engine, inp = args.create_config()
        return np.asarray(xDiTParallel(engine, inp)(decode=True), np.float32)

    for model in ("flux-tiny", "sd3-tiny", "hunyuandit-tiny"):
        img = run(model)
        assert img.ndim == 4 and img.shape[-1] == 3, (model, img.shape)
        assert 0.0 <= img.min() and img.max() <= 1.0, model
    vid = run("latte-tiny", num_frames=2)
    assert vid.ndim == 5 and vid.shape[1] == 2 and vid.shape[-1] == 3
    assert 0.0 <= vid.min() and vid.max() <= 1.0


def test_registry_tiny_cogvideox_1_5():
    # routes to the patch_t=2 config (THUDM/CogVideoX1.5-5B naming)
    arr = _run_family("cogvideox1.5-tiny", num_frames=9)
    assert arr.ndim == 3


def test_registry_tiny_hunyuanvideo():
    arr = _run_family("hunyuanvideo-tiny", num_frames=5)
    assert arr.ndim == 3


def test_classify_height_width_bin():
    from compactfusion_tpu.parallel_api import classify_height_width_bin

    # native squares map to themselves (default requests unchanged)
    assert classify_height_width_bin(512, 512, 512) == (512, 512)
    assert classify_height_width_bin(1024, 1024, 1024) == (1024, 1024)
    # non-native request snaps to an aligned, ~area-preserving bin with the
    # closest aspect ratio
    bh, bw = classify_height_width_bin(600, 400, 512)
    assert bh % 32 == 0 and bw % 32 == 0
    assert abs(bh * bw - 512 * 512) <= 0.15 * 512 * 512
    assert abs(bh / bw - 1.5) < 0.05
    # portrait
    bh, bw = classify_height_width_bin(400, 600, 512)
    assert abs(bh / bw - 2 / 3) < 0.05


def test_resolution_binning_end_to_end():
    """A request at an untrained size generates at the nearest native-area
    bin and comes back resized to the requested pixels (reference
    use_resolution_binning; diffusers classify_height_width_bin +
    resize_and_crop_tensor)."""
    import compactfusion_tpu.parallel_api as api

    # the module-scoped tiny_runner fixture may have swapped the pixart
    # builder; this test needs the real one (it applies the binning)
    orig_build = api._REGISTRY["pixart"].build
    api._REGISTRY["pixart"].build = api._build_pixart

    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    argv = ["--model", "pixart-tiny", "--height", "70", "--width", "50",
            "--num_inference_steps", "2", "--max_sequence_length", "8",
            "--prompt", "a cat"]
    args = xFuserArgs.from_cli_args(parser.parse_args(argv))
    engine, inp = args.create_config()
    assert inp.use_resolution_binning
    try:
        runner = xDiTParallel(engine, inp)
        # tiny native area is 64x64 (sample_size 8 x vae 8): 70x50 snaps to
        # a 16-aligned bin, not the raw request
        ph, pw = runner.pipeline_config.height, runner.pipeline_config.width
        assert (ph, pw) != (70, 50) and ph % 16 == 0 and pw % 16 == 0
        out = np.asarray(runner(decode=True), np.float32)
        assert out.shape[1:] == (70, 50, 3)  # resized back to the request
        assert np.isfinite(out).all()

        # opt-out flag keeps the raw size end to end (16-aligned request)
        argv2 = [a for a in argv] + ["--no_use_resolution_binning"]
        argv2[argv2.index("70")] = "80"
        argv2[argv2.index("50")] = "48"
        args2 = xFuserArgs.from_cli_args(parser.parse_args(argv2))
        engine2, inp2 = args2.create_config()
        assert not inp2.use_resolution_binning
        runner2 = xDiTParallel(engine2, inp2)
        assert (
            runner2.pipeline_config.height, runner2.pipeline_config.width
        ) == (80, 48)
    finally:
        api._REGISTRY["pixart"].build = orig_build


def test_vae_parallel_size_through_api():
    """--vae_parallel_size routes decode onto the trailing VAE devices
    (reference separate-VAE-ranks mode); the banded halo-exchange decoder is
    bit-compatible with the replicated decode."""
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    base_argv = ["--model", "pixart-tiny", "--height", "64", "--width", "64",
                 "--num_inference_steps", "2", "--max_sequence_length", "8",
                 "--ulysses_degree", "2", "--prompt", "a cat"]

    def run(extra):
        args = xFuserArgs.from_cli_args(parser.parse_args(base_argv + extra))
        engine, inp = args.create_config()
        runner = xDiTParallel(engine, inp)
        return np.asarray(runner(decode=True), np.float32)

    ref = run([])
    tail = run(["--vae_parallel_size", "2"])
    assert tail.shape == ref.shape
    # bf16 decode: the banded decoder's psum'd GroupNorm stats differ from
    # the replicated reduction order by ~1 ulp (fp32 exactness is pinned in
    # tests/core/test_parallel_vae.py)
    np.testing.assert_allclose(tail, ref, atol=2e-2)
    assert np.abs(tail - ref).mean() < 2e-3


def test_consisid_img_file_path(tmp_path):
    """--img_file_path conditions ConsisID identity tokens end-to-end: the
    image-derived id_states change the output vs the unconditioned run, and
    two different images give different outputs (reference consisid
    examples' process_face_embeddings_infer path; offline stand-in
    documented in models/face.py)."""
    from PIL import Image

    rng = np.random.default_rng(7)
    p1 = tmp_path / "face1.png"
    p2 = tmp_path / "face2.png"
    for p, seed in ((p1, 1), (p2, 2)):
        arr = np.random.default_rng(seed).integers(
            0, 255, (32, 32, 3), dtype=np.uint8
        )
        Image.fromarray(arr).save(p)

    base = _run_family("consisid-tiny", num_frames=5)
    a = _run_family("consisid-tiny", num_frames=5, img_file_path=str(p1))
    b = _run_family("consisid-tiny", num_frames=5, img_file_path=str(p2))
    assert a.shape == base.shape == b.shape
    assert np.abs(a - base).max() > 0  # identity tokens reached the model
    assert np.abs(a - b).max() > 0  # distinct images -> distinct outputs


def test_quantize_backbone_int8_flag(tiny_runner):
    """--quantize_backbone_int8 (TPU extension, VERDICT r4 #2's machinery
    as a user-facing flag): block stacks become int8 payloads and the
    pipeline still produces close-to-bf16 latents."""
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    argv = ["--model", "pixart-tiny", "--height", "64", "--width", "64",
            "--num_inference_steps", "3", "--max_sequence_length", "8",
            "--prompt", "a cat", "--quantize_backbone_int8"]
    args = xFuserArgs.from_cli_args(parser.parse_args(argv))
    engine, inp = args.create_config()
    assert engine.runtime_config.quantize_backbone

    ref_engine, _ = _engine_inp()
    ref = np.asarray(xDiTParallel(ref_engine, inp)(decode=False), np.float32)

    runner = xDiTParallel(engine, inp)
    blocks = runner.pipeline.params["blocks"]
    assert "w_q" in blocks["attn_qkv"]
    assert blocks["attn_qkv"]["w_q"].dtype == np.int8
    out = np.asarray(runner(decode=False), np.float32)
    err = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-12)
    assert np.isfinite(out).all()
    assert err < 0.1, err
