"""Benchmark: PixArt-alpha 512px, 20-step DPM-Solver++, single chip.

Driver config #1 (BASELINE.json): "PixArt-alpha 512px, 20 steps, single
device, compression off".  Runs the full-size 0.61B PixArt-alpha backbone
(28 layers, dim 1152) with CFG (2 forwards/step) + SD-VAE decode on the one
real TPU chip and reports seconds per image.

``vs_baseline`` is measured against a hardware roofline, not a GPU wall-clock
(the reference publishes no absolute PixArt single-GPU latency):
  FLOPs/image ~= 40 model forwards x (2 * 0.61e9 params * 1024 tokens * ~1.15
  attn overhead) + VAE ~= 60 TFLOP; at 50% MFU on v5e (197 TFLOPS bf16)
  -> 0.61 s/image.  vs_baseline = roofline_sec / measured_sec, so 1.0 means
  running at 50% MFU; higher is better.
"""

import json
import os
import subprocess
import sys
import time

ROOFLINE_SEC = 0.61

_BUSY_FLAG = "/tmp/tpu_busy"
_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")


def _emit(payload: dict) -> None:
    """Print the driver-parsed JSON line; persist it as last-good."""
    print(json.dumps(payload))
    try:
        with open(_LAST_GOOD, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except OSError:
        pass


def _emit_stale_or_die(reason: str) -> None:
    """Tunnel down after all retries: fall back to the last-good number.

    Round 4 lost its scoring artifact to a single failed probe (VERDICT r4
    missing #1); a stale-but-labeled number beats an empty round.
    """
    try:
        with open(_LAST_GOOD) as f:
            last = json.load(f)
    except (OSError, ValueError):
        print(json.dumps({"error": reason + "; no last-good bench to fall back on"}))
        raise SystemExit(2)
    last["stale"] = True
    last["stale_reason"] = reason
    print(json.dumps(last))
    raise SystemExit(0)


def _guard_chip(busy_wait_s: int = 6300, probe_timeout_s: int = 180) -> None:
    """Fail soft instead of hanging when the chip can't be used.

    The TPU is single-tenant through the axon tunnel: a second process
    touching it deadlocks both silently, and when the tunnel itself is down
    ``jax.devices()`` blocks forever.  Long-running chip jobs in this repo
    hold ``/tmp/tpu_busy`` — wait for it to clear (bounded), then probe the
    chip in a SUBPROCESS with a hard timeout so an unreachable tunnel
    surfaces as a clean error, not an indefinite hang.  Tunnel outages are
    often transient (the 2026-08-17 one self-healed), so probe 3 times over
    ~20 minutes before giving up; on final failure emit the last-good
    result marked ``stale`` rather than an empty artifact.
    """
    t0 = time.time()
    while os.path.exists(_BUSY_FLAG) and time.time() - t0 < busy_wait_s:
        print(
            f"bench: waiting for {_BUSY_FLAG} to clear "
            f"({int(time.time() - t0)}s)...",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(30)
    probe = (
        "import jax, numpy as np, jax.numpy as jnp\n"
        "y = np.asarray(jax.jit(lambda a: (a @ a).sum())"
        "(jnp.ones((128, 128), jnp.bfloat16)))\n"
    )
    backoffs = [120, 480]  # 3 probes spread over ~20 min incl. probe timeouts
    last_err = "unknown"
    for attempt in range(len(backoffs) + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", probe],
                timeout=probe_timeout_s,
                check=True,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            last_err = type(e).__name__
            print(
                f"bench: chip probe {attempt + 1} failed ({last_err})",
                file=sys.stderr,
                flush=True,
            )
            if attempt < len(backoffs):
                time.sleep(backoffs[attempt])
    _emit_stale_or_die(f"device backend unreachable (probe {last_err} x3)")


def _flux_full_depth_ms():
    """Measured FULL-depth (19+38 block) int8 FLUX forward, in a SUBPROCESS
    so the 12 GB param tree is freed before the PixArt run and an OOM can't
    kill the whole bench (the chip is single-tenant: run before the parent
    initializes the backend)."""
    out_path = os.path.join(os.path.dirname(_LAST_GOOD), "BENCH_FLUX_FULL.json")
    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmark", "flux_full_int8.py"
    )
    try:
        subprocess.run(
            [sys.executable, script],
            timeout=2400,
            check=True,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(out_path) as f:
            full = json.load(f)
        return full["measured_full_depth_fwd_ms"]
    except Exception as e:  # noqa: BLE001 - any failure → extrapolation only
        print(f"bench: full-depth FLUX skipped ({e})", file=sys.stderr)
        return None


def main():
    _guard_chip()
    flux_full_ms = _flux_full_depth_ms()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compactfusion_tpu.utils import jax_cache

    jax_cache.enable()  # warm-start remote compiles (minutes -> seconds)
    from compactfusion_tpu.config import ParallelConfig
    from compactfusion_tpu.models.pixart import init_pixart, pixart_alpha_512
    from compactfusion_tpu.models.vae import init_vae_decoder, sd_vae
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )

    from compactfusion_tpu.models.common import jit_init

    mcfg = pixart_alpha_512()
    params = jit_init(init_pixart, jax.random.PRNGKey(0), mcfg)
    vcfg = sd_vae()
    vae_params = jit_init(init_vae_decoder, jax.random.PRNGKey(1), vcfg)

    pcfg = PixArtPipelineConfig(
        model=mcfg,
        vae=vcfg,
        parallel=ParallelConfig(),
        num_steps=20,
        guidance_scale=4.5,
        height=512,
        width=512,
    )
    mesh = make_mesh(pcfg.parallel, devices=jax.devices()[:1])
    pipe = PixArtPipeline(params, vae_params, pcfg, mesh)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.standard_normal((2, 1, 120, mcfg.text_dim)), jnp.float32)
    mask = jnp.ones((2, 1, 120), bool)
    key = jax.random.PRNGKey(2)

    # under the axon tunnel block_until_ready does not actually block; force
    # completion with a scalar device->host transfer
    checksum = jax.jit(jnp.sum)

    def run(n=1):
        for _ in range(n):
            img = pipe(text, mask, key)
        # ONE device->host sync per measurement: the tunnel round trip is
        # several ms and spiky, so amortise it over n queued images
        return float(np.asarray(checksum(img)))

    run()  # warmup (compile)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(4)
        times.append((time.perf_counter() - t0) / 4)
    sec = min(times)

    # flagship regression guard (VERDICT r3 #8): reduced-depth FLUX-1024
    # forward, MEASURED every round (full FLUX is 24 GB bf16 > one v5e's
    # HBM; both block families scan stacked params, so per-block cost — and
    # hence the extrapolation — is depth-independent, see benchmark/
    # flux_bench.py for the 3-point depth sweep behind the scale factor)
    flux_ms = _flux_reduced_depth_fwd_ms()
    full_ms = flux_ms["extrapolated_full_fwd_ms"]

    _emit(
        {
            "metric": "pixart_alpha_512px_20steps_sec_per_image_1chip",
            "value": round(sec, 4),
            "unit": "s",
            "vs_baseline": round(ROOFLINE_SEC / sec, 3),
            # vs_baseline is measured against a SELF-DEFINED hardware
            # roofline (0.61 s = this workload at 50% MFU on v5e), NOT
            # against any reference GPU wall-clock — the reference
            # publishes no absolute PixArt single-GPU latency.  1.0
            # means 50% MFU; 1.45 ~= 73% effective MFU.
            "baseline_definition": "50%-MFU v5e roofline (0.61 s), self-defined",
            "flux_d4s8_1024px_fwd_ms": flux_ms["d4s8_fwd_ms"],
            "flux_extrapolated_schnell_4step_s_per_image_1chip": round(
                4 * full_ms / 1e3, 3
            ),
            # MEASURED full 57-block FLUX via int8 weights (None if the
            # subprocess failed; see BENCH_FLUX_FULL.json for breakdown)
            "flux_full_depth_1024px_fwd_ms_measured": flux_full_ms,
        }
    )


def _flux_reduced_depth_fwd_ms():
    """Measured FLUX(4 double + 8 single)-1024px forward ms on the chip."""
    import dataclasses as _dc
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from compactfusion_tpu.models import common as cm
    from compactfusion_tpu.models.flux import (
        FluxConfig,
        flux_forward,
        flux_image_positions,
        init_flux,
    )

    cfg = _dc.replace(
        FluxConfig(guidance_embeds=False), double_layers=4, single_layers=8
    )
    params = init_flux(jax.random.PRNGKey(0), cfg)
    b, s_txt, hp, wp = 1, 512, 64, 64
    img0 = jnp.zeros((b, hp * wp, cfg.in_channels), cfg.dtype)
    txt = jnp.zeros((b, s_txt, cfg.text_dim), cfg.dtype)
    pooled = jnp.zeros((b, cfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 500.0, jnp.float32)
    img_rope = cm.rope_frequencies(flux_image_positions(hp, wp), cfg.axes_dim)
    txt_rope = cm.rope_frequencies(jnp.zeros((s_txt, 3), jnp.int32), cfg.axes_dim)
    steps = 8

    @jax.jit
    def loop(params, img):
        def body(carry, _):
            out, _, _ = flux_forward(
                params, carry, txt, pooled, t, None, cfg,
                img_rope=img_rope, txt_rope=txt_rope,
            )
            return out.astype(carry.dtype), None

        out, _ = jax.lax.scan(body, img, None, length=steps)
        return jnp.sum(out)

    _ = np.asarray(loop(params, img0))  # compile+run
    times = []
    for _ in range(3):
        t0 = _time.perf_counter()
        _ = np.asarray(loop(params, img0))
        times.append(_time.perf_counter() - t0)
    ms = min(times) / steps * 1e3
    # BENCH_FLUX.json depth sweep: fwd(19+38) = overhead + 19*pd + 38*ps
    # with (pd, ps) from (4+8, 8+8, 4+16); at those measurements the ratio
    # full/d4s8 was 575.4/124.7 = 4.614 — block-time-dominated, so reuse
    # the *structure* but rescale by today's measured d4s8 time
    return {
        "d4s8_fwd_ms": round(ms, 2),
        "extrapolated_full_fwd_ms": round(ms * 575.4 / 124.7, 1),
    }


if __name__ == "__main__":
    main()
