"""DiTFastAttn tests: method semantics, plan selection, model integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.cache.fast_attn import (
    CalibrationAttn,
    FastAttnAttn,
    FastAttnMethod,
    compression_loss,
    load_plan,
    save_plan,
    select_methods,
    window_attention,
)
from compactfusion_tpu.models import common as cm
from compactfusion_tpu.models.pixart import init_pixart, pixart_forward, pixart_tiny
from compactfusion_tpu.ops.attention import sdpa


def _qkv(seed=0, b=1, s=32, h=4, d=16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return mk(), mk(), mk()


def test_window_attention_masks_far_tokens():
    q, k, v = _qkv(0)
    full = sdpa(q, k, v)
    win = window_attention(q, k, v, window=4)
    assert float(compression_loss(full, win)) > 0.01  # differs from full
    win_all = window_attention(q, k, v, window=64)  # window >= S == full
    np.testing.assert_allclose(
        np.asarray(win_all), np.asarray(full), atol=1e-5
    )


def test_fast_attn_methods():
    impl = FastAttnAttn(window_size=4)
    q, k, v = _qkv(1)
    st = jax.tree_util.tree_map(
        lambda a: a[0], impl.init_state(1, 1, 32, 4, 16, jnp.float32)
    )

    # step 1: FULL — caches residual and last_out
    st = dict(st, method=jnp.int32(FastAttnMethod.FULL_ATTN))
    out_full, st = impl(q, k, v, st)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(sdpa(q, k, v)), atol=1e-5
    )

    # step 2 (same inputs): WINDOW_RESIDUAL reconstructs full exactly
    st = dict(st, method=jnp.int32(FastAttnMethod.RESIDUAL_WINDOW_ATTN))
    out_wr, st = impl(q, k, v, st)
    np.testing.assert_allclose(
        np.asarray(out_wr), np.asarray(out_full), atol=1e-4
    )

    # step 3: OUTPUT_SHARE returns the cached output
    st = dict(st, method=jnp.int32(FastAttnMethod.OUTPUT_SHARE))
    out_sh, st = impl(jnp.zeros_like(q), k, v, st)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_wr), atol=1e-5)


def test_select_methods_ramp():
    wl = np.array([0.5, 0.10, 0.10, 0.01])
    sl = np.array([0.9, 0.50, 0.05, 0.9])
    plan = select_methods(wl, sl, threshold=0.4, n_layers=4)
    assert plan[0] == FastAttnMethod.FULL_ATTN  # budget 0.1, both too lossy
    assert plan[1] == FastAttnMethod.RESIDUAL_WINDOW_ATTN  # budget 0.2
    assert plan[2] == FastAttnMethod.OUTPUT_SHARE  # share under budget 0.3
    assert plan[3] == FastAttnMethod.RESIDUAL_WINDOW_ATTN


def test_select_methods_cfg_share_order():
    """Candidate order matches the reference pre-hook (utils.py:94-99):
    OUTPUT_SHARE > WINDOW_CFG > WINDOW > FULL_CFG > FULL."""
    wl = np.array([0.5, 0.15, 0.5, 0.5])
    sl = np.array([0.9, 0.9, 0.9, 0.9])
    wcl = np.array([0.5, 0.05, 0.5, 0.5])
    fcl = np.array([0.5, 0.5, 0.25, 0.5])
    plan = select_methods(
        wl, sl, threshold=0.4, n_layers=4,
        window_cfg_loss=wcl, full_cfg_loss=fcl,
    )
    assert plan[0] == FastAttnMethod.FULL_ATTN
    assert plan[1] == FastAttnMethod.RESIDUAL_WINDOW_ATTN_CFG_SHARE
    assert plan[2] == FastAttnMethod.FULL_ATTN_CFG_SHARE  # budget 0.3
    assert plan[3] == FastAttnMethod.FULL_ATTN


def test_cfg_share_methods():
    """CFG_SHARE computes on the cond half and mirrors it; with identical
    cond/uncond inputs it equals the non-shared method exactly."""
    b, s, h, d = 2, 32, 4, 16
    rng = np.random.default_rng(5)
    half = lambda: jnp.asarray(rng.standard_normal((1, s, h, d)), jnp.float32)
    qh, kh, vh = half(), half(), half()
    q = jnp.concatenate([qh, qh]); k = jnp.concatenate([kh, kh])
    v = jnp.concatenate([vh, vh])

    impl = FastAttnAttn(window_size=4, cfg_batched=True)
    st = jax.tree_util.tree_map(
        lambda a: a[0], impl.init_state(1, b, s, h, d, jnp.float32)
    )
    st = dict(st, method=jnp.int32(FastAttnMethod.FULL_ATTN))
    out_full, st_full = impl(q, k, v, st)
    st = dict(st, method=jnp.int32(FastAttnMethod.FULL_ATTN_CFG_SHARE))
    out_cfg, st_cfg = impl(q, k, v, st)
    np.testing.assert_allclose(
        np.asarray(out_cfg), np.asarray(out_full), atol=1e-5
    )
    # mirrored halves by construction
    np.testing.assert_array_equal(
        np.asarray(out_cfg)[:1], np.asarray(out_cfg)[1:]
    )
    np.testing.assert_allclose(
        np.asarray(st_cfg["residual"]), np.asarray(st_full["residual"]),
        atol=1e-5,
    )

    # WINDOW + CFG_SHARE reconstructs the full output from the cached
    # residual on identical inputs
    st2 = dict(
        st_cfg, method=jnp.int32(FastAttnMethod.RESIDUAL_WINDOW_ATTN_CFG_SHARE)
    )
    out_wc, _ = impl(q, k, v, st2)
    np.testing.assert_allclose(
        np.asarray(out_wc), np.asarray(out_full), atol=1e-4
    )


def test_calibration_cfg_losses():
    """With mirrored cond/uncond inputs, CFG-share losses are ~0 while the
    window loss is not; without cfg_batched they are inf."""
    b, s, h, d = 2, 32, 4, 16
    rng = np.random.default_rng(6)
    half = lambda: jnp.asarray(rng.standard_normal((1, s, h, d)), jnp.float32)
    qh, kh, vh = half(), half(), half()
    q = jnp.concatenate([qh, qh]); k = jnp.concatenate([kh, kh])
    v = jnp.concatenate([vh, vh])

    cal = CalibrationAttn(window_size=4, cfg_batched=True)
    st = jax.tree_util.tree_map(
        lambda a: a[0], cal.init_state(1, b, s, h, d, jnp.float32)
    )
    _, st = cal(q, k, v, st)
    assert float(st["full_cfg_loss"]) < 1e-5
    assert float(st["window_loss"]) > 0.01
    assert abs(
        float(st["window_cfg_loss"]) - float(st["window_loss"])
    ) < 1e-5  # mirrored inputs: window == window-on-half-mirrored

    cal_nc = CalibrationAttn(window_size=4, cfg_batched=False)
    st = jax.tree_util.tree_map(
        lambda a: a[0], cal_nc.init_state(1, b, s, h, d, jnp.float32)
    )
    _, st = cal_nc(q, k, v, st)
    assert np.isinf(float(st["full_cfg_loss"]))


def test_window_flash_kernel_matches_masked_sdpa():
    """The banded Pallas kernel (interpret mode) == masked sdpa, including
    band widths that are not block multiples."""
    from compactfusion_tpu.ops.flash_pallas import flash_attn_with_lse
    from compactfusion_tpu.cache.fast_attn import window_mask

    rng = np.random.default_rng(7)
    for s, w, bq, bk in [(256, 32, 64, 128), (256, 100, 128, 128)]:
        q = jnp.asarray(rng.standard_normal((1, s, 2, 64)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, s, 2, 64)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, s, 2, 64)), jnp.float32)
        out, _ = flash_attn_with_lse(
            q, k, v, block_q=bq, block_k=bk, interpret=True, window=w
        )
        ref = sdpa(q, k, v, mask=window_mask(s, w))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )


def test_plan_persistence(tmp_path):
    plan = np.array([[0, 1], [2, 0]], np.int32)
    p = str(tmp_path / "plan.json")
    save_plan(plan, p)
    np.testing.assert_array_equal(load_plan(p), plan)


def test_pixart_with_fast_attn_plan():
    """Full plan == baseline; calibration strategy records sane losses."""
    mcfg = pixart_tiny()
    params = init_pixart(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        rng.standard_normal((1, 16, mcfg.patch**2 * mcfg.in_channels)), jnp.float32
    )
    text = jnp.asarray(rng.standard_normal((1, 8, mcfg.text_dim)), jnp.float32)
    t = jnp.full((1,), 500.0)
    pos = cm.sincos_pos_embed_2d(mcfg.dim, 4, 4)

    ref, _ = pixart_forward(
        params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos
    )

    impl = FastAttnAttn(window_size=4)
    st = impl.init_state(mcfg.depth, 1, 16, mcfg.heads, mcfg.head_dim, jnp.float32)
    st = dict(st, method=jnp.zeros((mcfg.depth,), jnp.int32))  # all FULL
    out, st = pixart_forward(
        params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos,
        attn=impl, attn_state=st,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=1e-2
    )

    cal = CalibrationAttn(window_size=4)
    cst = cal.init_state(mcfg.depth, 1, 16, mcfg.heads, mcfg.head_dim, jnp.float32)
    out, cst = pixart_forward(
        params, x.astype(mcfg.dtype), t, text, mcfg, pos_embed=pos,
        attn=cal, attn_state=cst,
    )
    wl = np.asarray(cst["window_loss"])
    sl = np.asarray(cst["share_loss"])
    assert wl.shape == (mcfg.depth,) and (wl >= 0).all()
    # first step: share loss vs zero cache must be ~1
    assert (sl > 0.5).all()
    plan = select_methods(wl, sl, 0.5, mcfg.depth)
    assert plan.shape == (mcfg.depth,)


def test_fast_attn_calibration_workflow(tmp_path, monkeypatch):
    """The one-call API path (reference ``fast_attention_compression``):
    --use_fast_attn calibrates, builds a per-(step, layer) plan with step 0
    pinned FULL, persists it with --use_cache, and the rebuilt pipeline
    reuses the cached plan."""
    from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
    from compactfusion_tpu.parallel_api import xDiTParallel

    monkeypatch.chdir(tmp_path)  # plan cache file lands here
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    args = parser.parse_args([
        "--model", "pixart-tiny", "--height", "64", "--width", "64",
        "--num_inference_steps", "5", "--max_sequence_length", "8",
        "--prompt", "a calibration cat", "--use_fast_attn",
        "--threshold", "0.35", "--window_size", "4", "--use_cache",
    ])
    engine, inp = xFuserArgs.from_cli_args(args).create_config()
    runner = xDiTParallel(engine, inp)
    plan = np.asarray(runner.pipeline_config.fast_attn_plan)
    assert plan.shape == (5, 2)
    assert (plan[0] == FastAttnMethod.FULL_ATTN).all()
    out = np.asarray(runner())
    assert np.isfinite(out).all()
    caches = list(tmp_path.glob(".cftpu_fastattn_*.json"))
    assert len(caches) == 1
    # rebuild: plan comes from the cache, not a new calibration
    runner2 = xDiTParallel(engine, inp)
    np.testing.assert_array_equal(
        np.asarray(runner2.pipeline_config.fast_attn_plan), plan
    )


def test_fast_attn_pipeline():
    """DiTFastAttn plan in the PixArt pipeline: all-FULL plan == baseline;
    aggressive plan stays finite and close."""
    import dataclasses as _dc

    from compactfusion_tpu.config import ParallelConfig
    from compactfusion_tpu.models.vae import tiny_vae
    from compactfusion_tpu.parallel.mesh import make_mesh
    from compactfusion_tpu.pipelines.pixart import (
        PixArtPipeline,
        PixArtPipelineConfig,
    )

    mcfg = pixart_tiny()
    params = init_pixart(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(3)
    text = jnp.asarray(
        np.stack([rng.standard_normal((1, 8, 32)), np.zeros((1, 8, 32))]),
        jnp.float32,
    )
    mask = jnp.ones((2, 1, 8), bool)
    key = jax.random.PRNGKey(4)
    steps = 4

    base_cfg = PixArtPipelineConfig(
        model=mcfg, vae=tiny_vae(), parallel=ParallelConfig(),
        num_steps=steps, guidance_scale=4.5, height=64, width=64,
    )
    mesh = make_mesh(base_cfg.parallel, devices=jax.devices()[:1])
    ref = PixArtPipeline(params, None, base_cfg, mesh)(
        text, mask, key, decode=False
    )

    full_plan = tuple(tuple(0 for _ in range(mcfg.depth)) for _ in range(steps))
    cfg_full = _dc.replace(base_cfg, fast_attn_plan=full_plan, fast_attn_window=4)
    out = PixArtPipeline(params, None, cfg_full, mesh)(
        text, mask, key, decode=False
    )
    err = np.linalg.norm(np.asarray(out - ref, np.float32)) / np.linalg.norm(
        np.asarray(ref, np.float32)
    )
    assert err < 1e-2  # FULL plan ~= baseline

    # steps 2+: window-residual everywhere
    plan = tuple(
        tuple((1 if s >= 2 else 0) for _ in range(mcfg.depth))
        for s in range(steps)
    )
    cfg_w = _dc.replace(base_cfg, fast_attn_plan=plan, fast_attn_window=4)
    out_w = PixArtPipeline(params, None, cfg_w, mesh)(
        text, mask, key, decode=False
    )
    assert np.isfinite(np.asarray(out_w, np.float32)).all()


def test_optimize_plan_marks_dead_residual_refreshes():
    from compactfusion_tpu.cache.fast_attn import optimize_plan

    F = FastAttnMethod
    # layer 0: FULL at step 0 feeds windows at 1-2, FULL at 3 feeds nothing,
    #          FULL at 4 feeds a window at 6 THROUGH an OUTPUT_SHARE at 5
    # layer 1: FULLs never feed a window -> all become NO_RESIDUAL
    plan = np.array(
        [
            [F.FULL_ATTN, F.FULL_ATTN],
            [F.RESIDUAL_WINDOW_ATTN, F.OUTPUT_SHARE],
            [F.RESIDUAL_WINDOW_ATTN, F.FULL_ATTN_CFG_SHARE],
            [F.FULL_ATTN, F.OUTPUT_SHARE],
            [F.FULL_ATTN, F.FULL_ATTN],
            [F.OUTPUT_SHARE, F.OUTPUT_SHARE],
            [F.RESIDUAL_WINDOW_ATTN_CFG_SHARE, F.OUTPUT_SHARE],
        ],
        np.int32,
    )
    opt = optimize_plan(plan)
    expect = np.array(
        [
            [F.FULL_ATTN, F.FULL_ATTN_NO_RESIDUAL],
            [F.RESIDUAL_WINDOW_ATTN, F.OUTPUT_SHARE],
            [F.RESIDUAL_WINDOW_ATTN, F.FULL_ATTN_CFG_SHARE_NO_RESIDUAL],
            [F.FULL_ATTN_NO_RESIDUAL, F.OUTPUT_SHARE],
            [F.FULL_ATTN, F.FULL_ATTN_NO_RESIDUAL],
            [F.OUTPUT_SHARE, F.OUTPUT_SHARE],
            [F.RESIDUAL_WINDOW_ATTN_CFG_SHARE, F.OUTPUT_SHARE],
        ],
        np.int32,
    )
    np.testing.assert_array_equal(opt, expect)
    # idempotent
    np.testing.assert_array_equal(optimize_plan(opt), expect)


def test_full_no_residual_branch_matches_full_output():
    """NO_RESIDUAL FULL variants: same output, residual left untouched."""
    impl = FastAttnAttn(window_size=4, cfg_batched=True)
    q, k, v = _qkv(7, b=2)  # [cond; uncond] rows
    st0 = jax.tree_util.tree_map(
        lambda a: a[0], impl.init_state(1, 2, 32, 4, 16, jnp.float32)
    )
    st0 = dict(st0, residual=jnp.full_like(st0["residual"], 3.25))

    st = dict(st0, method=jnp.int32(FastAttnMethod.FULL_ATTN))
    out_full, st_full = impl(q, k, v, st)
    st = dict(st0, method=jnp.int32(FastAttnMethod.FULL_ATTN_NO_RESIDUAL))
    out_nores, st_nores = impl(q, k, v, st)
    np.testing.assert_allclose(
        np.asarray(out_nores), np.asarray(out_full), atol=1e-6
    )
    # residual passthrough (3.25 marker), vs FULL which refreshed it
    np.testing.assert_array_equal(
        np.asarray(st_nores["residual"]), np.asarray(st0["residual"])
    )
    assert not np.allclose(
        np.asarray(st_full["residual"]), np.asarray(st0["residual"])
    )

    st = dict(st0, method=jnp.int32(FastAttnMethod.FULL_ATTN_CFG_SHARE))
    out_cfg, _ = impl(q, k, v, st)
    st = dict(
        st0, method=jnp.int32(FastAttnMethod.FULL_ATTN_CFG_SHARE_NO_RESIDUAL)
    )
    out_cfg_nores, st_cfg_nores = impl(q, k, v, st)
    np.testing.assert_allclose(
        np.asarray(out_cfg_nores), np.asarray(out_cfg), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(st_cfg_nores["residual"]), np.asarray(st0["residual"])
    )


def test_calibration_rejects_joint_tensors():
    impl = CalibrationAttn(window_size=4)
    q, k, v = _qkv(3)
    st = jax.tree_util.tree_map(
        lambda a: a[0], impl.init_state(1, 1, 32, 4, 16, jnp.float32)
    )
    with pytest.raises(AssertionError):
        impl(q, k, v, st, joint_q=q, joint_k=k, joint_v=v)
