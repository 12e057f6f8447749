"""Quality metric tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from compactfusion_tpu.eval.metrics import (
    LPIPS,
    fid_from_features,
    psnr,
    ssim,
    video_psnr,
    video_ssim,
)


def _img(seed=0, shape=(2, 32, 32, 3)):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)


def test_psnr_identity_and_noise():
    a = _img()
    assert float(psnr(a, a)) > 100
    noisy = jnp.clip(a + 0.1 * _img(1), 0, 1)
    v = float(psnr(a, noisy))
    assert 10 < v < 35


def test_ssim_bounds():
    a = _img(2)
    assert float(ssim(a, a)) > 0.999
    b = _img(3)
    assert float(ssim(a, b)) < 0.5


def test_video_metrics():
    a = _img(4, (1, 3, 32, 32, 3))
    noisy = jnp.clip(a + 0.05, 0, 1)
    assert float(video_psnr(a, a)) > 100
    assert 15 < float(video_psnr(a, noisy)) < 40
    assert float(video_ssim(a, a)) > 0.999


def test_fid_math():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((500, 16))
    b = rng.standard_normal((500, 16))
    same = fid_from_features(a, a)
    diff = fid_from_features(a, b + 3.0)
    assert same < 1e-6
    assert diff > 100


def test_lpips_with_dummy_extractor():
    def extractor(x):
        return [x, x[:, ::2, ::2]]

    lp = LPIPS(extractor)
    a = _img(6)
    d_same = np.asarray(lp(a, a))
    d_diff = np.asarray(lp(a, _img(7)))
    assert (d_same < 1e-10).all()
    assert (d_diff > d_same).all()
