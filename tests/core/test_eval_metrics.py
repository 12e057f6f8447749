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


# ---------------------------------------------------------------------------
# VGG16 LPIPS extractor + FVD additions (round 2)
# ---------------------------------------------------------------------------


def test_vgg16_lpips_matches_torch_reference():
    """JAX VGG16 trunk + LPIPS math vs an independent torch implementation
    built with the torchvision state-dict naming."""
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from compactfusion_tpu.eval.vgg import (
        VGG16_CONVS,
        LPIPS_TAPS,
        convert_vgg16,
        make_lpips,
        _SHIFT,
        _SCALE,
    )

    # torch reference: torchvision vgg16 'features' topology + lpips math
    # (conv/relu pairs with maxpools exactly like torchvision up to relu5_3)
    feats = []
    convs = iter([nn.Conv2d(ci, co, 3, padding=1) for _, ci, co in VGG16_CONVS])
    plan = "CRCRMCRCRMCRCRCRMCRCRCRMCRCRCR"  # vgg16 features up to relu5_3
    for ch in plan:
        if ch == "C":
            feats.append(next(convs))
        elif ch == "R":
            feats.append(nn.ReLU())
        else:
            feats.append(nn.MaxPool2d(2))
    torch.manual_seed(0)
    trunk = nn.Sequential(*feats).eval()
    state = {f"features.{i}.{k}": v.detach().numpy()
             for i, m in enumerate(trunk) if isinstance(m, nn.Conv2d)
             for k, v in m.state_dict().items()}

    def torch_lpips(a, b):
        taps = []
        sh = torch.tensor(_SHIFT).view(1, 3, 1, 1)
        sc = torch.tensor(_SCALE).view(1, 3, 1, 1)

        def run(x):
            x = (x - sh) / sc
            out = []
            for i, m in enumerate(trunk):
                x = m(x)
                if i in (3, 8, 15, 22, 29):  # relu after each tap conv
                    out.append(x)
            return out

        fa, fb = run(a), run(b)
        total = 0.0
        for xa, xb in zip(fa, fb):
            na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
            nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
            # the lpips package's baseline: SUM over channels, then spatial
            # average (each stage weighs by its channel count)
            total = total + ((na - nb) ** 2).sum(dim=1).mean(dim=(1, 2))
        return total

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_lpips(torch.tensor(a), torch.tensor(b)).numpy()

    params = convert_vgg16(state)
    lp = make_lpips(params, lins=None)
    got = np.asarray(
        lp(jnp.asarray(a.transpose(0, 2, 3, 1)), jnp.asarray(b.transpose(0, 2, 3, 1)))
    )
    assert np.allclose(got, ref, rtol=2e-4, atol=1e-5), (got, ref)


def test_fvd_math_and_stats_roundtrip(tmp_path):
    from compactfusion_tpu.eval.metrics import (
        feature_stats,
        frechet_distance,
        fvd_from_features,
        load_fid_stats_npz,
    )

    rng = np.random.default_rng(1)
    fa = rng.standard_normal((256, 16)).astype(np.float64)
    fb = fa + 0.5
    d = fvd_from_features(fa, fb)
    assert d == pytest.approx(0.25 * 16, rel=0.2)  # mean shift dominates
    assert fvd_from_features(fa, fa) == pytest.approx(0.0, abs=1e-6)

    mu, cov = feature_stats(fb)
    np.savez(tmp_path / "stats.npz", mu=mu, sigma=cov)
    mu2, cov2 = load_fid_stats_npz(str(tmp_path / "stats.npz"))
    d2 = frechet_distance(*feature_stats(fa), mu2, cov2)
    assert d2 == pytest.approx(d, rel=1e-6)
