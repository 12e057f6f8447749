"""Image/video quality metrics.

Reference: the offline eval harness — ``benchmark/fid/compute_fid.py`` (FID,
cleanfid), LPIPS/PSNR scripts, and ``common_metrics_on_video_quality/
calculate_{fvd,lpips,psnr,ssim}.py`` for video.

PSNR / SSIM / per-frame video variants are implemented natively in JAX.
FID and LPIPS require pretrained feature extractors (InceptionV3, AlexNet/VGG)
— :func:`fid_from_features` / :class:`LPIPS` implement the metric math and
take features from any extractor; torchmetrics/lpips can be plugged in where
their weights are available (this image has no network egress, so the
extractors themselves are not bundled).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio; inputs (..., H, W, C) in [0, data_range].

    With a batch dimension (ndim == 4), returns the MEAN of per-image PSNRs
    — the reference eval harness's convention; pooling the MSE over the
    batch first would let one bad image dominate every good one (log of a
    mean vs mean of logs).
    """
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    if a.ndim == 4:
        m = jnp.mean((a32 - b32) ** 2, axis=(1, 2, 3))
    else:
        m = mse(a, b)
    return jnp.mean(10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return g[:, None] * g[None, :]


def ssim(
    a: jax.Array, b: jax.Array, data_range: float = 1.0,
    kernel_size: int = 11, sigma: float = 1.5,
) -> jax.Array:
    """Structural similarity for (B, H, W, C) images (Wang et al. settings)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    k = _gaussian_kernel(kernel_size, sigma)
    c = a.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = filt(a * a) - mu_a2
    var_b = filt(b * b) - mu_b2
    cov = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_ab + c1) * (2 * cov + c2)) / (
        (mu_a2 + mu_b2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)


def video_psnr(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Mean per-frame PSNR for (B, F, H, W, C) videos (reference
    calculate_psnr.py semantics: average over frames)."""
    bshape = a.shape[:2]
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    per_frame = jax.vmap(lambda x, y: psnr(x, y, data_range))(flat(a), flat(b))
    return jnp.mean(per_frame.reshape(bshape))


def video_ssim(a: jax.Array, b: jax.Array, data_range: float = 1.0) -> jax.Array:
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    per_frame = jax.vmap(
        lambda x, y: ssim(x[None], y[None], data_range)
    )(flat(a), flat(b))
    return jnp.mean(per_frame)


# ---------------------------------------------------------------------------
# FID (metric math over externally-computed features)
# ---------------------------------------------------------------------------


def frechet_distance(
    mu_a: np.ndarray, cov_a: np.ndarray, mu_b: np.ndarray, cov_b: np.ndarray
) -> float:
    """Frechet distance between two Gaussians — usable directly with
    published precomputed statistics (e.g. cleanfid / FID .npz files with
    ``mu``/``sigma`` arrays), so FID is runnable without the extractor."""
    import scipy.linalg

    diff = mu_a - mu_b
    covmean = scipy.linalg.sqrtm(cov_a @ cov_b)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov_a + cov_b - 2.0 * covmean))


def feature_stats(feat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mu, cov), the sufficient statistics for FID/FVD."""
    return feat.mean(0), np.cov(feat, rowvar=False)


def load_fid_stats_npz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load precomputed FID statistics (cleanfid/pytorch-fid .npz layout:
    ``mu`` + ``sigma``)."""
    with np.load(path) as z:
        return np.asarray(z["mu"]), np.asarray(z["sigma"])


def fid_from_features(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """Frechet distance between two feature sets (N, D) — the math behind
    ``benchmark/fid/compute_fid.py``; features come from any extractor
    (InceptionV3 pool3 for standard FID)."""
    return frechet_distance(*feature_stats(feat_a), *feature_stats(feat_b))


def fvd_from_features(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """Frechet Video Distance over per-CLIP video features (N, D) — the
    reference's ``common_metrics_on_video_quality/calculate_fvd.py``
    computes exactly this Frechet distance over I3D (or VideoMAE) logits;
    any such extractor's features plug in here (precomputed stats via
    :func:`load_fid_stats_npz` + :func:`frechet_distance` also work)."""
    return fid_from_features(feat_a, feat_b)


class LPIPS:
    """LPIPS distance given a feature extractor.

    ``extractor(images) -> list of (B, H, W, C) feature maps``; the metric
    normalises each map channelwise, SUMS squared differences over channels
    and spatially averages — the lpips package's baseline aggregation
    (``spatial_average(diff.sum(dim=1))``; same math as
    ``eval.vgg.make_lpips``, keep in sync).  AlexNet/VGG weights plug in via
    ``compactfusion_tpu.io.hf`` when present locally.
    """

    def __init__(self, extractor, weights=None):
        self.extractor = extractor
        self.weights = weights

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        fa = self.extractor(a)
        fb = self.extractor(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10
            )
            nb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10
            )
            d = jnp.mean(jnp.sum((na - nb) ** 2, axis=-1), axis=(1, 2))
            if self.weights is not None:
                d = d * self.weights[i]
            total = total + d
        return total
