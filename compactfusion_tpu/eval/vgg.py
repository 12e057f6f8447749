"""VGG16 feature extractor for LPIPS, functional JAX.

The reference computes LPIPS with the ``lpips`` package (torchvision VGG16
backbone + learned linear calibration, ``benchmark/fid`` scripts and
``common_metrics_on_video_quality/calculate_lpips.py``).  This module is the
TPU-native equivalent: the 13-conv VGG16 feature trunk with taps at
relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 (the 5 LPIPS stages), a
converter from the torchvision ``vgg16`` state-dict naming, and a loader for
the lpips linear-calibration weights.

Local-weights path (no egress in this environment):
  1. download ``vgg16-397923af.pth`` (torchvision) and the lpips ``vgg.pth``
     linear weights on a connected machine; export both to safetensors/npz;
  2. ``params = convert_vgg16(load_safetensors(path))``;
     ``lins = load_lpips_lins(load_safetensors(lin_path))``;
  3. ``lpips = make_lpips(params, lins)``; ``d = lpips(a, b)`` with images
     (B, H, W, 3) in [-1, 1].

Validated against a torch reference in ``tests/core/test_eval_metrics.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

#: torchvision vgg16 ``features`` conv layer indices and channel widths
VGG16_CONVS = (
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
)
#: feature taps AFTER the relu of these conv indices (relu{1..5}_x)
LPIPS_TAPS = (2, 7, 14, 21, 28)

#: lpips input normalization (the package's scaling layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_vgg16(key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init with the torchvision topology (for tests)."""
    params = {}
    ks = jax.random.split(key, len(VGG16_CONVS))
    for (idx, c_in, c_out), k in zip(VGG16_CONVS, ks):
        w = jax.random.truncated_normal(k, -2, 2, (3, 3, c_in, c_out)) * (
            9 * c_in
        ) ** -0.5
        params[f"conv{idx}"] = {
            "w": w.astype(dtype),
            "b": jnp.zeros((c_out,), dtype),
        }
    return params


def convert_vgg16(state: Dict[str, np.ndarray], dtype=jnp.float32):
    """torchvision ``vgg16().features`` state dict -> param tree."""
    params = {}
    for idx, _, _ in VGG16_CONVS:
        w = state[f"features.{idx}.weight"]  # (O, I, 3, 3)
        params[f"conv{idx}"] = {
            "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
            "b": jnp.asarray(state[f"features.{idx}.bias"], dtype),
        }
    return params


def load_lpips_lins(state: Dict[str, np.ndarray], dtype=jnp.float32):
    """lpips vgg.pth linear weights: lin{i}.model.1.weight (C_i, 1, 1, 1)."""
    return [
        jnp.asarray(state[f"lin{i}.model.1.weight"].reshape(-1), dtype)
        for i in range(5)
    ]


def vgg16_features(params, images: jax.Array) -> List[jax.Array]:
    """(B, H, W, 3) in [-1, 1] -> 5 LPIPS feature maps (lpips-normalised
    input, maxpool between stages)."""
    x = (images.astype(jnp.float32) - _SHIFT) / _SCALE
    taps = []
    for idx, _, _ in VGG16_CONVS:
        p = params[f"conv{idx}"]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]
        x = jax.nn.relu(x)
        if idx in LPIPS_TAPS:
            taps.append(x)
            if idx != LPIPS_TAPS[-1]:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID",
                )
    return taps


def make_lpips(params, lins: Optional[List[jax.Array]] = None):
    """Build the full LPIPS callable: images (B, H, W, 3) in [-1, 1] ->
    (B,) distances.  ``lins`` are the learned per-channel calibration
    weights; None = the lpips package's 'baseline' mode, which SUMS over
    channels before spatial averaging (not a per-channel mean — each
    stage's contribution scales with its channel count, like upstream).

    Same normalise/aggregate math as ``eval.metrics.LPIPS`` (keep in sync;
    this variant adds the per-channel ``lins`` hook)."""

    def distance(a, b):
        fa = vgg16_features(params, a)
        fb = vgg16_features(params, b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10
            )
            nb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10
            )
            d2 = (na - nb) ** 2  # (B, H, W, C)
            if lins is not None:
                d2 = d2 * lins[i]
            total = total + jnp.mean(jnp.sum(d2, axis=-1), axis=(1, 2))
        return total

    return jax.jit(distance)
