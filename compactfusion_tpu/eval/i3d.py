"""I3D (Inflated 3D Inception) feature extractor for FVD, functional JAX.

The reference computes FVD with a Kinetics-400 I3D
(``common_metrics_on_video_quality/calculate_fvd.py`` — styleganv/videogpt
torchscript flavors of the same TF-Hub model).  This module is the
TPU-native equivalent: the Inception-v1 trunk inflated to 3D, TF-style SAME
padding, eval-mode BatchNorms (eps=1e-3) folded into the convs at load time,
returning the 400-d averaged logits (the standard FVD feature).

Weights use the de-facto PyTorch I3D naming (piergiaj/pytorch-i3d
``rgb_imagenet.pt``: ``Conv3d_1a_7x7.conv3d.weight``,
``Mixed_3b.b0.bn.running_var``, ``logits.conv3d.{weight,bias}``, ...).
Local-weights path: export that checkpoint to safetensors/npz on a connected
machine, then ``params = convert_i3d(load_safetensors(path))``.

``i3d_features(params, videos)`` takes (B, T, H, W, 3) in [-1, 1] with
H = W = 224 and T >= 10 (the FVD clip convention); feed the features to
:func:`compactfusion_tpu.eval.metrics.fvd_from_features`.

Validated against an independent torch reference in
``tests/core/test_eval_extractors.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

#: Inception-v1 mixed-block channel table: prefix -> (in, [b0, b1a, b1b,
#: b2a, b2b, b3b])
I3D_MIXED = (
    ("Mixed_3b", 192, (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", 256, (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", 480, (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", 512, (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", 512, (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", 512, (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", 528, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", 832, (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", 832, (384, 192, 384, 48, 128, 128)),
)

#: every Unit3D: name -> (c_in, c_out, kernel, stride)
I3D_UNITS: Dict[str, Any] = {
    "Conv3d_1a_7x7": (3, 64, (7, 7, 7), (2, 2, 2)),
    "Conv3d_2b_1x1": (64, 64, (1, 1, 1), (1, 1, 1)),
    "Conv3d_2c_3x3": (64, 192, (3, 3, 3), (1, 1, 1)),
}
for _prefix, _cin, _b in I3D_MIXED:
    I3D_UNITS[f"{_prefix}.b0"] = (_cin, _b[0], (1, 1, 1), (1, 1, 1))
    I3D_UNITS[f"{_prefix}.b1a"] = (_cin, _b[1], (1, 1, 1), (1, 1, 1))
    I3D_UNITS[f"{_prefix}.b1b"] = (_b[1], _b[2], (3, 3, 3), (1, 1, 1))
    I3D_UNITS[f"{_prefix}.b2a"] = (_cin, _b[3], (1, 1, 1), (1, 1, 1))
    I3D_UNITS[f"{_prefix}.b2b"] = (_b[3], _b[4], (3, 3, 3), (1, 1, 1))
    I3D_UNITS[f"{_prefix}.b3b"] = (_cin, _b[5], (1, 1, 1), (1, 1, 1))

FEATURE_DIM = 400  # Kinetics-400 logits
PRE_LOGITS_DIM = 1024


def init_i3d(key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init with the pytorch-i3d topology (for tests)."""
    params = {}
    ks = jax.random.split(key, len(I3D_UNITS) + 1)
    for (name, (c_in, c_out, k, _)), kk in zip(I3D_UNITS.items(), ks):
        fan = c_in * k[0] * k[1] * k[2]
        w = jax.random.truncated_normal(kk, -2, 2, k + (c_in, c_out))
        params[name] = {
            "w": (w * fan**-0.5).astype(dtype),
            "b": jnp.zeros((c_out,), dtype),
        }
    w = jax.random.truncated_normal(
        ks[-1], -2, 2, (1, 1, 1, PRE_LOGITS_DIM, FEATURE_DIM)
    )
    params["logits"] = {
        "w": (w * PRE_LOGITS_DIM**-0.5).astype(dtype),
        "b": jnp.zeros((FEATURE_DIM,), dtype),
    }
    return params


def convert_i3d(state: Dict[str, np.ndarray], dtype=jnp.float32, eps: float = 1e-3):
    """pytorch-i3d state dict -> param tree with eval-mode BN folded.

    torch Conv3d weights are (O, I, T, H, W) -> (T, H, W, I, O).
    """
    params = {}
    for name in I3D_UNITS:
        w = np.asarray(state[f"{name}.conv3d.weight"], np.float32)
        g = np.asarray(state[f"{name}.bn.weight"], np.float32)
        beta = np.asarray(state[f"{name}.bn.bias"], np.float32)
        mu = np.asarray(state[f"{name}.bn.running_mean"], np.float32)
        var = np.asarray(state[f"{name}.bn.running_var"], np.float32)
        s = g / np.sqrt(var + eps)
        params[name] = {
            "w": jnp.asarray(
                np.transpose(w * s[:, None, None, None, None], (2, 3, 4, 1, 0)),
                dtype,
            ),
            "b": jnp.asarray(beta - mu * s, dtype),
        }
    params["logits"] = {
        "w": jnp.asarray(
            np.transpose(np.asarray(state["logits.conv3d.weight"], np.float32),
                         (2, 3, 4, 1, 0)), dtype
        ),
        "b": jnp.asarray(state["logits.conv3d.bias"], dtype),
    }
    return params


def _unit(params, name, x, relu=True):
    c_in, c_out, k, stride = I3D_UNITS.get(
        name, (None, None, (1, 1, 1), (1, 1, 1))
    )
    p = params[name]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + p["b"].astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _maxpool(x, k, s):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1,) + k + (1,), (1,) + s + (1,), "SAME"
    )


def _mixed(params, prefix, x):
    b0 = _unit(params, f"{prefix}.b0", x)
    b1 = _unit(params, f"{prefix}.b1b", _unit(params, f"{prefix}.b1a", x))
    b2 = _unit(params, f"{prefix}.b2b", _unit(params, f"{prefix}.b2a", x))
    b3 = _unit(params, f"{prefix}.b3b", _maxpool(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_features(params, videos: jax.Array, *, pre_logits: bool = False) -> jax.Array:
    """(B, T, 224, 224, 3) in [-1, 1] -> (B, 400) FVD features.

    ``pre_logits=True`` returns the 1024-d pooled trunk features instead.
    """
    x = videos.astype(jnp.float32)
    x = _unit(params, "Conv3d_1a_7x7", x)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _unit(params, "Conv3d_2b_1x1", x)
    x = _unit(params, "Conv3d_2c_3x3", x)
    x = _maxpool(x, (1, 3, 3), (1, 2, 2))
    x = _mixed(params, "Mixed_3b", x)
    x = _mixed(params, "Mixed_3c", x)
    x = _maxpool(x, (3, 3, 3), (2, 2, 2))
    for m in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _mixed(params, m, x)
    x = _maxpool(x, (2, 2, 2), (2, 2, 2))
    x = _mixed(params, "Mixed_5b", x)
    x = _mixed(params, "Mixed_5c", x)
    # avg_pool kernel (2, 7, 7) stride 1 VALID, then 1x1x1 logits conv,
    # spatial squeeze + temporal mean (pytorch-i3d forward semantics)
    x = lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1), "VALID"
    ) / (2 * 7 * 7)
    if pre_logits:
        return jnp.mean(x, axis=(1, 2, 3))
    x = lax.conv_general_dilated(
        x, params["logits"]["w"].astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    ) + params["logits"]["b"].astype(x.dtype)
    return jnp.mean(x, axis=(1, 2, 3))
