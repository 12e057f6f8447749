"""InceptionV3 pool-feature extractor for FID, functional JAX.

The reference computes FID with pytorch-fid's InceptionV3 (2048-d pool3
features, ``benchmark/fid/compute_fid.py``).  This module is the TPU-native
equivalent: the torchvision ``inception_v3`` trunk up to the global average
pool, with a converter that folds the eval-mode BatchNorms (eps=1e-3) into
conv weight/bias at load time.

Local-weights path (no egress in this environment):
  1. export ``inception_v3_google-0cc3c7bd.pth`` (torchvision) to
     safetensors/npz on a connected machine.  (The pytorch-fid
     ``pt_inception-2015-12-05`` weights are NOT drop-in: pytorch-fid
     patches the A/C/E branch pools to count_include_pad=False and makes
     Mixed_7c's pool branch a max-pool — this forward implements the
     torchvision semantics only, so FID numbers are comparable across
     runs of THIS harness but not to pytorch-fid absolute values);
  2. ``params = convert_inception_v3(load_safetensors(path))``;
  3. ``feats = inception_pool_features(params, images)`` with images
     (B, 299, 299, 3) in [-1, 1];
  4. feed to :func:`compactfusion_tpu.eval.metrics.fid_from_features` or
     :func:`feature_stats` for a stats file.

Validated against an independent torch reference in
``tests/core/test_eval_extractors.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

#: stem convs: name -> (k, stride, pad)
_STEM = (
    ("Conv2d_1a_3x3", 3, 2, 0),
    ("Conv2d_2a_3x3", 3, 1, 0),
    ("Conv2d_2b_3x3", 3, 1, 1),
    ("maxpool", 0, 0, 0),
    ("Conv2d_3b_1x1", 1, 1, 0),
    ("Conv2d_4a_3x3", 3, 1, 0),
    ("maxpool", 0, 0, 0),
)

#: all (BasicConv2d name, in, out, (kh, kw), stride, (ph, pw)) — converter
#: and random init share this table; forward wires the topology explicitly.
INCEPTION_CONVS = []


def _cv(name, c_in, c_out, k, stride=1, pad=(0, 0)):
    kh, kw = (k, k) if isinstance(k, int) else k
    INCEPTION_CONVS.append((name, c_in, c_out, (kh, kw), stride, pad))


_cv("Conv2d_1a_3x3", 3, 32, 3, 2)
_cv("Conv2d_2a_3x3", 32, 32, 3)
_cv("Conv2d_2b_3x3", 32, 64, 3, 1, (1, 1))
_cv("Conv2d_3b_1x1", 64, 80, 1)
_cv("Conv2d_4a_3x3", 80, 192, 3)


def _inception_a(prefix, c_in, pool):
    _cv(f"{prefix}.branch1x1", c_in, 64, 1)
    _cv(f"{prefix}.branch5x5_1", c_in, 48, 1)
    _cv(f"{prefix}.branch5x5_2", 48, 64, 5, 1, (2, 2))
    _cv(f"{prefix}.branch3x3dbl_1", c_in, 64, 1)
    _cv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1))
    _cv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 1, (1, 1))
    _cv(f"{prefix}.branch_pool", c_in, pool, 1)
    return 64 + 64 + 96 + pool


def _inception_b(prefix, c_in):
    _cv(f"{prefix}.branch3x3", c_in, 384, 3, 2)
    _cv(f"{prefix}.branch3x3dbl_1", c_in, 64, 1)
    _cv(f"{prefix}.branch3x3dbl_2", 64, 96, 3, 1, (1, 1))
    _cv(f"{prefix}.branch3x3dbl_3", 96, 96, 3, 2)
    return 384 + 96 + c_in


def _inception_c(prefix, c_in, c7):
    _cv(f"{prefix}.branch1x1", c_in, 192, 1)
    _cv(f"{prefix}.branch7x7_1", c_in, c7, 1)
    _cv(f"{prefix}.branch7x7_2", c7, c7, (1, 7), 1, (0, 3))
    _cv(f"{prefix}.branch7x7_3", c7, 192, (7, 1), 1, (3, 0))
    _cv(f"{prefix}.branch7x7dbl_1", c_in, c7, 1)
    _cv(f"{prefix}.branch7x7dbl_2", c7, c7, (7, 1), 1, (3, 0))
    _cv(f"{prefix}.branch7x7dbl_3", c7, c7, (1, 7), 1, (0, 3))
    _cv(f"{prefix}.branch7x7dbl_4", c7, c7, (7, 1), 1, (3, 0))
    _cv(f"{prefix}.branch7x7dbl_5", c7, 192, (1, 7), 1, (0, 3))
    _cv(f"{prefix}.branch_pool", c_in, 192, 1)
    return 768


def _inception_d(prefix, c_in):
    _cv(f"{prefix}.branch3x3_1", c_in, 192, 1)
    _cv(f"{prefix}.branch3x3_2", 192, 320, 3, 2)
    _cv(f"{prefix}.branch7x7x3_1", c_in, 192, 1)
    _cv(f"{prefix}.branch7x7x3_2", 192, 192, (1, 7), 1, (0, 3))
    _cv(f"{prefix}.branch7x7x3_3", 192, 192, (7, 1), 1, (3, 0))
    _cv(f"{prefix}.branch7x7x3_4", 192, 192, 3, 2)
    return 320 + 192 + c_in


def _inception_e(prefix, c_in):
    _cv(f"{prefix}.branch1x1", c_in, 320, 1)
    _cv(f"{prefix}.branch3x3_1", c_in, 384, 1)
    _cv(f"{prefix}.branch3x3_2a", 384, 384, (1, 3), 1, (0, 1))
    _cv(f"{prefix}.branch3x3_2b", 384, 384, (3, 1), 1, (1, 0))
    _cv(f"{prefix}.branch3x3dbl_1", c_in, 448, 1)
    _cv(f"{prefix}.branch3x3dbl_2", 448, 384, 3, 1, (1, 1))
    _cv(f"{prefix}.branch3x3dbl_3a", 384, 384, (1, 3), 1, (0, 1))
    _cv(f"{prefix}.branch3x3dbl_3b", 384, 384, (3, 1), 1, (1, 0))
    _cv(f"{prefix}.branch_pool", c_in, 192, 1)
    return 320 + 768 + 768 + 192


c = _inception_a("Mixed_5b", 192, 32)
c = _inception_a("Mixed_5c", c, 64)
c = _inception_a("Mixed_5d", c, 64)
c = _inception_b("Mixed_6a", c)
c = _inception_c("Mixed_6b", c, 128)
c = _inception_c("Mixed_6c", c, 160)
c = _inception_c("Mixed_6d", c, 160)
c = _inception_c("Mixed_6e", c, 192)
c = _inception_d("Mixed_7a", c)
c = _inception_e("Mixed_7b", c)
FEATURE_DIM_CHECK = _inception_e("Mixed_7c", c)
assert FEATURE_DIM_CHECK == 2048

_CONV_TABLE = {t[0]: t for t in INCEPTION_CONVS}


def init_inception_v3(key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init with the torchvision topology (for tests)."""
    params = {}
    ks = jax.random.split(key, len(INCEPTION_CONVS))
    for (name, c_in, c_out, (kh, kw), _, _), k in zip(INCEPTION_CONVS, ks):
        w = jax.random.truncated_normal(k, -2, 2, (kh, kw, c_in, c_out))
        params[name] = {
            "w": (w * (kh * kw * c_in) ** -0.5).astype(dtype),
            "b": jnp.zeros((c_out,), dtype),
        }
    return params


def convert_inception_v3(
    state: Dict[str, np.ndarray], dtype=jnp.float32, eps: float = 1e-3
):
    """torchvision ``inception_v3`` state dict -> param tree with the
    eval-mode BatchNorm folded into each conv (w' = w*g/sqrt(v+eps),
    b' = beta - mean*g/sqrt(v+eps))."""
    params = {}
    for name, *_ in INCEPTION_CONVS:
        w = np.asarray(state[f"{name}.conv.weight"], np.float32)  # (O,I,kh,kw)
        g = np.asarray(state[f"{name}.bn.weight"], np.float32)
        beta = np.asarray(state[f"{name}.bn.bias"], np.float32)
        mu = np.asarray(state[f"{name}.bn.running_mean"], np.float32)
        var = np.asarray(state[f"{name}.bn.running_var"], np.float32)
        s = g / np.sqrt(var + eps)
        params[name] = {
            "w": jnp.asarray(np.transpose(w * s[:, None, None, None], (2, 3, 1, 0)), dtype),
            "b": jnp.asarray(beta - mu * s, dtype),
        }
    return params


def _conv(params, name, x):
    _, _, _, _, stride, (ph, pw) = _CONV_TABLE[name]
    p = params[name]
    y = lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool(x, k=3, s=2, pad="VALID"):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), pad
    )


def _avgpool3(x):
    """torch avg_pool2d(3, stride=1, padding=1) with count_include_pad."""
    y = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    return y / 9.0


def _block_a(params, prefix, x):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b5 = _conv(params, f"{prefix}.branch5x5_2", _conv(params, f"{prefix}.branch5x5_1", x))
    b3 = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_2", b3)
    b3 = _conv(params, f"{prefix}.branch3x3dbl_3", b3)
    bp = _conv(params, f"{prefix}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_1", x)
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", bd)
    bd = _conv(params, f"{prefix}.branch3x3dbl_3", bd)
    return jnp.concatenate([b3, bd, _maxpool(x)], axis=-1)


def _block_c(params, prefix, x):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b7 = x
    for i in (1, 2, 3):
        b7 = _conv(params, f"{prefix}.branch7x7_{i}", b7)
    bd = x
    for i in (1, 2, 3, 4, 5):
        bd = _conv(params, f"{prefix}.branch7x7dbl_{i}", bd)
    bp = _conv(params, f"{prefix}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, prefix, x):
    b3 = _conv(params, f"{prefix}.branch3x3_2", _conv(params, f"{prefix}.branch3x3_1", x))
    b7 = x
    for i in (1, 2, 3, 4):
        b7 = _conv(params, f"{prefix}.branch7x7x3_{i}", b7)
    return jnp.concatenate([b3, b7, _maxpool(x)], axis=-1)


def _block_e(params, prefix, x):
    b1 = _conv(params, f"{prefix}.branch1x1", x)
    b3 = _conv(params, f"{prefix}.branch3x3_1", x)
    b3 = jnp.concatenate(
        [_conv(params, f"{prefix}.branch3x3_2a", b3),
         _conv(params, f"{prefix}.branch3x3_2b", b3)], axis=-1
    )
    bd = _conv(params, f"{prefix}.branch3x3dbl_2", _conv(params, f"{prefix}.branch3x3dbl_1", x))
    bd = jnp.concatenate(
        [_conv(params, f"{prefix}.branch3x3dbl_3a", bd),
         _conv(params, f"{prefix}.branch3x3dbl_3b", bd)], axis=-1
    )
    bp = _conv(params, f"{prefix}.branch_pool", _avgpool3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool_features(params, images: jax.Array) -> jax.Array:
    """(B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool features (fp32)."""
    x = images.astype(jnp.float32)
    x = _conv(params, "Conv2d_1a_3x3", x)
    x = _conv(params, "Conv2d_2a_3x3", x)
    x = _conv(params, "Conv2d_2b_3x3", x)
    x = _maxpool(x)
    x = _conv(params, "Conv2d_3b_1x1", x)
    x = _conv(params, "Conv2d_4a_3x3", x)
    x = _maxpool(x)
    for m in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _block_a(params, m, x)
    x = _block_b(params, "Mixed_6a", x)
    for m in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(params, m, x)
    x = _block_d(params, "Mixed_7a", x)
    x = _block_e(params, "Mixed_7b", x)
    x = _block_e(params, "Mixed_7c", x)
    return jnp.mean(x, axis=(1, 2))
