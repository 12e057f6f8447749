"""Shared test helpers."""

import jax
import jax.numpy as jnp
import numpy as np


def spice_params(params, seed=123, scale=0.5):
    """Randomize modulation tables/biases so attention contributions are O(1).

    Freshly-initialised DiTs have zero AdaLN gates (zero scale_shift_table,
    zero mod biases), which makes block outputs nearly input-independent and
    hides compression error under bf16 rounding — e2e tests must perturb them
    to be sensitive to the attention path.
    """
    rng = np.random.default_rng(seed)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, path + (i,)) for i, v in enumerate(node))
        name = "/".join(str(p) for p in path)
        if "scale_shift" in name or (
            ("mod" in name or "adaln" in name) and name.endswith("b")
        ):
            return jnp.asarray(
                rng.standard_normal(node.shape) * scale, node.dtype
            )
        return node

    return walk(params, ())


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
