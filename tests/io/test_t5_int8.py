"""Int8 T5 encoder (the reference's ``--use_fp8_t5_encoder`` analog).

The reference gates fp8 T5 on an optimum-quanto CUDA capability probe
(``xfuser/config/args.py`` + ``xfuser/envs.py:52-120``); v5e has no fp8, so
the honest TPU equivalent is per-channel int8 weight quantization
(``models/text_encoders.quantize_t5_int8``): T5-XXL drops ~9.1 -> ~4.6 GB of
a 16 GB chip, compute stays bf16 on the MXU, one layer dequantized at a time
inside the encoder scan.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from compactfusion_tpu.models.text_encoders import (
    T5Config,
    init_t5,
    quantize_t5_int8,
    t5_encode,
    t5_tiny,
)
from tests.helpers import rel_err


def _nbytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def test_int8_t5_close_to_full_precision():
    cfg = dataclasses.replace(t5_tiny(), num_layers=3, dtype=jnp.float32)
    params = init_t5(jax.random.PRNGKey(0), cfg)
    qparams = quantize_t5_int8(params)

    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 17)))
    mask = jnp.asarray(np.random.default_rng(1).random((2, 17)) > 0.2)
    full = t5_encode(params, ids, cfg, mask=mask)
    quant = t5_encode(qparams, ids, cfg, mask=mask)

    err = rel_err(quant, full)
    # per-channel int8 weight error is ~0.3%/matmul; through 3 layers the
    # output must stay close but NOT bit-equal (that would mean the
    # quantized path silently fell back to the full weights)
    assert err < 0.05, err
    assert err > 1e-6, "quantized path did not engage"
    assert np.isfinite(np.asarray(quant, np.float32)).all()


def test_int8_t5_halves_parameter_bytes():
    cfg = dataclasses.replace(t5_tiny(), dtype=jnp.bfloat16)
    params = init_t5(jax.random.PRNGKey(0), cfg)
    qparams = quantize_t5_int8(params)
    # bf16 -> int8 on every matrix: close to 2x overall (scales are tiny)
    assert _nbytes(qparams) < 0.62 * _nbytes(params)
    # every linear + the embedding is int8
    assert qparams["embed_q"].dtype == jnp.int8
    assert qparams["blocks"]["q"]["w_q"].dtype == jnp.int8
    assert qparams["blocks"]["wo"]["w_q"].dtype == jnp.int8


def test_int8_flag_reaches_runtime_config():
    from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs

    for flag in ("--use_fp8_t5_encoder", "--use_int8_t5_encoder"):
        parser = FlexibleArgumentParser()
        xFuserArgs.add_cli_args(parser)
        args = xFuserArgs.from_cli_args(
            parser.parse_args(["--model", "pixart-tiny", flag])
        )
        engine, _ = args.create_config()
        assert engine.runtime_config.quantize_t5 is True
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args(["--model", "pixart-tiny"]))
    engine, _ = args.create_config()
    assert engine.runtime_config.quantize_t5 is False
