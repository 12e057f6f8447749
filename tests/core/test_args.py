"""CLI args surface tests (reference config/args.py parity)."""

import pytest

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.config import CompressType


def _parse(argv):
    parser = FlexibleArgumentParser()
    xFuserArgs.add_cli_args(parser)
    return xFuserArgs.from_cli_args(parser.parse_args(argv))


def test_reference_style_invocation():
    args = _parse(
        [
            "--model", "black-forest-labs/FLUX.1-dev",
            "--ulysses_degree", "2",
            "--ring_degree", "2",
            "--height", "1024",
            "--width=1024",  # =value form
            "--num-inference-steps", "28",  # dash form
            "--prompt", "a photo of a cat",
        ]
    )
    engine, inp = args.create_config()
    assert engine.parallel_config.ulysses_degree == 2
    assert engine.parallel_config.sp_degree == 4
    assert inp.height == 1024 and inp.num_inference_steps == 28
    assert inp.prompt == ("a photo of a cat",)


def test_cfg_parallel_and_compact():
    args = _parse(
        [
            "--use_cfg_parallel",
            "--compact",
            "--compact_type", "int2",
            "--compact_warmup_steps", "3",
        ]
    )
    engine, _ = args.create_config()
    assert engine.parallel_config.cfg_degree == 2
    cc = engine.compact_config
    assert cc.enabled and cc.compress_type == CompressType.INT2
    assert cc.warmup_steps == 3 and cc.error_feedback


def test_world_size():
    args = _parse(
        ["--ulysses_degree", "2", "--ring_degree", "2", "--use_cfg_parallel"]
    )
    engine, _ = args.create_config()
    assert engine.parallel_config.world_size == 8
