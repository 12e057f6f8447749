"""Per-layer compression schedule example.

The reference accepts a ``compress_func(layer, step)`` callable
(``xfuser/compact/utils.py:51``) consulted per transformer layer per denoise
step; this build resolves the callable at trace time into a static
(step-segments x layer-segments) plan and compiles one block-scan per
contiguous layer segment (``pipelines/base.py:compact_layer_segments``).

The plan below reproduces a common CompactFusion recipe: early (most
condition-sensitive) layers stay lossless while the rest of the stack runs
1-bit residuals, and every layer exchanges raw K/V during the warmup steps.

    python examples/per_layer_schedule_example.py --model pixart-tiny \
        --ring_degree 4 --height 64 --width 64 --num_inference_steps 6

Works for every compact-capable pipeline (PixArt, FLUX, SD3, CogVideoX,
HunyuanVideo, HunyuanDiT); two-family models (FLUX/HunyuanVideo double+single
stacks, HunyuanDiT down/up halves) index layers across both families.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.config import CompressType
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler

WARMUP_STEPS = 2
LOSSLESS_LAYERS = 2  # keep the first N layers uncompressed


def compress_func(layer: int, step: int) -> CompressType:
    if step < WARMUP_STEPS:
        return CompressType.WARMUP
    if layer < LOSSLESS_LAYERS:
        return CompressType.IDENTITY
    return CompressType.BINARY


def main():
    parser = FlexibleArgumentParser(description="per-layer schedule example")
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args())
    args.compact = True
    engine_config, input_config = args.create_config()

    engine_config = dataclasses.replace(
        engine_config,
        compact_config=dataclasses.replace(
            engine_config.compact_config,
            enabled=True,
            compress_type=CompressType.BINARY,
            warmup_steps=WARMUP_STEPS,
            residual=1,
            error_feedback=True,
            compress_func=compress_func,
        ),
    )

    runner = xDiTParallel(engine_config, input_config)
    with Profiler.scope("total"):
        with Profiler.scope("warmup"):
            runner(decode=False)
        with Profiler.scope("generate"):
            out = runner(decode=False)
    arr = np.asarray(out, np.float32)
    print(f"latents: shape={arr.shape} finite={np.isfinite(arr).all()}")
    # persist the result like the reference examples (./results)
    print(f"saved: {runner.save('results', prefix='per_layer', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
