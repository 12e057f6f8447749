"""FLUX.1 example (reference: examples/flux_example.py).

    python examples/flux_example.py --model black-forest-labs/FLUX.1-dev \
        --ulysses_degree 2 --ring_degree 2 --height 1024 --width 1024 \
        --num_inference_steps 28 --compact --compact_type binary

The compact flags replicate the reference's ``compact_init(CompactConfig(...))``
setup (``examples/flux_example.py:91``): warmup steps exchange raw K/V, later
steps exchange 1-bit residuals with error feedback.

Add ``--quantize_backbone_int8`` to run FULL-DEPTH FLUX on a single 16 GB
v5e (int8 block-stack weights, bf16 MXU compute: 561.5 ms/fwd at 1024px,
85.2% MFU — BENCH_FLUX_FULL.json; int8-vs-bf16 parity bounded by
tests/models/test_flux.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="FLUX example")
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args())
    args.guidance_scale = 3.5 if args.guidance_scale == 4.5 else args.guidance_scale
    engine_config, input_config = args.create_config()

    runner = xDiTParallel(engine_config, input_config)
    with Profiler.scope("total"):
        with Profiler.scope("warmup"):
            runner(decode=False)
        with Profiler.scope("generate"):
            out = runner(decode=False)
    arr = np.asarray(out, np.float32)
    print(f"latents: shape={arr.shape} finite={np.isfinite(arr).all()}")
    # persist the result like the reference examples (./results)
    print(f"saved: {runner.save('results', prefix='flux', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
