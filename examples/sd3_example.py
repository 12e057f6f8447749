"""SD3 example (reference: examples/sd3_example.py).

    python examples/sd3_example.py --model stabilityai/stable-diffusion-3-medium \
        --ulysses_degree 2 --ring_degree 2 --use_cfg_parallel \
        --height 1024 --width 1024 --num_inference_steps 28
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="SD3 example")
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args())
    if args.model == xFuserArgs.model:
        args.model = "stabilityai/stable-diffusion-3-medium"
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
    print(f"saved: {runner.save('results', prefix='sd3', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
