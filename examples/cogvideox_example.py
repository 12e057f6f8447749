"""CogVideoX example (reference: examples/cogvideox_example.py).

    python examples/cogvideox_example.py --model THUDM/CogVideoX-2b \
        --ulysses_degree 2 --ring_degree 2 --height 480 --width 720 \
        --num_frames 49 --num_inference_steps 50 \
        --compact --compact_type binary
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="CogVideoX example")
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args())
    if args.model == xFuserArgs.model:
        args.model = "THUDM/CogVideoX-2b"
    if args.num_frames == 1:
        args.num_frames = 49
    engine_config, input_config = args.create_config()
    runner = xDiTParallel(engine_config, input_config)
    with Profiler.scope("total"):
        with Profiler.scope("warmup"):
            runner()
        with Profiler.scope("generate"):
            out = runner()
    arr = np.asarray(out, np.float32)
    print(f"video latents: shape={arr.shape} finite={np.isfinite(arr).all()}")
    # persist the result like the reference examples (./results)
    print(f"saved: {runner.save('results', prefix='cogvideox', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
