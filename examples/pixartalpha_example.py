"""PixArt-alpha example (reference: examples/pixartalpha_example.py).

    python examples/pixartalpha_example.py --model PixArt-alpha/PixArt-XL-2-512x512 \
        --ulysses_degree 2 --ring_degree 2 --height 512 --width 512 \
        --num_inference_steps 20 --prompt "a small cactus with a happy face"

Add ``--compact --compact_type binary`` for CompactFusion-compressed ring
attention.  Without a checkpoint, weights are randomly initialised (the
parallel machinery and performance are real; the pixels are not art).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="PixArt-alpha example")
    xFuserArgs.add_cli_args(parser)
    args = xFuserArgs.from_cli_args(parser.parse_args())
    engine_config, input_config = args.create_config()

    runner = xDiTParallel(engine_config, input_config)
    with Profiler.scope("total"):
        with Profiler.scope("warmup"):
            runner()
        with Profiler.scope("generate"):
            out = runner()
    arr = np.asarray(out, np.float32)
    print(f"output: shape={arr.shape} finite={np.isfinite(arr).all()}")
    # persist the result like the reference examples (./results)
    print(f"saved: {runner.save('results', prefix='pixart_alpha', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
