"""PixArt-Sigma example (reference: examples/pixartsigma_example.py).

    python examples/pixartsigma_example.py --model PixArt-alpha/PixArt-Sigma-XL-2-1024-MS \
        --ulysses_degree 2 --ring_degree 2 --height 1024 --width 1024 \
        --num_inference_steps 20 --prompt "a small cactus with a happy face"

The registry routes any model name containing "sigma" (or height > 512) to
the PixArt-Sigma 1024px config (``models/pixart.pixart_sigma_1024``).  Add
``--compact --compact_type binary`` for CompactFusion-compressed ring
attention.  Without a checkpoint, weights are randomly initialised (the
parallel machinery and performance are real; the pixels are not art).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="PixArt-Sigma example")
    xFuserArgs.add_cli_args(parser)
    ns = parser.parse_args()
    if ns.model == xFuserArgs.model:  # user did not override the default
        ns.model = "PixArt-alpha/PixArt-Sigma-XL-2-1024-MS"
        ns.height = max(ns.height, 1024)
        ns.width = max(ns.width, 1024)
    args = xFuserArgs.from_cli_args(ns)
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
    print(f"saved: {runner.save('results', prefix='pixart_sigma', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
