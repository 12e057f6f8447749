"""ConsisID identity-preserving video (gated ID tokens + 3D-VAE decode) example.

    python examples/consisid_example.py --model BestWishYsh/ConsisID-preview \
        --ulysses_degree 2 --num_inference_steps 20 --prompt "a scenic lake"

Add `--compact --compact_type binary` for the CompactFusion-compressed
ring.  Without a checkpoint, weights are randomly initialised (the parallel
machinery and performance are real; the pixels are not art).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from compactfusion_tpu.args import FlexibleArgumentParser, xFuserArgs
from compactfusion_tpu.parallel_api import xDiTParallel
from compactfusion_tpu.utils.prof import Profiler


def main():
    parser = FlexibleArgumentParser(description="consisid example")
    xFuserArgs.add_cli_args(parser)
    ns = parser.parse_args()
    if ns.model == xFuserArgs.model:  # user did not override the default
        ns.model = "BestWishYsh/ConsisID-preview"
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
    print(f"saved: {runner.save('results', prefix='consisid', out=arr)}")
    print(Profiler.summary())


if __name__ == "__main__":
    main()
