from compactfusion_tpu.eval.metrics import (  # noqa: F401
    mse,
    psnr,
    ssim,
)
