"""Quality-eval package: metric math + JAX feature extractors.

Extractors (all torch-parity-tested, local-weights converters):
  * ``eval.vgg`` — VGG16 / LPIPS
  * ``eval.inception`` — InceptionV3 pool features (FID)
  * ``eval.i3d`` — I3D Kinetics logits (FVD)
"""

from compactfusion_tpu.eval.metrics import (  # noqa: F401
    mse,
    psnr,
    ssim,
)
