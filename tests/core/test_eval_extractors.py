"""Ground-truth parity for the FID/FVD feature extractors.

Same technique as the backbone parity suite: independent torch references
(canonical state-dict naming) -> converter -> JAX forward must match.
BatchNorm running stats are randomised so the eval-mode BN folding is
actually exercised (defaults mean=0/var=1 would make folding trivial).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests import torch_ref
from tests.helpers import rel_err


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.tensor(rng.standard_normal(m.num_features) * 0.2, dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(0.5 + rng.random(m.num_features), dtype=torch.float32)
            )


def test_inception_v3_pool_features_match_torch():
    from compactfusion_tpu.eval.inception import (
        convert_inception_v3,
        inception_pool_features,
    )

    torch.manual_seed(41)
    ref = torch_ref.InceptionV3Ref().eval()
    rng = np.random.default_rng(42)
    with torch.no_grad():
        _randomize_bn(ref, rng)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_inception_v3(state)

    img = rng.standard_normal((2, 96, 96, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        feat_ref = ref(torch.tensor(img).permute(0, 3, 1, 2)).numpy()
    feat = inception_pool_features(params, jnp.asarray(img))
    assert feat.shape == (2, 2048)
    assert rel_err(feat, feat_ref) < 2e-4, rel_err(feat, feat_ref)


def test_i3d_fvd_features_match_torch():
    from compactfusion_tpu.eval.i3d import convert_i3d, i3d_features

    torch.manual_seed(43)
    ref = torch_ref.I3DRef().eval()
    rng = np.random.default_rng(44)
    with torch.no_grad():
        _randomize_bn(ref, rng)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_i3d(state)

    vid = rng.standard_normal((1, 16, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        feat_ref = ref(torch.tensor(vid).permute(0, 4, 1, 2, 3)).numpy()
    feat = i3d_features(params, jnp.asarray(vid))
    assert feat.shape == (1, 400)
    assert rel_err(feat, feat_ref) < 2e-4, rel_err(feat, feat_ref)
