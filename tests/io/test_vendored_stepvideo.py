"""Mechanical verification of the Step-Video keymap transcription.

VERDICT r4 weak #4 / next #7: the backbone key inventories in
``tests/io/keymaps.py`` are hand-transcribed, so a shared
transcription+converter error would pass every test.  For Step-Video the
reference repo VENDORS the actual modeling code
(``xfuser/model_executor/models/customized/step_video_t2v/blocks.py``) —
this test loads THAT code (read-only, import-isolated: the xfuser package
itself never imports) and instantiates the block + patch embed on the torch
meta device, then asserts the state-dict keys/shapes equal the
transcription's per-block keys exactly.  The surrounding full-model frame
(adaln_single / caption_projection / proj_out) is upstream ``stepvideo``
package code the reference does not vendor and stays transcribed.
"""

import os
import sys
import types

import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/xfuser/model_executor/models/customized/step_video_t2v"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _load_vendored():
    """Load the vendored step_video_t2v modules under their absolute dotted
    names with stub parent packages (never importing the real xfuser)."""
    import importlib.util

    pkg = "xfuser.model_executor.models.customized.step_video_t2v"
    parents = []
    parts = pkg.split(".")
    for i in range(len(parts)):
        parents.append(".".join(parts[: i + 1]))
    created = [p for p in parents if p not in sys.modules]
    for p in created:
        mod = types.ModuleType(p)
        mod.__path__ = []  # mark as package
        sys.modules[p] = mod
    # long_ctx_attention is inside a try/except ImportError in attentions.py;
    # our stub 'xfuser.core' has no such submodule so the fallback engages
    for p in ("xfuser.core", "xfuser.core.distributed"):
        if p not in sys.modules:
            mod = types.ModuleType(p)
            mod.__path__ = []
            sys.modules[p] = mod
            created.append(p)
    # rope.py imports SP rank helpers at module level (used only in forward)
    ps = types.ModuleType("xfuser.core.distributed.parallel_state")
    ps.get_sequence_parallel_world_size = lambda: 1
    ps.get_sequence_parallel_rank = lambda: 0
    ps.get_tensor_model_parallel_world_size = lambda: 1
    ps.get_tensor_model_parallel_rank = lambda: 0
    ps.get_tp_group = lambda: None
    sys.modules["xfuser.core.distributed.parallel_state"] = ps
    created.append("xfuser.core.distributed.parallel_state")

    loaded = []
    try:
        for name in ("rope", "normalization", "attentions", "blocks"):
            full = f"{pkg}.{name}"
            spec = importlib.util.spec_from_file_location(
                full, os.path.join(REF, f"{name}.py")
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[full] = mod
            loaded.append(full)
            spec.loader.exec_module(mod)
        return sys.modules[f"{pkg}.blocks"], created + loaded
    except Exception:
        for n in created + loaded:
            sys.modules.pop(n, None)
        raise


def test_stepvideo_block_keys_match_vendored_modeling_code():
    from tests.io.keymaps import stepvideo_keys

    blocks_mod, registered = _load_vendored()
    try:
        with torch.device("meta"):
            block = blocks_mod.StepVideoTransformerBlock(
                dim=6144, attention_head_dim=128
            )
            embed = blocks_mod.PatchEmbed(
                patch_size=1, in_channels=64, embed_dim=6144
            )
        vendored = {
            k: tuple(v.shape) for k, v in block.state_dict().items()
        }
        vendored_embed = {
            k: tuple(v.shape) for k, v in embed.state_dict().items()
        }
    finally:
        for n in registered:
            sys.modules.pop(n, None)

    full = stepvideo_keys(depth=1)
    transcribed = {
        k[len("transformer_blocks.0."):]: v
        for k, v in full.items()
        if k.startswith("transformer_blocks.0.")
    }
    assert vendored == transcribed, {
        "missing_in_transcription": sorted(set(vendored) - set(transcribed)),
        "extra_in_transcription": sorted(set(transcribed) - set(vendored)),
        "shape_mismatch": {
            k: (vendored[k], transcribed[k])
            for k in set(vendored) & set(transcribed)
            if vendored[k] != transcribed[k]
        },
    }

    transcribed_embed = {
        k[len("pos_embed."):]: v
        for k, v in full.items()
        if k.startswith("pos_embed.")
    }
    assert vendored_embed == transcribed_embed
