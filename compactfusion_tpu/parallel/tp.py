"""Tensor parallelism: Megatron-style column/row split of feed-forward layers.

Reference semantics: ``xFuserFeedForwardWrapper``
(``xfuser/model_executor/layers/feedforward.py:15-69``) — the reference's
generic TP splits each diffusers ``FeedForward``: first projection
column-parallel (weights chunked on the output/hidden axis), second projection
row-parallel followed by an all_reduce, bias added after.  (Full-model TP
exists in the reference only for Step-Video's bespoke ColumnParallelLinear /
RowParallelLinear — ``customized/step_video_t2v/tp_applicator.py``.)

On TPU this is just parameter sharding: FFN weights get a PartitionSpec on
the hidden axis, ``shard_map`` hands each device its shard, and the row-
parallel matmul ends in one ``psum`` over the tp axis
(``compactfusion_tpu.models.common.ffn(tp_axis=...)``).  This module builds
the per-leaf PartitionSpec tree for a model's parameter pytree.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import PartitionSpec as P

from compactfusion_tpu.parallel.mesh import AXIS_PP, AXIS_TP

#: parameter-subtree names treated as TP-sharded feed-forwards
FFN_KEYS = ("ffn", "img_ffn", "txt_ffn", "mlp")

#: TOP-LEVEL parameter-subtree names whose leading (layer-stack) axis shards
#: over pp.  Matched at the root of the param tree ONLY: nested stacks that
#: happen to reuse a name (HunyuanVideo's token-refiner ``refiner.blocks``)
#: are NOT pipeline stages and must stay replicated.
BLOCK_KEYS = (
    "blocks",
    "double_blocks",
    "single_blocks",
    "down_blocks",
    "up_blocks",
)


def _ffn_specs(ffn_params: Any) -> Any:
    """Specs for one {fc1: {w,b}, fc2: {w,b}} subtree (leading layer-stack
    axes of any rank are handled by padding the spec with Nones)."""

    def spec_for(path_leaf, arr, shard_axis):
        nones = (None,) * (arr.ndim - 1)
        spec = list(nones) + [None]
        spec[shard_axis if shard_axis >= 0 else arr.ndim + shard_axis] = AXIS_TP
        return P(*spec)

    out = {"fc1": {}, "fc2": {}}
    out["fc1"]["w"] = spec_for("w", ffn_params["fc1"]["w"], -1)
    if "b" in ffn_params["fc1"]:
        out["fc1"]["b"] = spec_for("b", ffn_params["fc1"]["b"], -1)
    out["fc2"]["w"] = spec_for("w", ffn_params["fc2"]["w"], -2)
    if "b" in ffn_params["fc2"]:
        out["fc2"]["b"] = P(*((None,) * ffn_params["fc2"]["b"].ndim))
    return out


def model_param_specs(params: Any, tp: bool = False, pp: bool = False) -> Any:
    """PartitionSpec tree for a model parameter pytree.

    tp: shard FFN subtrees over the tp axis (column/row split).
    pp: shard the layer-stack (leading) axis of block subtrees over pp —
        PipeFusion stage slicing (reference ``_split_transformer_blocks``).
    """

    def add_pp(spec: P, ndim: int) -> P:
        parts = list(spec) + [None] * (ndim - len(spec))
        parts[0] = AXIS_PP
        return P(*parts)

    def walk(node, in_block, top):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if tp and k in FFN_KEYS and isinstance(v, dict) and "fc1" in v:
                    specs = _ffn_specs(v)
                    if pp and in_block:

                        def map_specs(s, a):
                            if isinstance(s, dict):
                                return {kk: map_specs(s[kk], a[kk]) for kk in s}
                            return add_pp(s, a.ndim)

                        specs = map_specs(specs, v)
                    out[k] = specs
                else:
                    out[k] = walk(
                        v, in_block or (top and k in BLOCK_KEYS), False
                    )
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, in_block, False) for v in node)
        if pp and in_block:
            return P(AXIS_PP)
        return P()

    return walk(params, False, True)


def tp_param_specs(params: Any) -> Any:
    """FFN subtrees sharded over tp, everything else replicated."""
    return model_param_specs(params, tp=True, pp=False)


def replicated_specs(params: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), params)
