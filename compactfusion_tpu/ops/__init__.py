from compactfusion_tpu.ops.attention import attn_with_lse  # noqa: F401
from compactfusion_tpu.ops.merge import merge_out_lse  # noqa: F401
