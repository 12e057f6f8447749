from compactfusion_tpu.compact.codecs import (  # noqa: F401
    decode,
    encode,
    payload_nbytes,
    sim_roundtrip,
)
from compactfusion_tpu.compact.engine import (  # noqa: F401
    EFState,
    ef_compress,
    ef_decompress,
    init_ef_state,
)
from compactfusion_tpu.compact.lowrank import subspace_iter  # noqa: F401
