from compactfusion_tpu.parallel.mesh import (  # noqa: F401
    AXIS_CFG,
    AXIS_DP,
    AXIS_PP,
    AXIS_RING,
    AXIS_SEQ,
    AXIS_TP,
    AXIS_ULYSSES,
    MeshSpec,
    make_mesh,
)
