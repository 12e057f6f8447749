from compactfusion_tpu.cache.accel import (  # noqa: F401
    CacheAccelConfig,
    CacheAccelState,
    init_cache_state,
    should_skip,
)
