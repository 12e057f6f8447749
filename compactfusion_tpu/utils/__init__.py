from compactfusion_tpu.utils.logger import init_logger  # noqa: F401
from compactfusion_tpu.utils.prof import Profiler  # noqa: F401
