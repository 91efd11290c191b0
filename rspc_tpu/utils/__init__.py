from rspc_tpu.utils.profiling import stage_timer, trace  # noqa: F401
from rspc_tpu.utils.log import get_logger  # noqa: F401
