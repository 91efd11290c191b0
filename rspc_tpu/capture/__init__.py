from rspc_tpu.capture.synthetic import SyntheticSequence, render_frame  # noqa: F401
from rspc_tpu.capture.replay import ReplaySource, get_clouds  # noqa: F401
