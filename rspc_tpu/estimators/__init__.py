from rspc_tpu.estimators.rotation import (  # noqa: F401
    ImuSample,
    RotationEstimator,
    rotation_from_imu_stream,
)
from rspc_tpu.estimators.translation import estimate_translation  # noqa: F401
