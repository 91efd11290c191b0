from rspc_tpu.ops.transform import (  # noqa: F401
    apply_transform,
    apply_transform_cloud,
    compose,
    imu_guess_full,
    imu_guess_y,
    make_rigid,
    rotation_matrix,
    static_y_guess,
)
from rspc_tpu.ops.umeyama import rigid_fit  # noqa: F401
from rspc_tpu.ops.voxel import voxel_downsample  # noqa: F401
from rspc_tpu.ops.nn import nearest_neighbors  # noqa: F401
