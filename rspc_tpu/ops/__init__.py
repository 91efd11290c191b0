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
from rspc_tpu.ops.canny import canny, canny_from_gradients  # noqa: F401
from rspc_tpu.ops.normals import estimate_normals  # noqa: F401
from rspc_tpu.ops.edges import (  # noqa: F401
    extract_edge_features,
    extract_organized_edges,
)
from rspc_tpu.ops.deproject import (  # noqa: F401
    Intrinsics,
    deproject_depth,
    rgbd_to_organized_cloud,
)
from rspc_tpu.ops.filters import (  # noqa: F401
    passthrough,
    statistical_outlier_removal,
)
