from rspc_tpu.parallel.chain import batched_registration  # noqa: F401
from rspc_tpu.parallel.mesh import make_mesh  # noqa: F401
from rspc_tpu.parallel.icp import (  # noqa: F401
    batched_sharded_icp_align,
    sharded_icp_align,
)
from rspc_tpu.parallel.ndt import sharded_ndt_align  # noqa: F401
from rspc_tpu.parallel.nn import sharded_nearest_neighbors  # noqa: F401
