from rspc_tpu.io.pcd import load_pcd, save_pcd  # noqa: F401
from rspc_tpu.io.dataset import (  # noqa: F401
    dataset_path,
    load_dataset_clouds,
    save_dataset_clouds,
)
