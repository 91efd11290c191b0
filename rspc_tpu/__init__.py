"""rspc_tpu — a TPU-native (JAX/XLA/Pallas) RGBD point-cloud registration framework.

Re-implements, TPU-first, the full capability surface of the reference C++
application ``hyunminch/realsense-pointcloud`` (``rs-pcl``): RGBD capture /
replay, depth deprojection to colored point clouds, organized edge-feature
extraction, IMU complementary-filter rotation estimation, grid-search
translation estimation, and global registration of frame sequences via
edge-based ICP and NDT — plus the numerics the reference delegates to PCL,
librealsense2, and OpenCV (ICP, NDT, organized edge detection, integral-image
normals, voxel downsampling, deprojection, PCD I/O), rebuilt as jittable JAX
ops and Pallas kernels over fixed-capacity padded cloud buffers.

Layer map (mirrors SURVEY.md §1 of the reference):
  cloud.py          — core cloud pytrees (reference: src/types.hpp)
  io/               — PCD v0.7 I/O + dataset naming (reference: pcl::io, main.cpp)
  ops/              — transforms, NN search, voxel grid, normals, edges,
                      deprojection, filters (reference: PCL/librealsense internals)
  registration/     — ICP, NDT, registration schemes (reference: src/*_registration.hpp)
  estimators/       — rotation (IMU) + translation estimators (reference:
                      src/rotation_estimator.hpp, src/translation_estimator.hpp)
  capture/          — replay + synthetic RGBD sources (reference: src/capture*.hpp)
  viz/              — headless point-cloud renderer (reference: src/visualizer.hpp)
  parallel/         — jax.sharding meshes + sharded kernels (no reference analog;
                      SURVEY.md §2c maps the parallelism axes)
  cli.py            — argv-compatible command-line surface (reference: src/main.cpp)
"""

__version__ = "0.1.0"

import os as _os

# Geometry at millimeter scales cannot tolerate TPU's default matmul
# precision: plain `a @ b` truncates f32 operands to bf16 on the MXU
# (~0.4% relative), which injects several-1e-4 of error into every 4x4
# transform composition, pose matrix product, and einsum that does not
# request a precision explicitly — measured as a 2.5x accuracy loss on
# the end-to-end registration benchmark. Hot kernels that genuinely
# tolerate lower precision request it explicitly.
# Opt out (e.g. for throughput experiments) with RSPC_BF16_MATMUL=1.
if not _os.environ.get("RSPC_BF16_MATMUL"):
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "float32")


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (default ON for TPU backends;
    opt out with RSPC_NO_CACHE=1). The full-pipeline program compiles in
    minutes through a remote-compile TPU tunnel but deserializes from
    this cache in ~1 s, so one-shot CLI invocations would otherwise pay
    the whole compile every run. Verified to serialize/deserialize
    correctly through the axon remote-compile tunnel; wrapped in
    try/except so backends without executable serialization silently
    skip it."""
    import jax

    cache_dir = path or _os.environ.get(
        "RSPC_CACHE_DIR", _os.path.expanduser("~/.cache/rspc_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


def _cache_is_safe() -> bool:
    # The cache exists to amortize the remote TPU compile. On XLA:CPU it
    # is a liability, twice over: (a) serializing the large fused
    # pipeline executables aborts inside
    # compilation_cache.put_executable_and_time (reproduced 2/2 on full
    # test-suite runs — a CHECK in XLA:CPU AOT export, not fixable from
    # Python), and (b) deserializing an executable AOT-compiled on a
    # different host SIGILLs when machine features differ (XLA warns
    # exactly this on the virtual-CPU dryrun). CPU compiles are seconds,
    # not minutes, so the cache buys nothing there — keep it TPU-only.
    # JAX_PLATFORMS is the only signal available without prematurely
    # initializing the backend, so the gate is ALLOWLIST-shaped: enable
    # the cache only when the env EXPLICITLY names a TPU-class platform
    # (this image exports JAX_PLATFORMS=axon ambiently; real TPU pods
    # export tpu). An unset variable means jax will pick whatever is
    # present — on a CPU-only host that is exactly the fatal XLA:CPU
    # path, so unset defaults to NO cache (a TPU user without the env
    # var loses only the cross-process compile cache, not correctness;
    # enable_compilation_cache() remains callable explicitly).
    plats = _os.environ.get("JAX_PLATFORMS", "").strip().lower()
    first = plats.split(",")[0].strip()
    return first in ("tpu", "axon")


if not _os.environ.get("RSPC_NO_CACHE"):
    if _cache_is_safe():
        enable_compilation_cache()
    elif not _os.environ.get("JAX_PLATFORMS", "").strip():
        # A real TPU host that doesn't export JAX_PLATFORMS silently
        # loses the cross-process compile cache (minutes-long cold
        # compiles per CLI run) — say so once instead of failing quiet.
        import logging as _logging

        _logging.getLogger(__name__).info(
            "persistent XLA compile cache disabled: JAX_PLATFORMS is "
            "unset (cache is TPU-only; see _cache_is_safe). On a TPU "
            "host, export JAX_PLATFORMS=tpu or call "
            "rspc_tpu.enable_compilation_cache() explicitly."
        )

from rspc_tpu.cloud import Cloud, OrganizedCloud  # noqa: F401
from rspc_tpu.config import (  # noqa: F401
    EdgeConfig,
    ICPConfig,
    NDTConfig,
    PipelineConfig,
    VoxelConfig,
)
