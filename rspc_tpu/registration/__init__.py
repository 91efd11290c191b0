from rspc_tpu.registration.icp import ICPResult, icp_align  # noqa: F401
