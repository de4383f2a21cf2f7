from tpuslam.solver import factors, pose_opt, local_ba  # noqa: F401
