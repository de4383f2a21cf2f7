from tpuslam.parallel import dist_ba  # noqa: F401
