from tpuslam.tracking import tracker  # noqa: F401
