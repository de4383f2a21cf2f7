from tpuslam.geometry import lie, cameras  # noqa: F401
