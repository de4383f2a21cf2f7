from tpuslam.mapping import mapstate  # noqa: F401
