from tpuslam.eval import ate  # noqa: F401
