from tpuslam.frontend import extractor, matching  # noqa: F401
