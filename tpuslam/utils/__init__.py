from tpuslam.utils import profiling  # noqa: F401
