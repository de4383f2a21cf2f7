from tpuslam.datasets import synthetic  # noqa: F401
