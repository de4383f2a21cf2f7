from tpuslam.imu import preintegration  # noqa: F401
