from . import imu_preint, wheel_preint  # noqa: F401
