from . import ct_icp, eskf, odometry, voxel_map  # noqa: F401
