from . import brief, pose_graph  # noqa: F401
