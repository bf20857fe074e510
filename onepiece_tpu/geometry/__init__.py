from . import se3, transforms, camera, pointcloud  # noqa: F401
from .camera import PinholeCamera, TUM_CAMERA, OPEN3D_CAMERA, MI_CAMERA, PRESETS  # noqa: F401
from .pointcloud import PointCloud  # noqa: F401
