from . import voxelize, spconv, pointnet  # noqa: F401
