from .meshio import read_obj, write_obj, read_npts, write_npts
from .rawdepth import load_depth_raw, save_depth_raw, depth_to_image
from .manifest import StageManifest

__all__ = [
    "read_obj", "write_obj", "read_npts", "write_npts",
    "load_depth_raw", "save_depth_raw", "depth_to_image",
    "StageManifest",
]
