from .cameras import CameraBatch, project, unproject, world_to_cam, cam_to_world
from .transforms import Similarity, compose, inverse, apply as apply_similarity

__all__ = [
    "CameraBatch", "project", "unproject", "world_to_cam", "cam_to_world",
    "Similarity", "compose", "inverse", "apply_similarity",
]
