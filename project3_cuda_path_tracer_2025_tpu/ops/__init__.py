from . import bsdf, camera, compaction, film, intersect, shade, texture
from .rays import Intersections, PathState

__all__ = [
    "bsdf",
    "camera",
    "compaction",
    "film",
    "intersect",
    "shade",
    "texture",
    "Intersections",
    "PathState",
]
