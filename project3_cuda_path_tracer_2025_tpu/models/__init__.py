from .megakernel import megakernel_iteration
from .wavefront import wavefront_iteration
from .renderer import Renderer, RenderResult

__all__ = [
    "megakernel_iteration",
    "wavefront_iteration",
    "Renderer",
    "RenderResult",
]
