"""flutpu.ttml.render — the TTML renderer.

Host text shaping (fonts/layout) + device compositing kernels (composite)
behind the ``ttmlrender`` element (render_el).
"""

from .render_el import TTMLRender
from .overlay_el import OverlayCompositor
from .composite import compose_window, overlay_on_frames, overlay_on_planes
from .layout import draw_region_layer

__all__ = ["TTMLRender", "OverlayCompositor", "compose_window", "overlay_on_frames",
           "overlay_on_planes", "draw_region_layer"]
