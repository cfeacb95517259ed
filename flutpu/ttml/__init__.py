"""flutpu.ttml — TTML (W3C Timed Text) subtitle engine.

Rebuild of the reference's fluttml plugin: a streaming host-side parse
engine (state machine, attribute model, event timeline — pure logic, no
device work) and three elements:

- ``ttmlparse``          → pango-markup text buffers
- ``ttmlsegmentedparse`` → standalone per-interval TTML documents
- ``ttmlrender``         → BGRA overlay frames (host text layout + device
                           compositing kernels in flutpu.ttml.render)
"""

from .enums import AttrType, NodeType, TextAlign, TimeBase
from .attributes import Attribute, Length, parse_attribute, parse_color
from .state import TTMLState
from .style import Style
from .span import Span, SpanList
from .timeline import Timeline, TimelineEvent, TimelineEventType
from .base import TTMLBase
from .parse_el import TTMLParse
from .segmented import TTMLSegmentedParse
from .render import TTMLRender
from .typefind import TTML_MIME, type_find

__all__ = [
    "AttrType", "NodeType", "TextAlign", "TimeBase", "Attribute", "Length",
    "parse_attribute", "parse_color", "TTMLState", "Style", "Span",
    "SpanList", "Timeline", "TimelineEvent", "TimelineEventType", "TTMLBase",
    "TTMLParse", "TTML_MIME", "type_find",
]
