"""scenedetector — GOP-chunk boundary generator.

In-place passthrough video filter: every ``gop_size`` frames (keyed off the
buffer ``offset``) it emits a SceneNewEvent downstream *before* the buffer,
marking the start of chunk ``offset // gop_size``. Fixed-GOP chunking, no
pixel analysis — faithful to the reference
(hype/src/scenedetector/imp.rs:141-161).
"""

from __future__ import annotations

from typing import Optional

from ..core import (Buffer, Element, FlowReturn, Pad, PadDirection,
                    PropertySpec, register)
from .events import SceneNewEvent
from ..core.log import category

CAT = category("hype", "GOP-parallel encoder")

DEFAULT_GOP_SIZE = 10


@register
class SceneDetector(Element):
    FACTORY = "scenedetector"
    PROPERTIES = [
        PropertySpec("gop-size", DEFAULT_GOP_SIZE,
                     "emit a SceneNewEvent every gop-size buffers"),
    ]

    def __init__(self, name: Optional[str] = None, **props):
        super().__init__(name, **props)
        self.sinkpad = self.add_pad(Pad("sink", PadDirection.SINK, self))
        self.srcpad = self.add_pad(Pad("src", PadDirection.SRC, self))
        self.sinkpad.chain_function = self._chain
        self._buffer_count = 0

    def _chain(self, pad: Pad, buf: Buffer) -> FlowReturn:
        gop_size = int(self.get_property("gop-size"))
        # Key off the buffer offset like the reference; fall back to a local
        # counter for sources that don't stamp offsets.
        offset = buf.offset if buf.offset is not None else self._buffer_count
        self._buffer_count += 1
        if offset % gop_size == 0:
            gop_index = offset // gop_size
            CAT.debug("scene event: gop_index=%d gop_size=%d", gop_index,
                      gop_size)
            self.srcpad.push_event(SceneNewEvent(gop_index, gop_size))
        return self.srcpad.push(buf)
