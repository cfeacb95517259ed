"""TTML engine tests: attribute grammar, state machine, timeline, and the
ttmlparse element end-to-end on realistic documents (patterned after the
W3C TTML1 testsuite structure the reference validates against)."""

import numpy as np
import pytest

from flutpu.core import Buffer, Harness, SECOND, MSECOND
from flutpu.ttml.attributes import (Length, parse_attribute, parse_color,
                                    parse_length, parse_time_expression)
from flutpu.ttml.enums import (AttrType, FontStyle, FontWeight, LengthUnit,
                               TextAlign, TextDecoration, TimeBase)
from flutpu.ttml.state import TTMLState


@pytest.fixture
def state():
    return TTMLState()


class TestTimeExpressions:
    def test_clock(self, state):
        assert parse_time_expression(state, "00:00:05") == 5 * SECOND
        assert parse_time_expression(state, "01:02:03") == 3723 * SECOND
        assert parse_time_expression(state, "00:00:5.5") == int(5.5 * SECOND)

    def test_clock_with_frames(self, state):
        # default 30 fps → 15 frames = 0.5 s
        assert parse_time_expression(state, "00:00:01:15") == int(1.5 * SECOND)

    def test_clock_frames_with_framerate(self, state):
        state.frame_rate = 25.0
        assert parse_time_expression(state, "00:00:00:05") == int(0.2 * SECOND)

    def test_subframes(self, state):
        state.frame_rate = 10.0
        state.sub_frame_rate = 2
        # 1 frame + 1/2 subframe = 1.5 frames = 0.15 s
        assert parse_time_expression(state, "00:00:00:01.1") == int(0.15 * SECOND)

    def test_offset_metrics(self, state):
        assert parse_time_expression(state, "2h") == 7200 * SECOND
        assert parse_time_expression(state, "2m") == 120 * SECOND
        assert parse_time_expression(state, "3s") == 3 * SECOND
        assert parse_time_expression(state, "500ms") == SECOND // 2
        state.tick_rate = 100.0  # ticks per second
        assert parse_time_expression(state, "50t") == SECOND // 2
        state.frame_rate = 25.0
        assert parse_time_expression(state, "5f") == int(0.2 * SECOND)

    def test_frame_rate_multiplier(self, state):
        from fractions import Fraction
        state.frame_rate = 30.0
        state.frame_rate_num, state.frame_rate_den = 1000, 1001
        spf = 1001 / (30.0 * 1000)
        assert parse_time_expression(state, "30f") == pytest.approx(
            int(30 * spf * SECOND), abs=2)

    def test_invalid(self, state):
        assert parse_time_expression(state, "bogus") is None


class TestColors:
    def test_hex(self):
        assert parse_color("#ff0000")[0] == 0xFF0000FF
        assert parse_color("#ff000080")[0] == 0xFF000080

    def test_rgb_functions(self):
        assert parse_color("rgb(255, 0, 0)")[0] == 0xFF0000FF
        assert parse_color("rgba(0, 255, 0, 128)")[0] == 0x00FF0080

    def test_named(self):
        assert parse_color("yellow")[0] == 0xFFFF00FF
        assert parse_color("transparent")[0] == 0x00000000
        assert parse_color("Cyan")[0] == 0x00FFFFFF

    def test_invalid(self):
        rgba, consumed, ok = parse_color("notacolor")
        assert not ok and rgba == 0xFFFFFFFF


class TestLengths:
    def test_units(self):
        l, _ = parse_length("16px")
        assert (l.value, l.unit) == (16.0, LengthUnit.PIXELS)
        l, _ = parse_length("1.5em")
        assert (l.value, l.unit) == (1.5, LengthUnit.EM)
        l, _ = parse_length("2c")
        assert (l.value, l.unit) == (2.0, LengthUnit.CELLS)
        l, _ = parse_length("50%")
        assert (l.value, l.unit) == (0.5, LengthUnit.RELATIVE)

    def test_extent_normalizes_to_frame(self, state):
        state.frame_width, state.frame_height = 720, 576
        a = parse_attribute(state, None, "extent", "50% 25%")
        assert a.value[0].unit == LengthUnit.PIXELS
        assert a.value[0].value == pytest.approx(360)
        assert a.value[1].value == pytest.approx(144)

    def test_cells_normalize(self, state):
        state.frame_width, state.frame_height = 320, 150
        a = parse_attribute(state, None, "fontSize", "1c")
        # 1 cell = frame_height/cell_resolution_y = 150/15 = 10 px (dir 1 is
        # vertical, but index 0 normalizes horizontally: 320/32 = 10)
        assert a.value[0].unit == LengthUnit.PIXELS
        assert a.value[0].value == pytest.approx(10)

    def test_padding_shorthand(self, state):
        state.frame_width, state.frame_height = 100, 100
        a = parse_attribute(state, None, "padding", "1px 2px 3px 4px")
        assert [l.value for l in a.value] == [1, 2, 3, 4]
        a = parse_attribute(state, None, "padding", "5px")
        assert [l.value for l in a.value] == [5, 5, 5, 5]
        a = parse_attribute(state, None, "padding", "5px 7px")
        assert [l.value for l in a.value] == [5, 7, 5, 7]
        a = parse_attribute(state, None, "padding", "5px 7px 9px")
        assert [l.value for l in a.value] == [5, 7, 9, 7]


class TestAttributes:
    def test_zindex_micro_tiebreak(self, state):
        a1 = parse_attribute(state, None, "zIndex", "2")
        a2 = parse_attribute(state, None, "zIndex", "2")
        assert a1.value == 2000 and a2.value == 2001

    def test_font_style_weight(self, state):
        assert parse_attribute(state, None, "fontStyle", "italic").value == FontStyle.ITALIC
        assert parse_attribute(state, None, "fontWeight", "bold").value == FontWeight.BOLD

    def test_text_decoration_flags(self, state):
        a = parse_attribute(state, None, "textDecoration", "underline lineThrough")
        assert a.value & TextDecoration.UNDERLINE
        assert a.value & TextDecoration.STRIKETHROUGH

    def test_unknown_attr_ignored(self, state):
        assert parse_attribute(state, None, "bogusAttr", "x") is None

    def test_non_ttml_namespace_ignored(self, state):
        assert parse_attribute(state, "http://example.com/other", "color",
                               "red") is None


class TestStateMachine:
    def test_push_pop_restores(self, state):
        from flutpu.ttml.attributes import Attribute
        state.push_attribute(Attribute(AttrType.NODE_TYPE,
                                       __import__("flutpu.ttml.enums", fromlist=["NodeType"]).NodeType.P))
        a = parse_attribute(state, None, "color", "red")
        state.push_attribute(a)
        assert state.style.get(AttrType.COLOR).value == 0xFF0000FF
        state.pop_attribute()  # color removed (no previous value)
        assert state.style.get(AttrType.COLOR) is None

    def test_begin_relative_to_container(self, state):
        from flutpu.ttml.attributes import Attribute
        state.container_begin = 10 * SECOND
        state.merge_attribute(Attribute(AttrType.BEGIN, 2 * SECOND))
        assert state.begin == 12 * SECOND

    def test_end_clipped_by_container(self, state):
        from flutpu.ttml.attributes import Attribute
        state.container_begin = 0
        state.container_end = 5 * SECOND
        state.merge_attribute(Attribute(AttrType.END, 30 * SECOND))
        assert state.end == 5 * SECOND

    def test_dur_becomes_end(self, state):
        from flutpu.ttml.attributes import Attribute
        state.begin = 3 * SECOND
        state.merge_attribute(Attribute(AttrType.DUR, 2 * SECOND))
        assert state.end == 5 * SECOND


# ---------------------------------------------------------------------------
# end-to-end documents through the ttmlparse element
# ---------------------------------------------------------------------------

DOC_SIMPLE = """<?xml version="1.0" encoding="utf-8"?>
<tt xmlns="http://www.w3.org/ns/ttml" xmlns:tts="http://www.w3.org/ns/ttml#styling">
  <body>
    <div>
      <p begin="0s" end="2s">Hello world</p>
      <p begin="2s" end="4s">Second cue</p>
    </div>
  </body>
</tt>
"""

DOC_STYLED = """<?xml version="1.0" encoding="utf-8"?>
<tt xmlns="http://www.w3.org/ns/ttml" xmlns:tts="http://www.w3.org/ns/ttml#styling">
  <head>
    <styling>
      <style xml:id="s1" tts:color="red" tts:fontWeight="bold"/>
    </styling>
  </head>
  <body>
    <div>
      <p begin="4s" end="6s" style="s1">Styled text</p>
    </div>
  </body>
</tt>
"""

DOC_OVERLAP = """<?xml version="1.0"?>
<tt xmlns="http://www.w3.org/ns/ttml">
  <body><div>
    <p begin="0s" end="3s">first</p>
    <p begin="1s" end="2s">second</p>
  </div></body>
</tt>
"""

DOC_SEQ = """<?xml version="1.0"?>
<tt xmlns="http://www.w3.org/ns/ttml">
  <body><div timeContainer="seq">
    <p dur="1s"><span>one</span></p>
    <p dur="2s"><span>two</span></p>
  </div></body>
</tt>
"""


def run_ttmlparse(doc: str, pts=0):
    h = Harness("ttmlparse")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(doc.encode(), pts=pts))
    h.push_eos()
    out = []
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        out.append((b.pts, b.duration, b.data.decode()))
    h.teardown()
    return out


class TestTTMLParseElement:
    def test_simple_cues(self):
        out = run_ttmlparse(DOC_SIMPLE)
        texts = [(p, d, t) for p, d, t in out if t.strip()]
        assert len(texts) == 2
        assert texts[0][2].strip().endswith("Hello world")
        assert texts[0][0] == 0 and texts[0][1] == 2 * SECOND
        assert texts[1][2].strip().endswith("Second cue")
        assert texts[1][0] == 2 * SECOND

    def test_referential_style(self):
        out = run_ttmlparse(DOC_STYLED)
        styled = [t for _, _, t in out if "Styled text" in t]
        assert styled, out
        assert 'fgcolor="#ff0000"' in styled[0]
        assert 'font_weight="bold"' in styled[0]

    def test_overlapping_cues_produce_intervals(self):
        out = run_ttmlparse(DOC_OVERLAP)
        both = [t for _, _, t in out if "first" in t and "second" in t]
        assert both, f"no interval with both cues: {out}"
        only_first = [(p, d) for p, d, t in out
                      if "first" in t and "second" not in t]
        assert len(only_first) == 2  # [0,1) and [2,3)

    def test_sequential_container(self):
        out = run_ttmlparse(DOC_SEQ)
        one = [(p, d) for p, d, t in out if "one" in t]
        two = [(p, d) for p, d, t in out if "two" in t]
        assert one and one[0][0] == 0 and one[0][1] == 1 * SECOND
        assert two and two[0][0] == 1 * SECOND and two[0][1] == 2 * SECOND

    def test_concatenated_documents(self):
        h = Harness("ttmlparse")
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer((DOC_SIMPLE + DOC_STYLED).encode(), pts=0))
        h.push_eos()
        texts = []
        while True:
            b = h.try_pull(timeout=0.2)
            if b is None:
                break
            texts.append(b.data.decode())
        h.teardown()
        assert any("Hello world" in t for t in texts)
        assert any("Styled text" in t for t in texts)

    def test_chunked_delivery(self):
        """Document split at an awkward byte boundary must still parse."""
        data = DOC_SIMPLE.encode()
        h = Harness("ttmlparse")
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer(data[:97], pts=0))
        h.push(Buffer(data[97:], pts=0))
        h.push_eos()
        texts = []
        while True:
            b = h.try_pull(timeout=0.2)
            if b is None:
                break
            texts.append(b.data.decode())
        h.teardown()
        assert any("Hello world" in t for t in texts)
        assert any("Second cue" in t for t in texts)

    def test_concatenated_bare_root_documents(self):
        """Two documents with BARE <tt> roots in one buffer: the opening
        tag itself contains 'tt>', which defeated the old first-substring
        doc split and silently dropped the second document."""
        bare1 = ('<tt><body><div><p begin="0s" end="1s">alpha</p>'
                 "</div></body></tt>")
        bare2 = ('<tt><body><div><p begin="1s" end="2s">beta</p>'
                 "</div></body></tt>")
        h = Harness("ttmlparse")
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer((bare1 + bare2).encode(), pts=0))
        h.push_eos()
        texts = []
        while True:
            b = h.try_pull(timeout=0.2)
            if b is None:
                break
            texts.append(b.data.decode())
        h.teardown()
        assert any("alpha" in t for t in texts), texts
        assert any("beta" in t for t in texts), texts

    def test_malformed_numeric_attribute_ignored(self):
        """A malformed numeric attribute (frameRate="29.97i",
        tts:opacity="garbage") is skipped like SAX junk — it must not
        error the stream (reference logs and keeps going,
        gstttmlbase.c:783-807)."""
        doc = """<?xml version="1.0" encoding="utf-8"?>
<tt xmlns="http://www.w3.org/ns/ttml"
    xmlns:tts="http://www.w3.org/ns/ttml#styling"
    xmlns:ttp="http://www.w3.org/ns/ttml#parameter"
    ttp:frameRate="29.97i">
  <body><div>
    <p begin="0s" end="2s" tts:opacity="garbage">Still here</p>
  </div></body>
</tt>
"""
        out = run_ttmlparse(doc)
        assert any("Still here" in t for _, _, t in out), out
