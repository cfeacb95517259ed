"""TTML seek/flush semantics: a time seek becomes a byte-0 upstream seek
plus self-clipping (reference gstttmlbase.c:1347-1373), and typefind
sniffing."""

import time

import numpy as np
import pytest

from flutpu.core import Buffer, SECOND, SeekEvent, parse_launch
from flutpu.ttml.typefind import TTML_MIME, type_find

DOC = """<?xml version="1.0"?>
<tt xmlns="http://www.w3.org/ns/ttml">
  <body><div>
    <p begin="0s" end="2s">cue0</p>
    <p begin="2s" end="4s">cue1</p>
    <p begin="4s" end="6s">cue2</p>
  </div></body>
</tt>
"""


def pull_all(sink, timeout=5.0):
    out = []
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        b = sink.try_pull_buffer(timeout=0.3)
        if b is None:
            break
        out.append(b)
    return out


def test_time_seek_restarts_and_clips(tmp_path):
    path = tmp_path / "cues.ttml"
    path.write_text(DOC)
    p = parse_launch(f"filesrc location={path} ! ttmlparse name=t ! appsink name=out")
    t = p.get_by_name("t")
    sink = p.get_by_name("out")
    assert p.play().name == "SUCCESS"
    first = pull_all(sink)
    texts = [bytes(b.data).decode() for b in first]
    assert any("cue0" in x for x in texts)

    # seek to 3s: ttmlparse converts to a byte-0 seek upstream; filesrc
    # restarts; output must be clipped to >= 3s
    assert t.srcpad.send_event(SeekEvent(3 * SECOND))
    second = pull_all(sink)
    assert second, "no output after seek"
    texts2 = [(b.pts, bytes(b.data).decode()) for b in second]
    data_cues = [(pts, s) for pts, s in texts2 if s.strip()]
    assert all(pts >= 3 * SECOND for pts, _ in data_cues), data_cues
    assert any("cue1" in s for _, s in data_cues)
    assert any("cue2" in s for _, s in data_cues)
    assert not any("cue0" in s for _, s in data_cues)
    p.stop()


def test_non_flushing_seek_applies_window(tmp_path):
    """flush=False seek: no FLUSH_STOP arrives, so the pending window is
    adopted at seek time (it used to stay pending forever and the seek
    silently never took effect)."""
    path = tmp_path / "cues.ttml"
    path.write_text(DOC)
    p = parse_launch(f"filesrc location={path} ! ttmlparse name=t "
                     "! appsink name=out")
    t = p.get_by_name("t")
    sink = p.get_by_name("out")
    assert p.play().name == "SUCCESS"
    first = pull_all(sink)
    assert any("cue0" in bytes(b.data).decode() for b in first)

    assert t.srcpad.send_event(SeekEvent(4 * SECOND, flush=False))
    second = pull_all(sink)
    data_cues = [(b.pts, bytes(b.data).decode()) for b in second
                 if bytes(b.data).decode().strip()]
    assert data_cues, "no output after non-flushing seek"
    assert all(pts >= 4 * SECOND for pts, _ in data_cues), data_cues
    assert any("cue2" in s for _, s in data_cues)
    assert not any("cue0" in s or "cue1" in s for _, s in data_cues)
    p.stop()


class TestTypefind:
    def test_positive(self):
        assert type_find(DOC.encode())
        assert type_find(b'<tt xmlns="http://www.w3.org/ns/ttml"><body/></tt>')

    def test_negative(self):
        assert not type_find(b"\xff\xd8\xff\xe0 jpeg data")
        assert not type_find(b"<html><body>hi</body></html>")
        assert not type_find(b"")

    def test_mime(self):
        assert TTML_MIME == "application/ttml+xml"
