"""avimux: MJPEG-in-AVI container output (playable in stock players;
verified structurally + frames re-decoded from the container)."""

import struct

import numpy as np

from flutpu.core import Buffer, Harness, MSECOND
from flutpu.core.elements import make_test_frame
from flutpu.codec.jpeg import decode_jpeg, psnr


def test_avi_structure_and_frames(tmp_path):
    h = Harness("tpujpegenc quality=90 batch-frames=4 ! avimux")
    h.set_src_caps("video/x-raw, format=RGB, width=64, height=48, framerate=25/1")
    frames = []
    for i in range(4):
        f = make_test_frame("gradient", 64, 48, i)
        frames.append(f)
        h.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
    h.push_eos()
    avi = bytes(h.pull(timeout=20).data)
    h.teardown()

    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    riff_len = struct.unpack("<I", avi[4:8])[0]
    assert riff_len == len(avi) - 8
    assert b"MJPG" in avi and b"idx1" in avi

    # extract the four 00dc chunks and re-decode them
    found = []
    pos = 12
    while pos + 8 <= len(avi):
        tag = avi[pos:pos + 4]
        size = struct.unpack("<I", avi[pos + 4:pos + 8])[0]
        if tag == b"LIST":
            pos += 12  # descend
            continue
        if tag == b"00dc":
            found.append(avi[pos + 8:pos + 8 + size])
        pos += 8 + size + (size & 1)
    assert len(found) == 4
    for i, payload in enumerate(found):
        assert psnr(frames[i], decode_jpeg(payload)) > 30


def test_avi_roundtrip_demux():
    """tpujpegenc ! avimux → avidemux ! jpegdec recovers the frames."""
    import numpy as np
    from flutpu.codec.jpeg import psnr
    from flutpu.core import Buffer, Harness, MSECOND
    from flutpu.core.elements import make_test_frame

    enc = Harness("tpujpegenc quality=90 batch-frames=4 ! avimux")
    enc.set_src_caps("video/x-raw, format=RGB, width=64, height=48, "
                     "framerate=30/1")
    frames = []
    for i in range(4):
        f = make_test_frame("gradient", 64, 48, i)
        frames.append(f)
        enc.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
    enc.push_eos()
    avi = bytes(enc.pull(timeout=30).data)
    enc.teardown()

    dec = Harness("avidemux ! jpegdec")
    dec.set_src_caps("video/x-msvideo")
    dec.push(Buffer(avi, pts=0))
    dec.push_eos()
    for i in range(4):
        out = dec.pull(timeout=30)
        assert psnr(frames[i], np.asarray(out.data)) > 30, i
    dec.teardown()


def test_parse_avi_rejects_garbage():
    from flutpu.codec.avimux import parse_avi
    assert parse_avi(b"") is None
    assert parse_avi(b"RIFFxxxxWAVE") is None
    assert parse_avi(b"\x00" * 64) is None


def test_avidemux_streams_before_eos():
    """Frames emit as their bytes arrive — pushed one byte... well, in
    small slices — with NO EOS; the index at the tail is never needed."""
    import numpy as np
    from flutpu.codec.jpeg import psnr
    from flutpu.core import Buffer, Harness, MSECOND
    from flutpu.core.elements import make_test_frame

    enc = Harness("tpujpegenc quality=90 batch-frames=4 ! avimux")
    enc.set_src_caps("video/x-raw, format=RGB, width=64, height=48, "
                     "framerate=30/1")
    frames = []
    for i in range(4):
        f = make_test_frame("gradient", 64, 48, i)
        frames.append(f)
        enc.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
    enc.push_eos()
    avi = bytes(enc.pull(timeout=30).data)
    enc.teardown()

    dec = Harness("avidemux ! jpegdec")
    dec.set_src_caps("video/x-msvideo")
    got = []
    first_out_at = None
    step = 777
    for off in range(0, len(avi), step):
        dec.push(Buffer(avi[off:off + step], pts=0))
        while True:
            b = dec.try_pull(timeout=0.05)
            if b is None:
                break
            got.append(np.asarray(b.data))
        if got and first_out_at is None:
            first_out_at = off
    # everything out without ever pushing EOS, and the first frame came
    # out long before the file ended (no waiting for idx1)
    assert len(got) == 4
    assert first_out_at is not None and first_out_at < len(avi) // 2
    for i in range(4):
        assert psnr(frames[i], got[i]) > 30, i
    dec.teardown()


def test_avidemux_long_stream_bounded_memory():
    """A multi-megabyte AVI streamed in blocks: internal buffer stays
    bounded (consumed prefix trimmed) and all frames emerge."""
    import numpy as np
    from flutpu.core import Buffer, Harness, MSECOND
    from flutpu.codec.avimux import build_avi
    from fractions import Fraction

    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    avi = build_avi([frame] * 64, 64, 48, Fraction(30, 1))  # ~2.5 MB
    h = Harness("avidemux")
    h.set_src_caps("video/x-msvideo")
    el = h.element if hasattr(h, "element") else None
    n = 0
    for off in range(0, len(avi), 65536):
        h.push(Buffer(avi[off:off + 65536], pts=0))
        while h.try_pull(timeout=0.05) is not None:
            n += 1
    h.push_eos()
    while h.try_pull(timeout=0.5) is not None:
        n += 1
    demux = [e for e in h.pipeline.iterate_elements()
             if e.FACTORY == "avidemux"][0] if hasattr(h, "pipeline") else None
    if demux is not None:
        assert len(demux._buf) < 1.2 * (1 << 20), len(demux._buf)
    h.teardown()
    assert n == 64

def test_avidemux_odd_sized_list_pad_byte():
    """RIFF pads odd-sized chunks (LISTs included) to even offsets; the
    streaming demux must resume aligned after an odd-sized LIST (round-1
    ADVICE: LIST ends lacked the size&1 adjustment)."""
    import struct
    from flutpu.core import Buffer, Harness

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    strh = b"vids" + b"\x00" * 16 + struct.pack("<II", 1, 30) + b"\x00" * 8
    strf = struct.pack("<I", 40) + struct.pack("<ii", 16, 12) + b"\x00" * 28
    # last subchunk left unpadded → the LIST's declared size is odd and the
    # pad byte lands AFTER the LIST (the case the round-1 parser missed)
    junk_raw = b"JUNK" + struct.pack("<I", 7) + b"x" * 7
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf) + junk_raw
    assert len(strl) & 1 == 1
    hdrl = b"hdrl" + chunk(b"avih", b"\x00" * 56) \
        + chunk(b"LIST", strl)
    frames = [bytes([i]) * 100 for i in range(3)]
    movi = b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    h = Harness("avidemux")
    h.set_src_caps("video/x-msvideo")
    got = []
    for off in range(0, len(avi), 37):  # misalign the pushes too
        h.push(Buffer(avi[off:off + 37], pts=0))
        while True:
            b = h.try_pull(timeout=0.05)
            if b is None:
                break
            got.append(bytes(b.data))
    h.push_eos()
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        got.append(bytes(b.data))
    h.teardown()
    assert got == frames


def test_avidemux_corrupt_size_stops_parsing():
    """A chunk declaring an absurd size (or a garbage fourcc) marks the
    stream bad instead of buffering forever."""
    import struct
    from flutpu.codec.avimux import AviDemux
    from flutpu.core import Buffer, Harness

    bad = (b"RIFF" + struct.pack("<I", 100) + b"AVI "
           + b"\x01\x02\x03\x04" + struct.pack("<I", 0xFFFFFFF0) + b"junk")
    h = Harness("avidemux")
    h.set_src_caps("video/x-msvideo")
    h.push(Buffer(bad, pts=0))
    demux = [e for e in h.pipeline.iterate_elements()
             if isinstance(e, AviDemux)][0]
    assert demux._bad
    h.teardown()


def test_demux_arbitrary_input_fragmentation():
    """Streaming demux must be agnostic to upstream buffer boundaries:
    byte-dribbled (1-byte) input yields the identical frames (round-4
    robustness probe)."""
    h = Harness("avimux")
    h.set_src_caps("image/jpeg, width=16, height=16, framerate=30/1")
    payloads = [b"\xff\xd8" + bytes([i] * 50) + b"\xff\xd9"
                for i in range(5)]
    for i, p in enumerate(payloads):
        h.push(Buffer(p, pts=i * MSECOND, duration=MSECOND, offset=i))
    h.push_eos()
    avi = b""
    while (b := h.try_pull(timeout=2)) is not None:
        avi += bytes(b.data)
    h.teardown()

    for chunk in (1, 7, 64):
        h = Harness("avidemux")
        h.set_src_caps("video/x-msvideo")
        for off in range(0, len(avi), chunk):
            h.push(Buffer(avi[off:off + chunk], pts=None))
        h.push_eos()
        frames = []
        while (b := h.try_pull(timeout=2)) is not None:
            frames.append(bytes(b.data))
        h.teardown()
        assert frames == payloads, chunk


def _chunk(fourcc, payload):
    import struct
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def test_avidemux_huge_movi_list_size_ok():
    """A movi LIST declaring > 256 MB is legal (long recordings); the
    corrupt-size guard applies only to chunks the parser must buffer
    whole. The old guard marked the whole stream bad at the LIST header
    and silently emitted zero frames."""
    import struct
    from flutpu.core import Buffer, Harness

    jpg = b"\xff\xd8\xff\xe0" + b"j" * 40 + b"\xff\xd9"
    movi_body = b"movi" + _chunk(b"00dc", jpg) + _chunk(b"00dc", jpg)
    huge = (1 << 28) + 64   # declared size far beyond the buffered bytes
    movi = b"LIST" + struct.pack("<I", huge) + movi_body
    riff_body = b"AVI " + movi
    data = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    h = Harness("avidemux")
    h.set_src_caps("video/x-msvideo")
    h.push(Buffer(data, pts=0))
    got = []
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        got.append(bytes(b.data))
    h.teardown()
    assert got == [jpg, jpg]


def test_avidemux_audio_first_stream_association():
    """An AVI whose FIRST strl is audio (legal ordering): the audio strf
    must not poison width/height, and only the VIDEO stream's ##dc
    chunks become frames."""
    import struct
    from flutpu.codec.avimux import parse_avi
    from flutpu.core import Buffer, Harness

    def _list(kind, payload):
        body = kind + payload
        pad = b"\x00" if len(body) & 1 else b""
        return b"LIST" + struct.pack("<I", len(body)) + body + pad

    auds_strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00" * 4,
                            0, 0, 0, 0, 1, 44100, 0, 0, 0, 0xFFFFFFFF,
                            0, 0, 0, 0, 0)
    auds_strf = struct.pack("<HHIIHH", 1, 1, 44100, 176400, 2, 16)
    vids_strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG",
                            0, 0, 0, 0, 1, 30, 0, 2, 0, 0xFFFFFFFF,
                            0, 0, 0, 64, 48)
    vids_strf = struct.pack("<IiiHH4sIiiII", 40, 64, 48, 1, 24, b"MJPG",
                            64 * 48 * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _list(b"strl", _chunk(b"strh", auds_strh)
                       + _chunk(b"strf", auds_strf))
                 + _list(b"strl", _chunk(b"strh", vids_strh)
                         + _chunk(b"strf", vids_strf)))
    jpg = b"\xff\xd8\xff\xe0" + b"v" * 30 + b"\xff\xd9"
    movi = _list(b"movi", _chunk(b"00wb", b"a" * 50)       # audio data
                 + _chunk(b"01dc", jpg) + _chunk(b"01dc", jpg))
    riff_body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    parsed = parse_avi(data)
    assert parsed["width"] == 64 and parsed["height"] == 48
    assert parsed["frames"] == [jpg, jpg]

    h = Harness("avidemux")
    h.set_src_caps("video/x-msvideo")
    h.push(Buffer(data, pts=0))
    got, caps = [], []
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        got.append(bytes(b.data))
    sink_caps = h.sinkpad.caps
    h.teardown()
    assert got == [jpg, jpg]
    assert sink_caps is not None
    assert sink_caps.get("width") == 64
    assert sink_caps.get("height") == 48


def test_avimux_flush_discards_buffered_frames():
    """Frames buffered before FLUSH_STOP must not appear in the
    post-flush file."""
    from flutpu.codec.avimux import parse_avi
    from flutpu.core import Buffer, Harness
    from flutpu.core.events import FlushStartEvent, FlushStopEvent

    h = Harness("avimux")
    h.set_src_caps("image/jpeg, width=64, height=48, framerate=30/1")
    old = b"\xff\xd8OLD\xff\xd9"
    new = b"\xff\xd8NEW\xff\xd9"
    h.push(Buffer(old, pts=0))
    h.push_event(FlushStartEvent())
    h.push_event(FlushStopEvent())
    h.push(Buffer(new, pts=0))
    h.push_eos()
    avi = bytes(h.pull(timeout=10).data)
    h.teardown()
    parsed = parse_avi(avi)
    assert parsed["frames"] == [new]


def test_avidemux_flush_renegotiates_next_stream():
    """After FLUSH_STOP a NEW file with different geometry must
    renegotiate caps (header/caps state used to survive the flush)."""
    import numpy as np
    from flutpu.core import Buffer, Harness, MSECOND
    from flutpu.core.elements import make_test_frame
    from flutpu.core.events import FlushStartEvent, FlushStopEvent

    def encode(w, hgt):
        e = Harness(f"tpujpegenc quality=90 batch-frames=2 ! avimux")
        e.set_src_caps(f"video/x-raw, format=RGB, width={w}, "
                       f"height={hgt}, framerate=30/1")
        for i in range(2):
            e.push(Buffer(make_test_frame("gradient", w, hgt, i),
                          pts=i * MSECOND, duration=MSECOND, offset=i))
        e.push_eos()
        out = bytes(e.pull(timeout=30).data)
        e.teardown()
        return out

    avi_a = encode(64, 48)
    avi_b = encode(96, 64)
    d = Harness("avidemux ! jpegdec")
    d.set_src_caps("video/x-msvideo")
    d.push(Buffer(avi_a, pts=0))
    got_a = []
    while True:
        b = d.try_pull(timeout=0.3)
        if b is None:
            break
        got_a.append(np.asarray(b.data))
    d.push_event(FlushStartEvent())
    d.push_event(FlushStopEvent())
    d.push(Buffer(avi_b, pts=0))
    got_b = []
    while True:
        b = d.try_pull(timeout=0.3)
        if b is None:
            break
        got_b.append(np.asarray(b.data))
    d.teardown()
    assert len(got_a) == 2 and got_a[0].shape == (48, 64, 3)
    assert len(got_b) == 2 and got_b[0].shape == (64, 96, 3), \
        [g.shape for g in got_b]
