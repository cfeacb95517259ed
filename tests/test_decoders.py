"""Decoder elements: encode→decode roundtrip pipelines, incl. the
decode→overlay shape of BASELINE config 2."""

import numpy as np
import pytest

from flutpu.codec.jpeg import psnr
from flutpu.core import Buffer, Harness, MSECOND, parse_launch
from flutpu.core.elements import make_test_frame

CAPS = "video/x-raw, format=RGB, width=64, height=48, framerate=30/1"


def push_video(h, n, pattern="gradient", w=64, hh=48):
    frames = []
    for i in range(n):
        f = make_test_frame(pattern, w, hh, i)
        frames.append(f)
        h.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
    return frames


def test_jpeg_roundtrip_pipeline():
    h = Harness("tpujpegenc quality=90 batch-frames=4 ! jpegdec")
    h.set_src_caps(CAPS)
    frames = push_video(h, 4)
    h.push_eos()
    for i in range(4):
        out = h.pull(timeout=20)
        assert out.pts == i * MSECOND
        img = np.asarray(out.data)
        assert img.shape == (48, 64, 3)
        assert psnr(frames[i], img) > 30
    h.teardown()


def test_fvc_roundtrip_pipeline():
    h = Harness("fvcenc quality=90 gop-size=4 ! fvcdec")
    h.set_src_caps(CAPS)
    frames = push_video(h, 8, pattern="ball")
    h.push_eos()
    for i in range(8):
        out = h.pull(timeout=20)
        assert out.pts == i * MSECOND
        assert psnr(frames[i], np.asarray(out.data)) > 30
    h.teardown()


def test_decode_overlay_pipeline():
    """BASELINE config 2 shape: decode → injectbin(processing) → sink,
    with a mid-stream swap."""
    p = parse_launch(
        "appsrc name=src caps='video/x-raw, format=RGB, width=64, height=48, framerate=30/1' "
        "! tpujpegenc quality=90 batch-frames=2 ! jpegdec "
        "! injectbin name=ib ! appsink name=out")
    src = p.get_by_name("src")
    ib = p.get_by_name("ib")
    sink = p.get_by_name("out")
    assert p.play().name == "SUCCESS"
    from flutpu.core import make
    inv = make("identity")
    inv.set_property("handoff",
                     lambda e, b: b.meta.update(processed=True))
    for i in range(8):
        if i == 4:
            ib.set_property("element", inv)
        src.push(Buffer(make_test_frame("gradient", 64, 48, i),
                        pts=i * MSECOND, duration=MSECOND, offset=i))
    src.end_of_stream()
    got = [sink.try_pull_buffer(timeout=20) for _ in range(8)]
    p.stop()
    assert all(b is not None for b in got)
    assert [b.pts for b in got] == [i * MSECOND for i in range(8)]
    assert any(b.meta.get("processed") for b in got)


def test_fvc_motion_roundtrip_pipeline():
    """v2 container through the element pair: fvcenc motion=true ! fvcdec."""
    h = Harness("fvcenc quality=90 gop-size=4 motion=true search-range=5 "
                "! fvcdec")
    h.set_src_caps(CAPS)
    frames = push_video(h, 8, pattern="ball")
    h.push_eos()
    for i in range(8):
        out = h.pull(timeout=30)
        assert out.pts == i * MSECOND
        assert psnr(frames[i], np.asarray(out.data)) > 30
    h.teardown()


def test_fvcdec_reassembles_byte_stream():
    """fvcdec consumes arbitrary byte blocks (filesrc-style), reassembling
    chunks and synthesizing monotonic pts."""
    from flutpu.codec.fvc import FvcEncoder
    frames = [make_test_frame("ball", 64, 48, i) for i in range(8)]
    enc = FvcEncoder(quality=88)
    data = (enc.encode_chunk(np.stack(frames[:4]))
            + enc.encode_chunk(np.stack(frames[4:])))
    h = Harness("fvcdec")
    h.set_src_caps("video/x-fvc")
    for off in range(0, len(data), 333):
        h.push(Buffer(data[off:off + 333], pts=0))
    h.push_eos()
    out = []
    while True:
        b = h.try_pull(timeout=5)
        if b is None:
            break
        out.append(b)
    h.teardown()
    assert len(out) == 8
    assert [b.pts for b in out] == sorted(b.pts for b in out)
    for i in (0, 3, 7):
        assert psnr(frames[i], np.asarray(out[i].data)) > 30, i
