"""ABR ladder encoding: one input, N rung streams."""

import numpy as np

from flutpu.codec import FvcDecoder, parse_rungs
from flutpu.codec.jpeg import psnr
from flutpu.core import Buffer, MSECOND, parse_launch
from flutpu.core.elements import make_test_frame


def test_parse_rungs():
    r = parse_rungs("1920x1080@85, 960x540@80,480x270")
    assert (r[0].width, r[0].height, r[0].quality) == (1920, 1080, 85)
    assert (r[2].width, r[2].height, r[2].quality) == (480, 270, 85)


def test_ladder_element_three_rungs():
    p = parse_launch(
        "appsrc name=src caps='video/x-raw, format=RGB, width=128, "
        "height=96, framerate=30/1' "
        "! fvcladderenc name=lad rungs='128x96@88,64x48@80' gop-size=4 "
        "lad.src_0 ! appsink name=hi "
        "lad.src_1 ! appsink name=lo")
    src = p.get_by_name("src")
    hi, lo = p.get_by_name("hi"), p.get_by_name("lo")
    p.play()
    frames = [make_test_frame("ball", 128, 96, i) for i in range(8)]
    for i, f in enumerate(frames):
        src.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
    src.end_of_stream()
    hi_chunks, lo_chunks = [], []
    while True:
        b = hi.try_pull_buffer(timeout=10)
        if b is None:
            break
        hi_chunks.append(bytes(b.data))
    while True:
        b = lo.try_pull_buffer(timeout=10)
        if b is None:
            break
        lo_chunks.append(bytes(b.data))
    p.stop()
    assert len(hi_chunks) == 2 and len(lo_chunks) == 2
    dhi = FvcDecoder().decode_stream(b"".join(hi_chunks))
    dlo = FvcDecoder().decode_stream(b"".join(lo_chunks))
    assert dhi.shape == (8, 96, 128, 3)
    assert dlo.shape == (8, 48, 64, 3)
    assert psnr(frames[5], dhi[5]) > 30
    # the low rung carries fewer bytes than the high rung
    assert sum(map(len, lo_chunks)) < sum(map(len, hi_chunks))


def test_parse_rungs_garbage():
    import pytest
    for bad in ("", "x", "12x", "@85", "axb@c"):
        with pytest.raises(ValueError):
            parse_rungs(bad)
