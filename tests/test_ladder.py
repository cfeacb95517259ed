"""ABR ladder encoding: one input, N rung streams."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_ladder_bframes_rungs_decode_and_shrink():
    """bframes=1 on the ladder (the serving case B frames exist for):
    every rung stream carries the B structure (header flags bit 5),
    decodes with the stock decoder, and is smaller than the b0 rung on
    NOISY content (the regime B frames win in — PERF.md B-frames table;
    on tiny clean geometries the doubled anchor spacing can cost more
    than B saves, a documented content tradeoff)."""
    rng = np.random.default_rng(3)
    frames = [np.clip(
        np.asarray(make_test_frame("ball", 128, 96, i)).astype(np.int16)
        + rng.normal(0, 6, (96, 128, 3)).astype(np.int16),
        0, 255).astype(np.uint8) for i in range(8)]

    def run(bframes):
        p = parse_launch(
            "appsrc name=src caps='video/x-raw, format=RGB, width=128, "
            "height=96, framerate=30/1' "
            f"! fvcladderenc name=lad rungs='128x96@85,64x48@80' "
            f"gop-size=8 motion=true bframes={bframes} "
            "lad.src_0 ! appsink name=hi "
            "lad.src_1 ! appsink name=lo")
        src = p.get_by_name("src")
        sinks = [p.get_by_name("hi"), p.get_by_name("lo")]
        p.play()
        for i, f in enumerate(frames):
            src.push(Buffer(f, pts=i * MSECOND, duration=MSECOND, offset=i))
        src.end_of_stream()
        outs = []
        for s in sinks:
            chunks = []
            while (b := s.try_pull_buffer(timeout=10)) is not None:
                chunks.append(bytes(b.data))
            outs.append(b"".join(chunks))
        p.stop()
        return outs

    hi_b, lo_b = run(1)
    hi_0, lo_0 = run(0)
    for blob in (hi_b, lo_b):
        assert blob[5] & 32, "flags bit 5 (B frames)"
    dhi = FvcDecoder().decode_stream(hi_b)
    assert dhi.shape == (8, 96, 128, 3)
    assert psnr(frames[5], dhi[5]) > 30
    assert FvcDecoder().decode_stream(lo_b).shape == (8, 48, 64, 3)
    # the full-res rung shrinks (noisy content, the B-win regime); the
    # downscale smooths the noise off the tiny rung, where B may cost a
    # few percent — the documented content tradeoff
    assert len(hi_b) < len(hi_0)
    assert len(lo_b) <= len(lo_0) * 1.05


def test_parse_rungs_garbage():
    import pytest
    for bad in ("", "x", "12x", "@85", "axb@c"):
        with pytest.raises(ValueError):
            parse_rungs(bad)


def test_adaptive_rung_follows_bandwidth_estimate():
    """Closing the bwmeter loop (reference fluc_bwmeter_base.c:109-147 —
    the conservative estimate exists for adaptive streaming): with
    adaptive=true the ladder emits, per chunk, the highest rung whose
    bitrate fits the estimated bandwidth; throttled traffic shifts the
    emitted rung down, recovered traffic shifts it back up (slowly — the
    asymmetric EWMA)."""
    from flutpu.fluc.bwmeter import BwMeter

    p = parse_launch(
        "appsrc name=src caps='video/x-raw, format=RGB, width=128, "
        "height=96, framerate=30/1' "
        "! fvcladderenc name=lad rungs='128x96@90,32x24@40' gop-size=4 "
        "adaptive=true "
        "lad.src_0 ! appsink name=hi "
        "lad.src_1 ! appsink name=lo "
        "lad.src_active ! appsink name=act")
    src, act = p.get_by_name("src"), p.get_by_name("act")
    lad = p.get_by_name("lad")
    meter = BwMeter()           # injected instance meter (the global
    meter.session_start()       # singleton is process-wide state)
    lad._meter = meter
    p.play()

    def push_gop(base):
        for i in range(4):
            src.push(Buffer(make_test_frame("ball", 128, 96, base + i),
                            pts=(base + i) * MSECOND, duration=MSECOND,
                            offset=base + i))

    # fast link: ~80 Mbps measured -> top rung fits
    meter.data(0, _now=0.0)
    meter.data(2000 * 1024, _now=0.2)
    push_gop(0)
    first = act.try_pull_buffer(timeout=5)
    assert first.meta["rung"] == 0

    # throttle: a slow window collapses the estimate (fall alpha 1.0)
    meter.data(100, _now=0.9)
    push_gop(4)
    second = act.try_pull_buffer(timeout=5)
    assert second.meta["rung"] == 1

    # every rung stream still carries every chunk (the server-side ladder
    # is unchanged; src_active is the selection signal)
    assert p.get_by_name("hi").try_pull_buffer(timeout=5) is not None
    assert p.get_by_name("lo").try_pull_buffer(timeout=5) is not None
    src.end_of_stream()
    p.stop()
