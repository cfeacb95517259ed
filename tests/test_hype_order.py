"""hype ordered scatter/gather tests — the reference's core invariant suite
(hype/tests/tests.rs): push NUM_BUFFERS timestamped buffers through any
scatter/encode/gather topology, pull them back in exactly input pts order,
including under severe branch latency skew."""

import pytest

from flutpu.core import (Buffer, Caps, Harness, MSECOND, State, make,
                         parse_launch)
from flutpu.hype.events import SceneNewEvent

NUM_BUFFERS = 20

CAPS = "video/x-raw, format=RGB, width=1, height=1, framerate=30/1"


def run_order_test(pipeline: str, num_buffers: int = NUM_BUFFERS):
    h = Harness.new_parse(pipeline)
    h.set_src_caps(CAPS)
    h.set_sink_caps(CAPS)

    buffers = []
    for i in range(num_buffers):
        buf = Buffer(bytes(27), pts=i * MSECOND, duration=1 * MSECOND, offset=i)
        buffers.append(buf)

    for buf in buffers:
        assert h.push(buf.copy()).value == "ok"
    assert h.push_eos()

    for in_buf in buffers:
        out = h.pull(timeout=15.0)
        assert out.pts == in_buf.pts, (
            f"order violated: expected pts={in_buf.pts}, got {out.pts}")
    h.teardown()


def test_one_identity():
    run_order_test(
        "scenedetector gop-size=2 "
        "! outputselector name=os "
        "! identity "
        "! scenecollector name=col")


def test_identity_two_branches():
    run_order_test(
        "scenedetector gop-size=2 "
        "! outputselector name=os "
        "os.src_0 ! identity ! col. "
        "os.src_1 ! identity ! col. "
        "scenecollector name=col")


def test_identity_sleep_skew():
    # branch 0 sleeps 10ms/buffer, branch 1 sleeps 0.1ms/buffer: branch 1
    # finishes its scenes long before branch 0 — output must still be ordered
    run_order_test(
        "scenedetector gop-size=5 "
        "! outputselector name=os "
        "os.src_0 ! identity sleep-time=10000 silent=false ! col. "
        "os.src_1 ! identity sleep-time=100 silent=false ! col. "
        "scenecollector name=col")


def test_hype_one_encoder():
    run_order_test("hype gop-size=5 encoder-1=identity")


def test_hype_three_encoders():
    run_order_test(
        "hype gop-size=5 encoder-1=identity encoder-2=identity "
        "encoder-3=identity")


def test_hype_three_encoders_skewed():
    run_order_test(
        "hype gop-size=3 "
        "encoder-1='identity sleep-time=5000' "
        "encoder-2='identity sleep-time=50' "
        "encoder-3='identity sleep-time=500'")


def test_incompatible_encoders():
    """Encoders whose src caps don't intersect must fail the state change
    (reference hype/tests/tests.rs:133-140 with x264enc+x265enc)."""
    from flutpu.codec.base import VideoEncoder
    from flutpu.core import register, FlowReturn

    class EncA(VideoEncoder):
        FACTORY = "testenc-a"
        SRC_CAPS = "video/x-codec-a"

        def encode_frame(self, buf, keyframe):
            return buf

    class EncB(VideoEncoder):
        FACTORY = "testenc-b"
        SRC_CAPS = "video/x-codec-b"

        def encode_frame(self, buf, keyframe):
            return buf

    register(EncA)
    register(EncB)

    hype = make("hype")
    hype.set_property("encoder-0", EncA())
    hype.set_property("encoder-1", EncB())
    assert hype.set_state(State.PLAYING).name == "FAILURE"


def test_scene_events_mark_chunks():
    """Scene events land only on the branch owning the chunk, with
    round-robin placement."""
    p = parse_launch(
        "scenedetector gop-size=2 ! outputselector name=os "
        "os.src_0 ! identity name=i0 ! col. "
        "os.src_1 ! identity name=i1 ! col. "
        "scenecollector name=col")
    seen = {0: [], 1: []}
    col = p.get_by_name("col")
    for idx in (0, 1):
        pad = col.get_pad(f"sink_{idx}")
        orig = pad.event_function
        def wrap(pad_, ev, _idx=idx, _orig=orig):
            s = SceneNewEvent.parse(ev)
            if s is not None:
                seen[_idx].append(s.gop_index)
            return _orig(pad_, ev)
        pad.event_function = wrap
    h = Harness(p)
    h.set_src_caps(CAPS)
    for i in range(8):
        h.push(Buffer(bytes(3), pts=i * MSECOND, duration=MSECOND, offset=i))
    h.push_eos()
    for _ in range(8):
        h.pull(timeout=10)
    assert seen[0] == [0, 2]
    assert seen[1] == [1, 3]
    h.teardown()


def test_forced_keyframe_at_chunk_start():
    """Each branch receives a ForceKeyUnit before its chunk's first buffer."""
    p = parse_launch(
        "scenedetector gop-size=2 ! outputselector name=os "
        "os.src_0 ! identity name=i0 ! col. "
        "os.src_1 ! identity name=i1 ! col. "
        "scenecollector name=col")
    fku = []
    i0 = p.get_by_name("i0")
    orig = i0.sinkpad.event_function
    def wrap(pad_, ev):
        if ev.name == "GstForceKeyUnit":
            fku.append(ev)
        if orig:
            return orig(pad_, ev)
        from flutpu.core.pad import _forward_event
        return _forward_event(pad_, ev)
    i0.sinkpad.event_function = wrap
    h = Harness(p)
    h.set_src_caps(CAPS)
    for i in range(8):
        h.push(Buffer(bytes(3), pts=i * MSECOND, duration=MSECOND, offset=i))
    h.push_eos()
    for _ in range(8):
        h.pull(timeout=10)
    # branch 0 owns chunks 0 and 2 → at least its non-initial activations
    # carry a ForceKeyUnit (first chunk may precede any switch)
    assert len(fku) >= 1
    h.teardown()


def test_dead_branch_timeout_skips_scene():
    """Failure tolerance beyond the reference: a stalled branch's scene is
    skipped after branch-timeout-ms so the stream keeps flowing (the
    reference stalls forever, SURVEY §7 'ordering under failure')."""
    import time
    from flutpu.core import make, SegmentEvent, Segment, StreamStartEvent
    col = make("scenecollector")
    col.set_property("branch-timeout-ms", 150)
    p0 = col.request_pad("sink_%u")
    p1 = col.request_pad("sink_%u")
    out = []
    sink = __import__("flutpu.core.pad", fromlist=["Pad"]).Pad(
        "t", __import__("flutpu.core.pad", fromlist=["PadDirection"]).PadDirection.SINK)
    from flutpu.core import FlowReturn
    sink.chain_function = lambda pad, b: (out.append(b), FlowReturn.OK)[1]
    col.srcpad.link(sink)

    from flutpu.hype.events import SceneNewEvent
    # scene 0 assigned to branch 0 but its buffers never arrive (dead branch)
    p0.send_event(SceneNewEvent(0, 4))
    # scene 1 complete on branch 1
    p1.send_event(SceneNewEvent(1, 4))
    for i in range(4):
        p1.chain(Buffer(bytes(1), pts=(4 + i) * MSECOND))
    p1.send_event(SceneNewEvent(3, 4))  # completes scene 1
    assert out == []  # held: scene 0 still pending
    time.sleep(0.2)
    # further activity on the live branch triggers the timeout path
    p1.chain(Buffer(bytes(1), pts=12 * MSECOND))
    assert len(out) == 4  # scene 1 flushed; scene 0 skipped
    assert out[0].pts == 4 * MSECOND


def test_adaptive_scene_detection():
    """scene-threshold > 0: boundaries at content cuts plus a max chunk
    length (extension beyond the reference's fixed-GOP-only detector)."""
    import numpy as np
    from flutpu.core import make, State
    det = make("scenedetector")
    det.set_property("gop-size", 100)       # max length: effectively off
    det.set_property("scene-threshold", 10.0)
    events = []
    from flutpu.core.pad import Pad, PadDirection
    from flutpu.core import FlowReturn
    sink = Pad("t", PadDirection.SINK)
    sink.chain_function = lambda p, b: FlowReturn.OK
    def ev(p, e):
        s = SceneNewEvent.parse(e)
        if s is not None:
            events.append(s.gop_index)
        return True
    sink.event_function = ev
    det.srcpad.link(sink)
    dark = np.zeros((64, 64, 3), np.uint8)
    bright = np.full((64, 64, 3), 200, np.uint8)
    seq = [dark] * 5 + [bright] * 5 + [dark] * 5  # two hard cuts
    for i, f in enumerate(seq):
        det.sinkpad.chain(Buffer(f, offset=i))
    assert events == [0, 1, 2]  # start + 2 cuts


def test_soak_five_branches_random_skew():
    """Long-run soak: 600 buffers over 5 branches with per-branch latency
    skew (0.02–2 ms/buffer) — ordering must hold over many wrap-arounds of
    the round-robin and deep reorder-buffer occupancy."""
    run_order_test(
        "scenedetector gop-size=3 "
        "! outputselector name=os "
        "os.src_0 ! identity sleep-time=2000 ! col. "
        "os.src_1 ! identity sleep-time=20 ! col. "
        "os.src_2 ! identity sleep-time=700 ! col. "
        "os.src_3 ! identity sleep-time=50 ! col. "
        "os.src_4 ! identity sleep-time=1300 ! col. "
        "scenecollector name=col",
        num_buffers=600)
