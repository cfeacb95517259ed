"""Core dataflow tests: caps, buffers, events, pads, queue, parse_launch,
harness."""

import threading
import time

import pytest

from flutpu.core import (Buffer, Caps, EosEvent, Event, EventType,
                         FlowReturn, Harness, IntRange, MSECOND, Pad,
                         PadDirection, ProbeReturn, ProbeType, Segment,
                         State, ValueList, make, parse_launch)


class TestCaps:
    def test_parse(self):
        c = Caps.from_string("video/x-raw, format=RGB, width=1, height=1, framerate=30/1")
        assert c.media_type == "video/x-raw"
        assert c["format"] == "RGB"
        assert c["width"] == 1
        assert c["framerate"].numerator == 30

    def test_intersect_fixed(self):
        a = Caps.from_string("video/x-raw, format=RGB, width=320")
        b = Caps.from_string("video/x-raw, format=RGB")
        i = a.intersect(b)
        assert i is not None and i["width"] == 320

    def test_intersect_disjoint(self):
        a = Caps.from_string("video/x-raw, format=RGB")
        b = Caps.from_string("video/x-raw, format=I420")
        assert a.intersect(b) is None

    def test_intersect_media_type_mismatch(self):
        assert Caps.new("video/x-h264").intersect(Caps.new("video/x-h265")) is None

    def test_any(self):
        a = Caps.any()
        b = Caps.from_string("video/x-raw, format=RGB")
        assert a.intersect(b) == b
        assert not a.is_fixed()

    def test_range_and_list(self):
        a = Caps.new("video/x-raw", width=IntRange(16, 4096))
        b = Caps.new("video/x-raw", width=1920)
        assert a.intersect(b)["width"] == 1920
        c = Caps.new("video/x-raw", format=ValueList(("RGB", "BGRA")))
        d = Caps.new("video/x-raw", format="BGRA")
        assert c.intersect(d)["format"] == "BGRA"

    def test_fixate(self):
        a = Caps.new("video/x-raw", width=IntRange(16, 4096),
                     format=ValueList(("RGB", "BGRA")))
        f = a.fixate({"width": 720})
        assert f.is_fixed() and f["width"] == 720 and f["format"] == "RGB"

    def test_subset(self):
        sub = Caps.from_string("video/x-raw, format=RGB, width=320")
        sup = Caps.new("video/x-raw", width=IntRange(16, 4096))
        assert sub.is_subset(sup)
        assert not sup.is_subset(sub)

    def test_parse_range_and_list_syntax(self):
        """Commas inside [lo,hi] and {a,b} belong to the FIELD — a naive
        split produced silently wrong caps (width='[16')."""
        c = Caps.from_string("video/x-raw, width=[16,4096], "
                             "format={RGB,BGRA}, height=32")
        assert c["width"] == IntRange(16, 4096)
        assert c["format"] == ValueList(("RGB", "BGRA"))
        assert c["height"] == 32
        fixed = Caps.from_string(
            "video/x-raw, format=RGB, width=1920, height=32")
        assert fixed.is_subset(c)


class TestSegment:
    def test_clip_inside(self):
        seg = Segment(start=0, stop=100)
        assert seg.clip(10, 5) == (10, 5)

    def test_clip_outside(self):
        seg = Segment(start=50, stop=100)
        assert seg.clip(200, 10) is None
        assert seg.clip(10, 20) is None

    def test_clip_partial(self):
        seg = Segment(start=50, stop=100)
        assert seg.clip(40, 20) == (50, 10)
        assert seg.clip(90, 20) == (90, 10)


class TestPads:
    def test_link_and_push(self):
        src = Pad("src", PadDirection.SRC)
        sink = Pad("sink", PadDirection.SINK)
        got = []
        sink.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
        src.link(sink)
        assert src.push(Buffer(b"x")) == FlowReturn.OK
        assert len(got) == 1

    def test_incompatible_link(self):
        src = Pad("src", PadDirection.SRC,
                  template_caps=Caps.from_string("video/x-h264"))
        sink = Pad("sink", PadDirection.SINK,
                   template_caps=Caps.from_string("video/x-h265"))
        with pytest.raises(ValueError):
            src.link(sink)

    def test_sticky_replay_on_link(self):
        from flutpu.core import CapsEvent
        src = Pad("src", PadDirection.SRC)
        caps = Caps.from_string("video/x-raw, format=RGB")
        src.push_event(CapsEvent(caps))  # unlinked: stored sticky
        sink = Pad("sink", PadDirection.SINK)
        seen = []
        sink.event_function = lambda p, e: (seen.append(e), True)[1]
        src.link(sink)
        assert any(e.type == EventType.CAPS for e in seen)
        assert sink.caps == caps

    def test_probe_drop(self):
        src = Pad("src", PadDirection.SRC)
        sink = Pad("sink", PadDirection.SINK)
        got = []
        sink.chain_function = lambda p, b: (got.append(b), FlowReturn.OK)[1]
        src.link(sink)
        src.add_probe(ProbeType.BUFFER, lambda p, d: ProbeReturn.DROP)
        assert src.push(Buffer(b"x")) == FlowReturn.OK
        assert got == []

    def test_probe_remove(self):
        src = Pad("src", PadDirection.SRC)
        sink = Pad("sink", PadDirection.SINK)
        sink.chain_function = lambda p, b: FlowReturn.OK
        src.link(sink)
        calls = []
        def probe(p, d):
            calls.append(d)
            return ProbeReturn.REMOVE
        src.add_probe(ProbeType.BUFFER, probe)
        src.push(Buffer(b"a"))
        src.push(Buffer(b"b"))
        assert len(calls) == 1

    def test_flushing(self):
        src = Pad("src", PadDirection.SRC)
        sink = Pad("sink", PadDirection.SINK)
        sink.chain_function = lambda p, b: FlowReturn.OK
        src.link(sink)
        sink.set_flushing(True)
        assert src.push(Buffer(b"x")) == FlowReturn.FLUSHING
        sink.set_flushing(False)
        assert src.push(Buffer(b"x")) == FlowReturn.OK


class TestQueue:
    def test_decouples_thread(self):
        q = make("queue")
        q.set_state(State.PLAYING)
        out = []
        threads = []
        sink = Pad("sink", PadDirection.SINK)
        sink.chain_function = lambda p, b: (
            out.append(b), threads.append(threading.current_thread()),
            FlowReturn.OK)[2]
        q.srcpad.link(sink)
        for i in range(5):
            assert q.sinkpad.chain(Buffer(i)) == FlowReturn.OK
        deadline = time.monotonic() + 5
        while len(out) < 5 and time.monotonic() < deadline:
            time.sleep(0.01)
        assert [b.data for b in out] == [0, 1, 2, 3, 4]
        assert all(t is not threading.main_thread() for t in threads)
        q.set_state(State.NULL)

    def test_eos_passes_through(self):
        q = make("queue")
        q.set_state(State.PLAYING)
        got = threading.Event()
        sink = Pad("sink", PadDirection.SINK)
        sink.event_function = lambda p, e: (
            got.set() if e.type == EventType.EOS else None, True)[1]
        q.srcpad.link(sink)
        q.sinkpad.send_event(EosEvent())
        assert got.wait(5)
        q.set_state(State.NULL)

    def test_buffer_list_sees_downstream_error(self):
        """A downstream flow error must reach buffer-LIST pushers the same
        way it reaches per-buffer pushers (the loop thread records it in
        _srcresult; _chain_list used to ignore it forever)."""
        from flutpu.core import BufferList
        q = make("queue")
        q.set_state(State.PLAYING)
        sink = Pad("sink", PadDirection.SINK)
        sink.chain_list_function = lambda p, bl: FlowReturn.ERROR
        sink.chain_function = lambda p, b: FlowReturn.ERROR
        q.srcpad.link(sink)
        q.sinkpad.chain_list(BufferList([Buffer(0)]))
        deadline = time.monotonic() + 5
        ret = FlowReturn.OK
        while time.monotonic() < deadline:
            ret = q.sinkpad.chain_list(BufferList([Buffer(1)]))
            if ret != FlowReturn.OK:
                break
            time.sleep(0.01)
        assert ret == FlowReturn.ERROR
        q.set_state(State.NULL)


class TestBus:
    def test_pop_none_blocks_until_message(self):
        """pop(timeout=None) waits (the timed_pop_filtered convention);
        it used to alias None to get_nowait and return instantly."""
        from flutpu.core.bus import Bus, Message, MessageType
        bus = Bus()
        t = threading.Timer(0.2, lambda: bus.post(
            Message(MessageType.EOS, None)))
        t.start()
        t0 = time.monotonic()
        msg = bus.pop(timeout=None)
        assert msg is not None and msg.type == MessageType.EOS
        assert time.monotonic() - t0 >= 0.15

    def test_pop_zero_nonblocking(self):
        from flutpu.core.bus import Bus
        bus = Bus()
        t0 = time.monotonic()
        assert bus.pop(timeout=0) is None
        assert time.monotonic() - t0 < 0.1


class TestGhostPadRetarget:
    def test_sink_ghost_replays_stickies_on_retarget(self):
        """Retargeting a SINK ghost mid-stream hands the new target the
        negotiation state (STREAM_START/CAPS/SEGMENT) the ghost has seen,
        before any proxied buffer."""
        from flutpu.core import (CapsEvent, GhostPad, Segment, SegmentEvent,
                                 StreamStartEvent)
        ghost = GhostPad("sink", PadDirection.SINK)
        first = Pad("sink1", PadDirection.SINK)
        seen1, seen2 = [], []
        first.event_function = lambda p, e: (seen1.append(e.type), True)[1]
        ghost.set_target(first)
        ghost.send_event(StreamStartEvent("s"))
        ghost.send_event(CapsEvent(Caps.from_string(
            "video/x-raw, format=RGB, width=8, height=8")))
        ghost.send_event(SegmentEvent(Segment()))
        assert EventType.CAPS in seen1
        second = Pad("sink2", PadDirection.SINK)
        second.event_function = lambda p, e: (seen2.append(e.type), True)[1]
        ghost.set_target(second)
        assert {EventType.STREAM_START, EventType.CAPS,
                EventType.SEGMENT} <= set(seen2)
        got = []
        second.chain_function = lambda p, b: (got.append(b),
                                              FlowReturn.OK)[1]
        ghost.chain(Buffer(b"x"))
        assert len(got) == 1


class TestParseLaunch:
    def test_simple_chain(self):
        p = parse_launch("identity name=a ! identity name=b")
        a, b = p.get_by_name("a"), p.get_by_name("b")
        assert a.srcpad.peer is b.sinkpad

    def test_props(self):
        p = parse_launch("identity name=a sleep-time=42 silent=false")
        a = p.get_by_name("a")
        assert a.get_property("sleep-time") == 42
        assert a.get_property("silent") is False

    def test_named_pad_refs_and_forward_refs(self):
        p = parse_launch(
            "scenedetector gop-size=2 ! outputselector name=os "
            "os.src_0 ! identity name=i0 ! col. "
            "os.src_1 ! identity name=i1 ! col. "
            "scenecollector name=col")
        os_el = p.get_by_name("os")
        col = p.get_by_name("col")
        assert os_el.get_pad("src_0").peer.element.name == "i0"
        assert col.get_pad("sink_0").peer.element.name == "i0"
        assert col.get_pad("sink_1").peer.element.name == "i1"

    def test_unknown_factory(self):
        with pytest.raises(ValueError):
            parse_launch("nosuchelement ! identity")


class TestHarness:
    def test_identity_passthrough(self):
        h = Harness("identity")
        h.set_src_caps("video/x-raw, format=RGB, width=1, height=1")
        h.push(Buffer(b"abc", pts=0))
        out = h.pull()
        assert out.data == b"abc"
        h.teardown()

    def test_eos(self):
        h = Harness("identity")
        h.push(Buffer(b"abc"))
        h.push_eos()
        h.pull()
        assert h.wait_for_eos(2)
        h.teardown()

    def test_pull_returns_none_at_eos(self):
        """pull() drains buffers then returns None once EOS is reached
        (the appsink pull_sample contract) instead of raising
        TimeoutError; a live stream with no data still times out."""
        h = Harness("identity")
        h.push(Buffer(b"a"))
        h.push(Buffer(b"b"))
        h.push_eos()
        assert h.pull().data == b"a"
        assert h.pull().data == b"b"
        assert h.pull(timeout=2) is None      # EOS: end of stream
        assert h.pull(timeout=0.2) is None    # stays None
        h.teardown()
        h2 = Harness("identity")
        import pytest
        with pytest.raises(TimeoutError):     # live stream, no data
            h2.pull(timeout=0.2)
        h2.teardown()

    def test_pull_post_eos_honors_deadline_under_racing_consumer(self):
        """ADVICE r3: after EOS, a racing second consumer can keep the
        queue transiently non-empty; pull() must still honor the caller's
        deadline instead of looping forever."""
        import queue as _pyqueue
        import time as _time

        import pytest

        h = Harness("identity")
        h.push(Buffer(b"a"))
        h.push_eos()
        # simulate the race: qsize() reports 1 but get() always loses
        h._out = type("Q", (), {
            "get": lambda self, timeout=None: (_ for _ in ()).throw(
                _pyqueue.Empty),
            "qsize": lambda self: 1,
            "put": lambda self, item: None,
        })()
        t0 = _time.monotonic()
        with pytest.raises(TimeoutError):
            h.pull(timeout=0.3)
        assert _time.monotonic() - t0 < 5.0
        h.teardown()


class TestVideoConvert:
    def _run(self, in_fmt, out_fmt, data):
        from flutpu.core import parse_launch
        p = parse_launch(
            f"appsrc name=src caps='video/x-raw, format={in_fmt}, width=4, height=2' "
            f"! videoconvert ! capsfilter caps='video/x-raw, format={out_fmt}' "
            "! appsink name=out")
        src, sink = p.get_by_name("src"), p.get_by_name("out")
        p.play()
        src.push(Buffer(data, pts=0))
        src.end_of_stream()
        b = sink.try_pull_buffer(timeout=5)
        p.stop()
        return b

    def test_rgb_to_bgra(self):
        import numpy as np
        rgb = np.zeros((2, 4, 3), np.uint8)
        rgb[..., 0] = 200  # red
        out = self._run("RGB", "BGRA", rgb)
        img = np.asarray(out.data)
        assert img.shape == (2, 4, 4)
        assert img[0, 0, 2] == 200 and img[0, 0, 0] == 0  # BGRA order
        assert img[0, 0, 3] == 255

    def test_bgra_to_rgb(self):
        import numpy as np
        bgra = np.zeros((2, 4, 4), np.uint8)
        bgra[..., 0] = 123  # blue
        bgra[..., 3] = 255
        out = self._run("BGRA", "RGB", bgra)
        img = np.asarray(out.data)
        assert img.shape == (2, 4, 3)
        assert img[0, 0, 2] == 123

    def test_rgb_to_i420(self):
        import numpy as np
        rgb = np.full((2, 4, 3), 128, np.uint8)
        out = self._run("RGB", "I420", rgb)
        planes = out.data
        assert planes["y"].shape == (2, 4)
        assert planes["u"].shape == (1, 2)
        assert abs(int(planes["y"][0, 0]) - 128) <= 1


class TestElementErrorContainment:
    """catch-panic analog: an element whose chain raises must yield
    FlowReturn.ERROR + a bus ERROR message — not a dead streaming thread
    (reference scenecollector/imp.rs catch_panic_pad_function)."""

    def test_chain_exception_becomes_flow_error(self):
        from flutpu.core import parse_launch
        from flutpu.core.bus import MessageType

        p = parse_launch("appsrc name=src ! identity name=boom ! fakesink")
        boom = p.get_by_name("boom")
        def explode(pad, buf):
            raise RuntimeError("element bug")
        boom.sinkpad.chain_function = explode
        src = p.get_by_name("src")
        p.play()
        ret = src.push(Buffer(b"x", pts=0))
        msg = p.bus.timed_pop_filtered(5, [MessageType.ERROR])
        p.stop()
        assert ret == FlowReturn.ERROR
        assert msg is not None and msg.structure["exception"] == "RuntimeError"

    def test_queue_thread_survives_downstream_exception(self):
        from flutpu.core import parse_launch
        from flutpu.core.bus import MessageType

        p = parse_launch("appsrc name=src ! queue ! identity name=boom "
                         "! fakesink")
        boom = p.get_by_name("boom")
        calls = []
        def explode(pad, buf):
            calls.append(buf)
            raise ValueError("bug in streaming thread")
        boom.sinkpad.chain_function = explode
        src = p.get_by_name("src")
        p.play()
        src.push(Buffer(b"a", pts=0))
        msg = p.bus.timed_pop_filtered(5, [MessageType.ERROR])
        assert msg is not None and "bug in streaming thread" in msg.structure["error"]
        # the queue latches the flow error and reports it UPSTREAM on the
        # next push (GStreamer srcresult semantics) instead of crashing
        # its streaming thread
        deadline = time.monotonic() + 5
        ret = FlowReturn.OK
        while ret == FlowReturn.OK and time.monotonic() < deadline:
            time.sleep(0.01)
            ret = src.push(Buffer(b"b", pts=1))
        p.stop()
        assert ret == FlowReturn.ERROR
        assert len(calls) == 1
