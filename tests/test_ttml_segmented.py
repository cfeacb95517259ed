"""ttmlsegmentedparse: each interval re-serializes to a standalone TTML doc
that round-trips through our own parser (the implicit golden-file strategy
of the reference's README pipelines made explicit)."""

import pytest

from flutpu.core import Buffer, Harness, SECOND
from flutpu.ttml.typefind import type_find

DOC = """<?xml version="1.0" encoding="utf-8"?>
<tt xmlns="http://www.w3.org/ns/ttml" xmlns:tts="http://www.w3.org/ns/ttml#styling">
  <head>
    <styling>
      <style xml:id="s1" tts:color="yellow"/>
    </styling>
    <layout>
      <region xml:id="r1" tts:origin="10% 80%" tts:extent="80% 20%"/>
    </layout>
  </head>
  <body>
    <div>
      <p begin="0s" end="2s" region="r1" style="s1">Line one<br/>Line two</p>
      <p begin="2s" end="4s">Plain</p>
    </div>
  </body>
</tt>
"""


def run_segmented(doc):
    h = Harness("ttmlsegmentedparse")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(doc.encode(), pts=0))
    h.push_eos()
    out = []
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        out.append((b.pts, b.duration, bytes(b.data).decode()))
    h.teardown()
    return out


def test_segments_are_ttml_docs():
    out = run_segmented(DOC)
    assert out, "no segments produced"
    for pts, dur, doc in out:
        assert type_find(doc.encode())
        assert doc.count("<tt") == 1 and doc.rstrip().endswith("</tt>")


def test_segment_content_and_times():
    out = run_segmented(DOC)
    seg1 = [d for p, _, d in out if "Line one" in d]
    assert seg1
    assert "Line two" in seg1[0]
    # newline split → two <p> elements
    assert seg1[0].count("<p ") == 2
    assert 'region="r1"' in seg1[0]
    seg2 = [(p, d) for p, _, d in out if "Plain" in d]
    assert seg2 and seg2[0][0] == 2 * SECOND


def test_head_carries_styles_and_regions():
    out = run_segmented(DOC)
    seg1 = [d for p, _, d in out if "Line one" in d][0]
    assert "<styling>" in seg1 and 'xml:id="s1"' in seg1
    assert "<layout>" in seg1 and 'xml:id="r1"' in seg1


def test_segments_round_trip_through_parser():
    out = run_segmented(DOC)
    seg1 = [d for p, _, d in out if "Line one" in d][0]
    h = Harness("ttmlparse")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(seg1.encode(), pts=0))
    h.push_eos()
    texts = []
    while True:
        b = h.try_pull(timeout=0.2)
        if b is None:
            break
        texts.append(bytes(b.data).decode())
    h.teardown()
    assert any("Line one" in t for t in texts), texts
    # the referential color style survived the round trip
    assert any('fgcolor="#ffff00"' in t for t in texts), texts


def test_segmented_chain_to_render():
    """DASH-style chain: one document segmented into per-interval docs,
    then re-parsed and rendered downstream — the segmented stream is a
    fully valid TTML stream."""
    import numpy as np
    from flutpu.core import parse_launch
    p = parse_launch(
        "appsrc name=src caps='application/ttml+xml' "
        "! ttmlsegmentedparse ! ttmlrender window-width=128 window-height=96 "
        "! appsink name=out")
    src = p.get_by_name("src")
    sink = p.get_by_name("out")
    assert p.play().name == "SUCCESS"
    src.push(Buffer(DOC.encode(), pts=0))
    src.end_of_stream()
    frames = []
    while (b := sink.try_pull_buffer(timeout=10)) is not None:
        frames.append((b.pts, np.asarray(b.data)))
    p.stop()
    assert frames, "no rendered frames from the segmented chain"
    # at least one interval has visible pixels
    assert any((img[..., 3] > 0).sum() > 20 for _, img in frames)


@pytest.mark.slow
def test_randomized_docs_roundtrip_property():
    """Property test: for randomized cue sets, re-parsing the segmented
    output yields the same (pts, duration, text) intervals as parsing the
    original document directly (seeded: failures reproduce)."""
    import numpy as np
    from flutpu.core import Buffer, Harness

    rng = np.random.default_rng(97)

    def parse(doc, element):
        h = Harness(element)
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer(doc.encode(), pts=0))
        h.push_eos()
        out = []
        while True:
            b = h.try_pull(timeout=0.5)
            if b is None:
                break
            out.append(b)
        h.teardown()
        return out

    for trial in range(4):
        n = int(rng.integers(2, 6))
        cues = []
        t = 0
        for i in range(n):
            t += int(rng.integers(0, 3))
            dur = int(rng.integers(1, 4))
            style = ' tts:fontWeight="bold"' if rng.integers(2) else ""
            cues.append(f'<p begin="{t}s" end="{t + dur}s">'
                        f'<span{style}>cue {trial}-{i}</span></p>')
            t += dur
        doc = ('<?xml version="1.0"?>'
               '<tt xmlns="http://www.w3.org/ns/ttml" '
               'xmlns:tts="http://www.w3.org/ns/ttml#styling"><body><div>'
               + "".join(cues) + "</div></body></tt>")

        direct = [(b.pts, b.duration, bytes(b.data).decode())
                  for b in parse(doc, "ttmlparse")]
        segs = parse(doc, "ttmlsegmentedparse")
        reparsed = []
        for s in segs:
            for b in parse(bytes(s.data).decode(), "ttmlparse"):
                # segment docs carry absolute interval times (reference
                # dump semantics) — b.pts is already stream-absolute
                if bytes(b.data).decode().strip():
                    reparsed.append((b.pts, b.duration,
                                     bytes(b.data).decode()))
        direct_text = [(p, d, t.strip()) for p, d, t in direct if t.strip()]
        assert len(reparsed) == len(direct_text), (trial, direct_text,
                                                   reparsed)
        for (p1, d1, t1), (p2, d2, t2) in zip(direct_text, reparsed):
            assert p1 == p2 and d1 == d2, (trial, (p1, d1), (p2, d2))
            # trailing-newline placement differs; markup content must match
            assert t1.strip() == t2.strip(), (trial, t1, t2)


def _plain_text(markup: str) -> str:
    """Strip pango-ish markup to bare text for content comparison."""
    import re
    return re.sub(r"<[^>]*>", "", markup).strip()


def _parse_texts(doc: str):
    h = Harness("ttmlparse")
    h.set_src_caps("application/ttml+xml")
    h.push(Buffer(doc.encode(), pts=0))
    h.push_eos()
    out = []
    while (b := h.try_pull(timeout=0.3)) is not None:
        out.append((b.pts, _plain_text(bytes(b.data).decode())))
    h.teardown()
    return out


def _corpus_docs():
    import os
    root = os.path.join(os.path.dirname(__file__), "ttml_corpus")
    for area in ("Animation", "Content", "Styling", "Timing", "EbuTtD"):
        d = os.path.join(root, area)
        for name in sorted(os.listdir(d)):
            if name.endswith(".xml"):
                yield f"{area}/{name[:-4]}", \
                    open(os.path.join(d, name)).read()


@pytest.mark.parametrize("key,doc", list(_corpus_docs()),
                         ids=[k for k, _ in _corpus_docs()])
def test_corpus_segmented_roundtrip_text(key, doc):
    """Corpus-wide round-trip property: re-parsing ttmlsegmentedparse's
    per-interval documents yields the same visible TEXT per interval as
    parsing the original (styling may re-serialize differently; text and
    timing must survive)."""
    orig = [(p, t) for p, t in _parse_texts(doc) if t]
    segs = run_segmented(doc)
    for pts, dur, seg_doc in segs:
        orig_here = [t for p, t in orig if p == pts]
        if not orig_here:
            continue  # blank/clearing intervals have no segment text
        re_texts = [t for _, t in _parse_texts(seg_doc) if t]
        assert re_texts, (key, pts, seg_doc[:200])
        # the re-parsed segment must reproduce the interval's text
        # (whitespace-normalized; a segment doc is one interval)
        a = " ".join(" ".join(re_texts).split())
        b = " ".join(" ".join(orig_here).split())
        assert a == b, (key, pts, a, b)
