"""Robustness fuzzing: every parser that consumes untrusted bytes must
fail cleanly (None / ValueError / zero output) — never crash, hang, or
emit garbage silently. Mirrors the defensive posture of the reference's
parsers (gstttmlbase.c SAX error paths, fludownloader outcome taxonomy).
All randomness is seeded — failures are reproducible."""

import numpy as np
import pytest

from flutpu.codec.decoders import parse_jfif
from flutpu.codec.fvc import MAGIC, FvcDecoder, FvcEncoder
from flutpu.core import Buffer, Caps, Harness, parse_launch


def _rng():
    return np.random.default_rng(61423)


class TestFvcFuzz:
    def test_random_bytes(self):
        rng = _rng()
        dec = FvcDecoder()
        for n in (0, 3, 12, 64, 513):
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            with pytest.raises(ValueError):
                dec.decode_chunk(blob)

    def test_magic_plus_garbage(self):
        rng = _rng()
        dec = FvcDecoder()
        for n in (1, 8, 40, 300):
            blob = MAGIC + rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            with pytest.raises((ValueError, Exception)):
                dec.decode_chunk(blob)

    def test_truncations_never_crash(self):
        """Every prefix-truncation of a valid chunk raises ValueError."""
        frames = np.random.default_rng(1).integers(
            0, 256, (3, 32, 32, 3), np.uint8)
        for motion in (False, True):
            chunk = FvcEncoder(quality=80, motion=motion).encode_chunk(frames)
            for cut in range(4, len(chunk) - 1, max(1, len(chunk) // 23)):
                with pytest.raises(ValueError):
                    FvcDecoder().decode_chunk(chunk[:cut])

    def test_bframes_truncations_never_crash(self):
        """B streams (flags bit 5: bquality byte, fwd+bwd+mode fields) —
        every prefix truncation raises ValueError too."""
        frames = np.random.default_rng(4).integers(
            0, 256, (4, 32, 32, 3), np.uint8)
        chunk = FvcEncoder(quality=80, motion=True,
                           bframes=1).encode_chunk(frames)
        for cut in range(4, len(chunk) - 1, max(1, len(chunk) // 31)):
            with pytest.raises(ValueError):
                FvcDecoder().decode_chunk(chunk[:cut])

    @pytest.mark.slow
    def test_bframes_bitflips_contained(self):
        """Single-byte corruptions of a B stream either raise ValueError
        or decode to the right shape — zlib'd vector/mode fields and the
        mode-plane selection must not escape containment."""
        frames = np.random.default_rng(5).integers(
            0, 256, (4, 32, 32, 3), np.uint8)
        chunk = bytearray(FvcEncoder(quality=80, motion=True,
                                     bframes=2).encode_chunk(frames))
        rng = _rng()
        for _ in range(32):
            pos = int(rng.integers(12, len(chunk)))
            orig = chunk[pos]
            chunk[pos] ^= 0xFF
            try:
                out, _ = FvcDecoder().decode_chunk(bytes(chunk))
                assert out.shape == frames.shape
            except ValueError:
                pass
            chunk[pos] = orig

    def test_bitflips_contained(self):
        """Single-byte corruptions either raise ValueError or decode to
        frames of the right shape — never crash with anything else."""
        frames = np.random.default_rng(2).integers(
            0, 256, (2, 32, 32, 3), np.uint8)
        chunk = bytearray(FvcEncoder(quality=80).encode_chunk(frames))
        rng = _rng()
        for _ in range(24):
            pos = int(rng.integers(12, len(chunk)))
            orig = chunk[pos]
            chunk[pos] ^= 0xFF
            try:
                out, _ = FvcDecoder().decode_chunk(bytes(chunk))
                assert out.shape == frames.shape
            except ValueError:
                pass
            chunk[pos] = orig

    @staticmethod
    def _with_coded_ext(chunk: bytes, pw: int, ph: int) -> bytes:
        """Rewrite a valid chunk to carry the flags-bit-4 coded-size
        extension (the round-4 spatial-striping header extension)."""
        import struct
        version, flags = chunk[4], chunk[5]
        off = 13 if version >= 2 else 12
        return (chunk[:5] + bytes([flags | 16]) + chunk[6:off]
                + struct.pack(">HH", pw, ph) + chunk[off:])

    @pytest.mark.slow
    def test_coded_size_extension_roundtrip(self):
        """bit4 with the natural macroblock padding decodes identically to
        the same stream without the extension (v1 and v2 header offsets)."""
        frames = np.random.default_rng(3).integers(
            0, 256, (3, 24, 40, 3), np.uint8)
        for motion in (False, True):
            chunk = FvcEncoder(quality=80, motion=motion).encode_chunk(frames)
            base, _ = FvcDecoder().decode_chunk(chunk)
            ext, _ = FvcDecoder().decode_chunk(
                self._with_coded_ext(chunk, 48, 32))  # _pad_to(40/24, 16)
            np.testing.assert_array_equal(base, ext)

    def test_coded_size_extension_truncated(self):
        frames = np.random.default_rng(4).integers(
            0, 256, (2, 24, 40, 3), np.uint8)
        chunk = FvcEncoder(quality=80).encode_chunk(frames)
        ext = self._with_coded_ext(chunk, 48, 32)
        for cut in (12, 13, 14, 15):  # inside the 4-byte extension
            with pytest.raises(ValueError):
                FvcDecoder().decode_chunk(ext[:cut])

    def test_coded_size_extension_invalid(self):
        """Coded sizes below the frame, non-multiples of the macroblock,
        or inconsistent with the payload are contained (ValueError or a
        right-shaped decode) — never a crash."""
        frames = np.random.default_rng(5).integers(
            0, 256, (2, 24, 40, 3), np.uint8)
        chunk = FvcEncoder(quality=80).encode_chunk(frames)
        for pw, ph in ((16, 8), (48, 16), (50, 32), (48, 33), (0, 0)):
            with pytest.raises(ValueError):
                FvcDecoder().decode_chunk(self._with_coded_ext(chunk, pw, ph))
        # a LARGER-than-coded geometry mismatches the payload's block count
        try:
            out, _ = FvcDecoder().decode_chunk(
                self._with_coded_ext(chunk, 64, 48))
            assert out.shape == frames.shape
        except ValueError:
            pass


class TestJfifFuzz:
    def test_random_bytes_return_none(self):
        rng = _rng()
        for n in (0, 1, 2, 16, 400):
            assert parse_jfif(rng.integers(0, 256, n,
                                           dtype=np.uint8).tobytes()) is None

    def test_soi_plus_garbage(self):
        rng = _rng()
        for n in (0, 2, 9, 64):
            blob = b"\xff\xd8" + rng.integers(
                0, 256, n, dtype=np.uint8).tobytes()
            # must terminate and return None or a dict — not raise/hang
            r = parse_jfif(blob)
            assert r is None or isinstance(r, dict)

    def test_truncated_real_jpeg(self):
        from flutpu.codec.jpeg import JpegEncoder
        frame = np.random.default_rng(3).integers(
            0, 256, (1, 32, 32, 3), np.uint8)
        payload = JpegEncoder(quality=80, engine="host").encode_gop(frame)[0]
        assert parse_jfif(payload) is not None
        for cut in (2, 10, 20, len(payload) // 2):
            r = parse_jfif(payload[:cut])
            assert r is None or isinstance(r, dict)


class TestCoreFuzz:
    def test_caps_garbage(self):
        for s in ("", ",,,", "a=b", "video/x-raw, =", "x, w=[", "t, a=1/0"):
            try:
                Caps.from_string(s)
            except (ValueError, ZeroDivisionError, KeyError):
                pass

    def test_parse_launch_garbage(self):
        for s in ("!", "! !", "a.b.c !", "identity !",
                  "identity prop", "[bracket] ! identity"):
            with pytest.raises((ValueError, KeyError)):
                parse_launch(s)

    def test_ttml_garbage_no_crash(self):
        rng = _rng()
        for _ in range(6):
            blob = rng.integers(0, 256, 200, dtype=np.uint8).tobytes()
            h = Harness("ttmlparse")
            h.set_src_caps("application/ttml+xml")
            h.push(Buffer(blob, pts=0))
            h.push_eos()
            while h.try_pull(timeout=0.2) is not None:
                pass
            h.teardown()

    def test_ttml_truncated_doc_no_crash(self):
        doc = (b"<?xml version='1.0'?><tt xmlns='http://www.w3.org/ns/ttml'>"
               b"<body><div><p begin='0s' end='1s'>hello</p></div></body></tt>")
        for cut in range(8, len(doc), 17):
            h = Harness("ttmlparse")
            h.set_src_caps("application/ttml+xml")
            h.push(Buffer(doc[:cut], pts=0))
            h.push_eos()
            while h.try_pull(timeout=0.2) is not None:
                pass
            h.teardown()

    def test_ttml_unknown_encoding_is_sax_error(self):
        """pyexpat raises LookupError (not ExpatError) for an unknown
        declared encoding — must be handled as a logged SAX error like
        libxml2, not escape the chain function (fuzz-found)."""
        doc = (b"<?xml version='1.0' encoding='u-8'?>"
               b"<tt xmlns='http://www.w3.org/ns/ttml'>"
               b"<body><div><p begin='0s' end='1s'>x</p></div></body></tt>")
        h = Harness("ttmlparse")
        h.set_src_caps("application/ttml+xml")
        ret = h.push(Buffer(doc, pts=0))
        h.push_eos()
        while h.try_pull(timeout=0.2) is not None:
            pass
        h.teardown()
        from flutpu.core import FlowReturn
        assert ret == FlowReturn.OK, ret

    @pytest.mark.slow
    def test_ttml_corpus_mutations_contained(self):
        """Structured mutations of REAL corpus documents (byte flips,
        truncation, slice delete/duplicate) through both ttmlparse and
        ttmlrender: mutated markup must never raise out of the element.
        A broader exploratory run (834 mutations x 2 elements, seeds 0-1)
        found exactly one escape class — the unknown-encoding LookupError
        pinned above."""
        import os
        corpus = os.path.join(os.path.dirname(__file__), "ttml_corpus")
        rng = _rng()
        docs = []
        for area in ("Content", "Styling", "Timing", "EbuTtD"):
            names = sorted(n for n in os.listdir(os.path.join(corpus, area))
                           if n.endswith(".xml"))
            for n in names[:3]:
                with open(os.path.join(corpus, area, n), "rb") as f:
                    docs.append(f.read())
        for data in docs:
            for _ in range(3):
                b = bytearray(data)
                kind = int(rng.integers(0, 4))
                if kind == 0:
                    for _ in range(int(rng.integers(1, 6))):
                        b[int(rng.integers(0, len(b)))] = \
                            int(rng.integers(0, 256))
                elif kind == 1:
                    b = b[:int(rng.integers(4, len(b)))]
                elif kind == 2:
                    i = int(rng.integers(0, len(b) - 8))
                    del b[i:i + int(rng.integers(1, 64))]
                else:
                    i = int(rng.integers(0, len(b) - 8))
                    j = i + int(rng.integers(1, 64))
                    b[int(rng.integers(0, len(b))):0] = b[i:j]
                for el in ("ttmlparse",
                           "ttmlrender window-width=160 window-height=120"):
                    h = Harness(el)
                    h.set_src_caps("application/ttml+xml")
                    h.push(Buffer(bytes(b), pts=0))
                    h.push_eos()
                    while h.try_pull(timeout=0.2) is not None:
                        pass
                    h.teardown()


class TestRenderHostileGeometry:
    """ttmlrender must clamp hostile region geometry, not crash or
    allocate absurd buffers."""

    def _render(self, region_attrs, body="x"):
        doc = ('<?xml version="1.0"?><tt xmlns="http://www.w3.org/ns/ttml" '
               'xmlns:tts="http://www.w3.org/ns/ttml#styling"><head><layout>'
               f'<region xml:id="r" {region_attrs}/></layout></head><body>'
               f'<div><p begin="0s" end="1s" region="r">{body}</p></div>'
               '</body></tt>')
        h = Harness("ttmlrender window-width=160 window-height=96")
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer(doc.encode(), pts=0))
        h.push_eos()
        frames = []
        while True:
            b = h.try_pull(timeout=2)
            if b is None:
                break
            frames.append(b)
        h.teardown()
        return frames

    def test_offscreen_origin(self):
        self._render('tts:origin="500% 500%" tts:extent="10% 10%"')

    def test_negative_origin(self):
        self._render('tts:origin="-50px -50px" tts:extent="80% 80%"')

    def test_zero_extent(self):
        self._render('tts:extent="0px 0px"')

    def test_huge_zindex_and_fontsize(self):
        self._render('tts:extent="50% 50%" tts:zIndex="2147483647"',
                     body='<span tts:fontSize="10000px">big</span>')


class TestJpegDecFuzz:
    def test_corrupt_scan_contained(self):
        """jpegdec on a valid JFIF with corrupted scan bytes: flow error
        or decoded frame — never a crash."""
        from flutpu.codec.jpeg import JpegEncoder
        frame = np.random.default_rng(9).integers(0, 256, (1, 32, 32, 3),
                                                  np.uint8)
        payload = bytearray(
            JpegEncoder(quality=80, engine="host").encode_gop(frame)[0])
        rng = _rng()
        sos = bytes(payload).find(b"\xff\xda")
        for _ in range(8):
            pos = int(rng.integers(sos + 14, len(payload) - 2))
            orig = payload[pos]
            payload[pos] ^= 0x55
            h = Harness("jpegdec")
            h.set_src_caps("image/jpeg")
            h.push(Buffer(bytes(payload), pts=0))
            h.push_eos()
            while h.try_pull(timeout=1) is not None:
                pass
            h.teardown()
            payload[pos] = orig


class TestAviFuzz:
    """RIFF/AVI reader (codec/avimux.parse_avi) against hostile bytes —
    the container walker recurses over attacker-controlled offsets."""

    def _real_avi(self):
        from flutpu.codec.avimux import AviMux
        from flutpu.core import MSECOND
        h = Harness("avimux")
        h.set_src_caps("image/jpeg, width=16, height=16, framerate=30/1")
        for i in range(3):
            h.push(Buffer(b"\xff\xd8" + bytes(range(40)) + b"\xff\xd9",
                          pts=i * MSECOND, duration=MSECOND, offset=i))
        h.push_eos()
        out = b""
        while (b := h.try_pull(timeout=2)) is not None:
            out += bytes(b.data)
        h.teardown()
        return out

    def test_random_bytes_return_none_or_empty(self):
        from flutpu.codec.avimux import parse_avi
        rng = _rng()
        for n in (0, 4, 12, 64, 4096):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            r = parse_avi(data)
            assert r is None or isinstance(r, dict)

    def test_riff_header_plus_garbage(self):
        from flutpu.codec.avimux import parse_avi
        rng = _rng()
        for n in (0, 8, 100, 2000):
            body = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            import struct as _s
            data = b"RIFF" + _s.pack("<I", n + 4) + b"AVI " + body
            r = parse_avi(data)  # must not crash/hang on bogus sizes
            assert r is None or isinstance(r, dict)

    def test_truncations_never_crash(self):
        from flutpu.codec.avimux import parse_avi
        real = self._real_avi()
        assert parse_avi(real) and len(parse_avi(real)["frames"]) == 3
        for cut in range(0, len(real), 7):
            parse_avi(real[:cut])  # any prefix: clean result or None

    def test_bitflips_contained(self):
        from flutpu.codec.avimux import parse_avi
        real = bytearray(self._real_avi())
        rng = _rng()
        for _ in range(200):
            i = int(rng.integers(0, len(real)))
            bit = 1 << int(rng.integers(0, 8))
            real[i] ^= bit
            try:
                parse_avi(bytes(real))  # never crash; content may be junk
            finally:
                real[i] ^= bit

    def test_size_overflow_chunks(self):
        """Chunk sizes near 2^32 must not hang the walker or allocate."""
        import struct as _s
        from flutpu.codec.avimux import parse_avi
        evil = (b"RIFF" + _s.pack("<I", 0xFFFFFFF0) + b"AVI "
                + b"LIST" + _s.pack("<I", 0xFFFFFFF0) + b"movi"
                + b"00dc" + _s.pack("<I", 0xFFFFFFF0) + b"x" * 32)
        r = parse_avi(evil)
        assert r is None or isinstance(r, dict)


class TestHttpResponseFuzz:
    """The NATIVE downloader's HTTP response parser against hostile
    servers — a parser crash here is a process segfault, not an
    exception. Every response must produce a clean outcome."""

    def _serve_and_fetch(self, payloads, timeout_ms=2000):
        import socket
        import threading
        from flutpu.io import DownloadHelper

        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(8)
        port = srv.getsockname()[1]
        stop = threading.Event()

        def loop():
            srv.settimeout(0.2)
            i = 0
            while not stop.is_set():
                try:
                    conn, _ = srv.accept()
                except OSError:
                    continue
                try:
                    conn.recv(4096)
                    conn.sendall(payloads[min(i, len(payloads) - 1)])
                except OSError:
                    pass
                finally:
                    conn.close()
                i += 1

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        outcomes = []
        try:
            with DownloadHelper() as h:
                h._dl.set_timeouts(1000, timeout_ms)
                for _ in payloads:
                    _, outcome, _ = h.download(f"http://127.0.0.1:{port}/x",
                                               timeout=8)
                    outcomes.append(outcome)
        finally:
            stop.set()
            srv.close()
        return outcomes

    def test_random_bytes_responses(self):
        rng = _rng()
        payloads = [bytes(rng.integers(0, 256, n, dtype=np.uint8))
                    for n in (0, 1, 37, 512)]
        outcomes = self._serve_and_fetch(payloads)
        assert len(outcomes) == len(payloads)  # no crash/hang

    def test_malformed_headers(self):
        payloads = [
            b"HTTP/1.1 200 OK\r\nContent-Length: -5\r\n\r\nxx",
            b"HTTP/1.1 200 OK\r\nContent-Length: 99999999999999\r\n\r\nxx",
            b"HTTP/1.1 \r\n\r\n",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzzzz\r\n",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"ffffffff\r\nhi\r\n",
            b"HTTP/1.1 301 Moved\r\n\r\n",  # redirect with NO Location
        ]
        outcomes = self._serve_and_fetch(payloads)
        assert len(outcomes) == len(payloads)

    def test_location_header_garbage(self):
        """Hostile Location values must not crash the resolver."""
        payloads = [
            b"HTTP/1.1 302 Found\r\nLocation: \r\n\r\n",
            b"HTTP/1.1 302 Found\r\nLocation: ht!tp://\xff\xfe\r\n\r\n",
            b"HTTP/1.1 302 Found\r\nLocation: //\r\n\r\n",
            b"HTTP/1.1 302 Found\r\nLocation: :::::::\r\n\r\n",
        ]
        outcomes = self._serve_and_fetch(payloads)
        assert len(outcomes) == len(payloads)


class TestTtmlHostileStructures:
    """Structurally hostile (well-formed) TTML: reference loops, missing
    targets, absurd values — parse must terminate with sane output."""

    def _parse(self, doc, timeout=2.0):
        h = Harness("ttmlparse")
        h.set_src_caps("application/ttml+xml")
        h.push(Buffer(doc.encode(), pts=0))
        h.push_eos()
        out = []
        while (b := h.try_pull(timeout=timeout)) is not None:
            out.append(bytes(b.data).decode())
        h.teardown()
        return out

    TT = ('<tt xmlns="http://www.w3.org/ns/ttml" '
          'xmlns:tts="http://www.w3.org/ns/ttml#styling">')

    def test_style_reference_cycle_terminates(self):
        doc = f"""<?xml version="1.0"?>{self.TT}
<head><styling>
  <style xml:id="a" style="b" tts:color="red"/>
  <style xml:id="b" style="a" tts:fontWeight="bold"/>
</styling></head>
<body><div><p begin="0s" end="1s" style="a">x</p></div></body></tt>"""
        out = self._parse(doc)
        assert any("x" in t for t in out)

    def test_self_referencing_style(self):
        doc = f"""<?xml version="1.0"?>{self.TT}
<head><styling><style xml:id="s" style="s" tts:color="lime"/></styling>
</head><body><div><p begin="0s" end="1s" style="s">y</p></div></body></tt>"""
        out = self._parse(doc)
        assert any("y" in t for t in out)

    def test_undefined_style_and_region_refs(self):
        doc = f"""<?xml version="1.0"?>{self.TT}
<body><div><p begin="0s" end="1s" style="ghost" region="nowhere">z</p>
</div></body></tt>"""
        out = self._parse(doc)
        assert any("z" in t for t in out)

    def test_absurd_times_and_depth(self):
        deep = "<span>" * 40 + "deep" + "</span>" * 40
        doc = f"""<?xml version="1.0"?>{self.TT}
<body><div>
  <p begin="999999999s" end="9999999999s">far future</p>
  <p begin="2s" end="1s">negative duration</p>
  <p begin="0s" end="1s">{deep}</p>
</div></body></tt>"""
        self._parse(doc)  # must terminate without raising

    def test_huge_attribute_values(self):
        doc = f"""<?xml version="1.0"?>{self.TT}
<body><div><p begin="0s" end="1s"
  tts:fontSize="{'9' * 500}px" tts:zIndex="{'9' * 100}">big</p>
</div></body></tt>"""
        self._parse(doc)
