"""fluc + downloader tests: primitives, bwmeter EWMA semantics, file and
HTTP downloads against a local server (the reference ships no downloader
unit tests — its examples become real tests here)."""

import http.server
import os
import threading
import time

import pytest

from flutpu.fluc import Barrier, Monitor, Mutex
from flutpu.fluc.bwmeter import BwMeter
from flutpu.io import (DownloadHelper, Downloader, SslStatus, TaskOutcome,
                       download_sync, outcome_string)
from flutpu import native


class TestThreads:
    def test_mutex(self):
        m = Mutex()
        with m:
            pass
        assert m.trylock()
        m.unlock()

    def test_monitor_signal(self):
        mon = Monitor()
        hits = []

        def waiter():
            with mon:
                mon.wait(timeout_ms=5000)
                hits.append(1)

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)
        with mon:
            mon.signal()
        t.join(timeout=5)
        assert hits == [1]

    def test_barrier_gate(self):
        b = Barrier(open_=False)
        passed = []

        def runner():
            b.pass_()
            passed.append(1)

        t = threading.Thread(target=runner)
        t.start()
        time.sleep(0.05)
        assert passed == []
        b.set_open(True)
        t.join(timeout=5)
        assert passed == [1]

    def test_barrier_trypass_timeout(self):
        b = Barrier(open_=False)
        t0 = time.monotonic()
        assert not b.trypass_for(100)
        assert time.monotonic() - t0 >= 0.09
        b.set_open(True)
        assert b.trypass_for(100)


class TestBwMeter:
    def test_windowed_rate(self):
        m = BwMeter()
        m.session_start()
        t = 0.0
        m.data(0, _now=t)
        m.data(128 * 1024, _now=t + 0.2)  # window closes: 128KiB/0.2s
        raw, avg, total = m.stats()
        assert raw == pytest.approx(128 * 1024 * 8 / 0.2)
        assert avg == raw
        assert total == 128 * 1024

    def test_asymmetric_ewma(self):
        m = BwMeter()
        m.session_start()
        # first window: 8 Mbps
        m.data(0, _now=0.0)
        m.data(200 * 1024, _now=0.2)
        first = m.stats()[1]
        # drop: next window 10x slower → avg falls instantly (alpha 1.0)
        m.data(20 * 1024, _now=0.75)
        raw2, avg2, _ = m.stats()
        assert avg2 == pytest.approx(raw2)
        # rise: fast window again → avg rises slowly (alpha 0.2)
        m.data(400 * 1024, _now=1.0)
        raw3, avg3, _ = m.stats()
        assert avg3 < raw3
        assert avg3 == pytest.approx(avg2 + 0.2 * (raw3 - avg2))

    def test_sock_variant_isolated_from_global(self):
        """SockBwMeter (reference fluc_bwmeter_sock.c:14-35): an
        instantiable per-connection meter whose reads also feed the
        global singleton by default."""
        import socket
        from flutpu.fluc.bwmeter import SockBwMeter, bwmeter
        a, b = socket.socketpair()
        try:
            m = SockBwMeter(feed_global=True)
            g0 = bwmeter.stats()[2]
            payload = b"x" * 4096
            a.sendall(payload)
            got = b""
            while len(got) < len(payload):
                got += m.recv(b, 65536)
            assert got == payload
            # instance meter saw exactly this connection's bytes
            assert m.stats()[2] == len(payload)
            # the global singleton's total advanced by the same amount
            assert bwmeter.stats()[2] - g0 >= len(payload)
            m.close()
        finally:
            a.close()
            b.close()

    def test_sock_variant_no_global_feed(self):
        from flutpu.fluc.bwmeter import SockBwMeter, bwmeter
        m = SockBwMeter(feed_global=False)
        g0 = bwmeter.stats()[2]
        m.data(1234)
        assert m.stats()[2] == 1234
        assert bwmeter.stats()[2] == g0
        m.close()


@pytest.fixture(scope="module")
def http_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    (root / "hello.txt").write_bytes(b"hello downloader" * 100)
    (root / "big.bin").write_bytes(os.urandom(300 * 1024))

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

        def _redirect(self, status, location):
            self.send_response(status)
            self.send_header("Location", location)
            body = b"<a>moved</a>"  # redirect stub body, must never surface
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            # redirect endpoints (reference follows redirects via
            # CURLOPT_FOLLOWLOCATION, fludownloader.c:733-734)
            if self.path.startswith("/chain/"):
                n = int(self.path.rsplit("/", 1)[-1])
                if n <= 0:
                    self._redirect(302, "/hello.txt")      # absolute-path
                else:
                    self._redirect(301, f"/chain/{n - 1}")
                return
            if self.path == "/rel":
                self._redirect(302, "hello.txt")           # relative-path
                return
            if self.path == "/abs":
                host = self.headers.get("Host")
                self._redirect(303, f"http://{host}/hello.txt")  # absolute
                return
            if self.path == "/r307range":
                self._redirect(307, "/big.bin")
                return
            if self.path == "/loop":
                self._redirect(302, "/loop")
                return
            if self.path == "/rcookie":
                self._redirect(302, "/cookiecheck")
                return
            if self.path == "/search/results":
                # query-only Location keeps the WHOLE base path
                # (RFC 3986: a "?page=2" reference resolves against
                # /search/results, not /search/)
                self._redirect(302, "?page=2")
                return
            if self.path == "/search/results?page=2":
                body = b"page two"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/dots":
                self._redirect(302, "/sub/../hello.txt")   # dot segments
                return
            if self.path == "/noloc":
                # 3xx WITHOUT Location: not followable — the body is the
                # response (matches curl FOLLOWLOCATION / the native
                # downloader: delivered with outcome OK)
                body = b"not really moved"
                self.send_response(302)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path.startswith("/rto/"):
                self._redirect(302, self.path[4:])
                return
            if self.path.startswith("/enc/"):
                # Content-Encoding endpoints. A well-behaved server only
                # compresses when the client advertises support — so the
                # native client (which sends Accept-Encoding like
                # CURLOPT_ACCEPT_ENCODING "") gets compressed bytes and
                # decodes them, while the urllib fallback gets identity.
                import gzip as _gzip
                import zlib as _zlib
                kind = self.path[5:]
                raw = (root / ("big.bin" if kind == "gzipbig"
                               else "hello.txt")).read_bytes()
                ae = self.headers.get("Accept-Encoding", "")
                if "gzip" not in ae:
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(raw)))
                    self.end_headers()
                    self.wfile.write(raw)
                    return
                if kind in ("gzip", "gzipbig"):
                    body, enc = _gzip.compress(raw), "gzip"
                elif kind == "deflate":
                    body, enc = _zlib.compress(raw), "deflate"
                elif kind == "deflraw":
                    co = _zlib.compressobj(9, _zlib.DEFLATED, -15)
                    body, enc = co.compress(raw) + co.flush(), "deflate"
                elif kind == "trunc":
                    full = _gzip.compress(raw)
                    body, enc = full[:len(full) // 2], "gzip"
                elif kind == "bad":
                    full = bytearray(_gzip.compress(raw))
                    full[len(full) // 2] ^= 0xFF
                    body, enc = bytes(full), "gzip"
                else:
                    self.send_error(404)
                    return
                self.send_response(200)
                self.send_header("Content-Encoding", enc)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if self.path == "/cookiecheck":
                body = self.headers.get("Cookie", "").encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                path = self.translate_path(self.path)
                try:
                    with open(path, "rb") as f:
                        data = f.read()
                except OSError:
                    self.send_error(404)
                    return
                a, _, b = rng[6:].partition("-")
                start = int(a)
                end = int(b) if b else len(data) - 1
                body = data[start:end + 1]
                self.send_response(206)
                self.send_header("Content-Length", str(len(body)))
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}")
                self.end_headers()
                self.wfile.write(body)
                return
            super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", root
    srv.shutdown()


@pytest.mark.parametrize("force_python", [False, True])
class TestDownloader:
    def test_file_url(self, http_server, force_python, tmp_path):
        p = tmp_path / "data.bin"
        payload = os.urandom(50000)
        p.write_bytes(payload)
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"file://{p}")
        assert outcome == TaskOutcome.OK
        assert data == payload

    def test_file_not_found(self, http_server, force_python):
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download("file:///nonexistent/nope.bin")
        assert data is None
        assert outcome in (TaskOutcome.FILE_NOT_FOUND, TaskOutcome.ERROR)

    def test_http_get(self, http_server, force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/hello.txt")
        assert outcome == TaskOutcome.OK
        assert status == 200
        assert data == (root / "hello.txt").read_bytes()

    def test_http_404(self, http_server, force_python):
        base, _ = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/missing.txt")
        assert outcome == TaskOutcome.HTTP_ERROR
        assert status == 404

    def test_http_range(self, http_server, force_python):
        base, root = http_server
        full = (root / "big.bin").read_bytes()
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/big.bin",
                                               range="100-199")
        assert outcome == TaskOutcome.OK
        assert data == full[100:200]

    def test_sequence_in_order(self, http_server, force_python):
        base, root = http_server
        done = []
        ev = threading.Event()

        def done_cb(outcome, status, size, task):
            done.append(task.url.rsplit("/", 1)[-1])
            if len(done) == 3:
                ev.set()

        dl = Downloader(None, done_cb, force_python=force_python)
        try:
            dl.new_task(f"{base}/hello.txt")
            dl.new_task(f"{base}/big.bin")
            dl.new_task(f"{base}/hello.txt")
            assert ev.wait(20)
            assert done == ["hello.txt", "big.bin", "hello.txt"]
        finally:
            dl.destroy()

    def test_fault_injection(self, http_server, force_python):
        base, _ = http_server
        outcomes = []
        ev = threading.Event()

        def done_cb(outcome, status, size, task):
            outcomes.append(outcome)
            ev.set()

        dl = Downloader(None, done_cb, force_python=force_python)
        try:
            t = dl.new_task(f"{base}/hello.txt")
            t.set_outcome(TaskOutcome.TIMEOUT)
            ev.wait(10)
        finally:
            dl.destroy()
        # forced outcome observed (worker may have already completed the
        # real download on fast paths; both are legal per the reference)
        assert outcomes and outcomes[0] in (TaskOutcome.TIMEOUT,
                                            TaskOutcome.OK)

    def test_outcome_string(self, http_server, force_python):
        assert outcome_string(TaskOutcome.TIMEOUT) == "TIMEOUT"


@pytest.mark.parametrize("force_python", [False, True])
class TestRedirects:
    """Redirect following (reference: CURLOPT_FOLLOWLOCATION,
    fludownloader.c:733-734): 301/302/303/307/308, relative and absolute
    Location forms, hop cap, range/cookie reapplication."""

    def test_redirect_chain(self, http_server, force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/chain/2")
        assert outcome == TaskOutcome.OK
        assert status == 200
        assert data == (root / "hello.txt").read_bytes()

    def test_redirect_relative_location(self, http_server, force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/rel")
        assert outcome == TaskOutcome.OK
        assert data == (root / "hello.txt").read_bytes()

    def test_redirect_absolute_303(self, http_server, force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/abs")
        assert outcome == TaskOutcome.OK
        assert data == (root / "hello.txt").read_bytes()

    def test_redirect_307_reapplies_range(self, http_server, force_python):
        base, root = http_server
        full = (root / "big.bin").read_bytes()
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/r307range",
                                          range="100-199")
        assert outcome == TaskOutcome.OK
        assert data == full[100:200]

    def test_redirect_loop_hits_hop_cap(self, http_server, force_python):
        base, _ = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/loop")
        assert data is None
        assert outcome == TaskOutcome.TOO_MANY_REDIRECTS

    def test_redirect_stub_body_never_delivered(self, http_server,
                                                force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/chain/1")
        assert outcome == TaskOutcome.OK
        assert b"moved" not in data
        assert data == (root / "hello.txt").read_bytes()

    def test_redirect_query_only_location(self, http_server, force_python):
        """RFC 3986: a '?page=2' reference keeps the ENTIRE base path —
        /search/results, not the parent directory /search/."""
        base, _ = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/search/results")
        assert outcome == TaskOutcome.OK
        assert status == 200
        assert data == b"page two"

    def test_redirect_dot_segments_normalized(self, http_server,
                                              force_python):
        base, root = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/dots")
        assert outcome == TaskOutcome.OK
        assert data == (root / "hello.txt").read_bytes()

    def test_redirect_without_location_delivers_body(self, http_server,
                                                     force_python):
        """A Location-less 3xx is not followable: the response body IS the
        download (curl FOLLOWLOCATION behavior), not TOO_MANY_REDIRECTS."""
        base, _ = http_server
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/noloc")
        assert outcome == TaskOutcome.OK
        assert status == 302
        assert data == b"not really moved"

    def test_redirect_reapplies_cookies(self, http_server, force_python):
        if force_python:
            pytest.skip("cookies are a native-session feature")
        base, _ = http_server
        with DownloadHelper(cookies="sid=abc123",
                            force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/rcookie")
        assert outcome == TaskOutcome.OK
        assert data == b"sid=abc123"


@pytest.mark.parametrize("force_python", [False, True])
class TestHeaderCapture:
    """Task.raw_headers / Task.date survive task completion (reference:
    fludownloader_task_get_header / _get_date, fludownloader.h)."""

    def test_headers_and_date_on_done(self, http_server, force_python):
        base, _ = http_server
        captured = {}

        def done(outcome, status, size, task):
            captured["headers"] = task.raw_headers
            captured["date"] = task.date
            return False

        dl = Downloader(None, done, force_python=force_python)
        try:
            dl.new_task(f"{base}/hello.txt")
            for _ in range(200):
                if captured:
                    break
                time.sleep(0.05)
        finally:
            dl.destroy()
        assert "hello.txt" not in captured["headers"]  # headers, not body
        assert "Content-Length" in captured["headers"] \
            or "content-length" in captured["headers"].lower()
        assert captured["date"]  # SimpleHTTPRequestHandler sends Date


@pytest.mark.parametrize("force_python", [False, True])
class TestContentEncoding:
    """Transparent gzip/deflate decode (reference: CURLOPT_ACCEPT_ENCODING
    "", fludownloader.c:748 — libcurl advertises all built-in codings and
    decompresses before the write callback). The native client advertises
    and decodes; the urllib fallback doesn't advertise, so the server
    sends identity — either way callers receive identity bytes."""

    @pytest.mark.parametrize("kind", ["gzip", "deflate", "deflraw",
                                      "gzipbig"])
    def test_roundtrip_is_identity(self, http_server, force_python, kind):
        base, root = http_server
        name = "big.bin" if kind == "gzipbig" else "hello.txt"
        with DownloadHelper(force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/enc/{kind}")
        assert outcome == TaskOutcome.OK
        assert status == 200
        assert data == (root / name).read_bytes()

    def test_truncated_gzip_is_decode_error(self, http_server,
                                            force_python):
        if force_python:
            pytest.skip("urllib arm never receives compressed bytes")
        base, _ = http_server
        with DownloadHelper() as h:
            data, outcome, _ = h.download(f"{base}/enc/trunc")
        assert data is None
        assert outcome == TaskOutcome.DECODE_ERROR

    def test_corrupt_gzip_is_decode_error(self, http_server, force_python):
        if force_python:
            pytest.skip("urllib arm never receives compressed bytes")
        base, _ = http_server
        with DownloadHelper() as h:
            data, outcome, _ = h.download(f"{base}/enc/bad")
        assert data is None
        assert outcome == TaskOutcome.DECODE_ERROR

    def test_chunked_gzip_composes(self, http_server, force_python):
        """Transfer-Encoding: chunked carrying a gzip Content-Encoding —
        the chunked framing is removed first, then the payload inflates
        (RFC 9110 ordering)."""
        if force_python:
            pytest.skip("urllib arm never receives compressed bytes")
        import gzip as _gzip
        import socket

        base, root = http_server
        raw = (root / "hello.txt").read_bytes()
        gz = _gzip.compress(raw)

        def serve(conn):
            conn.recv(65536)
            out = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
                   b"Transfer-Encoding: chunked\r\n\r\n")
            # adversarial framing: 7-byte chunks split the gzip header
            for i in range(0, len(gz), 7):
                piece = gz[i:i + 7]
                out += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
            out += b"0\r\n\r\n"
            conn.sendall(out)
            conn.close()

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        t = threading.Thread(
            target=lambda: serve(srv.accept()[0]), daemon=True)
        t.start()
        try:
            with DownloadHelper() as h:
                data, outcome, _ = h.download(
                    f"http://127.0.0.1:{port}/x", timeout=30)
        finally:
            srv.close()
        assert outcome == TaskOutcome.OK
        assert data == raw


class TestRedirectedImageThroughRenderer:
    def test_ttmlrender_fetches_redirected_background_image(
            self, http_server):
        """End-to-end: a TTML backgroundImage URL behind a 302 renders the
        real image, not the redirect stub (the round-3 gap: a redirect was
        treated as a successful download of the stub)."""
        import io as _io

        import numpy as np
        from PIL import Image

        from flutpu.core import Buffer
        from flutpu.core.harness import Harness

        base, root = http_server
        img = Image.new("RGBA", (8, 8), (0, 255, 0, 255))
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        (root / "green.png").write_bytes(buf.getvalue())

        doc = f"""<?xml version="1.0"?>
<tt xmlns="http://www.w3.org/ns/ttml"
    xmlns:tts="http://www.w3.org/ns/ttml#styling"
    xmlns:smpte="http://www.smpte-ra.org/schemas/2052-1/2010/smpte-tt">
  <head><layout>
    <region xml:id="r1" tts:origin="0% 0%" tts:extent="50% 50%"
            smpte:backgroundImage="{base}/rto/green.png"/>
  </layout></head>
  <body><div><p begin="0s" end="1s" region="r1">x</p></div></body>
</tt>
"""
        h_el = Harness("ttmlrender window-width=64 window-height=48")
        h_el.set_src_caps("application/ttml+xml")
        h_el.push(Buffer(doc.encode(), pts=0))
        h_el.push_eos()
        b = h_el.try_pull(timeout=5.0)
        h_el.teardown()
        assert b is not None
        out = np.asarray(b.data)
        greens = (out[..., 1] > 200) & (out[..., 2] < 64) & (out[..., 3] > 0)
        assert greens.sum() >= 32


class TestNativeDownloaderSpecifics:
    def test_native_lib_available(self):
        import os
        if os.environ.get("FLUTPU_NO_NATIVE"):
            pytest.skip("native disabled via FLUTPU_NO_NATIVE")
        assert native.get_lib() is not None, \
            "native library must build in this environment"

    def test_connection_refused(self):
        with DownloadHelper() as h:
            data, outcome, _ = h.download("http://127.0.0.1:1/x", timeout=15)
        assert outcome in (TaskOutcome.CONNECTION_REFUSED,
                           TaskOutcome.COULD_NOT_CONNECT,
                           TaskOutcome.ERROR)

    @pytest.mark.parametrize("split_mode", ["whole", "terminator_split",
                                            "byte_dribble"])
    def test_chunked_transfer_adversarial_splits(self, split_mode):
        """Chunked encoding with the CRLF chunk terminator (and even the
        size lines) split across recv() boundaries — regression for the
        round-1 mis-framing bug where a leftover terminator was fed to the
        size-line parser and payload bytes were silently corrupted."""
        import socket

        chunks = [b"A" * 7, b"B" * 1, b"chunk-three" * 20, b"Z" * 64]
        expect = b"".join(chunks)

        def serve(conn):
            conn.recv(4096)  # request
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

            def send(b, pause=0.0):
                conn.sendall(b)
                if pause:
                    time.sleep(pause)

            send(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n",
                 0.05)
            for c in chunks:
                size_line = f"{len(c):x}\r\n".encode()
                if split_mode == "whole":
                    send(size_line + c + b"\r\n")
                elif split_mode == "terminator_split":
                    # payload ends the send; CRLF terminator arrives alone,
                    # one byte at a time, in later recv()s
                    send(size_line, 0.03)
                    send(c, 0.03)
                    send(b"\r", 0.03)
                    send(b"\n", 0.03)
                else:  # byte_dribble: everything one byte at a time
                    for byte in size_line + c + b"\r\n":
                        send(bytes([byte]), 0.002)
            send(b"0\r\n\r\n")
            conn.close()

        srv = socket.create_server(("127.0.0.1", 0))
        port = srv.getsockname()[1]

        def accept_loop():
            conn, _ = srv.accept()
            serve(conn)

        t = threading.Thread(target=accept_loop, daemon=True)
        t.start()
        try:
            with DownloadHelper() as h:
                data, outcome, status = h.download(
                    f"http://127.0.0.1:{port}/chunked", timeout=30)
            assert outcome == TaskOutcome.OK
            assert status == 200
            assert data == expect
        finally:
            srv.close()

    def test_chunked_no_stale_state_across_tasks(self):
        """An aborted chunked transfer must not leak buffered bytes into
        the next chunked download on the same session (round-1 ADVICE:
        thread_local cbuf persisted across tasks)."""
        import socket

        def serve_truncated(conn):
            conn.recv(4096)
            conn.sendall(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked"
                         b"\r\n\r\n10\r\nonly-part")  # declared 16, sent 9
            time.sleep(0.05)
            conn.close()  # mid-chunk EOF → RECV_ERROR

        def serve_good(conn):
            conn.recv(4096)
            conn.sendall(b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked"
                         b"\r\n\r\n5\r\nhello\r\n0\r\n\r\n")
            conn.close()

        srv = socket.create_server(("127.0.0.1", 0))
        port = srv.getsockname()[1]

        def accept_loop():
            for fn in (serve_truncated, serve_good):
                conn, _ = srv.accept()
                fn(conn)

        t = threading.Thread(target=accept_loop, daemon=True)
        t.start()
        try:
            with DownloadHelper() as h:
                _, outcome1, _ = h.download(
                    f"http://127.0.0.1:{port}/bad", timeout=30)
                data2, outcome2, _ = h.download(
                    f"http://127.0.0.1:{port}/good", timeout=30)
            assert outcome1 == TaskOutcome.RECV_ERROR
            assert outcome2 == TaskOutcome.OK
            assert data2 == b"hello"
        finally:
            srv.close()

    def test_pause_resume(self, http_server):
        base, root = http_server
        got = []
        ev = threading.Event()
        dl = Downloader(lambda d, t: got.append(len(d)) or True,
                        lambda o, s, n, t: ev.set() or None)
        try:
            dl.pause()
            dl.new_task(f"{base}/big.bin")
            time.sleep(0.3)
            before = sum(got)
            dl.resume()
            assert ev.wait(20)
            assert sum(got) == (root / "big.bin").stat().st_size
            assert before < sum(got)
        finally:
            dl.destroy()


# ---------------------------------------------------------------------------
# TLS + proxy (reference: curl SSL/proxy setup, fludownloader.c:710-748 and
# the SSL status taxonomy, fludownloader.h:50-82)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    """Local HTTPS server with a freshly generated self-signed cert for
    'localhost' (the cryptography package is in the image)."""
    import datetime
    import ssl
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    root = tmp_path_factory.mktemp("tls-www")
    (root / "secure.txt").write_bytes(b"over TLS" * 400)
    certdir = tmp_path_factory.mktemp("certs")
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "localhost")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=10))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    certfile = certdir / "cert.pem"
    keyfile = certdir / "key.pem"
    certfile.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    keyfile.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption()))

    class Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(root), **kw)

        def log_message(self, *a):
            pass

        def do_GET(self):
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                with open(self.translate_path(self.path), "rb") as f:
                    data = f.read()
                a, _, b = rng[6:].partition("-")
                start = int(a)
                end = int(b) if b else len(data) - 1
                body = data[start:end + 1]
                self.send_response(206)
                self.send_header("Content-Length", str(len(body)))
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}")
                self.end_headers()
                self.wfile.write(body)
                return
            super().do_GET()

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    sctx = __import__("ssl").SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(str(certfile), str(keyfile))
    srv.socket = sctx.wrap_socket(srv.socket, server_side=True)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield (f"https://localhost:{srv.server_address[1]}", root, str(certfile))
    srv.shutdown()


@pytest.mark.parametrize("force_python", [False, True])
class TestTls:
    def test_https_get(self, tls_server, force_python):
        base, root, ca = tls_server
        with DownloadHelper(ca_file=ca, force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/secure.txt")
        assert outcome == TaskOutcome.OK
        assert status == 200
        assert data == (root / "secure.txt").read_bytes()

    def test_https_untrusted_ca_fails_with_status(self, tls_server,
                                                  force_python):
        base, _, _ = tls_server
        done = threading.Event()
        seen = {}

        def done_cb(outcome, status, size, task):
            seen["outcome"] = outcome
            seen["ssl_status"] = task.ssl_status
            done.set()

        dl = Downloader(lambda d, t: True, done_cb,
                        force_python=force_python)
        try:
            dl.new_task(f"{base}/secure.txt")
            assert done.wait(30)
        finally:
            dl.destroy()
        assert seen["outcome"] == TaskOutcome.SSL_ERROR
        assert seen["ssl_status"] == SslStatus.CACERT

    def test_https_verify_off(self, tls_server, force_python):
        base, root, _ = tls_server
        with DownloadHelper(ssl_verify=False,
                            force_python=force_python) as h:
            data, outcome, _ = h.download(f"{base}/secure.txt")
        assert outcome == TaskOutcome.OK
        assert data == (root / "secure.txt").read_bytes()

    def test_https_range(self, tls_server, force_python):
        base, root, ca = tls_server
        full = (root / "secure.txt").read_bytes()
        with DownloadHelper(ca_file=ca, force_python=force_python) as h:
            data, outcome, status = h.download(f"{base}/secure.txt",
                                               range="10-99")
        assert outcome == TaskOutcome.OK
        assert data == full[10:100]


@pytest.fixture()
def mini_proxy():
    """Minimal HTTP proxy: absolute-URI GET forwarding + CONNECT tunnels.
    Records what it served so tests can assert traffic went through it."""
    import socket
    import urllib.request

    served = {"abs": 0, "connect": 0}
    srv = socket.create_server(("127.0.0.1", 0))
    srv.settimeout(30)
    port = srv.getsockname()[1]
    running = [True]

    def pump(a, b):
        try:
            while True:
                d = a.recv(65536)
                if not d:
                    break
                b.sendall(d)
        except OSError:
            pass
        finally:
            try:
                b.shutdown(socket.SHUT_WR)
            except OSError:
                pass

    def handle(conn):
        try:
            req = b""
            while b"\r\n\r\n" not in req:
                d = conn.recv(4096)
                if not d:
                    return
                req += d
            line = req.split(b"\r\n", 1)[0].decode()
            method, target, _ = line.split(" ", 2)
            if method == "CONNECT":
                served["connect"] += 1
                host, _, p = target.partition(":")
                up = socket.create_connection((host, int(p)), timeout=10)
                conn.sendall(b"HTTP/1.1 200 Connection established\r\n\r\n")
                t1 = threading.Thread(target=pump, args=(conn, up),
                                      daemon=True)
                t1.start()
                pump(up, conn)
                t1.join(5)
                up.close()
            elif method == "GET" and target.startswith("http://"):
                served["abs"] += 1
                with urllib.request.urlopen(target, timeout=10) as r:
                    body = r.read()
                conn.sendall(b"HTTP/1.1 200 OK\r\nContent-Length: "
                             + str(len(body)).encode()
                             + b"\r\nConnection: close\r\n\r\n" + body)
        except Exception:
            pass
        finally:
            conn.close()

    def loop():
        while running[0]:
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    yield f"127.0.0.1:{port}", served
    running[0] = False
    srv.close()


class TestProxy:
    def test_http_via_proxy_absolute_uri(self, http_server, mini_proxy):
        base, root = http_server
        proxy, served = mini_proxy
        with DownloadHelper(proxy=proxy) as h:
            data, outcome, status = h.download(f"{base}/hello.txt")
        assert outcome == TaskOutcome.OK
        assert data == (root / "hello.txt").read_bytes()
        assert served["abs"] == 1

    def test_https_via_connect_tunnel(self, tls_server, mini_proxy):
        base, root, ca = tls_server
        proxy, served = mini_proxy
        with DownloadHelper(proxy=proxy, ca_file=ca) as h:
            data, outcome, status = h.download(f"{base}/secure.txt")
        assert outcome == TaskOutcome.OK
        assert data == (root / "secure.txt").read_bytes()
        assert served["connect"] == 1


class TestNativeApiParity:
    """Reference-parity C surface (fludownloader.h:94-185): lock/unlock,
    task abort query, SSL status names, HTTP-date parsing, global
    init/shutdown."""

    def test_getdate_and_ssl_strings(self):
        lib = native.get_lib()
        if lib is None:
            pytest.skip("native library unavailable")
        assert lib.flu_dl_getdate(b"Sun, 06 Nov 1994 08:49:37") == 784111777
        assert lib.flu_dl_getdate(b"Sunday, 06-Nov-94 08:49:37") == 784111777
        assert lib.flu_dl_getdate(b"garbage") == -1
        assert lib.flu_dl_ssl_status_string(0) == b"OK"
        assert lib.flu_dl_ssl_status_string(6) == b"CACERT"
        assert lib.flu_dl_ssl_status_string(99) == b"UNKNOWN"
        lib.flu_dl_global_init()
        lib.flu_dl_global_shutdown()

    def test_lock_unlock_and_abort_query(self):
        """Task handles are valid only until the task completes (the
        reference contract — the worker frees them after done_cb), so the
        abort flag is queried while the transfer is provably in progress
        against a server that accepts but never responds."""
        import socket
        lib = native.get_lib()
        if lib is None:
            pytest.skip("native library unavailable")
        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        dl = Downloader()
        try:
            lib.flu_dl_lock(dl._ctx)
            lib.flu_dl_unlock(dl._ctx)
            t = dl.new_task(f"http://127.0.0.1:{port}/hang")
            time.sleep(0.3)          # worker sits in the receive poll
            assert lib.flu_dl_task_get_abort(t._native_handle) == 0
            t.abort()                # flag flips; the loop exits cleanly
        finally:
            dl.destroy()
            srv.close()
