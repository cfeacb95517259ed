"""Hot-swap a DEVICE encoder into a running pipeline with injectbin.

The round-4 contract: setting injectbin's ``element`` property pre-warms
the incoming element's device program against the current caps BEFORE any
dataflow block is installed — the stream keeps flowing while the compile
runs, so the observable output gap stays bounded by queue depth (the
reference's brief-block contract, gstinjectbin.c:131-174) instead of a
remote-compile latency.

Run:  FLUTPU_CPU=1 python examples/inject_swap.py
"""

import os
import sys
import threading
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("FLUTPU_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from flutpu.core import Buffer, MSECOND, make, parse_launch


def main():
    p = parse_launch(
        "appsrc name=src caps='video/x-raw, format=RGB, width=64, "
        "height=32' ! injectbin name=ib ! appsink name=out")
    src, ib, sink = (p.get_by_name(x) for x in ("src", "ib", "out"))
    p.play()

    got = []
    puller = threading.Thread(target=lambda: [
        got.append(b) for b in iter(
            lambda: sink.try_pull_buffer(timeout=10), None)])
    puller.start()

    frame = np.zeros((32, 64, 3), np.uint8)
    stop = threading.Event()

    def feed():
        i = 0
        while not stop.is_set():
            src.push(Buffer(frame, pts=i * MSECOND, offset=i))
            i += 1
            time.sleep(0.01)
        src.end_of_stream()

    feeder = threading.Thread(target=feed)
    feeder.start()
    time.sleep(0.1)

    enc = make("tpujpegenc", batch_frames=8)
    t0 = time.perf_counter()
    ib.set_property("element", enc)   # prewarm compiles in here
    print(f"swap requested; prewarm+install took "
          f"{(time.perf_counter() - t0) * 1e3:.0f} ms "
          f"(stream kept flowing)")
    time.sleep(0.5)
    stop.set()
    feeder.join()
    puller.join()
    p.stop()

    jpeg = sum(1 for b in got if bytes(b.data[:2]) == b"\xff\xd8")
    print(f"{len(got)} buffers out: {len(got) - jpeg} raw passthrough, "
          f"{jpeg} JPEG after the swap")


if __name__ == "__main__":
    main()
