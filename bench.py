#!/usr/bin/env python
"""Benchmark: 1080p encode frames/sec/chip (driver metric, BASELINE.json).

Measures the full hype encode path — device convert+DCT+quant+zigzag, host
Huffman scans — on the current JAX backend (TPU under the driver), and
compares against a CPU baseline of the same element contracts measured in a
subprocess (the reference publishes no numbers, so per BASELINE.md the CPU
baseline is measured here).

Prints ONE JSON line:
  {"metric": "1080p_encode_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": ratio_vs_measured_cpu}
"""

import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

W, H = 1920, 1080
PH, PW = 1088, 1920  # padded to macroblock multiples
GOP = 8
QUALITY = 85


def make_frames(n):
    from flutpu.core.elements import make_test_frame
    frames = np.stack([make_test_frame("gradient", W, H, i) for i in range(min(n, 4))])
    if n > 4:
        frames = np.concatenate([frames] * ((n + 3) // 4), axis=0)[:n]
    return frames


def run_pipeline(n_gops: int, report=lambda *a: None) -> float:
    """Encode n_gops GOPs of 1080p frames; return frames/sec."""
    import jax
    import jax.numpy as jnp
    from flutpu.codec.jpeg import encode_gop_to_coefs, encode_scan, jpeg_headers
    from flutpu.codec.ops.quant import (CHROMA_QTABLE, LUMA_QTABLE,
                                        scale_qtable)

    qy = scale_qtable(LUMA_QTABLE, QUALITY)
    qc = scale_qtable(CHROMA_QTABLE, QUALITY)
    qy_d, qc_d = jnp.asarray(qy), jnp.asarray(qc)
    frames = make_frames(GOP)
    frames_d = jnp.asarray(frames)

    def dispatch():
        return encode_gop_to_coefs(frames_d, qy_d, qc_d,
                                   pad_h=PH, pad_w=PW, subsample=True)

    # warmup: compile + one full round trip
    t0 = time.time()
    coefs = dispatch()
    jax.block_until_ready(coefs)
    report(f"compile+first dispatch: {time.time() - t0:.2f}s")
    t0 = time.time()
    host = [np.asarray(c) for c in coefs]
    report(f"first transfer: {time.time() - t0:.2f}s")

    hdr = jpeg_headers(H, W, qy, qc, True)
    pool = ThreadPoolExecutor(max_workers=8)

    def entropy(arrs):
        yq, cbq, crq = arrs
        futs = [pool.submit(
            lambda i: hdr + encode_scan(yq[i], cbq[i], crq[i], True) + b"\xff\xd9", i)
            for i in range(yq.shape[0])]
        return [f.result() for f in futs]

    sizes = [len(s) for s in entropy(host)]
    report(f"bitstream bytes/frame ~{int(np.mean(sizes))}")

    # timed: overlap device dispatch with host transfer+entropy
    t0 = time.time()
    pending = []
    done = 0
    scan_futures = []
    for g in range(n_gops):
        pending.append(dispatch())
        if len(pending) >= 2:
            arrs = [np.asarray(c) for c in pending.pop(0)]
            scan_futures.append(pool.submit(entropy, arrs))
            done += GOP
    while pending:
        arrs = [np.asarray(c) for c in pending.pop(0)]
        scan_futures.append(pool.submit(entropy, arrs))
        done += GOP
    payloads = [f.result() for f in scan_futures]
    assert all(len(p) == GOP for p in payloads)
    dt = time.time() - t0
    return done / dt


def main():
    if "--cpu-child" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        fps = run_pipeline(3)
        print(json.dumps({"cpu_fps": fps}))
        return

    report = (lambda *a: print(*a, file=sys.stderr)) if "--verbose" in sys.argv \
        else (lambda *a: None)

    import jax
    backend = jax.devices()[0].platform
    n_gops = 12 if backend != "cpu" else 3
    fps = run_pipeline(n_gops, report)
    report(f"{backend} fps: {fps:.1f}")

    # measured CPU baseline (same contracts, CPU backend) in a subprocess
    cpu_fps = None
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-child"],
            capture_output=True, timeout=900, env=env, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                cpu_fps = json.loads(line)["cpu_fps"]
    except Exception:
        pass
    report(f"cpu baseline fps: {cpu_fps}")

    vs = round(fps / cpu_fps, 3) if cpu_fps else None
    print(json.dumps({
        "metric": "1080p_encode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
