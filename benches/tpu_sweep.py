"""One-process TPU measurement sweep for round 3.

Runs, in priority order and with incremental JSON-line logging:
  1. headline stage split incl. the round-3 entropy variants
     (fused slot+pack on/off x concat v2/v3) — picks the winning combo
  2. headline 1080p throughput with the winning combo (bench.py shape,
     adaptive prefix, 2-deep pipelining) — warms the exact driver path
  3. config 5 encode+burn-in (1080p), config 6 FVC v1/motion
  4. TTML render benches (device + host-delivery) and the FVC-motion
     stage split

Every phase is individually fenced: a link failure mid-sweep keeps the
results logged so far. One process = one ~2 min axon init, and the
persistent compile cache carries across runs.

Run: nohup timeout 14000 python -u benches/tpu_sweep.py > /tmp/sweep.log &
"""

import json
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "benches"))


def _enable_compile_cache():
    try:
        import jax
        cache = os.environ.get("JAX_CACHE_DIR", "/tmp/flutpu-jax-cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

W, H = 1920, 1080
PH, PW = 1088, 1920
GOP = 8
if os.environ.get("FLUTPU_SWEEP_SMALL"):   # CPU smoke of the script logic
    W, H, PH, PW, GOP = 128, 96, 96, 128, 2


def log(**kw):
    print(json.dumps(kw), flush=True)


def fence(name, fn):
    t0 = time.time()
    try:
        fn()
        log(phase=name, status="done", wall_s=round(time.time() - t0, 1))
    except Exception as e:
        traceback.print_exc()
        log(phase=name, status="error", error=f"{type(e).__name__}: {e}"[:200],
            wall_s=round(time.time() - t0, 1))


def product_prefix(enc, used_words: int, full_prefix: int) -> int:
    """Adaptive window via the ENCODER'S OWN policy, computed as a FRESH
    encoder's first derivation. A hand-copied formula here (1.25x + 1024
    @ 4096 buckets vs the encoder's 1.15x + 512 @ 2048) made the sweep
    measure programs the product path never dispatches; and mutating the
    one shared sweep encoder would leak earlier phases' running max /
    adopted window into later phases (different layouts report different
    usage magnitudes), so the shared state is saved and restored."""
    with enc._adapt_lock:
        saved = (getattr(enc, "_prefix_used_words", None),
                 getattr(enc, "_prefix_window", None))
        enc._prefix_used_words = None
        enc._prefix_window = None
        try:
            enc._note_prefix_usage(int(used_words))
            return min(full_prefix, enc._prefix_estimate() or full_prefix)
        finally:
            enc._prefix_used_words, enc._prefix_window = saved


def main():
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flutpu.codec.jpeg import (JpegEncoder, encode_gop_planes_to_coefs,
                                   encode_gop_to_coefs)
    from flutpu.codec.ops import entropy as E
    from flutpu.codec.ops.testsrc import (gradient_ball_frames,
                                          gradient_ball_planes)

    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8))))
    log(phase="probe", init_s=round(time.time() - t0, 1),
        backend=jax.default_backend())

    enc = JpegEncoder(quality=85, engine="auto")
    layout = E.mcu_layout(PW // 8, PH // 8, PW // 16, PH // 16, True)
    prefix = enc.PREFIX_WORDS
    reps = int(os.environ.get("STAGE_REPS", "4"))

    def timed(fn, label, **extra):
        np.asarray(fn(jnp.float32(0)))   # compile + materialize
        t0 = time.time()
        for i in range(reps):
            np.asarray(fn(jnp.float32(i * GOP)))
        ms = (time.time() - t0) / reps * 1000.0
        log(stage=label, ms_per_gop=round(ms, 1), **extra)
        return ms

    # ---- 1. entropy variants ------------------------------------------
    results = {}

    def coefs(start):
        # channel-planar product shape (round 4): byte-identical to the
        # interleaved form; convert measured 8.9 -> 0.2 ms/GOP
        r, g, b = gradient_ball_planes(PH, PW, GOP, start)
        return encode_gop_planes_to_coefs(
            r, g, b, enc._qy_dev, enc._qc_dev, pad_h=PH, pad_w=PW,
            subsample=True)

    def coefs_interleaved(start):
        return encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), enc._qy_dev,
            enc._qc_dev, pad_h=PH, pad_w=PW, subsample=True)

    def phase_variants():
        for fused in (True, False):
            for concat in ("v3", "v2"):
                @jax.jit
                def p_full(start, _f=fused, _c=concat):
                    yq, cbq, crq = coefs(start)
                    out = E.encode_gop_scans_combined(
                        yq, cbq, crq, layout=layout, prefix_words=prefix,
                        use_pallas=enc.use_pallas, fused=_f, concat=_c)
                    return out.astype(jnp.uint32).sum()
                key = f"full_fused={int(fused)}_concat={concat}"
                results[(fused, concat)] = timed(p_full, key)

    fence("entropy_variants", phase_variants)

    best = min(results, key=results.get) if results else (True, "v2")
    log(phase="winner", fused=best[0], concat=best[1],
        ms=results.get(best))
    if not best[0]:
        os.environ["FLUTPU_NO_FUSED_PACK"] = "1"
    os.environ["FLUTPU_CONCAT"] = best[1]

    # ---- 2. supporting stage split (src/coefs/burnin/pack) -------------
    def phase_stages():
        @jax.jit
        def p_src(start):
            return gradient_ball_frames(PH, PW, GOP, start).sum()

        @jax.jit
        def p_coefs(start):
            return sum(o.astype(jnp.int32).sum() for o in coefs(start))

        rngnp = np.random.default_rng(7)
        ov_np = np.zeros((PH, PW, 4), np.uint8)
        ov_np[PH * 3 // 4:PH * 7 // 8] = (32, 32, 32, 160)
        ov = jnp.asarray(ov_np)

        @jax.jit
        def p_burnin(start):
            from flutpu.ttml.render import overlay_on_planes
            r, g, b = overlay_on_planes(
                *gradient_ball_planes(PH, PW, GOP, start), ov)
            out = encode_gop_planes_to_coefs(
                r, g, b, enc._qy_dev, enc._qc_dev, pad_h=PH, pad_w=PW,
                subsample=True)
            return sum(o.astype(jnp.int32).sum() for o in out)

        @jax.jit
        def p_pack_fused(start):
            yq, cbq, crq = coefs(start)
            packed, bits = E.encode_gop_scans(
                yq, cbq, crq, layout=layout, out_words=256,
                use_pallas=enc.use_pallas, fused=True, concat="v2")
            return bits.sum()  # tiny out_words: concat ~free, isolates pack

        # coefs sub-stages (round 4): where do the ~16.6 ms/GOP go —
        # colorspace conversion, DCT matmuls, or quant/zigzag?
        from flutpu.codec.ops.colorspace import rgb_to_i420
        from flutpu.codec.ops.dct import blockize, plane_dct_planar
        from flutpu.codec.ops.quant import quantize_planar, zigzag_flatten

        from flutpu.codec.ops.colorspace import planes_to_i420

        @jax.jit
        def p_convert(start):
            y, cb, cr = rgb_to_i420(
                gradient_ball_frames(PH, PW, GOP, start).astype(jnp.float32))
            return y.sum() + cb.sum() + cr.sum()

        @jax.jit
        def p_convert_planar(start):
            y, cb, cr = planes_to_i420(
                *gradient_ball_planes(PH, PW, GOP, start))
            return y.sum() + cb.sum() + cr.sum()

        @jax.jit
        def p_dct(start):
            y, cb, cr = planes_to_i420(
                *gradient_ball_planes(PH, PW, GOP, start))
            return sum(plane_dct_planar(p - 128.0).sum() for p in (y, cb, cr))

        @jax.jit
        def p_coefs_interleaved(start):
            return sum(o.astype(jnp.int32).sum()
                       for o in coefs_interleaved(start))

        timed(p_src, "src")
        timed(p_convert, "convert_interleaved")
        timed(p_convert_planar, "convert_planar")
        timed(p_dct, "convert+dct")
        timed(p_coefs, "coefs")
        timed(p_coefs_interleaved, "coefs_interleaved")
        timed(p_burnin, "burnin")
        timed(p_pack_fused, "pack_fused_tiny_concat")

    fence("stage_split", phase_stages)

    # ---- 3. headline throughput (bench.py shape, winner variant) -------
    def phase_headline():
        from flutpu.codec.ops.entropy import stuff_and_finalize
        full_prefix = enc.PREFIX_WORDS

        @functools.partial(jax.jit, static_argnames=("pfx",))
        def gop_program(start, pfx=full_prefix):
            yq, cbq, crq = coefs(start)
            return E.encode_gop_scans_combined(
                yq, cbq, crq, layout=layout, prefix_words=pfx,
                use_pallas=enc.use_pallas, fused=best[0], concat=best[1])

        first = np.asarray(gop_program(jnp.float32(0)))
        used = int((first[:, 0].astype(np.int64).max() + 31) // 32)
        pfx = product_prefix(enc, used, full_prefix)
        np.asarray(gop_program(jnp.float32(0), pfx=pfx))
        n_gops = 40 if not os.environ.get("FLUTPU_SWEEP_SMALL") else 4
        t0 = time.time()
        pending = [gop_program(jnp.float32(0), pfx=pfx)]
        done = 0
        for g in range(1, n_gops):
            pending.append(gop_program(jnp.float32(g * GOP), pfx=pfx))
            arr = np.asarray(pending.pop(0))
            bits = arr[:, 0].astype(np.int64)
            assert (bits <= pfx * 32).all()
            for i in range(arr.shape[0]):
                stuff_and_finalize(arr[i, 1:], int(bits[i]))
            done += GOP
        while pending:
            # drained GOPs get the same host finalize as the main loop so
            # every counted GOP carries equal work
            arr = np.asarray(pending.pop(0))
            bits = arr[:, 0].astype(np.int64)
            for i in range(arr.shape[0]):
                stuff_and_finalize(arr[i, 1:], int(bits[i]))
            done += GOP
        fps = done / (time.time() - t0)
        log(metric="headline_1080p_fps", value=round(fps, 1),
            fused=best[0], concat=best[1], adaptive_prefix=pfx)

    fence("headline", phase_headline)

    # ---- 3b. round-4 segment layout A/B ---------------------------------
    # Device-only: the segmented program (grouped pack + word-aligned
    # segment placement, NO block concat) vs the winner above. Then the
    # full throughput shape including the host compaction on the worker
    # pool — the honest comparison, since segments trade device concat
    # for host compaction + ~6% fetch.
    def phase_segment_device():
        n_segs = (layout.n_blocks + 15) // 16

        def make_prog(sw):
            @functools.partial(jax.jit, static_argnames=("pfx",))
            def p_seg(start, pfx=prefix):
                yq, cbq, crq = coefs(start)
                return E.encode_gop_scans_segmented(
                    yq, cbq, crq, layout=layout, prefix_words=pfx,
                    seg_words=sw,
                    interpret=jax.default_backend() == "cpu") \
                    .astype(jnp.uint32).sum()
            return p_seg

        sw = 64
        while sw <= 832:
            try:
                timed(make_prog(sw), f"seg_full_sw={sw}", n_segs=n_segs)
                break
            except Exception:
                sw *= 2
        log(stage="seg_device_vs_v3", v3_ms=results.get((True, "v3")),
            note="compare seg_full_sw row against entropy_variants")

    fence("segment_device", phase_segment_device)

    def phase_headline_threaded_std():
        """Standard layout in the SAME 3-deep threaded shape as the
        segmented phase below — the shape-matched, same-process A/B arm
        (separate bench.py runs sit in different chip-load windows)."""
        from concurrent.futures import ThreadPoolExecutor
        from flutpu.codec.ops.entropy import stuff_and_finalize
        full_prefix = enc.PREFIX_WORDS

        @functools.partial(jax.jit, static_argnames=("pfx",))
        def gop_program(start, pfx=full_prefix):
            yq, cbq, crq = coefs(start)
            return E.encode_gop_scans_combined(
                yq, cbq, crq, layout=layout, prefix_words=pfx,
                use_pallas=enc.use_pallas, fused=best[0], concat=best[1])

        first = np.asarray(gop_program(jnp.float32(0)))
        used = int((first[:, 0].astype(np.int64).max() + 31) // 32)
        pfx = product_prefix(enc, used, full_prefix)

        def finalize(arr):
            bits = arr[:, 0].astype(np.int64)
            assert (bits <= pfx * 32).all()
            for i in range(arr.shape[0]):
                stuff_and_finalize(arr[i, 1:], int(bits[i]))

        np.asarray(gop_program(jnp.float32(0), pfx=pfx))
        n_gops = 40 if not os.environ.get("FLUTPU_SWEEP_SMALL") else 4
        pool = ThreadPoolExecutor(
            max_workers=int(os.environ.get("FLUTPU_BENCH_WORKERS", "3")))
        depth = int(os.environ.get("FLUTPU_BENCH_DEPTH", "8"))
        t0 = time.time()
        futs = []
        done = 0
        for g in range(n_gops):
            combined = gop_program(jnp.float32(g * GOP), pfx=pfx)
            futs.append(pool.submit(
                lambda c: finalize(np.asarray(c)), combined))
            if len(futs) >= depth:
                futs.pop(0).result()
                done += GOP
        for fu in futs:
            fu.result()
            done += GOP
        fps = done / (time.time() - t0)
        pool.shutdown()
        log(metric="headline_1080p_fps_THREADED_STD", value=round(fps, 1),
            adaptive_prefix=pfx)

    fence("headline_threaded_std", phase_headline_threaded_std)

    def phase_headline_seg():
        from concurrent.futures import ThreadPoolExecutor
        from flutpu.codec.ops.entropy import (compact_aligned_segments,
                                              stuff_and_finalize)
        full_prefix = enc.PREFIX_WORDS
        n_segs = (layout.n_blocks + 15) // 16

        @functools.partial(jax.jit, static_argnames=("pfx", "sw"))
        def gop_program(start, pfx=full_prefix, sw=64):
            yq, cbq, crq = coefs(start)
            return E.encode_gop_scans_segmented(
                yq, cbq, crq, layout=layout, prefix_words=pfx, seg_words=sw,
                interpret=jax.default_backend() == "cpu")

        sw = 64
        first = np.asarray(gop_program(jnp.float32(0)))
        while first[:, 1:1 + n_segs].astype(np.int64).max() > sw * 32 \
                and sw <= 832:
            sw *= 2
            first = np.asarray(gop_program(jnp.float32(0), sw=sw))
        used = int(first[:, 0].astype(np.int64).max())
        pfx = product_prefix(enc, used, full_prefix)

        def finalize(arr):
            segbits = arr[:, 1:1 + n_segs].astype(np.int64)
            assert (arr[:, 0].astype(np.int64) <= pfx).all()
            for i in range(arr.shape[0]):
                stream, total = compact_aligned_segments(
                    segbits[i], arr[i, 1 + n_segs:])
                stuff_and_finalize(stream, total)

        np.asarray(gop_program(jnp.float32(0), pfx=pfx, sw=sw))
        n_gops = 40 if not os.environ.get("FLUTPU_SWEEP_SMALL") else 4
        pool = ThreadPoolExecutor(
            max_workers=int(os.environ.get("FLUTPU_BENCH_WORKERS", "3")))
        depth = int(os.environ.get("FLUTPU_BENCH_DEPTH", "8"))
        t0 = time.time()
        futs = []
        done = 0
        for g in range(n_gops):
            combined = gop_program(jnp.float32(g * GOP), pfx=pfx, sw=sw)
            futs.append(pool.submit(
                lambda c: finalize(np.asarray(c)), combined))
            if len(futs) >= depth:
                futs.pop(0).result()
                done += GOP
        for fu in futs:
            fu.result()
            done += GOP
        fps = done / (time.time() - t0)
        pool.shutdown()
        log(metric="headline_1080p_fps_SEGMENTED", value=round(fps, 1),
            seg_words=sw, adaptive_prefix=pfx)

    fence("headline_segmented", phase_headline_seg)

    # ---- 4. configs 5 + 6 ---------------------------------------------
    def phase_cfg56():
        import bench_all as BA
        BA.bench_full_pipeline()
        BA.bench_fvc()
        BA.bench_fvc(motion=True)

    fence("config5_6", phase_cfg56)

    # ---- 5. ttml + fvc stage split -------------------------------------
    def phase_ttml():
        import bench_ttml as BT
        BT.main()

    fence("ttml", phase_ttml)

    def phase_ttml_host_delivery():
        import bench_all as BA
        BA.bench_ttml_render()

    fence("ttml_host_delivery", phase_ttml_host_delivery)

    def phase_fvc_stages():
        import stage_split_fvc as SF
        SF.main()

    fence("fvc_stage_split", phase_fvc_stages)


if __name__ == "__main__":
    from flutpu.benchlock import hold_tpu_lock
    with hold_tpu_lock('tpu_sweep.py', timeout_s=2400.0):
        main()
