"""Full-program A/B bench for the headline 1080p GOP encode.

Round-4 methodology note: the earlier version of this file timed
CUMULATIVE CUTS of the program (src / coefs / slots / pack / concat).
Cut-point numbers mis-attribute cost — a cut forces a materialization
the full program elides (the blockize+zigzag stage measured 5.8 ms/GOP
as a cut, yet a bit-identical rebuild that removed it from the full
program changed nothing; see PERF.md). This bench therefore A/Bs FULL
programs only, each as a rep-loop reduced to a scalar checksum (the
load-independent device-time shape of bench.measure_device_ms_per_gop):

  planar_segmented    — the product default (channel-planar source,
                        segment bitstream layout)
  planar_concat_v3    — same with the block-granular concat v3
  interleaved_segmented — the (F, H, W, 3) source layout tax arm
  planar_seg_burnin   — + BGRA overlay blend with the overlay as a
                        program ARGUMENT (the product form: overlays
                        change per subtitle interval) — includes the
                        ~7 ms/GOP source-materialization boundary
  planar_seg_burnin_const — same blend with the overlay embedded as a
                        compile-time CONSTANT: XLA constant-folds the
                        blend prep and keeps the source fused (+1.2-2.2
                        ms/GOP measured) — the boundary is an
                        argument-read cost, not a blend cost
  planar_barrier      — the XLA front end reading MATERIALIZED planes
                        (optimization_barrier after the source): the
                        host-fed / post-boundary shape
  kernel_plain        — the fused Pallas front end (ops/frontend_pallas)
                        reading the same materialized planes: blend-free
                        A/B partner of planar_barrier
  kernel_burnin       — materialized planes + overlay planes, blend
                        FOLDED INTO the kernel: A/B partner of
                        planar_seg_burnin (the product burn-in shape)
  src_only / coefs_cut — two CUT-POINT probes kept for continuity,
                        labeled as such: deltas against full programs
                        are NOT valid stage attributions.

Run on the TPU host: python benches/stage_split.py
Prints one JSON line per arm with device ms/GOP.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FLUTPU_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


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
PREFIX = 24576  # fixed window: comparable across runs/content drift


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from flutpu.codec.jpeg import (JpegEncoder, encode_gop_to_coefs,
                                   encode_gop_planes_to_coefs)
    from flutpu.codec.ops import entropy as E
    from flutpu.codec.ops.testsrc import (gradient_ball_frames,
                                          gradient_ball_planes)
    from flutpu.ttml.render import overlay_on_planes

    enc = JpegEncoder(quality=85, engine="auto")
    layout = E.mcu_layout(PW // 8, PH // 8, PW // 16, PH // 16, True)

    # deterministic BGRA overlay (subtitle-like lower-third band)
    rng = np.random.default_rng(7)
    ov_np = np.zeros((PH, PW, 4), np.uint8)
    ov_np[PH * 3 // 4:PH * 7 // 8] = (32, 32, 32, 160)
    mask = rng.random((PH // 8, PW // 8)) > 0.9
    ov_np[PH * 3 // 4:PH * 3 // 4 + PH // 8, :PW // 8][mask] = \
        (255, 255, 255, 255)
    ov = jnp.asarray(ov_np)

    def coefs_planar(start, qy, qc, ov_in=None):
        r, g, b = gradient_ball_planes(PH, PW, GOP, start)
        if ov_in is not None:
            r, g, b = overlay_on_planes(r, g, b, ov_in)
        return encode_gop_planes_to_coefs(r, g, b, qy, qc,
                                          pad_h=PH, pad_w=PW, subsample=True)

    def entropy(yq, cbq, crq, segmented=True):
        if segmented:
            return E.encode_gop_scans_segmented(
                yq, cbq, crq, layout=layout, prefix_words=PREFIX,
                seg_words=enc.SEG_WORDS0, interpret=not enc.use_pallas)
        return E.encode_gop_scans_combined(
            yq, cbq, crq, layout=layout, prefix_words=PREFIX,
            use_pallas=enc.use_pallas)

    from flutpu.codec.ops.dct import blockize
    from flutpu.codec.ops.frontend_pallas import front_end_pallas
    from flutpu.codec.ops.quant import zigzag_flatten

    # overlay as channel planes for the kernel-fold arm (pre-split once
    # per subtitle interval in the product path — amortized)
    ovp = tuple(jnp.asarray(ov_np[..., c]) for c in (2, 1, 0, 3))

    def arm(start, ov_arg, mode):
        if mode == "src_only":
            r, g, b = gradient_ball_planes(PH, PW, GOP, start)
            return (r.astype(jnp.uint32).sum() + g.astype(jnp.uint32).sum()
                    + b.astype(jnp.uint32).sum())
        if mode == "interleaved_kernel":
            # host-fed interleaved shape: materialized (F, H, W, 3) arg
            # (the barrier) → plane extraction → kernel. A/B partner of
            # interleaved_segmented, which converts straight from the
            # interleaved layout.
            frames = jax.lax.optimization_barrier(
                gradient_ball_frames(PH, PW, GOP, start))
            r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
            yp, cbp, crp = front_end_pallas(
                r, g, b, enc._qy_dev, enc._qc_dev,
                interpret=jax.default_backend() == "cpu")
            yq = zigzag_flatten(blockize(yp))
            cbq = zigzag_flatten(blockize(cbp))
            crq = zigzag_flatten(blockize(crp))
            return entropy(yq, cbq, crq).astype(jnp.uint32).sum()
        if mode.startswith("kernel_") or mode == "planar_barrier":
            r, g, b = gradient_ball_planes(PH, PW, GOP, start)
            if mode == "planar_barrier":
                r, g, b = jax.lax.optimization_barrier((r, g, b))
                yq, cbq, crq = encode_gop_planes_to_coefs(
                    r, g, b, enc._qy_dev, enc._qc_dev,
                    pad_h=PH, pad_w=PW, subsample=True)
            else:
                ovk = ovp if mode == "kernel_burnin" else None
                yp, cbp, crp = front_end_pallas(
                    r, g, b, enc._qy_dev, enc._qc_dev, overlay_planes=ovk,
                    interpret=jax.default_backend() == "cpu")
                yq = zigzag_flatten(blockize(yp))
                cbq = zigzag_flatten(blockize(cbp))
                crq = zigzag_flatten(blockize(crp))
            return entropy(yq, cbq, crq).astype(jnp.uint32).sum()
        if mode in ("interleaved_segmented", "interleaved_barrier"):
            frames = gradient_ball_frames(PH, PW, GOP, start)
            if mode == "interleaved_barrier":
                # the host-fed shape: frames as a materialized argument
                frames = jax.lax.optimization_barrier(frames)
            yq, cbq, crq = encode_gop_to_coefs(
                frames, enc._qy_dev, enc._qc_dev, pad_h=PH, pad_w=PW,
                subsample=True)
            return entropy(yq, cbq, crq).astype(jnp.uint32).sum()
        ov_in = (ov_arg if mode == "planar_seg_burnin"
                 else ov if mode == "planar_seg_burnin_const" else None)
        yq, cbq, crq = coefs_planar(start, enc._qy_dev, enc._qc_dev,
                                    ov_in=ov_in)
        if mode == "coefs_cut":
            return sum(o.astype(jnp.int32).sum() for o in (yq, cbq, crq))
        return entropy(yq, cbq, crq,
                       segmented=mode != "planar_concat_v3") \
            .astype(jnp.uint32).sum()

    reps = int(os.environ.get("STAGE_REPS", "8"))

    @functools.partial(jax.jit, static_argnames=("mode",))
    def loop(start, ov_arg, mode):
        def body(i, acc):
            return (acc
                    + arm(start + i.astype(jnp.float32) * GOP, ov_arg, mode)
                    .astype(jnp.uint32))
        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x8 = jnp.ones((8, 8), jnp.float32)
    float(tiny(x8))
    arms = ("planar_segmented", "planar_concat_v3", "interleaved_segmented",
            "interleaved_barrier", "interleaved_kernel",
            "planar_seg_burnin", "planar_seg_burnin_const",
            "planar_barrier", "kernel_plain", "kernel_burnin",
            "src_only", "coefs_cut")
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        arms = tuple(a for a in arms if a in only)
    for mode in arms:
        int(loop(jnp.float32(0), ov, mode))   # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(tiny(x8))
            rtt = time.time() - t0
            t0 = time.time()
            int(loop(jnp.float32(0), ov, mode))
            best = min(best,
                       max(0.0, time.time() - t0 - rtt) / reps * 1000.0)
        print(json.dumps({"arm": mode, "device_ms_per_gop": round(best, 2)}),
              flush=True)


if __name__ == "__main__":
    from flutpu.benchlock import hold_tpu_lock
    with hold_tpu_lock('stage_split.py', timeout_s=2400.0):
        main()
