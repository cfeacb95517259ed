"""Stage-split microbench for the FVC-motion (v2 hybrid loop) GOP program.

VERDICT r2 weak #3: motion mode runs at ~half of v1's throughput with
~140 ms/GOP unattributed after the Pallas search kernel. This bench times
cumulative sub-programs of the hybrid loop, each as ONE dispatch reduced
to a scalar checksum (identical link cost → deltas isolate device time):

  src        — frame synthesis only
  i420       — + RGB→4:2:0 conversion
  search     — + per-frame Pallas motion search+predict (luma, scan over
               frames against the previous INPUT frame — no recon yet)
  chroma_mc  — + chroma motion compensation (the 64-shift roll loops)
  mc_chunk   — fvc_mc_encode_chunk (adds residual DCT/quant/zigzag,
               in-loop recon via IDCT, per-frame mode decision)
  full       — _fvc_gop_program_v2 (adds device entropy + mv bitcast)

Run: python benches/stage_split_fvc.py  (FLUTPU_CPU=1 for CPU)
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

# STAGE_4K=1 switches to the 2160x3840 flagship shape (GOP=4 keeps the
# scan carry modest); deltas remain comparable only WITHIN a resolution.
if os.environ.get("STAGE_4K"):
    W, H = 3840, 2160
    PH, PW = 2160, 3840
    GOP = 4
else:
    W, H = 1920, 1080
    PH, PW = 1088, 1920
    GOP = 8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flutpu.codec.fvc import FvcEncoder, _fvc_gop_program_v2
    from flutpu.codec.jpeg import JpegEncoder
    from flutpu.codec.ops import entropy as E
    from flutpu.codec.ops.colorspace import rgb_to_i420
    from flutpu.codec.ops.motion import motion_compensate, motion_search
    from flutpu.codec.ops.testsrc import gradient_ball_frames

    on_tpu = jax.default_backend() != "cpu"
    enc = FvcEncoder(quality=85, motion=True)
    layout = E.mcu_layout(PW // 8, PH // 8, PW // 16, PH // 16, True)
    prefix = JpegEncoder.PREFIX_WORDS

    def synth(start):
        return gradient_ball_frames(PH, PW, GOP, start).astype(jnp.float32)

    @jax.jit
    def p_src(start):
        return synth(start).sum()

    @jax.jit
    def p_i420(start):
        y, cb, cr = rgb_to_i420(synth(start))
        return y.sum() + cb.sum() + cr.sum()

    def search_fn(cy, ref):
        if on_tpu:
            from flutpu.codec.ops.motion_pallas import motion_search_mc_pallas
            return motion_search_mc_pallas(cy, ref)
        mv = motion_search(cy, ref)
        return mv, motion_compensate(cy, mv)

    @jax.jit
    def p_search(start):
        y, cb, cr = rgb_to_i420(synth(start))

        def step(prev_y, cy):
            mv, pred = search_fn(cy, prev_y)
            return cy, mv.sum() + pred.sum()

        _, sums = jax.lax.scan(step, y[0], y)
        return sums.sum()

    @jax.jit
    def p_search_dygrid(start):
        from flutpu.codec.ops.motion_pallas import \
            motion_search_mc_dygrid_pallas
        y, cb, cr = rgb_to_i420(synth(start))

        def step(prev_y, cy):
            mv, pred = motion_search_mc_dygrid_pallas(cy, prev_y)
            return cy, mv.sum() + pred.sum()

        _, sums = jax.lax.scan(step, y[0], y)
        return sums.sum()

    @jax.jit
    def p_chroma_mc(start):
        y, cb, cr = rgb_to_i420(synth(start))

        def step(carry, xs):
            prev_y, prev_cb, prev_cr = carry
            cy, ccb, ccr = xs
            mv, pred = search_fn(cy, prev_y)
            if on_tpu:
                # product path: both planes in one VMEM kernel
                from flutpu.codec.ops.motion_pallas import chroma_mc_pallas
                pcb, pcr = chroma_mc_pallas(prev_cb, prev_cr, mv)
            else:
                pcb = motion_compensate(prev_cb, mv, mb=8)
                pcr = motion_compensate(prev_cr, mv, mb=8)
            return (cy, ccb, ccr), mv.sum() + pred.sum() + pcb.sum() \
                + pcr.sum()

        _, sums = jax.lax.scan(step, (y[0], cb[0], cr[0]), (y, cb, cr))
        return sums.sum()

    @jax.jit
    def p_mc_chunk(start, qy, qc):
        from flutpu.codec.fvc import fvc_mc_encode_chunk
        ry, rcb, rcr, mvs, it = fvc_mc_encode_chunk(
            synth(start).astype(jnp.uint8), qy, qc, pad_h=PH, pad_w=PW,
            subpel=False)
        return (ry.astype(jnp.int32).sum() + rcb.astype(jnp.int32).sum()
                + rcr.astype(jnp.int32).sum() + mvs.astype(jnp.int32).sum())

    @functools.partial(jax.jit, static_argnames=("pfx", "hier", "sw"))
    def p_full(start, qy, qc, pfx=prefix, hier=False, sw=None):
        out = _fvc_gop_program_v2(
            synth(start).astype(jnp.uint8), qy, qc, pad_h=PH, pad_w=PW,
            search_range=7, layout=layout, prefix_words=pfx,
            use_pallas=enc._scan_coder.use_pallas, subpel=False,
            hier=hier, seg_words=sw)
        return out.astype(jnp.uint32).sum()

    # adaptive window: derive from the first GOP's actual usage through
    # the encoder's own policy — the PRODUCT window (the round-3 table's
    # entropy delta was at the FULL window, overstating the product cost)
    sc = enc._scan_coder
    first = np.asarray(_fvc_gop_program_v2(
        synth(jnp.float32(0)).astype(jnp.uint8), enc._qy_dev, enc._qc_dev,
        pad_h=PH, pad_w=PW, search_range=7, layout=layout,
        prefix_words=prefix, use_pallas=sc.use_pallas, subpel=False))
    sc._note_prefix_usage(int((first[:, 0].astype(np.int64).max() + 31)
                              // 32))
    pfx_adapt = min(prefix, sc._prefix_estimate() or prefix)
    print(json.dumps({"adaptive_prefix": pfx_adapt, "full": prefix,
                      "shape": f"{PH}x{PW}", "gop": GOP}), flush=True)

    stages = [("src", lambda s: p_src(s)),
              ("i420", lambda s: p_i420(s)),
              ("search+pred", lambda s: p_search(s)),
              *([("search+pred_dygrid", lambda s: p_search_dygrid(s))]
                if on_tpu else []),
              ("chroma_mc", lambda s: p_chroma_mc(s)),
              ("mc_chunk", lambda s: p_mc_chunk(s, enc._qy_dev,
                                                enc._qc_dev)),
              ("full=entropy", lambda s: p_full(s, enc._qy_dev,
                                                enc._qc_dev)),
              ("full_adaptive_window", lambda s: p_full(
                  s, enc._qy_dev, enc._qc_dev, pfx=pfx_adapt)),
              ("full_segmented", lambda s: p_full(
                  s, enc._qy_dev, enc._qc_dev, pfx=pfx_adapt, sw=64)),
              ("full_hier_kernel", lambda s: p_full(
                  s, enc._qy_dev, enc._qc_dev, pfx=pfx_adapt, hier=True))]
    reps = int(os.environ.get("STAGE_REPS", "5"))
    for name, fn in stages:
        np.asarray(fn(jnp.float32(0)))  # compile + materialize
        t0 = time.time()
        for i in range(reps):
            np.asarray(fn(jnp.float32(i * GOP)))
        ms = (time.time() - t0) / reps * 1000.0
        print(json.dumps({"stage": name, "ms_per_gop": round(ms, 1)}),
              flush=True)


if __name__ == "__main__":
    from flutpu.benchlock import hold_tpu_lock
    with hold_tpu_lock('stage_split_fvc.py', timeout_s=2400.0):
        main()
