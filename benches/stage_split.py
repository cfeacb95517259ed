"""Stage-split microbench for the headline 1080p GOP program.

Times cumulative sub-programs of bench.py's gop_program on the current
backend, each compiled as ONE dispatch returning a tiny reduction (so the
link cost is identical across variants and differences isolate device
compute):

  src      — frame synthesis only
  coefs    — + convert/DCT/quant/zigzag
  slots    — + slot tables (per-block symbol/bit-length arrays)
  pack     — + intra-block bit packing (Pallas)
  concat   — + inter-block concatenation (the full program, minus fetch)

Run: python benches/stage_split.py  (FLUTPU_CPU=1 for CPU)
Prints one JSON line per stage with warm ms/GOP.
"""

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


def main():
    import jax
    import jax.numpy as jnp
    from flutpu.codec.jpeg import JpegEncoder, encode_gop_to_coefs
    from flutpu.codec.ops import entropy as E
    from flutpu.codec.ops.testsrc import gradient_ball_frames

    enc = JpegEncoder(quality=85, engine="auto")
    layout = E.mcu_layout(PW // 8, PH // 8, PW // 16, PH // 16, True)
    prefix = enc.PREFIX_WORDS

    def mcu_reorder(yq, cbq, crq):
        f = yq.shape[0]
        allb = jnp.concatenate([
            yq.reshape(f, -1, 64), cbq.reshape(f, -1, 64),
            crq.reshape(f, -1, 64)], axis=1).astype(jnp.int32)
        sel = jnp.asarray(layout.block_sel)
        import numpy as np
        prev_np = np.asarray(layout.prev_same_comp)
        deltas_np = np.arange(len(prev_np)) - prev_np
        uniq = np.unique(deltas_np[prev_np >= 0])

        def reorder(blocks):
            mcu = blocks[sel]
            dc = mcu[:, 0]
            prev_dc = jnp.zeros_like(dc)
            for d in uniq:
                mask = jnp.asarray((deltas_np == d) & (prev_np >= 0))
                prev_dc = jnp.where(mask, jnp.roll(dc, int(d)), prev_dc)
            return jnp.concatenate([(dc - prev_dc)[:, None], mcu[:, 1:]],
                                   axis=1)
        return jax.vmap(reorder)(allb)

    @jax.jit
    def p_src(start):
        return gradient_ball_frames(PH, PW, GOP, start).sum()

    @jax.jit
    def p_coefs(start, qy, qc):
        out = encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), qy, qc,
            pad_h=PH, pad_w=PW, subsample=True)
        return sum(o.astype(jnp.int32).sum() for o in out)

    @jax.jit
    def p_burnin(start, qy, qc, ov):
        # coefs + overlay blend: the delta vs the coefs stage isolates the
        # device cost of the subtitle burn-in (VERDICT r2: the config-5
        # collapse needed attribution — blend vs program shape)
        from flutpu.ttml.render import overlay_on_frames
        frames = overlay_on_frames(
            gradient_ball_frames(PH, PW, GOP, start), ov)
        out = encode_gop_to_coefs(frames, qy, qc,
                                  pad_h=PH, pad_w=PW, subsample=True)
        return sum(o.astype(jnp.int32).sum() for o in out)

    @jax.jit
    def p_slots(start, qy, qc):
        yq, cbq, crq = encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), qy, qc,
            pad_h=PH, pad_w=PW, subsample=True)
        mcu = mcu_reorder(yq, cbq, crq)
        f, b = mcu.shape[:2]
        flat = mcu.reshape(f * b, 64)
        comp_flat = jnp.tile(jnp.asarray(layout.comp_is_chroma), f)
        lens, his, los = E._slot_tables_merged(flat, comp_flat,
                                               use_onehot=enc.use_pallas)
        return lens.sum() + (his ^ los).astype(jnp.uint32).sum()

    @jax.jit
    def p_pack(start, qy, qc):
        yq, cbq, crq = encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), qy, qc,
            pad_h=PH, pad_w=PW, subsample=True)
        mcu = mcu_reorder(yq, cbq, crq)
        f, b = mcu.shape[:2]
        flat = mcu.reshape(f * b, 64)
        comp_flat = jnp.tile(jnp.asarray(layout.comp_is_chroma), f)
        lens, his, los = E._slot_tables_merged(flat, comp_flat,
                                               use_onehot=enc.use_pallas)
        if enc.use_pallas:
            from flutpu.codec.ops.entropy_pallas import \
                pack_block_bits_pallas64
            buf, nbits = pack_block_bits_pallas64(lens, his, los)
        else:
            buf, nbits = E._pack_block_bits64(lens, his, los)
        return buf.astype(jnp.uint32).sum() + nbits.sum()

    @jax.jit
    def p_full(start, qy, qc):
        yq, cbq, crq = encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), qy, qc,
            pad_h=PH, pad_w=PW, subsample=True)
        out = E.encode_gop_scans_combined(
            yq, cbq, crq, layout=layout, prefix_words=prefix,
            use_pallas=enc.use_pallas)
        return out.astype(jnp.uint32).sum()

    import numpy as np
    # deterministic BGRA overlay (subtitle-like: a translucent lower-third
    # band with opaque speckle) uploaded once
    rng = np.random.default_rng(7)
    ov_np = np.zeros((PH, PW, 4), np.uint8)
    ov_np[PH * 3 // 4:PH * 7 // 8] = (32, 32, 32, 160)
    mask = rng.random((PH // 8, PW // 8)) > 0.9
    ov_np[PH * 3 // 4:PH * 3 // 4 + PH // 8, :PW // 8][mask] = \
        (255, 255, 255, 255)
    ov = jnp.asarray(ov_np)

    stages = [("src", lambda s: p_src(s)),
              ("coefs", lambda s: p_coefs(s, enc._qy_dev, enc._qc_dev)),
              ("burnin", lambda s: p_burnin(s, enc._qy_dev, enc._qc_dev,
                                            ov)),
              ("slots", lambda s: p_slots(s, enc._qy_dev, enc._qc_dev)),
              ("pack", lambda s: p_pack(s, enc._qy_dev, enc._qc_dev)),
              ("concat=full", lambda s: p_full(s, enc._qy_dev, enc._qc_dev))]
    reps = int(os.environ.get("STAGE_REPS", "5"))
    for name, fn in stages:
        np.asarray(fn(jnp.float32(0)))  # compile + materialize
        t0 = time.time()
        for i in range(reps):
            # scalar fetch per rep: the only reliable execution barrier on
            # the axon backend (see CLAUDE.md measurement rule); the ~30 ms
            # round trip is identical across stages so deltas cancel it
            np.asarray(fn(jnp.float32(i * GOP)))
        ms = (time.time() - t0) / reps * 1000.0
        print(json.dumps({"stage": name, "ms_per_gop": round(ms, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
