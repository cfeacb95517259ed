"""Follow-up TPU A/B: concat v4 vs v3, pipeline depth, prefix margin.

Run: nohup timeout 7200 python -u benches/tpu_followup.py > /tmp/follow.log &
"""

import functools
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


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

PH, PW, GOP = 1088, 1920, 8


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flutpu.codec.jpeg import JpegEncoder, encode_gop_to_coefs
    from flutpu.codec.ops import entropy as E
    from flutpu.codec.ops.entropy import stuff_and_finalize
    from flutpu.codec.ops.testsrc import gradient_ball_frames

    t0 = time.time()
    float(jnp.sum(jnp.ones((8, 8))))
    log(phase="probe", init_s=round(time.time() - t0, 1))

    enc = JpegEncoder(quality=85, engine="auto")
    layout = E.mcu_layout(PW // 8, PH // 8, PW // 16, PH // 16, True)
    reps = int(os.environ.get("STAGE_REPS", "5"))

    def coefs(start):
        return encode_gop_to_coefs(
            gradient_ball_frames(PH, PW, GOP, start), enc._qy_dev,
            enc._qc_dev, pad_h=PH, pad_w=PW, subsample=True)

    @functools.partial(jax.jit, static_argnames=("pfx", "concat"))
    def p_full_sum(start, pfx, concat):
        yq, cbq, crq = coefs(start)
        out = E.encode_gop_scans_combined(
            yq, cbq, crq, layout=layout, prefix_words=pfx,
            use_pallas=enc.use_pallas, fused=True, concat=concat)
        return out.astype(jnp.uint32).sum()

    def timed(fn, label, **extra):
        np.asarray(fn(jnp.float32(0)))
        t0 = time.time()
        for i in range(reps):
            np.asarray(fn(jnp.float32(i * GOP)))
        ms = (time.time() - t0) / reps * 1000.0
        log(stage=label, ms_per_gop=round(ms, 1), **extra)
        return ms

    # 1. concat A/B at full prefix (scalar fetch — pure device compare)
    full = enc.PREFIX_WORDS
    r = {}
    for concat in ("v4", "v3"):
        r[concat] = timed(lambda s, c=concat: p_full_sum(s, full, c),
                          f"full_{concat}_sum")
    best = min(r, key=r.get)
    log(phase="concat_winner", concat=best, ms=r[best])

    # 2. throughput: winner concat x pipeline depth x prefix margin
    @functools.partial(jax.jit, static_argnames=("pfx", "concat"))
    def gop_program(start, pfx, concat):
        yq, cbq, crq = coefs(start)
        return E.encode_gop_scans_combined(
            yq, cbq, crq, layout=layout, prefix_words=pfx,
            use_pallas=enc.use_pallas, fused=True, concat=concat)

    first = np.asarray(gop_program(jnp.float32(0), full, best))
    used = int((first[:, 0].astype(np.int64).max() + 31) // 32)

    def run(pfx, depth, n_gops=40):
        np.asarray(gop_program(jnp.float32(0), pfx, best))  # compile
        t0 = time.time()
        pending = []
        done = 0
        for g in range(n_gops):
            pending.append(gop_program(jnp.float32(g * GOP), pfx, best))
            if len(pending) >= depth:
                arr = np.asarray(pending.pop(0))
                bits = arr[:, 0].astype(np.int64)
                assert (bits <= pfx * 32).all()
                for i in range(arr.shape[0]):
                    stuff_and_finalize(arr[i, 1:], int(bits[i]))
                done += GOP
        while pending:
            arr = np.asarray(pending.pop(0))
            bits = arr[:, 0].astype(np.int64)
            for i in range(arr.shape[0]):
                stuff_and_finalize(arr[i, 1:], int(bits[i]))
            done += GOP
        return done / (time.time() - t0)

    pfx_norm = min(full, max(8192,
                             ((int(used * 1.25) + 1024 + 4095) // 4096)
                             * 4096))
    pfx_tight = min(full, max(8192,
                              ((int(used * 1.08) + 256 + 2047) // 2048)
                              * 2048))
    for pfx, tag in ((pfx_norm, "norm"), (pfx_tight, "tight")):
        for depth in (2, 3):
            fps = run(pfx, depth)
            log(metric="headline_fps", value=round(fps, 1), concat=best,
                prefix=pfx, margin=tag, depth=depth)


if __name__ == "__main__":
    from flutpu.benchlock import hold_tpu_lock
    with hold_tpu_lock('tpu_followup.py', timeout_s=2400.0):
        main()
