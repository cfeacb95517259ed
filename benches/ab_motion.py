"""A/B harness for the motion-path variants on real hardware.

Measures the DEVICE time of the 1080p fvc-motion chunk encode under each
formulation — rep loop INSIDE one jitted program reduced to a scalar
checksum, minus a tiny-op RTT (the only load-independent timing shape on
the axon link; see CLAUDE.md and bench.measure_device_ms_per_gop). The
round-2 version of this harness measured serial wall-clock fps, which the
link's minutes-long degraded phases dominate (a 2026-08-18 run measured
two IDENTICAL device programs 8x apart across subprocesses); device
ms/GOP is the number that should decide formulation defaults.

Arms (each in its own subprocess — the formulation env flags are read at
trace time):
  kernel_full        — fused Pallas search+predict kernel (product default)
  kernel_hier        — coarse-to-fine kernel with candidate skipping
  kernel_full_dygrid — dy-grid kernel restructure (FLUTPU_SEARCH_DYGRID=1)
  xla_full_rolls     — 225-roll XLA search + masked-roll MC
  xla_full_gather    — 225-roll XLA search + flat-gather MC
  xla_full_halfpel   — XLA search + half-pel refinement (subpel=True)

Run on the TPU host: python benches/ab_motion.py
Prints one JSON line per arm: {"metric": ..., "value": ms/GOP}.
"""

import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FLUTPU_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def _enable_compile_cache():
    """Persistent XLA compile cache (same as bench.py): the axon remote
    compiler costs minutes per program; cached reruns skip it."""
    try:
        import jax
        cache = os.environ.get("JAX_CACHE_DIR", "/tmp/flutpu-jax-cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

ARMS = {
    # name: (hier, subpel, extra env)
    "kernel_full": (False, False, {}),
    "kernel_hier": (True, False, {}),
    "kernel_full_dygrid": (False, False, {"FLUTPU_SEARCH_DYGRID": "1"}),
    "xla_full_rolls": (False, False, {"FLUTPU_NO_MOTION_KERNEL": "1",
                                      "FLUTPU_MC_ROLLS": "1"}),
    "xla_full_gather": (False, False, {"FLUTPU_NO_MOTION_KERNEL": "1",
                                       "FLUTPU_MC_ROLLS": "0"}),
    "xla_full_halfpel": (False, True, {}),
}


def measure_device_ms(hier: bool, subpel: bool, reps: int = 4) -> float:
    """Device ms/GOP of the fused motion chunk encode (1080p, GOP=8)."""
    import jax
    import jax.numpy as jnp
    from flutpu.codec.fvc import fvc_mc_encode_chunk
    from flutpu.codec.jpeg import JpegEncoder
    from flutpu.codec.ops.testsrc import gradient_ball_planes

    enc = JpegEncoder(quality=85)
    H, W = 1088, 1920

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(start, qy, qc, reps=reps):
        def body(i, acc):
            planes = gradient_ball_planes(
                H, W, 8, start + i.astype(jnp.float32) * 8)
            ry, rcb, rcr, mvs, itypes = fvc_mc_encode_chunk(
                planes, qy, qc, pad_h=H, pad_w=W,
                hier=hier, subpel=subpel)
            return (acc + jnp.abs(ry).astype(jnp.uint32).sum()
                    + jnp.abs(rcb).astype(jnp.uint32).sum()
                    + jnp.abs(rcr).astype(jnp.uint32).sum()
                    + jnp.abs(mvs).astype(jnp.uint32).sum())
        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x8 = jnp.ones((8, 8), jnp.float32)
    float(tiny(x8))
    int(loop(jnp.float32(0), enc._qy_dev, enc._qc_dev))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(tiny(x8))
        rtt = time.time() - t0
        t0 = time.time()
        int(loop(jnp.float32(0), enc._qy_dev, enc._qc_dev))
        best = min(best, max(0.0, time.time() - t0 - rtt) / reps * 1000.0)
    return best


def main():
    arm = os.environ.get("_AB_ARM")
    if arm:
        hier, subpel, _ = ARMS[arm]
        try:
            ms = round(measure_device_ms(hier, subpel), 1)
        except Exception as e:  # keep one-line-per-arm on kernel rejections
            print(json.dumps({"metric": f"fvc_motion_{arm}_device_ms_per_gop",
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
            return
        print(json.dumps({"metric": f"fvc_motion_{arm}_device_ms_per_gop",
                          "value": ms, "unit": "ms/GOP"}), flush=True)
        return
    which = sys.argv[1:] or list(ARMS)
    for arm in which:
        env = dict(os.environ, _AB_ARM=arm, **ARMS[arm][2])
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, check=False)


if __name__ == "__main__":
    main()
