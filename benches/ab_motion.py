"""A/B harness for the motion-path variants on real hardware.

Measures 1080p fvc-motion GOP encode under:
  - gather-based motion compensation (default) vs masked rolls
    (FLUTPU_MC_ROLLS=1 — env must be set before import, so the roll arm
    runs in a subprocess)
  - full vs hierarchical motion search

Run on the TPU host: python benches/ab_motion.py
Prints one JSON line per arm.
"""

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


def measure(hier: bool, gops: int = 3) -> float:
    import jax.numpy as jnp
    from flutpu.codec.fvc import FvcEncoder
    from flutpu.codec.ops.testsrc import gradient_ball_frames
    enc = FvcEncoder(quality=85, motion=True, hier=hier,
                     subpel=not os.environ.get("_AB_NO_SUBPEL"))
    enc.encode_chunk(gradient_ball_frames(1080, 1920, 8, jnp.float32(0)))
    t0 = time.time()
    for g in range(gops):
        enc.encode_chunk(gradient_ball_frames(1080, 1920, 8,
                                              jnp.float32(8 * (g + 1))))
    return gops * 8 / (time.time() - t0)


def main():
    if os.environ.get("_AB_ARM"):
        hier = os.environ["_AB_ARM"] == "hier"
        print(json.dumps({
            "metric": f"fvc_motion_{os.environ['_AB_ARM']}"
                      + ("_rolls" if os.environ.get("FLUTPU_MC_ROLLS")
                         else "_gather")
                      + ("_intpel" if os.environ.get("_AB_NO_SUBPEL")
                         else "_halfpel"),
            "value": round(measure(hier), 2), "unit": "frames/s"}),
            flush=True)
        return
    for arm in ("full", "hier"):
        for rolls in ("", "1"):
            env = dict(os.environ, _AB_ARM=arm)
            if rolls:
                env["FLUTPU_MC_ROLLS"] = rolls
                env["_AB_NO_SUBPEL"] = "1"  # rolls path is integer-only
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, check=False)
    env = dict(os.environ, _AB_ARM="full", _AB_NO_SUBPEL="1")
    subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                   check=False)


if __name__ == "__main__":
    main()
