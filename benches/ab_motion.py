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
  kernel_full_4k / xla_chroma_4k — 2160x3840 pair: banded chroma kernel
                       vs the XLA chroma arm
  kernel_bframes1/2  — anchors scan + parallel B pass (bframes=1/2)
  kernel_full_dxmajor — full chunk encode with the round-5 dy-major/
                       static-dx kernel (now the product default;
                       kernel_full pins the candidate-major arm)
  search_kernel_full / search_kernel_dxmajor / search_mxu_ssd — the
                       search stage in isolation; the mxu arm measures
                       the verdict-prescribed GEMM formulation (lost
                       27x — PERF.md roofline)

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
    # dxmajor is the round-5 DEFAULT — kernel_full pins it OFF so the
    # arm keeps measuring the candidate-major formulation it names
    "kernel_full": (False, False, {"FLUTPU_SEARCH_DXMAJOR": "0"}),
    "kernel_hier": (True, False, {}),
    "kernel_full_dygrid": (False, False, {"FLUTPU_SEARCH_DYGRID": "1"}),
    "xla_full_rolls": (False, False, {"FLUTPU_NO_MOTION_KERNEL": "1",
                                      "FLUTPU_MC_ROLLS": "1"}),
    "xla_full_gather": (False, False, {"FLUTPU_NO_MOTION_KERNEL": "1",
                                       "FLUTPU_MC_ROLLS": "0"}),
    "xla_full_halfpel": (False, True, {}),
    # 4K arms (verdict r3 weak #4 / next #6): the banded chroma-MC kernel
    # vs the XLA chroma formulation at 2160x3840 — GOP=4 keeps the loop
    # state modest; compare ms/GOP only within the 4K pair.
    "kernel_full_4k": (False, False, {"_AB_4K": "1"}),
    "xla_chroma_4k": (False, False, {"_AB_4K": "1",
                                     "FLUTPU_NO_CHROMA_KERNEL": "1"}),
    # B-frame arms (round 4): anchors scan + parallel bidirectional pass
    # (fvc_mc_encode_chunk_b). Expect ~1.5x the search work of P-only
    # (half the frames pay two searches); compare against kernel_full.
    "kernel_bframes1": (False, False, {"_AB_BFRAMES": "1"}),
    "kernel_bframes2": (False, False, {"_AB_BFRAMES": "2"}),
    # Round-5 arms:
    # kernel_full_dxmajor — full chunk encode with the dy-major/static-dx
    #   search kernel (FLUTPU_SEARCH_DXMAJOR=1); compare to kernel_full.
    "kernel_full_dxmajor": (False, False, {"FLUTPU_SEARCH_DXMAJOR": "1"}),
    # search-only arms (stage isolation, 7 pairs/GOP at 1088x1920):
    #   search_kernel_full    — fused candidate-major kernel (search+pred)
    #   search_kernel_dxmajor — dy-major/static-dx kernel (search+pred)
    #   search_mxu_ssd        — the verdict's MXU GEMM formulation
    #                           (search ONLY — no prediction, so it gets
    #                           a head start and still has to win)
    "search_kernel_full": (False, False, {"_AB_SEARCH_ONLY": "kernel"}),
    "search_kernel_dxmajor": (False, False,
                              {"_AB_SEARCH_ONLY": "dxmajor"}),
    "search_mxu_ssd": (False, False, {"_AB_SEARCH_ONLY": "mxu_ssd"}),
}


def measure_search_only_ms(which: str, reps: int = 4) -> float:
    """Device ms/GOP of the SEARCH stage alone — 7 frame pairs of an
    8-frame 1088x1920 GOP, rep loop inside one program reduced to a
    scalar checksum. Isolates the formulation question (verdict r4 #3:
    can the MXU beat the VPU roll kernel at block matching?)."""
    import jax
    import jax.numpy as jnp
    from flutpu.codec.ops.testsrc import gradient_ball_planes

    H, W, gop = 1088, 1920, 8

    def search(cy, ref):
        if which == "kernel":
            from flutpu.codec.ops.motion_pallas import \
                motion_search_mc_pallas
            mv, pred = motion_search_mc_pallas(cy, ref, search_range=7)
            return (jnp.abs(mv).astype(jnp.uint32).sum()
                    + jnp.abs(pred).astype(jnp.uint32).sum())
        if which == "dxmajor":
            from flutpu.codec.ops.motion_pallas import \
                motion_search_mc_dxmajor_pallas
            mv, pred = motion_search_mc_dxmajor_pallas(cy, ref,
                                                       search_range=7)
            return (jnp.abs(mv).astype(jnp.uint32).sum()
                    + jnp.abs(pred).astype(jnp.uint32).sum())
        assert which == "mxu_ssd"
        from flutpu.codec.ops.motion import motion_search_ssd_mxu
        mv = motion_search_ssd_mxu(cy, ref, search_range=7)
        return jnp.abs(mv).astype(jnp.uint32).sum()

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(start, reps=reps):
        def body(i, acc):
            y, _, _ = gradient_ball_planes(
                H, W, gop, start + i.astype(jnp.float32) * gop)
            def pair(j, a):
                return a + search(y[j + 1], y[j])
            return jax.lax.fori_loop(0, gop - 1, pair, acc)
        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x8 = jnp.ones((8, 8), jnp.float32)
    float(tiny(x8))
    int(loop(jnp.float32(0)))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(tiny(x8))
        rtt = time.time() - t0
        t0 = time.time()
        int(loop(jnp.float32(0)))
        best = min(best, max(0.0, time.time() - t0 - rtt) / reps * 1000.0)
    return best


def measure_device_ms(hier: bool, subpel: bool, reps: int = 4) -> float:
    """Device ms/GOP of the fused motion chunk encode (1080p or, with
    _AB_4K=1, 2160x3840 GOP=4)."""
    import jax
    import jax.numpy as jnp
    from flutpu.codec.fvc import fvc_mc_encode_chunk, fvc_mc_encode_chunk_b
    from flutpu.codec.jpeg import JpegEncoder
    from flutpu.codec.ops.testsrc import gradient_ball_planes

    enc = JpegEncoder(quality=85)
    four_k = bool(os.environ.get("_AB_4K"))
    bframes = int(os.environ.get("_AB_BFRAMES", "0"))
    H, W = (2160, 3840) if four_k else (1088, 1920)
    gop = 4 if four_k else 8
    if four_k:
        reps = 2

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(start, qy, qc, reps=reps):
        def body(i, acc):
            planes = gradient_ball_planes(
                H, W, gop, start + i.astype(jnp.float32) * gop)
            if bframes:
                ry, rcb, rcr, fwd, bwd, modes, _ft = fvc_mc_encode_chunk_b(
                    planes, qy, qc, pad_h=H, pad_w=W,
                    bframes=bframes, hier=hier)
                mvs = fwd
            else:
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


def verify_chroma_4k():
    """Bit-identity of the banded chroma-MC kernel vs the XLA formulation
    at the 4K chroma shape (1080x1920) on the current backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flutpu.codec.ops.motion import motion_compensate
    from flutpu.codec.ops.motion_pallas import chroma_mc_fits, chroma_mc_pallas

    hc, wc, r = 1080, 1920, 7
    assert chroma_mc_fits(hc, wc), "4K chroma must ride the banded kernel"
    rng = np.random.default_rng(7)
    cb = jnp.asarray(rng.integers(0, 256, (hc, wc)).astype(np.float32))
    cr = jnp.asarray(rng.integers(0, 256, (hc, wc)).astype(np.float32))
    # luma-grid vectors (H/16, W/16, 2) == (hc//8, wc//8, 2), full-pel
    mv = jnp.asarray(rng.integers(-r, r + 1,
                                  (hc // 8, wc // 8, 2)).astype(np.int32))

    interp = jax.default_backend() == "cpu"  # interpret mode off-TPU

    @jax.jit
    def diff(cb, cr, mv):
        kb, kr = chroma_mc_pallas(cb, cr, mv, search_range=r,
                                  interpret=interp)
        xb = motion_compensate(cb, mv, search_range=r, mb=8)
        xr = motion_compensate(cr, mv, search_range=r, mb=8)
        return jnp.abs(kb - xb).max() + jnp.abs(kr - xr).max()

    d = float(np.asarray(diff(cb, cr, mv)))
    print(json.dumps({"metric": "fvc_chroma_mc_4k_kernel_vs_xla_maxdiff",
                      "value": d, "unit": "abs",
                      "backend": jax.default_backend()}), flush=True)
    return d


def main():
    if "--verify-chroma-4k" in sys.argv:
        verify_chroma_4k()
        return
    arm = os.environ.get("_AB_ARM")
    if arm:
        hier, subpel, _ = ARMS[arm]
        try:
            so = os.environ.get("_AB_SEARCH_ONLY")
            ms = round(measure_search_only_ms(so) if so
                       else measure_device_ms(hier, subpel), 1)
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
        # the parent already holds the TPU-measurement lock around all
        # arms; mark it held so the child's own acquisition doesn't
        # nest-wait on its parent (flock is not re-entrant)
        env = dict(os.environ, _AB_ARM=arm, FLUTPU_TPU_LOCK_HELD="1",
                   **ARMS[arm][2])
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, check=False)


if __name__ == "__main__":
    from flutpu.benchlock import hold_tpu_lock
    with hold_tpu_lock('ab_motion.py', timeout_s=2400.0):
        main()
