"""Axon-link health gate for TPU wall-clock measurements (round 5).

The link has two distinct failure modes (CLAUDE.md):
  * DOWN — ops hang; bench.py's subprocess probe catches this.
  * DEGRADED — ops complete but 10-1000x slow for minutes to hours. A
    cold probe "succeeding in 2.3 s" does NOT catch this: round-5 saw a
    locked, uncontended bench.py measure 18.7 fps / 356.7 device ms/GOP
    (vs the normal ~16 ms) right after a probe passed.

This module measures WARM latencies — a warm tiny-op round trip and a
warm compute loop (100 chained 256x256 matmuls reduced to a scalar) —
and gates on both, which separates "link slow" (RTT blows up) from
"chip slow" (compute blows up, e.g. shared-tenant load).

Library:   from benches.linkhealth import probe, wait_healthy
CLI:       python benches/linkhealth.py [--wait SECS]
Exit code: 0 healthy, 1 not (after the optional wait budget).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RTT_MS_MAX = 250.0       # normal warm tiny-op fetch ~25-60 ms
COMPUTE_MS_MAX = 400.0   # normal warm 100x(256x256 matmul) loop well under
# bulk device->host fetch; tunnel is ~50 MB/s healthy. Overridable:
# capture scripts hunting a CLEAN window set 40; 20 = merely functional
FETCH_MBPS_MIN = float(os.environ.get("FLUTPU_FETCH_MBPS_MIN", "20"))
#                          healthy and the finalize path needs ~0.6 MB/GOP
#                          (round-5 saw RTT/compute healthy at 25 ms while
#                          bulk fetch degraded and wall fps halved)


def probe():
    """Warm-latency measurement; returns dict of medians in ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    @jax.jit
    def compute(x):
        def body(i, a):
            return a @ x + 1.0
        return jax.lax.fori_loop(0, 100, body, x).sum()

    @jax.jit
    def bulk(x):
        return x + 1.0

    x8 = jnp.ones((8, 8), jnp.float32)
    xc = jnp.full((256, 256), 1e-3, jnp.float32)
    xb = jnp.zeros((1024, 1024), jnp.float32)   # 4 MB fetch
    float(tiny(x8))                      # warm/compile
    float(compute(xc))
    np.asarray(bulk(xb))
    rtts, comps, bws = [], [], []
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(tiny(x8)))
        rtts.append((time.time() - t0) * 1000)
        t0 = time.time()
        float(np.asarray(compute(xc)))
        comps.append((time.time() - t0) * 1000)
        t0 = time.time()
        np.asarray(bulk(xb))
        dt = time.time() - t0
        bws.append(4.0 / max(dt - rtts[-1] / 1000, 1e-3))
    return {"warm_rtt_ms": round(sorted(rtts)[1], 1),
            "warm_compute_ms": round(sorted(comps)[1], 1),
            "fetch_mbps": round(sorted(bws)[1], 1)}


def is_healthy(p=None):
    p = p or probe()
    ok = (p["warm_rtt_ms"] < RTT_MS_MAX
          and p["warm_compute_ms"] < COMPUTE_MS_MAX
          and p.get("fetch_mbps", 1e9) > FETCH_MBPS_MIN)
    return ok, p


def wait_healthy(budget_s: float = 1800.0, poll_s: float = 120.0,
                 log=lambda *a: None):
    """Poll until healthy or budget exhausted. In-process: call ONLY
    from the main thread before any other jax work (the first-execution
    main-thread rule) or from a process that has already executed."""
    deadline = time.time() + budget_s
    while True:
        try:
            ok, p = is_healthy()
        except Exception as e:
            ok, p = False, {"error": f"{type(e).__name__}: {e}"[:120]}
        log(json.dumps({"healthy": ok, **p}))
        if ok or time.time() + poll_s > deadline:
            return ok, p
        time.sleep(poll_s)


if __name__ == "__main__":
    budget = 0.0
    if "--wait" in sys.argv:
        budget = float(sys.argv[sys.argv.index("--wait") + 1])
    ok, p = wait_healthy(budget_s=budget,
                         log=lambda m: print(m, flush=True))
    sys.exit(0 if ok else 1)
