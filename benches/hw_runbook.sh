#!/bin/bash
# Hardware runbook — run (in background) the moment the axon link recovers.
# Ordered cheapest-first so a mid-run link loss still yields data; first-time
# compiles of NEW shapes (the risky remote compiles, per CLAUDE.md) go LAST.
# Logs to /tmp/hw_runbook.log; every step is timeout-bounded.
#
# Round-4 session-4 goals:
#   1. fresh headline capture (warms /tmp/flutpu-jax-cache for the driver)
#   2. planar-era device-budget decomposition (stage_split.py full-program
#      arms + the labeled cut probes) — decides whether a fused Pallas
#      front end (convert+DCT+quant for materialized-input paths) is worth
#      building
#   3. B-frame element-level fps (bench_all fvc-b)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/hw_runbook.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

say "runbook start"
# 0. tiny probe — bail early if the link is still degraded
if ! timeout 150 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time(); x=jnp.ones((8,8))
print('probe ok', float(np.asarray((x@x).sum())), round(time.time()-t0,1), 's')
" >>"$LOG" 2>&1; then
  say "probe FAILED — link still degraded, aborting runbook"
  exit 1
fi

# 1. headline capture (driver shape; best-of-2 + device_ms_per_gop built in)
say "bench.py headline"
timeout 2400 python bench.py >>"$LOG" 2>&1

# 2. planar-era stage decomposition (cached shapes; cheap)
say "stage_split 1080p full-program arms"
timeout 2400 python benches/stage_split.py >>"$LOG" 2>&1

# 3. B-frame element fps (new program family: bframes through the
#    threaded-finalize pipeline)
say "bench_all fvc-b"
timeout 2400 python benches/bench_all.py fvc-b >>"$LOG" 2>&1

say "runbook done"
