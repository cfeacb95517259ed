#!/bin/bash
# Hardware runbook — run (in background) the moment the axon link recovers.
# Ordered cheapest-first so a mid-run link loss still yields data; first-time
# compiles of NEW shapes (the risky remote compiles, per CLAUDE.md) go LAST.
# Logs to /tmp/hw_runbook.log; every step is timeout-bounded.
#
# Round-4 session-5 goals:
#   1. fresh headline capture (warms /tmp/flutpu-jax-cache for the driver's
#      BENCH_r04 run; kernel front end is the default — expect ~350 fps,
#      device ~15.7 ms/GOP)
#   2. configs 5/6 with the kernel front end (burn-in / FVC v1 / motion)
#   3. 4K encode+burn-in margin check
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/hw_runbook.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

# Measurement discipline (CLAUDE.md): CPU-heavy local work (pytest, CPU
# baselines) running concurrently silently drops TPU wall-clock numbers
# 20-40%. Anyone starting such work touches /tmp/flutpu_cpu_busy; every
# measurement step waits (bounded) for it to clear.
cpu_gate() {
  local waited=0
  while [ -e /tmp/flutpu_cpu_busy ] && [ "$waited" -lt 2400 ]; do
    [ "$waited" = 0 ] && say "cpu_gate: waiting for /tmp/flutpu_cpu_busy to clear"
    sleep 30; waited=$(( waited + 30 ))
  done
  [ -e /tmp/flutpu_cpu_busy ] && say "cpu_gate: flag stuck after ${waited}s — proceeding (numbers may be contended)"
}

say "runbook start"
# 0. tiny probe — the link has minutes-long DEGRADED phases (CLAUDE.md), so
# retry with backoff inside a bounded budget (mirrors bench.py's probe loop)
# instead of aborting on the first slow window.
PROBE_BUDGET=${FLUTPU_RUNBOOK_PROBE_BUDGET_S:-1500}
PROBE_DEADLINE=$(( $(date +%s) + PROBE_BUDGET ))
PROBE_OK=0
DELAY=60
while :; do
  if timeout -k 15 150 python -c "
import time, jax, jax.numpy as jnp, numpy as np
t0=time.time(); x=jnp.ones((8,8))
print('probe ok', float(np.asarray((x@x).sum())), round(time.time()-t0,1), 's')
" >>"$LOG" 2>&1; then
    PROBE_OK=1; break
  fi
  NOW=$(date +%s)
  if [ $(( NOW + DELAY )) -ge "$PROBE_DEADLINE" ]; then break; fi
  say "probe failed — link degraded; retrying in ${DELAY}s ($(( PROBE_DEADLINE - NOW ))s budget left)"
  sleep "$DELAY"
  DELAY=$(( DELAY * 2 > 300 ? 300 : DELAY * 2 ))
done
if [ "$PROBE_OK" != 1 ]; then
  say "probe FAILED for ${PROBE_BUDGET}s — link down, aborting runbook"
  exit 1
fi

# 1. headline capture (driver shape; best-of-2 + device_ms_per_gop built in)
cpu_gate
say "bench.py headline"
timeout -k 15 2400 python bench.py >>"$LOG" 2>&1

# 2. secondary configs at the kernel front end (cached shapes; cheap)
cpu_gate
say "bench_all full (encode+burn-in)"
timeout -k 15 2400 python benches/bench_all.py full >>"$LOG" 2>&1
cpu_gate
say "bench_all fvc (v1 + motion)"
timeout -k 15 2400 python benches/bench_all.py fvc >>"$LOG" 2>&1

# 3. 4K margin (bigger shapes last)
cpu_gate
say "bench_all full4k (encode+burn-in at 4K; warm-cache shapes)"
timeout -k 15 3000 python benches/bench_all.py full4k >>"$LOG" 2>&1

# 4. batched-dispatch A/B (NEW static shapes — first-time compiles, so
# last): 16/32 frames per dispatch amortize the ~25 ms per-RTT link cost;
# device ms/frame should be flat, wall fps is the question.
cpu_gate
say "bench.py gop=16 A/B (batched dispatch)"
timeout -k 15 3000 env FLUTPU_BENCH_GOP=16 python bench.py >>"$LOG" 2>&1
cpu_gate
say "bench.py gop=32 A/B (batched dispatch)"
timeout -k 15 3000 env FLUTPU_BENCH_GOP=32 python bench.py >>"$LOG" 2>&1
cpu_gate
say "bench_all full gop=16 (batched burn-in dispatch)"
timeout -k 15 3000 env FLUTPU_BENCH_GOP=16 python benches/bench_all.py full >>"$LOG" 2>&1

say "runbook done"
