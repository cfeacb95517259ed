#!/bin/bash
# Hardware runbook — run (in background) the moment the axon link recovers.
# Ordered cheapest-first so a mid-run link loss still yields data; first-time
# compiles of NEW shapes (the risky remote compiles, per CLAUDE.md) go LAST.
# Logs to /tmp/hw_runbook.log; every step is timeout-bounded.
#
# Round-5 session goals:
#   1. clean headline at the adopted dispatch batch (TPU lock held)
#   2. motion dx-major kernel A/B + MXU-SSD arm (benches/ab_motion.py)
#   3. configs 5/6 re-check, 4K margin
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/hw_runbook.log
say() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

# Measurement discipline (CLAUDE.md): CPU-heavy local work (pytest, CPU
# baselines) running concurrently silently drops TPU wall-clock numbers
# 20-40%. Anyone starting such work touches /tmp/flutpu_cpu_busy; every
# measurement step waits (bounded) for it to clear. A flag older than
# STALE_AGE is treated as abandoned (advisor r4: a crashed holder must
# not re-charge every later gate its full wait), and once one gate
# declares it stuck the remaining gates skip the long wait too.
CPU_FLAG=/tmp/flutpu_cpu_busy
STALE_AGE=2700   # live holders refresh mtime (flutpu.benchlock.hold_cpu_busy)
CPU_FLAG_STUCK=0
flag_age() { echo $(( $(date +%s) - $(stat -c %Y "$CPU_FLAG" 2>/dev/null || echo 0) )); }
cpu_gate() {
  local budget=2400
  if [ "$CPU_FLAG_STUCK" = 1 ]; then budget=60; fi
  local waited=0
  while [ -e "$CPU_FLAG" ] && [ "$waited" -lt "$budget" ]; do
    if [ "$(flag_age)" -gt "$STALE_AGE" ]; then
      say "cpu_gate: flag is $(flag_age)s old — stale holder, proceeding"
      CPU_FLAG_STUCK=1
      return 0
    fi
    [ "$waited" = 0 ] && say "cpu_gate: waiting for $CPU_FLAG to clear"
    sleep 30; waited=$(( waited + 30 ))
  done
  if [ -e "$CPU_FLAG" ]; then
    say "cpu_gate: flag stuck after ${waited}s — proceeding (numbers may be contended)"
    CPU_FLAG_STUCK=1
  fi
  return 0
}

# TPU-measurement mutex (round-5 verdict #1): wall-clock TPU numbers are
# exclusive — the round-4 driver capture collided with this runbook's own
# arms on the same chip. Each step takes flock(1) on the shared lock file
# and marks it held so the Python tools' own fcntl lock (flutpu/benchlock
# .py) doesn't nest-wait. Lock wait is bounded; the step then runs anyway
# (contended beats absent) with the wait visible in the log.
TPU_LOCK=/tmp/flutpu_tpu_busy.lock
tpu_step() {
  flock -w 3000 "$TPU_LOCK" env FLUTPU_TPU_LOCK_HELD=1 "$@" \
    || say "step rc=$? (lock wait expired or command failed)"
  return 0
}

say "runbook start"
# 0. tiny probe — the link has minutes-long DEGRADED phases (CLAUDE.md), so
# retry with backoff inside a bounded budget (mirrors bench.py's probe loop)
# instead of aborting on the first slow window. One attempt needs <=165s
# (150s timeout + kill grace); keep trying while the remaining budget can
# cover an attempt, clamping the sleep to what's left (advisor r4: the old
# loop forfeited up to ~300s of budget without a final attempt).
PROBE_BUDGET=${FLUTPU_RUNBOOK_PROBE_BUDGET_S:-1500}
PROBE_START=$(date +%s)
PROBE_DEADLINE=$(( PROBE_START + PROBE_BUDGET ))
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
  REMAIN=$(( PROBE_DEADLINE - NOW ))
  if [ "$REMAIN" -lt 165 ]; then break; fi   # can't fit another attempt
  SLEEP=$(( DELAY < REMAIN - 165 ? DELAY : REMAIN - 165 ))
  [ "$SLEEP" -lt 1 ] && SLEEP=1
  say "probe failed — link degraded; retrying in ${SLEEP}s (${REMAIN}s budget left)"
  sleep "$SLEEP"
  DELAY=$(( DELAY * 2 > 300 ? 300 : DELAY * 2 ))
done
if [ "$PROBE_OK" != 1 ]; then
  say "probe FAILED after $(( $(date +%s) - PROBE_START ))s — link down, aborting runbook"
  exit 1
fi

# 1. headline capture (driver shape; best-of-2 + device_ms_per_gop built in)
cpu_gate
say "bench.py headline"
tpu_step timeout -k 15 2400 python bench.py >>"$LOG" 2>&1

# 2. motion kernel A/B: dx-major static-roll arm + MXU-SSD arm (round 5)
cpu_gate
say "ab_motion device A/B (full vs dxmajor vs mxu-ssd)"
tpu_step timeout -k 15 3000 python benches/ab_motion.py >>"$LOG" 2>&1

# 3. secondary configs at the kernel front end (cached shapes; cheap)
cpu_gate
say "bench_all full (encode+burn-in)"
tpu_step timeout -k 15 2400 python benches/bench_all.py full >>"$LOG" 2>&1
cpu_gate
say "bench_all fvc (v1 + motion)"
tpu_step timeout -k 15 2400 python benches/bench_all.py fvc >>"$LOG" 2>&1

# 4. 4K margin (bigger shapes last)
cpu_gate
say "bench_all full4k (encode+burn-in at 4K; warm-cache shapes)"
tpu_step timeout -k 15 3000 python benches/bench_all.py full4k >>"$LOG" 2>&1

# 5. 4K motion stage table (device-time; needs only the compute gate)
cpu_gate
say "stage_split_fvc 4K"
tpu_step timeout -k 15 3600 env STAGE_4K=1 python benches/stage_split_fvc.py >>"$LOG" 2>&1

say "runbook done"
