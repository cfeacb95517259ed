#!/bin/bash
# Hardware runbook — run (in background) the moment the axon link recovers.
# Ordered cheapest-first so a mid-run link loss still yields data; the 4K
# first-time compiles (the risky remote compiles, per CLAUDE.md) go LAST.
# Logs to /tmp/hw_runbook.log; every step is timeout-bounded.
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

# 2. 4K chroma-MC A/B: banded kernel vs XLA chroma (verdict #6 hardware half)
say "ab_motion 4K chroma A/B"
timeout 2400 python benches/ab_motion.py kernel_full_4k xla_chroma_4k >>"$LOG" 2>&1

# 3. 4K chroma bit-identity ON HARDWARE (interpret mode has lied before)
say "ab_motion --verify-chroma-4k (hardware)"
timeout 1800 python benches/ab_motion.py --verify-chroma-4k >>"$LOG" 2>&1

# 4. 1080p stage split refresh (cached programs; cheap)
say "stage_split_fvc 1080p"
timeout 2400 python benches/stage_split_fvc.py >>"$LOG" 2>&1

# 5. 4K stage split — the big first-time compiles, last
say "stage_split_fvc 4K"
STAGE_4K=1 timeout 3600 python benches/stage_split_fvc.py >>"$LOG" 2>&1

say "runbook done"
