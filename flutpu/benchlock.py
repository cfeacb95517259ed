"""TPU-measurement mutex (round-5 verdict #1).

The round-4 driver capture (BENCH_r04: 311.69 fps) ran concurrently with
the builder's own `benches/hw_runbook.sh` arms on the same chip and
understated the clean band (352-366 fps) — the cpu_busy convention gated
CPU contention but nothing serialized two *TPU* measurements. Every
wall-clock TPU measurement now takes an exclusive `flock` on
/tmp/flutpu_tpu_busy.lock:

  * Python benches: `with hold_tpu_lock("label"):` around the measured
    region (bench.py, benches/bench_all.py, benches/tpu_sweep.py,
    benches/ab_motion.py, benches/stage_split*.py).
  * Shell (hw_runbook.sh): `flock -w <secs> /tmp/flutpu_tpu_busy.lock
    <cmd>` — fcntl flock and flock(1) interoperate on the same file.

Acquisition is bounded: after `timeout_s` the measurement proceeds with
a warning (mirrors the cpu_gate convention — a wedged lock holder must
never deadlock the driver's capture), and the JSON consumer can see the
contention in the log. The lock is advisory and held only around the
measured region, never around probe/retry loops.
"""

from __future__ import annotations

import contextlib
import errno
import fcntl
import os
import sys
import time

LOCK_PATH = "/tmp/flutpu_tpu_busy.lock"
CPU_BUSY_PATH = "/tmp/flutpu_cpu_busy"


@contextlib.contextmanager
def hold_tpu_lock(label: str = "", timeout_s: float = 3600.0,
                  path: str = LOCK_PATH, quiet: bool = False):
    """Exclusive advisory lock serializing TPU wall-clock measurements.

    Yields True if the lock was acquired, False if the bounded wait
    expired (the caller proceeds either way; contended numbers are
    better than a hung driver, but the contention is now visible).
    CPU-backend runs (tests, FLUTPU_CPU) skip the lock entirely.
    """
    if os.environ.get("FLUTPU_CPU") or os.environ.get("JAX_PLATFORMS") == "cpu":
        yield True
        return
    if os.environ.get("FLUTPU_TPU_LOCK_HELD"):
        # an enclosing process (hw_runbook.sh step via flock(1)) already
        # holds the lock — flock is not re-entrant across processes, so
        # a nested bounded wait here would stall every step for its full
        # timeout and then run contended anyway
        yield True
        return
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
    acquired = False
    deadline = time.time() + timeout_s
    warned = False
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                acquired = True
                break
            except OSError as e:
                if e.errno not in (errno.EAGAIN, errno.EACCES):
                    raise
            if not warned and not quiet:
                print(f"tpu_lock[{label}]: waiting for a concurrent TPU "
                      f"measurement to finish ({path})", file=sys.stderr,
                      flush=True)
                warned = True
            if time.time() >= deadline:
                if not quiet:
                    print(f"tpu_lock[{label}]: wait expired after "
                          f"{timeout_s:.0f}s — proceeding (numbers may be "
                          f"contended)", file=sys.stderr, flush=True)
                break
            time.sleep(min(5.0, max(0.1, deadline - time.time())))
        if acquired:
            try:
                os.ftruncate(fd, 0)
                os.write(fd, f"{os.getpid()} {label}\n".encode())
            except OSError:
                pass
        yield acquired
    finally:
        if acquired:
            try:
                fcntl.flock(fd, fcntl.LOCK_UN)
            except OSError:
                pass
        os.close(fd)


@contextlib.contextmanager
def hold_cpu_busy():
    """Touch /tmp/flutpu_cpu_busy for the duration of CPU-heavy work
    (the CLAUDE.md convention the runbook's cpu_gate polls). Safe under
    concurrent holders: the flag carries this PID and is only removed
    by the process that created it; a crashed holder leaves a stale
    flag whose AGE the runbook now checks (advisor r4 fix)."""
    created = False
    try:
        if not os.path.exists(CPU_BUSY_PATH):
            with open(CPU_BUSY_PATH, "w") as f:
                f.write(f"{os.getpid()}\n")
            created = True
        else:
            # refresh mtime so age-based staleness checks see a live
            # holder even when this process merely joins an existing one
            os.utime(CPU_BUSY_PATH, None)
        yield
    finally:
        if created:
            try:
                os.remove(CPU_BUSY_PATH)
            except OSError:
                pass
