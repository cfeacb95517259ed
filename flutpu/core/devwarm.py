"""First-execution device warmup (axon TPU link).

MEASURED on this image (round 3): the FIRST jax computation in a process
must run on the MAIN thread. A first execution issued from a worker
thread wedges the axon backend permanently — a tiny (8, 8) matmul never
returned within 350 s from a fresh worker thread, while after ANY
main-thread execution the same worker-thread programs complete in
seconds (``jax.devices()`` alone does not arm it; the first *execution*
does). Pipelines run encoders on streaming threads, so every element
path would hit this wedge on its first buffer. The framework therefore
warms the device from construction / ``play()`` — which run on the
caller (normally main) thread — before any streaming thread touches jax.

Cheap: one (8, 8) matmul + scalar fetch, once per process; a no-op on
CPU backends and on every later call.
"""

from __future__ import annotations

import threading

_done = False
_lock = threading.Lock()


def skip_warmup() -> None:
    """Disable the construction-time warmup for this process. For tools
    that construct elements WITHOUT streaming any data (flutpu.inspect):
    touching the accelerator there would hang for minutes when the remote
    link is down, for zero benefit."""
    global _done
    _done = True


def warm_device() -> None:
    """Run one tiny device program from the calling thread (idempotent).

    Call on the main thread before any streaming thread executes jax
    work. Safe (and free) to call repeatedly or on CPU backends.
    """
    global _done
    if _done:
        return
    with _lock:
        if _done:
            return
        import jax

        if jax.default_backend() == "cpu":
            _done = True
            return
        if threading.current_thread() is not threading.main_thread():
            # executing from here would BE the wedge; leave unwarmed so
            # a later main-thread call can still arm the backend
            from .log import Category
            Category("devwarm").warning(
                "warm_device() first called from a non-main thread; "
                "the axon backend wedges if its first execution is off "
                "the main thread — call flutpu.core.devwarm.warm_device()"
                " (or construct the pipeline) on the main thread first")
            return
        import jax.numpy as jnp

        x = jnp.ones((8, 8), jnp.float32)
        float((x @ x).sum())  # scalar fetch forces execution (CLAUDE.md)
        _done = True
