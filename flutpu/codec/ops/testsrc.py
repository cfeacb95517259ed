"""On-device test video source — jitted frame synthesis.

The device-resident analog of videotestsrc: frames are generated directly in
HBM so benchmarks and self-tests of the encode path measure the pipeline,
not the host link (this image's host↔device tunnel moves ~14 MB/s, which
would otherwise dominate any raw-video measurement). Patterns are
deterministic functions of the frame index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("h", "w", "n"))
def gradient_ball_frames(h: int, w: int, n: int, start: jnp.ndarray):
    """n frames of a moving bright ball over an animated gradient —
    realistic mixed content (smooth background + moving edge detail).
    Returns (n, h, w, 3) uint8."""
    idx = start + jnp.arange(n, dtype=jnp.float32)
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    i = idx[:, None, None]

    r = (xx * 255.0 / max(w - 1, 1))
    g = (yy * 255.0 / max(h - 1, 1))
    b = (i * 5.0) % 256.0
    r = jnp.broadcast_to(r, (n, h, w))
    g = jnp.broadcast_to(g, (n, h, w))
    b = jnp.broadcast_to(b, (n, h, w))

    cx = (0.5 + 0.4 * jnp.sin(i * 0.2)) * w
    cy = (0.5 + 0.4 * jnp.cos(i * 0.23)) * h
    rad = max(4.0, min(h, w) / 10.0)
    mask = ((xx - cx) ** 2 + (yy - cy) ** 2) <= rad * rad
    frame = jnp.stack([r, g, b], axis=-1)
    frame = jnp.where(mask[..., None], 255.0, frame)
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)
