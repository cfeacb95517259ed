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


def _gradient_ball_channels(h: int, w: int, n: int, start: jnp.ndarray):
    """Shared math of the gradient-ball pattern as three f32 channel
    planes (r, g, b), each (n, h, w), BEFORE clip/cast."""
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
    return tuple(jnp.where(mask, 255.0, p) for p in (r, g, b))


@functools.partial(jax.jit, static_argnames=("h", "w", "n"))
def gradient_ball_frames(h: int, w: int, n: int, start: jnp.ndarray):
    """n frames of a moving bright ball over an animated gradient —
    realistic mixed content (smooth background + moving edge detail).
    Returns (n, h, w, 3) uint8."""
    r, g, b = _gradient_ball_channels(h, w, n, start)
    frame = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(frame, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h", "w", "n"))
def gradient_ball_planes(h: int, w: int, n: int, start: jnp.ndarray):
    """gradient_ball_frames in CHANNEL-PLANAR form: (r, g, b) uint8
    planes, each (n, h, w) — value-identical to slicing the interleaved
    frames (same per-channel math, clip, cast).

    Why this exists (measured, v5e): a materialized (n, h, w, 3) uint8
    array tiles its last two dims as (w, 3) — 3 of 128 lanes carry data,
    so every consumer pays ~42x the vector work. The fused
    convert stage measured 8.93 ms/GOP reading the interleaved form vs
    0.21 ms/GOP reading planes. Device pipelines should stay planar from
    the source onward; the interleaved variant remains as the host-API
    analog (video frames arrive interleaved from real sources)."""
    r, g, b = _gradient_ball_channels(h, w, n, start)
    return tuple(jnp.clip(p, 0, 255).astype(jnp.uint8) for p in (r, g, b))
