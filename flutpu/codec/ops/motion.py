"""Motion estimation/compensation — block matching as device math.

The TPU-native take on a codec's motion search: instead of per-macroblock
scalar loops, the full search evaluates every candidate displacement as a
whole-frame vector op (roll → absolute difference → per-macroblock box
reduction), keeping everything on the VPU with static shapes. Predictions
use wrap-around semantics (jnp.roll) — a valid predictor as long as the
decoder mirrors it, which ours does.

16x16 luma macroblocks; chroma (4:2:0) is compensated with the luma vector
halved on an 8x8 grid.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

MB = 16  # luma macroblock


def _mb_sums(diff: jnp.ndarray, mb: int) -> jnp.ndarray:
    """(H, W) → per-macroblock sums (H/mb, W/mb)."""
    h, w = diff.shape
    return diff.reshape(h // mb, mb, w // mb, mb).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("search_range",))
def motion_search(cur_y: jnp.ndarray, prev_y: jnp.ndarray,
                  search_range: int = 7):
    """Full-search motion estimation.

    cur_y/prev_y: (H, W) float luma (H, W multiples of 16).
    Returns mv (mbh, mbw, 2) int32 — per-macroblock (dy, dx) minimizing SAD
    over the ±search_range window (ties → first candidate scanned).
    """
    h, w = cur_y.shape
    mbh, mbw = h // MB, w // MB
    n = 2 * search_range + 1

    def body(c, state):
        best_cost, best_mv = state
        dy = c // n - search_range
        dx = c % n - search_range
        shifted = jnp.roll(prev_y, (dy, dx), axis=(0, 1))
        cost = _mb_sums(jnp.abs(cur_y - shifted), MB)
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        mv_c = jnp.stack([jnp.full_like(cost, dy, dtype=jnp.int32),
                          jnp.full_like(cost, dx, dtype=jnp.int32)], axis=-1)
        best_mv = jnp.where(better[..., None], mv_c, best_mv)
        return best_cost, best_mv

    # data-derived init (not jnp.full/zeros) so the loop carry keeps the
    # inputs' varying-manual-axes under shard_map
    z = cur_y[::MB, ::MB].astype(jnp.float32) * 0  # (mbh, mbw)
    init = (z + jnp.inf, jnp.stack([z, z], axis=-1).astype(jnp.int32))
    _, mv = jax.lax.fori_loop(0, n * n, body, init)
    return mv


@functools.partial(jax.jit, static_argnames=("search_range", "mb"))
def motion_compensate(prev: jnp.ndarray, mv: jnp.ndarray,
                      search_range: int = 7, mb: int = MB):
    """Build the prediction: each mb×mb block of the output comes from
    ``prev`` displaced by its motion vector (wrap-around edges).

    prev: (H, W); mv: (H/mb_l, W/mb_l, 2) on the LUMA grid — for chroma
    pass mb=8 and the same mv (vectors are halved internally when
    mb != MB).

    One flat gather from per-pixel source indices — (2r+1)² x less HBM
    traffic than enumerating every candidate displacement as a masked
    roll (the roll form stays available via FLUTPU_MC_ROLLS=1 for
    hardware A/B; both are bit-identical).
    """
    import os
    if os.environ.get("FLUTPU_MC_ROLLS"):
        return _motion_compensate_rolls(prev, mv, search_range, mb)
    h, w = prev.shape
    scale = MB // mb  # 1 luma, 2 chroma
    dy = mv[..., 0] if scale == 1 else mv[..., 0] // 2
    dx = mv[..., 1] if scale == 1 else mv[..., 1] // 2
    dy_full = jnp.repeat(jnp.repeat(dy, mb, axis=0), mb, axis=1)
    dx_full = jnp.repeat(jnp.repeat(dx, mb, axis=0), mb, axis=1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # jnp.roll(a, s) places a[(i - s) % n] at out[i]
    sy = (yy - dy_full) % h
    sx = (xx - dx_full) % w
    return prev.reshape(-1)[sy * w + sx]


def _motion_compensate_rolls(prev: jnp.ndarray, mv: jnp.ndarray,
                             search_range: int, mb: int):
    """Candidate-enumeration formulation (reference for A/B)."""
    h, w = prev.shape
    n = 2 * search_range + 1
    scale = MB // mb

    def body(c, pred):
        dy = c // n - search_range
        dx = c % n - search_range
        sdy = dy // scale if scale == 1 else dy // 2
        sdx = dx // scale if scale == 1 else dx // 2
        shifted = jnp.roll(prev, (sdy, sdx), axis=(0, 1))
        sel = (mv[..., 0] == dy) & (mv[..., 1] == dx)  # (mbh, mbw)
        mask = jnp.repeat(jnp.repeat(sel, mb, axis=0), mb, axis=1)
        return jnp.where(mask, shifted, pred)

    return jax.lax.fori_loop(0, n * n, body, prev * 0)
