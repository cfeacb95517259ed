"""Pallas TPU kernel: fused full-search motion estimation + prediction.

The XLA formulation (ops/motion.py) rolls the full reference frame once
per candidate and mb-reduces the absolute difference — every candidate
pays full-frame HBM traffic (measured on the chip: ~145 ms/GOP for the
search loop and another ~54 ms for the masked-roll compensation at 1080p,
~70% of motion-mode encode time). This kernel keeps a horizontal band of
the current frame and the wrap-padded reference resident in VMEM and runs
both 225-candidate loops on-chip:

  pass 1 (search): per candidate, SAD per macroblock via a sublane
      reduction + a block-diagonal-ones MXU matmul for the lane direction;
      running argmin in VMEM (first-scanned candidate wins ties — the
      XLA loop's order, reproduced).
  pass 2 (predict): per candidate, select the shifted reference into the
      prediction wherever that candidate won (per-pixel candidate-index
      map built once with the same ones matrix).

All arithmetic is f32 — mv and prediction are bit-identical to
motion_search + motion_compensate (tested in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache()
def _ones_blockdiag(w: int, mb: int) -> np.ndarray:
    """(w, w//mb) f32: column j sums lanes [j*mb, (j+1)*mb)."""
    m = np.zeros((w, w // mb), np.float32)
    for j in range(w // mb):
        m[j * mb:(j + 1) * mb, j] = 1.0
    return m


def _search_mc_kernel(cur_ref, prevp_ref, ones_ref, onest_ref,
                      mvy_ref, mvx_ref, pred_ref, *, rows, w, rng, mb):
    n = 2 * rng + 1
    mbr = rows // mb          # macroblock rows in this band
    mbw = ones_ref.shape[1]   # 128-padded mb columns (pad cols: zero ones
    #                           -> zero SAD -> candidate 0 wins; those mv
    #                           lanes are sliced away by the caller and
    #                           the transposed ones' zero rows keep them
    #                           out of the prediction)

    def shifted(c):
        # dynamic-start slices must be tile-aligned on TPU; a dynamic
        # circular roll + static slice expresses the same window.
        # pltpu.roll requires NON-NEGATIVE shifts (negative traced shifts
        # silently mis-rotate on hardware while interpret mode matches
        # np.roll — measured as wildly wrong motion vectors), so roll
        # right by (size - k) instead of left by k.
        dy = c // n - rng
        dx = c % n - rng
        p0, p1 = prevp_ref.shape
        r = pltpu.roll(prevp_ref[:], (p0 - (rng - dy)) % p0, axis=0)
        r = pltpu.roll(r, (p1 - (rng - dx)) % p1, axis=1)
        return r[:rows, :w]

    def sad(c):
        d = jnp.abs(cur_ref[:] - shifted(c))
        s1 = d.reshape(mbr, mb, w).sum(axis=1)          # (mbr, w)
        # exact f32: the default bf16 dot loses low SAD bits and flips
        # near-tie candidates (measured +7.6% bitrate at equal quality);
        # Mosaic supports only DEFAULT/HIGHEST in-kernel
        return jnp.dot(s1, ones_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (mbr, mbw)

    def body(c, state):
        best, by, bx = state
        dy = c // n - rng
        dx = c % n - rng
        # integer-scaled center-preferring tie bias — exact in f32 and
        # bit-identical to ops/motion.py motion_search (SAD*64 + |mv|)
        cost = sad(c) * 64 + (jnp.abs(dy) + jnp.abs(dx))
        better = cost < best
        best = jnp.where(better, cost, best)
        by = jnp.where(better, dy, by)
        bx = jnp.where(better, dx, bx)
        return best, by, bx

    zero = jnp.zeros((mbr, mbw), jnp.int32)
    best, by, bx = jax.lax.fori_loop(
        0, n * n, body,
        (jnp.full((mbr, mbw), jnp.inf, jnp.float32), zero, zero))
    mvy_ref[:] = by
    mvx_ref[:] = bx

    # per-pixel winning-candidate index map: (mbr, mbw) -> (rows, w) via
    # the transposed ones matrix on the lane axis + sublane broadcast
    cand = ((by + rng) * n + (bx + rng)).astype(jnp.float32)
    # one-hot row sums of integers <= 224: exact even in bf16
    cand_rows = jnp.dot(cand, onest_ref[:],
                        preferred_element_type=jnp.float32)   # (mbr, w)
    cand_map = jnp.broadcast_to(cand_rows[:, None, :],
                                (mbr, mb, w)).reshape(rows, w)

    def fill(c, pred):
        return jnp.where(cand_map == c, shifted(c), pred)

    pred_ref[:] = jax.lax.fori_loop(
        0, n * n, fill, jnp.zeros((rows, w), jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("search_range", "mb", "interpret"))
def motion_search_mc_pallas(cur_y: jax.Array, prev_y: jax.Array,
                            search_range: int = 7, mb: int = 16,
                            interpret: bool = False):
    """(H, W) f32 current + reference luma → (mv (H//mb, W//mb, 2) int32,
    pred (H, W) f32). Bit-identical to
    motion_search + motion_compensate (wrap-around edges, same tie
    order)."""
    h, w = cur_y.shape
    if w % 128:
        # cur/pred/onest BlockSpecs use w as the lane dim; Mosaic requires
        # (8, 128)-tile-aligned lane dims — callers gate on this and fall
        # back to the XLA formulation (see fvc_mc_encode_chunk)
        raise ValueError(f"motion_search_mc_pallas needs w % 128 == 0 "
                         f"(got {w}); use the XLA motion_search path")
    rng = search_range
    mbh, mbw = h // mb, w // mb

    # wrap-padded reference: roll semantics as pure dynamic slices
    prevp = jnp.pad(prev_y.astype(jnp.float32),
                    ((rng, rng), (rng, rng)), mode="wrap")

    # split into horizontal bands so cur + padded prev + pred fit VMEM
    g = mbh
    for cand in range(1, mbh + 1):
        if mbh % cand == 0 and \
                (h // cand) * (w + 2 * rng) * 4 * 3 < 10 * 2 ** 20:
            g = cand
            break
    rows = h // g
    # band b of cur covers rows [b*rows, (b+1)*rows); its padded reference
    # band needs rows [b*rows, b*rows + rows + 2*rng) of prevp. The band
    # is zero-padded up to (8, 128) tile multiples: tpu.dynamic_rotate
    # requires aligned shapes, and the post-roll [:rows, :w] slice never
    # reaches the wrapped-in tail (shift <= 2*rng <= the padding + halo).
    cur_b = cur_y.astype(jnp.float32).reshape(g, rows, w)
    idx = (jnp.arange(g) * rows)[:, None] + jnp.arange(rows + 2 * rng)[None]
    prevp_b = prevp[idx]                       # (g, rows+2R, w+2R)
    pr = -(rows + 2 * rng) % 8
    pc = -(w + 2 * rng) % 128
    if pr or pc:
        prevp_b = jnp.pad(prevp_b, ((0, 0), (0, pr), (0, pc)))
    prows, pcols = rows + 2 * rng + pr, w + 2 * rng + pc

    mbw_p = -(-mbw // 128) * 128   # lane-aligned mb-column count
    ones_np = _ones_blockdiag(w, mb)
    ones = jnp.asarray(np.pad(ones_np, ((0, 0), (0, mbw_p - mbw))))
    onest = jnp.asarray(np.pad(ones_np.T, ((0, mbw_p - mbw), (0, 0))))

    kernel = functools.partial(_search_mc_kernel, rows=rows, w=w,
                               rng=rng, mb=mb)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, prows, pcols), lambda i: (i, 0, 0)),
            pl.BlockSpec((w, mbw_p), lambda i: (0, 0)),
            pl.BlockSpec((mbw_p, w), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows // mb, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows // mb, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0)),
        ],
    )

    def kernel3d(cur_ref, prevp_ref, ones_ref, onest_ref,
                 mvy_ref, mvx_ref, pred_ref):
        kernel(cur_ref.at[0], prevp_ref.at[0], ones_ref, onest_ref,
               mvy_ref.at[0], mvx_ref.at[0], pred_ref.at[0])

    mvy, mvx, pred = pl.pallas_call(
        kernel3d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, rows // mb, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows // mb, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(cur_b, prevp_b, ones, onest)

    mv = jnp.stack([mvy[..., :mbw].reshape(mbh, mbw),
                    mvx[..., :mbw].reshape(mbh, mbw)], axis=-1)
    return mv, pred.reshape(h, w)
