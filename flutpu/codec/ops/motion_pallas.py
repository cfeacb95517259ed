"""Pallas TPU kernel: fused full-search motion estimation + prediction.

The XLA formulation (ops/motion.py) rolls the full reference frame once
per candidate and mb-reduces the absolute difference — every candidate
pays full-frame HBM traffic (measured on the chip: ~145 ms/GOP for the
search loop and another ~54 ms for the masked-roll compensation at 1080p,
~70% of motion-mode encode time). This kernel keeps a horizontal band of
the current frame and the wrap-padded reference resident in VMEM and runs
both 225-candidate loops on-chip:

  ONE fused candidate loop (round 3): per candidate, SAD per macroblock
  via a sublane reduction + a block-diagonal-ones MXU matmul for the
  lane direction; running argmin in VMEM (first-scanned candidate wins
  ties — the XLA loop's order, reproduced). The PREDICTION updates
  incrementally in the same iteration: the per-macroblock `better` mask
  broadcast to pixels (transposed-ones MXU dot, exact in bf16 for 0/1
  values) selects the already-computed shifted reference into pred_ref.
  The original two-pass form re-rolled the padded band 225 more times in
  a separate predict loop; fusing halves the kernel's roll traffic.

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
    mbr_p = mvy_ref.shape[0]  # sublane-aligned mv block rows (pad rows
    #                           are zero-filled; Mosaic rejects writing
    #                           a non-8-multiple sublane sub-block of an
    #                           int32 output ref — hit at 4K where
    #                           mbr=9 lowered to a (1,9,256) slice of
    #                           the padded (1,16,256) block memref)
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

    def body(c, state):
        best, by, bx = state
        dy = c // n - rng
        dx = c % n - rng
        sh = shifted(c)
        d = jnp.abs(cur_ref[:] - sh)
        s1 = d.reshape(mbr, mb, w).sum(axis=1)          # (mbr, w)
        # exact f32: the default bf16 dot loses low SAD bits and flips
        # near-tie candidates (measured +7.6% bitrate at equal quality);
        # Mosaic supports only DEFAULT/HIGHEST in-kernel
        sadv = jnp.dot(s1, ones_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (mbr, mbw)
        # integer-scaled center-preferring tie bias — exact in f32 and
        # bit-identical to ops/motion.py motion_search (SAD*64 + |mv|)
        cost = sadv * 64 + (jnp.abs(dy) + jnp.abs(dx))
        better = cost < best
        best = jnp.where(better, cost, best)
        by = jnp.where(better, dy, by)
        bx = jnp.where(better, dx, bx)
        # incremental prediction: broadcast the per-macroblock win mask
        # to pixels (0/1 values through the one-hot transposed ones —
        # exact even at the default bf16 dot; pad mb-columns hit zero
        # rows of onest and never touch real pixels). c=0 always wins
        # (cost < inf) so pred_ref is fully initialized on the first
        # iteration.
        bet_rows = jnp.dot(better.astype(jnp.float32), onest_ref[:],
                           preferred_element_type=jnp.float32)  # (mbr, w)
        bet_map = jnp.broadcast_to(bet_rows[:, None, :],
                                   (mbr, mb, w)).reshape(rows, w)
        pred_ref[:] = jnp.where(bet_map > 0, sh, pred_ref[:])
        return best, by, bx

    zero = jnp.zeros((mbr, mbw), jnp.int32)
    best, by, bx = jax.lax.fori_loop(
        0, n * n, body,
        (jnp.full((mbr, mbw), jnp.inf, jnp.float32), zero, zero))
    if mbr_p > mbr:
        padrows = jnp.zeros((mbr_p - mbr, mbw), jnp.int32)
        by = jnp.concatenate([by, padrows], axis=0)
        bx = jnp.concatenate([bx, padrows], axis=0)
    mvy_ref[:] = by
    mvx_ref[:] = bx


@functools.partial(jax.jit,
                   static_argnames=("search_range", "mb", "interpret"))
def motion_search_mc_pallas(cur_y: jax.Array, prev_y: jax.Array,
                            search_range: int = 7, mb: int = 16,
                            interpret: bool = False):
    """(H, W) f32 current + reference luma → (mv (H//mb, W//mb, 2) int32,
    pred (H, W) f32). Bit-identical to
    motion_search + motion_compensate (wrap-around edges, same tie
    order)."""
    h, w_real = cur_y.shape
    rng = search_range
    # Lane alignment: cur/pred/onest BlockSpecs use the width as the lane
    # dim, which Mosaic requires (8, 128)-tile-aligned. Non-multiple
    # widths (e.g. the 960-wide pooled frames of the hier coarse level)
    # are zero-padded AFTER the wrap-pad of the reference, so wrap
    # semantics stay those of the REAL width: the post-roll read of real
    # column i sources padded column i + (rng - dx) <= w_real-1 + 2*rng
    # < w_real + 2*rng, never a zero-pad lane. Pad macroblock columns see
    # zero cur and the ones matrix's zero columns; their mv/pred lanes
    # are sliced off below.
    w = -(-w_real // 128) * 128
    cur_pad = cur_y.astype(jnp.float32)
    if w != w_real:
        cur_pad = jnp.pad(cur_pad, ((0, 0), (0, w - w_real)))
    mbh, mbw = h // mb, w // mb
    mbw_real = w_real // mb

    # wrap-padded reference: roll semantics as pure dynamic slices
    prevp = jnp.pad(prev_y.astype(jnp.float32),
                    ((rng, rng), (rng, rng)), mode="wrap")
    if w != w_real:
        prevp = jnp.pad(prevp, ((0, 0), (0, w - w_real)))

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
    cur_b = cur_pad.reshape(g, rows, w)
    idx = (jnp.arange(g) * rows)[:, None] + jnp.arange(rows + 2 * rng)[None]
    prevp_b = prevp[idx]                       # (g, rows+2R, w+2R)
    pr = -(rows + 2 * rng) % 8
    pc = -(w + 2 * rng) % 128
    if pr or pc:
        prevp_b = jnp.pad(prevp_b, ((0, 0), (0, pr), (0, pc)))
    prows, pcols = rows + 2 * rng + pr, w + 2 * rng + pc

    mbw_p = -(-mbw // 128) * 128   # lane-aligned mb-column count
    mbr = rows // mb
    mbr_p = -(-mbr // 8) * 8       # sublane-aligned mv block rows
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
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
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
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(cur_b, prevp_b, ones, onest)

    mv = jnp.stack([mvy[:, :mbr, :mbw_real].reshape(mbh, mbw_real),
                    mvx[:, :mbr, :mbw_real].reshape(mbh, mbw_real)],
                   axis=-1)
    return mv, pred.reshape(h, w)[:, :w_real]


def _search_mc_dxmajor_kernel(cur_ref, prevp_ref, ones_ref, onest_ref,
                              mvy_ref, mvx_ref, pred_ref,
                              *, rows, w, rng, mb):
    """dy-major restructure of _search_mc_kernel (round 5): the sublane
    (dy) roll hoists OUT of the candidate loop — one dynamic axis-0 roll
    per dy value (15 total instead of 225) — and the lane (dx) loop is
    Python-UNROLLED so every axis-1 roll amount is a compile-time
    constant (Mosaic lowers a static lane rotate far cheaper than
    tpu.dynamic_rotate, and can software-pipeline the unrolled bodies).
    Candidate visit order stays dy-major row-major — (dy, dx) ascending,
    exactly the fused kernel's c = (dy+r)*n + (dx+r) order — so argmin
    tie-breaking (first win) and the integer-scaled center bias keep the
    bit-identical contract of motion_search + motion_compensate.

    Roll algebra: axis-0 and axis-1 rolls commute, so
    roll(roll(P, a0, 0), a1, 1)[:rows, :w] == the fused kernel's
    per-candidate pair; hoisting the axis-0 roll changes nothing."""
    n = 2 * rng + 1
    mbr = rows // mb
    mbr_p = mvy_ref.shape[0]
    mbw = ones_ref.shape[1]
    p0, p1 = prevp_ref.shape
    cur = cur_ref[:]

    def dy_body(j, state):
        best, by, bx = state
        dy = j - rng
        # one dynamic sublane roll per dy: shift right by p0-(rng-dy),
        # reduced mod p0 (at dy=+rng the raw shift equals p0; pltpu.roll
        # needs NON-NEGATIVE shifts and in-range is the safe contract —
        # the round-2 notes record traced out-of-contract shifts
        # silently mis-rotating on hardware)
        rdy = pltpu.roll(prevp_ref[:], (p0 - (2 * rng - j)) % p0, axis=0)
        for dx in range(-rng, rng + 1):       # STATIC unroll
            sh = pltpu.roll(rdy, (p1 - (rng - dx)) % p1,
                            axis=1)[:rows, :w]
            d = jnp.abs(cur - sh)
            s1 = d.reshape(mbr, mb, w).sum(axis=1)
            sadv = jnp.dot(s1, ones_ref[:],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            cost = sadv * 64 + (jnp.abs(dy) + abs(dx))
            better = cost < best
            best = jnp.where(better, cost, best)
            by = jnp.where(better, dy, by)
            bx = jnp.where(better, dx, bx)
            bet_rows = jnp.dot(better.astype(jnp.float32), onest_ref[:],
                               preferred_element_type=jnp.float32)
            bet_map = jnp.broadcast_to(bet_rows[:, None, :],
                                       (mbr, mb, w)).reshape(rows, w)
            pred_ref[:] = jnp.where(bet_map > 0, sh, pred_ref[:])
        return best, by, bx

    zero = jnp.zeros((mbr, mbw), jnp.int32)
    best, by, bx = jax.lax.fori_loop(
        0, n, dy_body,
        (jnp.full((mbr, mbw), jnp.inf, jnp.float32), zero, zero))
    if mbr_p > mbr:
        padrows = jnp.zeros((mbr_p - mbr, mbw), jnp.int32)
        by = jnp.concatenate([by, padrows], axis=0)
        bx = jnp.concatenate([bx, padrows], axis=0)
    mvy_ref[:] = by
    mvx_ref[:] = bx


@functools.partial(jax.jit,
                   static_argnames=("search_range", "mb", "interpret"))
def motion_search_mc_dxmajor_pallas(cur_y: jax.Array, prev_y: jax.Array,
                                    search_range: int = 7, mb: int = 16,
                                    interpret: bool = False):
    """Full-search motion + prediction with the dy-major/static-dx kernel
    (round 5). Same contract as motion_search_mc_pallas: bit-identical
    mv and prediction to ops.motion.motion_search + motion_compensate.
    Host-side setup (band split, wrap padding, tiling pads, ones
    matrices) is identical to the fused kernel so A/Bs isolate the roll
    structure."""
    h, w_real = cur_y.shape
    rng = search_range
    w = -(-w_real // 128) * 128
    cur_pad = cur_y.astype(jnp.float32)
    if w != w_real:
        cur_pad = jnp.pad(cur_pad, ((0, 0), (0, w - w_real)))
    mbh, mbw = h // mb, w // mb
    mbw_real = w_real // mb

    prevp = jnp.pad(prev_y.astype(jnp.float32),
                    ((rng, rng), (rng, rng)), mode="wrap")
    if w != w_real:
        prevp = jnp.pad(prevp, ((0, 0), (0, w - w_real)))

    g = mbh
    for cand in range(1, mbh + 1):
        if mbh % cand == 0 and \
                (h // cand) * (w + 2 * rng) * 4 * 3 < 10 * 2 ** 20:
            g = cand
            break
    rows = h // g
    cur_b = cur_pad.reshape(g, rows, w)
    idx = (jnp.arange(g) * rows)[:, None] + jnp.arange(rows + 2 * rng)[None]
    prevp_b = prevp[idx]                       # (g, rows+2R, w+2R)
    pr = -(rows + 2 * rng) % 8
    pc = -(w + 2 * rng) % 128
    if pr or pc:
        prevp_b = jnp.pad(prevp_b, ((0, 0), (0, pr), (0, pc)))
    prows, pcols = rows + 2 * rng + pr, w + 2 * rng + pc

    mbw_p = -(-mbw // 128) * 128
    mbr = rows // mb
    mbr_p = -(-mbr // 8) * 8
    ones_np = _ones_blockdiag(w, mb)
    ones = jnp.asarray(np.pad(ones_np, ((0, 0), (0, mbw_p - mbw))))
    onest = jnp.asarray(np.pad(ones_np.T, ((0, mbw_p - mbw), (0, 0))))

    kernel = functools.partial(_search_mc_dxmajor_kernel, rows=rows, w=w,
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
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
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
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(cur_b, prevp_b, ones, onest)

    mv = jnp.stack([mvy[:, :mbr, :mbw_real].reshape(mbh, mbw_real),
                    mvx[:, :mbr, :mbw_real].reshape(mbh, mbw_real)],
                   axis=-1)
    return mv, pred.reshape(h, w)[:, :w_real]


def _refine_mc_kernel(cur_ref, prevp_ref, by_ref, bx_ref, ones_ref,
                      onest_ref, mvy_ref, mvx_ref, pred_ref,
                      *, rows, w, rng, mb):
    """Hier refine (round 4): evaluate only the candidates ADJACENT to
    some macroblock's coarse base vector; whole-band candidates that no
    macroblock wants are skipped via lax.cond — on smooth motion most of
    the (2r+1)^2 grid never rolls. Carries stay functional (best/mv/pred
    are fori state, written to refs once at the end) so the cond body has
    no ref effects. Contract: bit-identical vectors+prediction to
    ops.motion.motion_search_hier + motion_compensate (refine cost is
    PLAIN SAD — the XLA hier refine carries no center tie bias — and the
    absolute row-major candidate order equals the XLA (oy, ox) order
    per macroblock since its base is fixed)."""
    n = 2 * rng + 1
    mbr = rows // mb
    mbr_p = mvy_ref.shape[0]
    mbw = ones_ref.shape[1]

    def shifted(c):
        dy = c // n - rng
        dx = c % n - rng
        p0, p1 = prevp_ref.shape
        r = pltpu.roll(prevp_ref[:], (p0 - (rng - dy)) % p0, axis=0)
        r = pltpu.roll(r, (p1 - (rng - dx)) % p1, axis=1)
        return r[:rows, :w]

    by = by_ref[:mbr, :]
    bx = bx_ref[:mbr, :]

    def body(c, state):
        dy = c // n - rng
        dx = c % n - rng
        adj = (jnp.abs(by - dy) <= 1) & (jnp.abs(bx - dx) <= 1)

        def work(s):
            best, my, mx, pred = s
            sh = shifted(c)
            d = jnp.abs(cur_ref[:] - sh)
            s1 = d.reshape(mbr, mb, w).sum(axis=1)
            sadv = jnp.dot(s1, ones_ref[:],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
            better = adj & (sadv < best)
            best = jnp.where(better, sadv, best)
            my = jnp.where(better, dy, my)
            mx = jnp.where(better, dx, mx)
            bet_rows = jnp.dot(better.astype(jnp.float32), onest_ref[:],
                               preferred_element_type=jnp.float32)
            bet_map = jnp.broadcast_to(bet_rows[:, None, :],
                                       (mbr, mb, w)).reshape(rows, w)
            pred = jnp.where(bet_map > 0, sh, pred)
            return best, my, mx, pred

        return jax.lax.cond(jnp.any(adj), work, lambda s: s, state)

    zero = jnp.zeros((mbr, mbw), jnp.int32)
    best, my, mx, pred = jax.lax.fori_loop(
        0, n * n, body,
        (jnp.full((mbr, mbw), jnp.inf, jnp.float32), zero, zero,
         jnp.zeros((rows, w), jnp.float32)))
    if mbr_p > mbr:
        padrows = jnp.zeros((mbr_p - mbr, mbw), jnp.int32)
        my = jnp.concatenate([my, padrows], axis=0)
        mx = jnp.concatenate([mx, padrows], axis=0)
    mvy_ref[:] = my
    mvx_ref[:] = mx
    pred_ref[:] = pred


@functools.partial(jax.jit,
                   static_argnames=("search_range", "mb", "interpret"))
def motion_search_mc_hier_pallas(cur_y: jax.Array, prev_y: jax.Array,
                                 search_range: int = 7, mb: int = 16,
                                 interpret: bool = False):
    """Coarse-to-fine search + prediction, fully in-kernel (the round-4
    `search=hier` TPU arm). Coarse: the full-search kernel on
    2x2-mean-pooled frames (±r//2, 8x8 blocks — ~1/18 the roll work of
    the 225-candidate full search). Refine: ±1 around the upscaled base
    with whole-band candidates skipped unless some macroblock needs them.
    Bit-identical to ops.motion.motion_search_hier + motion_compensate
    (all sums are integer-valued f32 < 2^24, so summation order cannot
    split the arms)."""
    h, w_real = cur_y.shape
    rng = search_range

    def pool(x):
        return x.reshape(h // 2, 2, w_real // 2, 2).mean(axis=(1, 3))

    coarse, _ = motion_search_mc_pallas(
        pool(cur_y.astype(jnp.float32)), pool(prev_y.astype(jnp.float32)),
        search_range=max(1, rng // 2), mb=mb // 2, interpret=interpret)
    base = jnp.clip(coarse * 2, -(rng - 1), rng - 1)  # (mbh, mbw, 2)

    # band split + padding: mirror motion_search_mc_pallas
    w = -(-w_real // 128) * 128
    cur_pad = cur_y.astype(jnp.float32)
    if w != w_real:
        cur_pad = jnp.pad(cur_pad, ((0, 0), (0, w - w_real)))
    mbh, mbw = h // mb, w // mb
    mbw_real = w_real // mb
    prevp = jnp.pad(prev_y.astype(jnp.float32),
                    ((rng, rng), (rng, rng)), mode="wrap")
    if w != w_real:
        prevp = jnp.pad(prevp, ((0, 0), (0, w - w_real)))
    g = mbh
    for cand in range(1, mbh + 1):
        if mbh % cand == 0 and \
                (h // cand) * (w + 2 * rng) * 4 * 4 < 10 * 2 ** 20:
            g = cand
            break
    rows = h // g
    cur_b = cur_pad.reshape(g, rows, w)
    idx = (jnp.arange(g) * rows)[:, None] + jnp.arange(rows + 2 * rng)[None]
    prevp_b = prevp[idx]
    pr = -(rows + 2 * rng) % 8
    pc = -(w + 2 * rng) % 128
    if pr or pc:
        prevp_b = jnp.pad(prevp_b, ((0, 0), (0, pr), (0, pc)))
    prows, pcols = rows + 2 * rng + pr, w + 2 * rng + pc

    mbw_p = -(-mbw // 128) * 128
    mbr = rows // mb
    mbr_p = -(-mbr // 8) * 8
    ones_np = _ones_blockdiag(w, mb)
    ones = jnp.asarray(np.pad(ones_np, ((0, 0), (0, mbw_p - mbw))))
    onest = jnp.asarray(np.pad(ones_np.T, ((0, mbw_p - mbw), (0, 0))))

    # per-band base vectors, sublane/lane padded (input blocks obey the
    # same tiling rules as outputs — pad rows to 8, lanes to 128)
    base_b = base.reshape(g, mbr, mbw_real, 2)
    base_b = jnp.pad(base_b, ((0, 0), (0, mbr_p - mbr),
                              (0, mbw_p - mbw_real), (0, 0)))
    by_b = base_b[..., 0].astype(jnp.int32)
    bx_b = base_b[..., 1].astype(jnp.int32)

    kernel = functools.partial(_refine_mc_kernel, rows=rows, w=w,
                               rng=rng, mb=mb)
    grid_spec = pl.GridSpec(
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, prows, pcols), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((w, mbw_p), lambda i: (0, 0)),
            pl.BlockSpec((mbw_p, w), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0)),
        ],
    )

    def kernel3d(cur_ref, prevp_ref, by_ref, bx_ref, ones_ref, onest_ref,
                 mvy_ref, mvx_ref, pred_ref):
        kernel(cur_ref.at[0], prevp_ref.at[0], by_ref.at[0], bx_ref.at[0],
               ones_ref, onest_ref, mvy_ref.at[0], mvx_ref.at[0],
               pred_ref.at[0])

    mvy, mvx, pred = pl.pallas_call(
        kernel3d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(cur_b, prevp_b, by_b, bx_b, ones, onest)

    mv = jnp.stack([mvy[:, :mbr, :mbw_real].reshape(mbh, mbw_real),
                    mvx[:, :mbr, :mbw_real].reshape(mbh, mbw_real)],
                   axis=-1)
    return mv, pred.reshape(h, w)[:, :w_real]


def _search_mc_dygrid_kernel(cur_ref, plane_ref, ones_ref, onest_ref,
                             mvy_ref, mvx_ref, pred_ref, best_ref,
                             *, rows, w, rng, mb):
    """dy-grid body (round 4): the sublane (dy) shift is resolved OUTSIDE
    the kernel — grid dim 1 walks the 2r+1 dy values and `plane_ref` is
    the already-dy-sliced reference band, so each candidate pays ONE lane
    roll instead of the fused kernel's sublane+lane pair (the kernel is
    roll-bound: PERF.md round-3 stage table). Argmin state persists across
    dy steps in the revisited mv/pred output blocks plus a cost scratch;
    candidate order stays dy-major = the XLA loop's (dy, dx) row-major
    order, so tie-breaking (first win) and the integer-scaled center bias
    keep the bit-identical contract of motion_search + motion_compensate."""
    n = 2 * rng + 1
    j = pl.program_id(1)
    dy = j - rng
    mbr = rows // mb
    mbr_p = mvy_ref.shape[0]
    mbw = ones_ref.shape[1]

    fresh = j == 0
    best0 = jnp.where(fresh, jnp.inf, best_ref[:][:mbr])
    # by/bx init values never survive: at j==0 the first candidate beats
    # inf for every macroblock, so reading the revisited output blocks
    # before their first write would be safe — but zero-fill anyway so no
    # uninitialized VMEM is ever an input to a select.
    by0 = jnp.where(fresh, 0, mvy_ref[:][:mbr])
    bx0 = jnp.where(fresh, 0, mvx_ref[:][:mbr])

    def body(k, state):
        best, by, bx = state
        dx = k - rng
        p1 = plane_ref.shape[1]
        sh = pltpu.roll(plane_ref[:], (p1 - (rng - dx)) % p1,
                        axis=1)[:, :w]
        d = jnp.abs(cur_ref[:] - sh)
        s1 = d.reshape(mbr, mb, w).sum(axis=1)
        sadv = jnp.dot(s1, ones_ref[:],
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        cost = sadv * 64 + (jnp.abs(dy) + jnp.abs(dx))
        better = cost < best
        best = jnp.where(better, cost, best)
        by = jnp.where(better, dy, by)
        bx = jnp.where(better, dx, bx)
        bet_rows = jnp.dot(better.astype(jnp.float32), onest_ref[:],
                           preferred_element_type=jnp.float32)
        bet_map = jnp.broadcast_to(bet_rows[:, None, :],
                                   (mbr, mb, w)).reshape(rows, w)
        pred_ref[:] = jnp.where(bet_map > 0, sh, pred_ref[:])
        return best, by, bx

    best, by, bx = jax.lax.fori_loop(0, n, body, (best0, by0, bx0))
    if mbr_p > mbr:
        padf = jnp.zeros((mbr_p - mbr, mbw), jnp.float32)
        padi = jnp.zeros((mbr_p - mbr, mbw), jnp.int32)
        best = jnp.concatenate([best, padf], axis=0)
        by = jnp.concatenate([by, padi], axis=0)
        bx = jnp.concatenate([bx, padi], axis=0)
    best_ref[:] = best
    mvy_ref[:] = by
    mvx_ref[:] = bx


@functools.partial(jax.jit,
                   static_argnames=("search_range", "mb", "interpret"))
def motion_search_mc_dygrid_pallas(cur_y: jax.Array, prev_y: jax.Array,
                                   search_range: int = 7, mb: int = 16,
                                   interpret: bool = False):
    """Same contract as motion_search_mc_pallas (bit-identical mv + pred),
    restructured so the per-candidate SUBLANE roll disappears: the 2r+1
    dy-shifted views of the wrap-padded reference are materialized in HBM
    by one affine row gather (XLA-side; ~(2r+1)x the frame bytes, ~0.4 ms
    of HBM traffic per 1080p frame pair against ~100 VMEM band rolls
    saved) and walked by a second sequential grid dimension. Each grid
    step Mosaic-pipelines one dy plane into VMEM while the kernel runs the
    2r+1 dx candidates with single lane rolls."""
    h, w_real = cur_y.shape
    rng = search_range
    n = 2 * rng + 1
    w = -(-w_real // 128) * 128
    cur_pad = cur_y.astype(jnp.float32)
    if w != w_real:
        cur_pad = jnp.pad(cur_pad, ((0, 0), (0, w - w_real)))
    mbh, mbw = h // mb, w // mb
    mbw_real = w_real // mb

    prevp = jnp.pad(prev_y.astype(jnp.float32),
                    ((rng, rng), (rng, rng)), mode="wrap")
    if w != w_real:
        prevp = jnp.pad(prevp, ((0, 0), (0, w - w_real)))

    # same band rule as the fused kernel (same g → clean roll-structure
    # A/B); the dy-grid working set is strictly smaller (no 2r halo rows)
    g = mbh
    for cand in range(1, mbh + 1):
        if mbh % cand == 0 and \
                (h // cand) * (w + 2 * rng) * 4 * 3 < 10 * 2 ** 20:
            g = cand
            break
    rows = h // g

    pc = -(w + 2 * rng) % 128
    if pc:
        prevp = jnp.pad(prevp, ((0, 0), (0, pc)))
    pcols = w + 2 * rng + pc
    # dy plane (b, j): rows [b*rows + 2r - j, ...+rows) of prevp — the
    # same window the fused kernel's axis-0 roll-by-(r-dy) + [:rows]
    # slice reads from its banded copy
    ridx = ((jnp.arange(g) * rows)[:, None, None]
            + (2 * rng - jnp.arange(n))[None, :, None]
            + jnp.arange(rows)[None, None, :])
    planes = prevp[ridx]                       # (g, n, rows, pcols)

    mbw_p = -(-mbw // 128) * 128
    mbr = rows // mb
    mbr_p = -(-mbr // 8) * 8
    ones_np = _ones_blockdiag(w, mb)
    ones = jnp.asarray(np.pad(ones_np, ((0, 0), (0, mbw_p - mbw))))
    onest = jnp.asarray(np.pad(ones_np.T, ((0, mbw_p - mbw), (0, 0))))

    cur_b = cur_pad.reshape(g, rows, w)
    kernel = functools.partial(_search_mc_dygrid_kernel, rows=rows, w=w,
                               rng=rng, mb=mb)
    grid_spec = pl.GridSpec(
        grid=(g, n),
        in_specs=[
            pl.BlockSpec((1, rows, w), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, rows, pcols), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((w, mbw_p), lambda i, j: (0, 0)),
            pl.BlockSpec((mbw_p, w), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, mbr_p, mbw_p), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, rows, w), lambda i, j: (i, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((mbr_p, mbw_p), jnp.float32)],
    )

    def kernel4d(cur_ref, plane_ref, ones_ref, onest_ref,
                 mvy_ref, mvx_ref, pred_ref, best_ref):
        kernel(cur_ref.at[0], plane_ref.at[0, 0], ones_ref, onest_ref,
               mvy_ref.at[0], mvx_ref.at[0], pred_ref.at[0], best_ref)

    mvy, mvx, pred = pl.pallas_call(
        kernel4d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, mbr_p, mbw_p), jnp.int32),
            jax.ShapeDtypeStruct((g, rows, w), jnp.float32),
        ],
        interpret=interpret,
    )(cur_b, planes, ones, onest)

    mv = jnp.stack([mvy[:, :mbr, :mbw_real].reshape(mbh, mbw_real),
                    mvx[:, :mbr, :mbw_real].reshape(mbh, mbw_real)],
                   axis=-1)
    return mv, pred.reshape(h, w)[:, :w_real]


@functools.lru_cache()
def _onest_chroma(wc: int, mbw_p: int) -> np.ndarray:
    """(mbw_p, wc_p128) f32 transposed block-selector: row j is one over
    lanes [8j, 8j+8) for j < wc//8, zero rows beyond (pad mb-columns and
    pad lanes select nothing)."""
    wcp = -(-wc // 128) * 128
    m = np.zeros((mbw_p, wcp), np.float32)
    for j in range(wc // 8):
        m[j, 8 * j:8 * j + 8] = 1.0
    return m


def _chroma_mc_kernel(prevp_ref, dyh_ref, dxh_ref, onest_ref, pred_ref,
                      *, hc, wcp, m, lo, R):
    mbh = dyh_ref.shape[0]
    # per-pixel winning-shift index map, built ONCE: shift index
    # c = (dyh-lo)*m + (dxh-lo) < 64 — exact even through the default
    # bf16 dot (one-hot row selector, integer values < 2^8)
    cand = ((dyh_ref[:] - lo) * m + (dxh_ref[:] - lo)).astype(jnp.float32)
    cand_rows = jnp.dot(cand, onest_ref[:],
                        preferred_element_type=jnp.float32)  # (mbh, wcp)
    cand_map = jnp.broadcast_to(cand_rows[:, None, :],
                                (mbh, 8, wcp)).reshape(hc, wcp)

    # STATIC unroll (round 5, after the dx-major search win): with the
    # shift loop as Python iteration every roll amount is a compile-time
    # constant — Mosaic lowers constant rolls far cheaper than
    # tpu.dynamic_rotate (measured 2.25x on the search kernel's lane
    # rolls). m*m = 64 small bodies keeps compile size modest. The dy
    # roll is hoisted per distinct sdy (8 axis-0 rolls instead of 64
    # roll pairs). Every real macroblock matches exactly ONE shift, so
    # pred_ref is fully covered; pad lanes keep garbage and are sliced
    # by the caller.
    p0, p1 = prevp_ref.shape
    for i in range(m):
        sdy = i + lo
        # roll left by (R - shift) ≡ roll right by p - (R - shift):
        # pltpu.roll needs NON-NEGATIVE shifts (see _search_mc_kernel)
        rdy = pltpu.roll(prevp_ref[:], (p0 - (R - sdy)) % p0, axis=0)
        for j in range(m):
            c = i * m + j
            sdx = j + lo
            r = pltpu.roll(rdy, (p1 - (R - sdx)) % p1, axis=1)
            pred_ref[:] = jnp.where(cand_map == c, r[:hc, :wcp],
                                    pred_ref[:])


def chroma_mc_fits(hc: int, wc: int) -> bool:
    """True when the chroma MC kernel supports the plane geometry. Since
    the round-4 band split (64-row bands = 8 sublane-aligned mv rows per
    band), any plane fits VMEM — only the 8/64 alignment of the grid
    remains. 4K (1080x1920) now rides the kernel instead of the XLA
    rolls arm."""
    return wc % 64 == 0 and hc % 8 == 0


_CHROMA_BAND = 64  # chroma rows per band = 8 mv rows (sublane-aligned)


@functools.partial(jax.jit, static_argnames=("search_range", "interpret"))
def chroma_mc_pallas(prev_cb: jax.Array, prev_cr: jax.Array, mv: jax.Array,
                     search_range: int = 7, interpret: bool = False):
    """Fused 4:2:0 chroma motion compensation for BOTH planes: the
    floor-halved luma vectors collapse onto (r//2 - (-(r+1)//2) + 1)^2
    distinct shifts (r=7: 64); each shift is one VMEM `pltpu.roll` of the
    wrap-padded band instead of an HBM whole-plane roll. Bit-identical
    to ops.motion.motion_compensate(prev, mv, mb=8) (the scale!=1 arm):
    pure selection, no arithmetic on pixel values.

    Round 4: planes process in 64-row BANDS (grid = planes x bands), so
    the working set is band-sized and 4K chroma (1080x1920) rides VMEM —
    the round-3 whole-plane kernel fell back to XLA there. Each band's
    8 mv rows are a sublane-aligned block slice (the CLAUDE.md rule that
    blocked banding is satisfied by construction: 8 mv rows per 64 plane
    rows).

    prev_cb/prev_cr: (H/2, W/2) f32; mv: (H/16, W/16, 2) int luma-grid
    vectors. Returns (pred_cb, pred_cr)."""
    hc, wc = prev_cb.shape
    r = search_range
    lo = -((r + 1) // 2)
    hi = r // 2
    m = hi - lo + 1
    R = max(hi, -lo)
    mbh, mbw = hc // 8, wc // 8
    if wc % 64 or hc % 8:
        raise ValueError(f"chroma_mc_pallas needs wc % 64 == 0 and "
                         f"hc % 8 == 0 (got {hc}x{wc})")

    g = -(-hc // _CHROMA_BAND)            # bands per plane
    hc_p = g * _CHROMA_BAND
    mbh_p = hc_p // 8

    dyh = (mv[..., 0].astype(jnp.int32)) // 2
    dxh = (mv[..., 1].astype(jnp.int32)) // 2
    mbw_p = -(-mbw // 128) * 128
    dyh = jnp.pad(dyh, ((0, mbh_p - mbh), (0, mbw_p - mbw)))
    dxh = jnp.pad(dxh, ((0, mbh_p - mbh), (0, mbw_p - mbw)))
    dyh_b = dyh.reshape(g, 8, mbw_p)
    dxh_b = dxh.reshape(g, 8, mbw_p)

    # wrap-pad ±R on the REAL plane (wrap semantics of the full plane),
    # then slice each band's rows [b*64, b*64 + 64 + 2R) and zero-pad to
    # (8, 128) tile multiples for tpu.dynamic_rotate
    prevp = jnp.stack([
        jnp.pad(prev_cb.astype(jnp.float32), ((R, R), (R, R)), mode="wrap"),
        jnp.pad(prev_cr.astype(jnp.float32), ((R, R), (R, R)), mode="wrap"),
    ])
    if hc_p != hc:
        prevp = jnp.pad(prevp, ((0, 0), (0, hc_p - hc), (0, 0)))
    idx = (jnp.arange(g) * _CHROMA_BAND)[:, None] \
        + jnp.arange(_CHROMA_BAND + 2 * R)[None]
    prevp_b = prevp[:, idx]               # (2, g, 64+2R, wc+2R)
    pr = -(_CHROMA_BAND + 2 * R) % 8
    pc = -(wc + 2 * R) % 128
    if pr or pc:
        prevp_b = jnp.pad(prevp_b, ((0, 0), (0, 0), (0, pr), (0, pc)))
    p0, p1 = _CHROMA_BAND + 2 * R + pr, wc + 2 * R + pc
    wcp = -(-wc // 128) * 128

    onest = jnp.asarray(_onest_chroma(wc, mbw_p))
    kernel = functools.partial(_chroma_mc_kernel, hc=_CHROMA_BAND,
                               wcp=wcp, m=m, lo=lo, R=R)

    def kernel4d(prevp_ref, dyh_ref, dxh_ref, onest_ref, pred_ref):
        kernel(prevp_ref.at[0, 0], dyh_ref.at[0], dxh_ref.at[0],
               onest_ref, pred_ref.at[0, 0])

    grid_spec = pl.GridSpec(
        grid=(2, g),
        in_specs=[
            pl.BlockSpec((1, 1, p0, p1), lambda i, b: (i, b, 0, 0)),
            pl.BlockSpec((1, 8, mbw_p), lambda i, b: (b, 0, 0)),
            pl.BlockSpec((1, 8, mbw_p), lambda i, b: (b, 0, 0)),
            pl.BlockSpec((mbw_p, wcp), lambda i, b: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, 1, _CHROMA_BAND, wcp),
                                lambda i, b: (i, b, 0, 0))],
    )
    pred = pl.pallas_call(
        kernel4d,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2, g, _CHROMA_BAND, wcp),
                                        jnp.float32)],
        interpret=interpret,
    )(prevp_b, dyh_b, dxh_b, onest)[0]
    pred = pred.reshape(2, hc_p, wcp)
    return pred[0, :hc, :wc], pred[1, :hc, :wc]
