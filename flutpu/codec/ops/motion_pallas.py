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

    mv = jnp.stack([mvy[:, :mbr, :mbw].reshape(mbh, mbw),
                    mvx[:, :mbr, :mbw].reshape(mbh, mbw)], axis=-1)
    return mv, pred.reshape(h, w)


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

    def body(c, _):
        sdy = c // m + lo
        sdx = c % m + lo
        p0, p1 = prevp_ref.shape
        # roll left by (R - shift) ≡ roll right by p - (R - shift):
        # pltpu.roll needs NON-NEGATIVE shifts (see _search_mc_kernel)
        r = pltpu.roll(prevp_ref[:], (p0 - (R - sdy)) % p0, axis=0)
        r = pltpu.roll(r, (p1 - (R - sdx)) % p1, axis=1)
        pred_ref[:] = jnp.where(cand_map == c, r[:hc, :wcp], pred_ref[:])
        return 0

    # every real macroblock matches exactly ONE shift, so pred_ref is
    # fully covered; pad lanes keep garbage and are sliced by the caller
    jax.lax.fori_loop(0, m * m, body, 0)


def chroma_mc_fits(hc: int, wc: int) -> bool:
    """True when a whole (hc, wc) chroma plane fits the kernel's VMEM
    working set (padded prev + pred + roll/mask temps ≈ 4 plane-sized
    f32 arrays). 1080p (544×960) fits comfortably; 4K (1080×1920) does
    not — callers fall back to the XLA rolls arm there (the kernel has
    no band split: a band's macroblock rows would need sublane-aligned
    BlockSpec slices of the mv grid, 8 mb-rows per 64 plane rows)."""
    wcp = -(-wc // 128) * 128
    return 4 * hc * wcp * 4 < 11 * 2 ** 20


@functools.partial(jax.jit, static_argnames=("search_range", "interpret"))
def chroma_mc_pallas(prev_cb: jax.Array, prev_cr: jax.Array, mv: jax.Array,
                     search_range: int = 7, interpret: bool = False):
    """Fused 4:2:0 chroma motion compensation for BOTH planes: the
    floor-halved luma vectors collapse onto (r//2 - (-(r+1)//2) + 1)^2
    distinct shifts (r=7: 64); each shift is one VMEM `pltpu.roll` of the
    wrap-padded plane instead of an HBM whole-plane roll. Bit-identical
    to ops.motion.motion_compensate(prev, mv, mb=8) (the scale!=1 arm):
    pure selection, no arithmetic on pixel values.

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

    dyh = (mv[..., 0].astype(jnp.int32)) // 2
    dxh = (mv[..., 1].astype(jnp.int32)) // 2
    mbw_p = -(-mbw // 128) * 128
    dyh = jnp.pad(dyh, ((0, 0), (0, mbw_p - mbw)))
    dxh = jnp.pad(dxh, ((0, 0), (0, mbw_p - mbw)))

    # wrap-pad ±R (roll semantics as in-VMEM rolls + static slice), then
    # zero-pad to (8, 128) tile multiples for tpu.dynamic_rotate
    prevp = jnp.stack([
        jnp.pad(prev_cb.astype(jnp.float32), ((R, R), (R, R)), mode="wrap"),
        jnp.pad(prev_cr.astype(jnp.float32), ((R, R), (R, R)), mode="wrap"),
    ])
    pr = -(hc + 2 * R) % 8
    pc = -(wc + 2 * R) % 128
    if pr or pc:
        prevp = jnp.pad(prevp, ((0, 0), (0, pr), (0, pc)))
    p0, p1 = hc + 2 * R + pr, wc + 2 * R + pc
    wcp = -(-wc // 128) * 128

    onest = jnp.asarray(_onest_chroma(wc, mbw_p))
    kernel = functools.partial(_chroma_mc_kernel, hc=hc, wcp=wcp,
                               m=m, lo=lo, R=R)

    def kernel3d(prevp_ref, dyh_ref, dxh_ref, onest_ref, pred_ref):
        kernel(prevp_ref.at[0], dyh_ref, dxh_ref, onest_ref,
               pred_ref.at[0])

    grid_spec = pl.GridSpec(
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, p0, p1), lambda i: (i, 0, 0)),
            pl.BlockSpec((mbh, mbw_p), lambda i: (0, 0)),
            pl.BlockSpec((mbh, mbw_p), lambda i: (0, 0)),
            pl.BlockSpec((mbw_p, wcp), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, hc, wcp), lambda i: (i, 0, 0))],
    )
    pred = pl.pallas_call(
        kernel3d,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((2, hc, wcp), jnp.float32)],
        interpret=interpret,
    )(prevp, dyh, dxh, onest)[0]
    return pred[0, :, :wc], pred[1, :, :wc]
