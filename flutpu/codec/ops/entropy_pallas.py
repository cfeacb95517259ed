"""Pallas TPU kernel for intra-block Huffman bit packing.

The XLA lax.scan formulation of the bit packer carries a (B, 64)-word
buffer through HBM on every one of 191 slot steps — ~38 GB of traffic per
1080p GOP (~400 ms measured). This kernel keeps the pack buffer for a tile
of blocks resident in VMEM, loops over bit-slots on-chip, and bounds the
loop by the tile's *actual* last active slot (smooth content uses ~40 of
191 slots), cutting the cost to a few ms.

Layout notes (TPU tiling): slot tables are passed transposed (S_pad, N) so
each loop step reads one full lane row; the pack buffer is (64, TILE_N)
with words on the sublane axis and blocks on lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 1024          # blocks per grid step (8*128 lanes)
_BLOCK_WORDS = 64      # per-block staging words (matches entropy._BLOCK_WORDS)


def _pack_kernel(bound_ref, lens_ref, vals_ref, buf_ref, nbits_ref):
    n = lens_ref.shape[1]
    buf_ref[:] = jnp.zeros((_BLOCK_WORDS, n), jnp.uint32)
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_WORDS, n), 0)
    bound = bound_ref[pl.program_id(0)]  # scalar-prefetch per-tile bound

    def body(s, off):
        slen = lens_ref[pl.ds(s, 1), :]          # (1, N) int32
        sval = vals_ref[pl.ds(s, 1), :].astype(jnp.uint32)
        total = (off & 31) + slen
        sh1 = jnp.clip(32 - total, 0, 31).astype(jnp.uint32)
        sh1b = jnp.clip(total - 32, 0, 31).astype(jnp.uint32)
        w0 = jnp.where(total <= 32, sval << sh1, sval >> sh1b)
        sh2 = (jnp.clip(64 - total, 1, 32) & 31).astype(jnp.uint32)
        w1 = jnp.where(total > 32, sval << sh2, jnp.uint32(0))
        widx = off >> 5                           # (1, N)
        active = slen > 0
        upd = (jnp.where(active & (word_iota == widx), w0, jnp.uint32(0))
               | jnp.where(active & (word_iota == widx + 1), w1, jnp.uint32(0)))
        buf_ref[:] = buf_ref[:] | upd
        return off + slen

    off = jax.lax.fori_loop(
        0, bound, body, jnp.zeros((1, n), jnp.int32))
    nbits_ref[:] = off


def _pack_kernel64(bound_ref, lens_ref, his_ref, los_ref, buf_ref,
                   nbits_ref):
    n = lens_ref.shape[1]
    buf_ref[:] = jnp.zeros((_BLOCK_WORDS, n), jnp.uint32)
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_WORDS, n), 0)
    bound = bound_ref[pl.program_id(0)]

    def body(s, off):
        slen = lens_ref[pl.ds(s, 1), :]          # (1, N) int32
        hi = his_ref[pl.ds(s, 1), :]
        lo = los_ref[pl.ds(s, 1), :]
        q = off & 31
        t = q + slen
        r = jnp.clip(96 - t, 0, 95)
        k = r >> 5
        m = (r & 31).astype(jnp.uint32)
        minv = ((32 - m) & 31).astype(jnp.uint32)
        spill_hi = jnp.where(m > 0, hi >> minv, jnp.uint32(0))
        spill_lo = jnp.where(m > 0, lo >> minv, jnp.uint32(0))
        c0 = jnp.where(k == 0, spill_hi,
                       jnp.where(k == 1, (hi << m) | spill_lo, lo << m))
        c1 = jnp.where(k == 0, (hi << m) | spill_lo,
                       jnp.where(k == 1, lo << m, jnp.uint32(0)))
        c2 = jnp.where(k == 0, lo << m, jnp.uint32(0))
        widx = off >> 5
        active = slen > 0
        upd = (jnp.where(active & (word_iota == widx), c0, jnp.uint32(0))
               | jnp.where(active & (word_iota == widx + 1), c1,
                           jnp.uint32(0))
               | jnp.where(active & (word_iota == widx + 2), c2,
                           jnp.uint32(0)))
        buf_ref[:] = buf_ref[:] | upd
        return off + slen

    off = jax.lax.fori_loop(
        0, bound, body, jnp.zeros((1, n), jnp.int32))
    nbits_ref[:] = off


def _bake_tables():
    """Huffman tables as plain python ints for in-kernel constant muxes."""
    from .entropy import _device_tables
    import numpy as np
    dc_code, dc_len, ac_code, ac_len = _device_tables()
    dc = [[(int(dc_len[c, s]) << 16) | int(dc_code[c, s])
           for s in range(12)] for c in range(2)]
    ac = [[[(int(ac_len[c, (r << 4) | s]) << 16) | int(ac_code[c, (r << 4) | s])
            for r in range(16)] for s in range(1, 11)] for c in range(2)]
    zrl = [(int(ac_len[c, 0xF0]) << 16) | int(ac_code[c, 0xF0])
           for c in range(2)]
    eob = [(int(ac_len[c, 0x00]) << 16) | int(ac_code[c, 0x00])
           for c in range(2)]
    return dc, ac, zrl, eob


def _fused_kernel(bound_ref, zz_ref, comp_ref, buf_ref, nbits_ref):
    """Slot construction + merged-64-bit packing in ONE kernel.

    The XLA slot stage materializes hundreds of (B, 63) intermediates in
    HBM (~15 ms/GOP measured); here each slot's symbol math lives on
    (1, N) rows in registers. Run-lengths need no precomputation at all:
    the pack loop is already sequential over AC positions, so the
    previous-nonzero position is just loop state. Bit-identical to
    _slot_tables_merged + _pack_block_bits64.
    """
    import jax.numpy as jnp
    n = zz_ref.shape[1]
    buf_ref[:] = jnp.zeros((_BLOCK_WORDS, n), jnp.uint32)
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_WORDS, n), 0)
    bound = bound_ref[pl.program_id(0)]
    dc_t, ac_t, zrl_t, eob_t = _bake_tables()

    chroma = comp_ref[0:1, :] == 1  # (1, N)

    def cmux(luma_const, chroma_const):
        return jnp.where(chroma, jnp.int32(chroma_const),
                         jnp.int32(luma_const))

    def magnitude(v, max_bits):
        a = jnp.abs(v)
        size = jnp.zeros_like(v)
        for i in range(max_bits):
            size = size + (a >= (1 << i)).astype(v.dtype)
        return size

    def place(off, slen, hi, lo):
        """96-bit placement of (hi:lo, slen) at bit offset off (mirror of
        _pack_kernel64's body). Returns the buf update."""
        q = off & 31
        t = q + slen
        r = jnp.clip(96 - t, 0, 95)
        k = r >> 5
        m = (r & 31).astype(jnp.uint32)
        minv = ((32 - m) & 31).astype(jnp.uint32)
        spill_hi = jnp.where(m > 0, hi >> minv, jnp.uint32(0))
        spill_lo = jnp.where(m > 0, lo >> minv, jnp.uint32(0))
        c0 = jnp.where(k == 0, spill_hi,
                       jnp.where(k == 1, (hi << m) | spill_lo, lo << m))
        c1 = jnp.where(k == 0, (hi << m) | spill_lo,
                       jnp.where(k == 1, lo << m, jnp.uint32(0)))
        c2 = jnp.where(k == 0, lo << m, jnp.uint32(0))
        widx = off >> 5
        active = slen > 0
        return (jnp.where(active & (word_iota == widx), c0, jnp.uint32(0))
                | jnp.where(active & (word_iota == widx + 1), c1,
                            jnp.uint32(0))
                | jnp.where(active & (word_iota == widx + 2), c2,
                            jnp.uint32(0)))

    # ---- DC slot (always present) --------------------------------------
    diff = zz_ref[0:1, :]
    dsize = magnitude(diff, 12)
    entry = jnp.zeros_like(diff)
    for s in range(11, -1, -1):
        entry = jnp.where(dsize == s, cmux(dc_t[0][s], dc_t[1][s]), entry)
    dc_len = (entry >> 16) & 0xFFFF
    dc_code = entry & 0xFFFF
    extra = jnp.where(diff < 0, diff + (1 << dsize) - 1, diff)
    slen0 = dc_len + dsize
    lo0 = ((dc_code << dsize) | (extra & ((1 << dsize) - 1))) \
        .astype(jnp.uint32)
    buf_ref[:] = buf_ref[:] | place(jnp.zeros_like(diff), slen0,
                                    jnp.zeros_like(lo0), lo0)
    off = slen0

    zrl_entry = cmux(zrl_t[0], zrl_t[1])
    zrl_len = (zrl_entry >> 16) & 0xFFFF
    zrl_code = zrl_entry & 0xFFFF

    # ---- AC slots: one merged 64-bit slot per position -----------------
    def body(s, carry):
        off, prev = carry
        ac = zz_ref[pl.ds(s, 1), :]
        nz = ac != 0
        run = s - prev - 1           # zeros since previous nonzero
        asize = magnitude(ac, 11)
        rem = run & 15
        # AC (len<<16|code) constant mux: by run (16) then size (10)
        entry = jnp.zeros_like(ac)
        for r in range(16):
            e_r = jnp.zeros_like(ac)
            for sz in range(10, 0, -1):
                e_r = jnp.where(asize == sz,
                                cmux(ac_t[0][sz - 1][r], ac_t[1][sz - 1][r]),
                                e_r)
            entry = jnp.where(rem == r, e_r, entry)
        ac_len = (entry >> 16) & 0xFFFF
        ac_code = entry & 0xFFFF
        aextra = jnp.where(ac < 0, ac + (1 << asize) - 1, ac)

        zrl_count = jnp.where(nz, run >> 4, 0)
        c2 = jnp.minimum(zrl_count, 2)
        la = jnp.where(nz, c2 * zrl_len, 0)
        va = jnp.where(c2 == 2, (zrl_code << zrl_len) | zrl_code,
                       jnp.where(c2 == 1, zrl_code, 0)).astype(jnp.uint32)
        lb = jnp.where(nz & (zrl_count >= 3), zrl_len, 0)
        vb = jnp.where(lb > 0, zrl_code, 0).astype(jnp.uint32)
        lc = jnp.where(nz, ac_len + asize, 0)
        vc = jnp.where(nz, (ac_code << asize)
                       | (aextra & ((1 << asize) - 1)), 0) \
            .astype(jnp.uint32)
        # compose (va | vb | vc) into one 64-bit value (entropy._shl64)
        hi = jnp.zeros_like(va)
        lo = va
        sh = lb.astype(jnp.uint32)
        hi = (hi << sh) | jnp.where(sh > 0, lo >> ((32 - sh) & 31),
                                    jnp.uint32(0))
        lo = (lo << sh) | vb
        sh = lc.astype(jnp.uint32)
        hi = (hi << sh) | jnp.where(sh > 0, lo >> ((32 - sh) & 31),
                                    jnp.uint32(0))
        lo = (lo << sh) | vc
        mlen = la + lb + lc

        buf_ref[:] = buf_ref[:] | place(off, mlen, hi, lo)
        return off + mlen, jnp.where(nz, s, prev)

    off, prev = jax.lax.fori_loop(
        1, bound, body, (off, jnp.zeros_like(off)))

    # ---- EOB slot ------------------------------------------------------
    eobe = cmux(eob_t[0], eob_t[1])
    need = prev < 63
    elen = jnp.where(need, (eobe >> 16) & 0xFFFF, 0)
    eval_ = jnp.where(need, eobe & 0xFFFF, 0).astype(jnp.uint32)
    buf_ref[:] = buf_ref[:] | place(off, elen, jnp.zeros_like(eval_), eval_)
    nbits_ref[:] = off + elen


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_block_bits_fused(zz: jax.Array, comp: jax.Array,
                          interpret: bool = False):
    """(B, 64) int32 DC-diffed MCU-ordered coefficients + (B,) comp flags
    → (buf (B, 64) uint32 MSB-first, nbits (B,) int32), computing the slot
    tables INSIDE the pack kernel (zero HBM-materialized slot arrays).
    Bit-identical to _slot_tables_merged + pack_block_bits_pallas64."""
    import jax.numpy as jnp
    b = zz.shape[0]
    n_pad = ((b + TILE_N - 1) // TILE_N) * TILE_N
    zz_t = jnp.zeros((64, n_pad), jnp.int32).at[:, :b].set(zz.T)
    comp_t = jnp.zeros((8, n_pad), jnp.int32).at[0, :b].set(comp)

    # per-tile loop bound: the last nonzero AC position + 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, 63), 1) + 1
    last_nz = jnp.max(jnp.where(zz[:, 1:] != 0, pos, 0), axis=1)  # (b,)
    last_t = jnp.zeros((n_pad,), jnp.int32).at[:b].set(last_nz)
    n_tiles = n_pad // TILE_N
    bounds = (jnp.max(last_t.reshape(n_tiles, TILE_N), axis=1)
              + 1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((64, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((8, TILE_N), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_WORDS, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((1, TILE_N), lambda i, *_: (0, i)),
        ],
    )
    buf_t, nbits_t = pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_BLOCK_WORDS, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, zz_t, comp_t)

    return buf_t[:, :b].T, nbits_t[0, :b]


def _fused_seg_kernel(seg_g, seg_words, bound_ref, zz_ref, comp_ref,
                      buf_ref, nbits_ref):
    """Segment variant of _fused_kernel: each LANE packs ``seg_g``
    CONSECUTIVE MCU-ordered blocks contiguously into one bit segment —
    the in-lane concat is the same sequential bit-append the per-block
    kernel already does, just without resetting the offset between
    blocks. This removes the per-block concat stage entirely: segments
    leave the kernel as (seg_words, N) staging columns + per-segment bit
    counts, the device then only word-aligns SEGMENTS (S = B/seg_g of
    them), and the host bit-compacts during the overlapped finalize.
    Cross-lane bit concat (the rejected Pallas-concat) is still never
    attempted — lanes stay independent. Bit semantics identical to
    _fused_kernel per block; comp < 0 marks padding blocks that emit
    zero bits."""
    n = zz_ref.shape[1]
    buf_ref[:] = jnp.zeros((seg_words, n), jnp.uint32)
    word_iota = jax.lax.broadcasted_iota(jnp.int32, (seg_words, n), 0)
    dc_t, ac_t, zrl_t, eob_t = _bake_tables()
    bound_base = pl.program_id(0) * seg_g  # hoisted: not legal in loop body

    def magnitude(v, max_bits):
        a = jnp.abs(v)
        size = jnp.zeros_like(v)
        for i in range(max_bits):
            size = size + (a >= (1 << i)).astype(v.dtype)
        return size

    def place(off, slen, hi, lo):
        q = off & 31
        t = q + slen
        r = jnp.clip(96 - t, 0, 95)
        k = r >> 5
        m = (r & 31).astype(jnp.uint32)
        minv = ((32 - m) & 31).astype(jnp.uint32)
        spill_hi = jnp.where(m > 0, hi >> minv, jnp.uint32(0))
        spill_lo = jnp.where(m > 0, lo >> minv, jnp.uint32(0))
        c0 = jnp.where(k == 0, spill_hi,
                       jnp.where(k == 1, (hi << m) | spill_lo, lo << m))
        c1 = jnp.where(k == 0, (hi << m) | spill_lo,
                       jnp.where(k == 1, lo << m, jnp.uint32(0)))
        c2 = jnp.where(k == 0, lo << m, jnp.uint32(0))
        widx = off >> 5
        active = slen > 0
        return (jnp.where(active & (word_iota == widx), c0, jnp.uint32(0))
                | jnp.where(active & (word_iota == widx + 1), c1,
                            jnp.uint32(0))
                | jnp.where(active & (word_iota == widx + 2), c2,
                            jnp.uint32(0)))

    def block_body(g, off):
        comp_row = comp_ref[pl.ds(g, 1), :]          # (1, N)
        chroma = comp_row == 1
        live = comp_row >= 0                         # padding blocks: -1

        def cmux(luma_const, chroma_const):
            return jnp.where(chroma, jnp.int32(chroma_const),
                             jnp.int32(luma_const))

        # ---- DC slot ----------------------------------------------------
        diff = zz_ref[pl.ds(g * 64, 1), :]
        dsize = magnitude(diff, 12)
        entry = jnp.zeros_like(diff)
        for s in range(11, -1, -1):
            entry = jnp.where(dsize == s, cmux(dc_t[0][s], dc_t[1][s]),
                              entry)
        dc_len = (entry >> 16) & 0xFFFF
        dc_code = entry & 0xFFFF
        extra = jnp.where(diff < 0, diff + (1 << dsize) - 1, diff)
        slen0 = jnp.where(live, dc_len + dsize, 0)
        lo0 = ((dc_code << dsize) | (extra & ((1 << dsize) - 1))) \
            .astype(jnp.uint32)
        buf_ref[:] = buf_ref[:] | place(off, slen0,
                                        jnp.zeros_like(lo0), lo0)
        off = off + slen0

        zrl_entry = cmux(zrl_t[0], zrl_t[1])
        zrl_len = (zrl_entry >> 16) & 0xFFFF
        zrl_code = zrl_entry & 0xFFFF

        # ---- AC slots ---------------------------------------------------
        def ac_body(s, carry):
            off, prev = carry
            ac = zz_ref[pl.ds(g * 64 + s, 1), :]
            nz = ac != 0
            run = s - prev - 1
            asize = magnitude(ac, 11)
            rem = run & 15
            entry = jnp.zeros_like(ac)
            for r in range(16):
                e_r = jnp.zeros_like(ac)
                for sz in range(10, 0, -1):
                    e_r = jnp.where(
                        asize == sz,
                        cmux(ac_t[0][sz - 1][r], ac_t[1][sz - 1][r]), e_r)
                entry = jnp.where(rem == r, e_r, entry)
            ac_len = (entry >> 16) & 0xFFFF
            ac_code = entry & 0xFFFF
            aextra = jnp.where(ac < 0, ac + (1 << asize) - 1, ac)

            zrl_count = jnp.where(nz, run >> 4, 0)
            c2 = jnp.minimum(zrl_count, 2)
            la = jnp.where(nz, c2 * zrl_len, 0)
            va = jnp.where(c2 == 2, (zrl_code << zrl_len) | zrl_code,
                           jnp.where(c2 == 1, zrl_code, 0)) \
                .astype(jnp.uint32)
            lb = jnp.where(nz & (zrl_count >= 3), zrl_len, 0)
            vb = jnp.where(lb > 0, zrl_code, 0).astype(jnp.uint32)
            lc = jnp.where(nz, ac_len + asize, 0)
            vc = jnp.where(nz, (ac_code << asize)
                           | (aextra & ((1 << asize) - 1)), 0) \
                .astype(jnp.uint32)
            hi = jnp.zeros_like(va)
            lo = va
            sh = lb.astype(jnp.uint32)
            hi = (hi << sh) | jnp.where(sh > 0, lo >> ((32 - sh) & 31),
                                        jnp.uint32(0))
            lo = (lo << sh) | vb
            sh = lc.astype(jnp.uint32)
            hi = (hi << sh) | jnp.where(sh > 0, lo >> ((32 - sh) & 31),
                                        jnp.uint32(0))
            lo = (lo << sh) | vc
            mlen = la + lb + lc
            buf_ref[:] = buf_ref[:] | place(off, mlen, hi, lo)
            return off + mlen, jnp.where(nz, s, prev)

        bound = bound_ref[bound_base + g]
        off, prev = jax.lax.fori_loop(1, bound, ac_body,
                                      (off, jnp.zeros_like(off)))

        # ---- EOB slot ---------------------------------------------------
        eobe = cmux(eob_t[0], eob_t[1])
        need = live & (prev < 63)
        elen = jnp.where(need, (eobe >> 16) & 0xFFFF, 0)
        eval_ = jnp.where(need, eobe & 0xFFFF, 0).astype(jnp.uint32)
        buf_ref[:] = buf_ref[:] | place(off, elen, jnp.zeros_like(eval_),
                                        eval_)
        return off + elen

    n_lanes = zz_ref.shape[1]
    off = jax.lax.fori_loop(0, seg_g, block_body,
                            jnp.zeros((1, n_lanes), jnp.int32))
    nbits_ref[:] = off


TILE_SEG = 512  # lanes (segments) per grid step for the segment kernel


@functools.partial(jax.jit,
                   static_argnames=("seg_g", "seg_words", "interpret"))
def pack_segments_fused(zz: jax.Array, comp: jax.Array, seg_g: int = 16,
                        seg_words: int = 64, interpret: bool = False):
    """(B, 64) int32 DC-diffed MCU-ordered coefficients + (B,) comp flags
    (-1 = padding block emitting zero bits) → per-SEGMENT packed bits:
    (segbuf (S, seg_words) uint32 MSB-first, segbits (S,) int32) with
    S = B/seg_g; blocks [s*seg_g, (s+1)*seg_g) concatenate contiguously
    into segment s. B must be a multiple of seg_g (callers pad with
    comp = -1 blocks)."""
    b = zz.shape[0]
    assert b % seg_g == 0, (b, seg_g)
    s_count = b // seg_g
    n_pad = ((s_count + TILE_SEG - 1) // TILE_SEG) * TILE_SEG
    g_rows = max(8, seg_g)  # sublane-aligned comp rows
    zz_t = jnp.zeros((seg_g * 64, n_pad), jnp.int32) \
        .at[:, :s_count].set(zz.reshape(s_count, seg_g * 64).T)
    comp_t = jnp.full((g_rows, n_pad), -1, jnp.int32) \
        .at[:seg_g, :s_count].set(comp.reshape(s_count, seg_g).T)

    # per-(tile, g) AC loop bound: last nonzero position + 1, maxed over
    # the tile's lanes
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, 63), 1) + 1
    last_nz = jnp.max(jnp.where(zz[:, 1:] != 0, pos, 0), axis=1)  # (b,)
    last_t = jnp.zeros((n_pad, seg_g), jnp.int32) \
        .at[:s_count].set(last_nz.reshape(s_count, seg_g))
    n_tiles = n_pad // TILE_SEG
    bounds = (jnp.max(last_t.reshape(n_tiles, TILE_SEG, seg_g), axis=1)
              + 1).astype(jnp.int32).reshape(-1)   # (n_tiles*seg_g,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((seg_g * 64, TILE_SEG), lambda i, *_: (0, i)),
            pl.BlockSpec((g_rows, TILE_SEG), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((seg_words, TILE_SEG), lambda i, *_: (0, i)),
            pl.BlockSpec((1, TILE_SEG), lambda i, *_: (0, i)),
        ],
    )
    buf_t, nbits_t = pl.pallas_call(
        functools.partial(_fused_seg_kernel, seg_g, seg_words),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((seg_words, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, zz_t, comp_t)

    return buf_t[:, :s_count].T, nbits_t[0, :s_count]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_block_bits_pallas64(lens: jax.Array, his: jax.Array,
                             los: jax.Array, interpret: bool = False):
    """Merged-64-bit-slot pack: lens (B, S) int32, his/los (B, S) uint32.

    Returns (buf (B, 64) uint32 MSB-first, nbits (B,) int32); bit-identical
    to entropy._pack_block_bits64. The slot axis is ~3x shorter than the
    32-bit-slot formulation, and the per-tile loop bound (last active
    slot) shrinks proportionally."""
    b, s = lens.shape
    s_pad = ((s + 7) // 8) * 8
    n_pad = ((b + TILE_N - 1) // TILE_N) * TILE_N
    lens_t = jnp.zeros((s_pad, n_pad), jnp.int32).at[:s, :b].set(lens.T)
    his_t = jnp.zeros((s_pad, n_pad), jnp.uint32).at[:s, :b].set(his.T)
    los_t = jnp.zeros((s_pad, n_pad), jnp.uint32).at[:s, :b].set(los.T)

    active = lens_t > 0
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (s_pad, n_pad), 0)
    last = jnp.max(jnp.where(active, slot_iota + 1, 0), axis=0)
    n_tiles = n_pad // TILE_N
    bounds = jnp.max(last.reshape(n_tiles, TILE_N), axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((s_pad, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((s_pad, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((s_pad, TILE_N), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_WORDS, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((1, TILE_N), lambda i, *_: (0, i)),
        ],
    )
    buf_t, nbits_t = pl.pallas_call(
        _pack_kernel64,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_BLOCK_WORDS, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, lens_t, his_t, los_t)

    return buf_t[:, :b].T, nbits_t[0, :b]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pack_block_bits_pallas(lens: jax.Array, vals: jax.Array,
                           interpret: bool = False):
    """lens/vals: (B, S) int32 per-slot bit lengths/values.

    Returns (buf (B, 64) uint32 MSB-first, nbits (B,) int32). Bit-identical
    to entropy._pack_block_bits.
    """
    b, s = lens.shape
    s_pad = ((s + 7) // 8) * 8
    n_pad = ((b + TILE_N - 1) // TILE_N) * TILE_N
    lens_t = jnp.zeros((s_pad, n_pad), jnp.int32).at[:s, :b].set(lens.T)
    vals_t = jnp.zeros((s_pad, n_pad), jnp.uint32).at[:s, :b].set(
        vals.astype(jnp.uint32).T)

    # per-tile dynamic loop bound: last active slot + 1
    active = lens_t > 0
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (s_pad, n_pad), 0)
    last = jnp.max(jnp.where(active, slot_iota + 1, 0), axis=0)  # (n_pad,)
    n_tiles = n_pad // TILE_N
    bounds = jnp.max(last.reshape(n_tiles, TILE_N), axis=1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((s_pad, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((s_pad, TILE_N), lambda i, *_: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((_BLOCK_WORDS, TILE_N), lambda i, *_: (0, i)),
            pl.BlockSpec((1, TILE_N), lambda i, *_: (0, i)),
        ],
    )
    buf_t, nbits_t = pl.pallas_call(
        _pack_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((_BLOCK_WORDS, n_pad), jnp.uint32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, lens_t, vals_t)

    return buf_t[:, :b].T, nbits_t[0, :b]
