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
