"""The Pallas pack kernel (interpret mode on CPU) must be bit-identical to
the lax.scan formulation and to the host coder."""

import numpy as np
import pytest

import jax.numpy as jnp

from flutpu.codec.jpeg import JpegEncoder
from flutpu.codec.ops.entropy import _pack_block_bits, _slot_tables
from flutpu.codec.ops.entropy_pallas import pack_block_bits_pallas
from flutpu.core.elements import make_test_frame


def _random_slots(b, seed):
    """Realistic slot tables from random quantized blocks."""
    rng = np.random.default_rng(seed)
    zz = np.zeros((b, 64), np.int32)
    for i in range(b):
        n = rng.integers(0, 20)
        pos = rng.choice(64, size=n, replace=False)
        zz[i, pos] = rng.integers(-200, 200, size=n)
    comp = (np.arange(b) % 3 > 0).astype(np.int32)
    return _slot_tables(jnp.asarray(zz), jnp.asarray(comp))


@pytest.mark.parametrize("b", [1, 7, 130])
def test_pallas_matches_scan(b):
    lens, vals = _random_slots(b, seed=b)
    buf_s, nb_s = _pack_block_bits(lens, vals)
    buf_p, nb_p = pack_block_bits_pallas(lens, vals, interpret=True)
    np.testing.assert_array_equal(np.asarray(nb_p), np.asarray(nb_s))
    np.testing.assert_array_equal(np.asarray(buf_p), np.asarray(buf_s))


def test_full_pipeline_with_pallas_interpret():
    frames = make_test_frame("gradient", 32, 32, 2)[None]
    host = JpegEncoder(quality=85, engine="host").encode_gop(frames)
    dev = JpegEncoder(quality=85, engine="device",
                      use_pallas=True)
    # interpret mode: patch the jit'd path via env-independent direct call
    from flutpu.codec.ops import entropy
    import flutpu.codec.ops.entropy_pallas as ep
    orig = ep.pack_block_bits_pallas64
    orig_f = ep.pack_block_bits_fused
    ep.pack_block_bits_pallas64 = lambda l, h, o, interpret=False: orig(
        l, h, o, interpret=True)
    ep.pack_block_bits_fused = lambda z, c, interpret=False: orig_f(
        z, c, interpret=True)
    try:
        out = dev.encode_gop(frames)
    finally:
        ep.pack_block_bits_pallas64 = orig
        ep.pack_block_bits_fused = orig_f
    assert out == host


def test_merged_64bit_slots_bit_identical():
    """Merged 64-bit slots (scan + pallas-interpret) match the 32-bit slot
    scan packer bit for bit."""
    from flutpu.codec.ops.entropy import (_pack_block_bits,
                                          _pack_block_bits64,
                                          _slot_tables,
                                          _slot_tables_merged)
    from flutpu.codec.ops.entropy_pallas import pack_block_bits_pallas64

    rng = np.random.default_rng(42)
    zz = rng.integers(-40, 40, size=(96, 64)).astype(np.int32)
    zz[rng.random(zz.shape) < 0.75] = 0      # sparse like real coefs
    zz[:5] = 0                                # all-zero blocks
    zz[6, 63] = 9                             # nonzero at the last position
    zz[7, 1:] = 0; zz[7, 0] = -1023           # DC-only, max magnitude
    zz[8, 1:48] = 0                           # long zero run -> 2+ ZRLs
    comp = (np.arange(96) % 3 > 0).astype(np.int32)

    lens, vals = _slot_tables(jnp.asarray(zz), jnp.asarray(comp))
    ref_buf, ref_nb = _pack_block_bits(lens, vals)

    ml, mh, mo = _slot_tables_merged(jnp.asarray(zz), jnp.asarray(comp))
    buf64, nb64 = _pack_block_bits64(ml, mh, mo)
    np.testing.assert_array_equal(np.asarray(ref_buf), np.asarray(buf64))
    np.testing.assert_array_equal(np.asarray(ref_nb), np.asarray(nb64))

    buf_p, nb_p = pack_block_bits_pallas64(ml, mh, mo, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_buf), np.asarray(buf_p))
    np.testing.assert_array_equal(np.asarray(ref_nb), np.asarray(nb_p))


def test_fused_slot_pack_bit_identical():
    """The round-3 fused slot+pack kernel (slot symbol math computed
    in-kernel, run-lengths as loop state) is bit-identical to the split
    _slot_tables_merged + _pack_block_bits64 formulation, across DC-only
    blocks, >47-zero runs (3 ZRLs), nonzero position 63 (no EOB), and
    both component classes."""
    from flutpu.codec.ops.entropy import (_pack_block_bits64,
                                          _slot_tables_merged)
    from flutpu.codec.ops.entropy_pallas import pack_block_bits_fused

    rng = np.random.default_rng(17)
    b = 260
    zz = np.zeros((b, 64), np.int32)
    zz[:, 0] = rng.integers(-2047, 2048, b)
    for i in range(b):
        k = rng.integers(0, 30)
        pos = rng.choice(np.arange(1, 64), size=k, replace=False)
        zz[i, pos] = rng.integers(-1023, 1024, k)
    zz[3, 1:] = 0                      # DC-only (EOB immediately)
    zz[4, 1:] = 0; zz[4, 63] = 9       # run 62 (3 ZRLs), no EOB
    zz[5, 1:] = 0; zz[5, 33] = -1      # run 32 (2 ZRLs)
    comp = (rng.random(b) > 0.5).astype(np.int32)

    lens, his, los = _slot_tables_merged(jnp.asarray(zz), jnp.asarray(comp))
    ref_buf, ref_nb = _pack_block_bits64(lens, his, los)
    got_buf, got_nb = pack_block_bits_fused(jnp.asarray(zz),
                                            jnp.asarray(comp),
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(got_nb), np.asarray(ref_nb))
    np.testing.assert_array_equal(np.asarray(got_buf), np.asarray(ref_buf))
