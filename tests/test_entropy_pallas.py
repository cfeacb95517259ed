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
    orig = ep.pack_block_bits_pallas
    ep.pack_block_bits_pallas = lambda l, v, interpret=False: orig(
        l, v, interpret=True)
    try:
        out = dev.encode_gop(frames)
    finally:
        ep.pack_block_bits_pallas = orig
    assert out == host
