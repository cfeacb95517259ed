"""Device entropy coder must be bit-identical to the host (C++/Python)
Huffman encoder across content, qualities, geometries and edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

from flutpu.codec.jpeg import (JpegEncoder, decode_jpeg, encode_gop_to_coefs,
                               psnr)
from flutpu.core.elements import make_test_frame


def _both(frames, quality=85, subsample=True):
    host = JpegEncoder(quality=quality, subsample=subsample, engine="host")
    dev = JpegEncoder(quality=quality, subsample=subsample, engine="device")
    return host.encode_gop(frames), dev.encode_gop(frames)


@pytest.mark.parametrize("pattern", ["gradient", "smpte", "ball", "noise", "solid"])
def test_device_matches_host(pattern):
    frames = np.stack([make_test_frame(pattern, 64, 48, i) for i in range(3)])
    h, d = _both(frames)
    assert h == d


@pytest.mark.parametrize("quality", [1, 25, 50, 75, 95, 100])
def test_quality_sweep(quality):
    frames = make_test_frame("noise", 48, 32, 7)[None]
    h, d = _both(frames, quality=quality)
    assert h == d


def test_444_matches():
    frames = np.stack([make_test_frame("gradient", 40, 24, i) for i in range(2)])
    h, d = _both(frames, subsample=False)
    assert h == d


def test_large_frame_matches():
    frames = make_test_frame("noise", 320, 240, 3)[None]
    h, d = _both(frames, quality=90)
    assert h == d


def test_single_mcu():
    frames = make_test_frame("gradient", 16, 16, 0)[None]
    h, d = _both(frames)
    assert h == d


def test_device_output_decodes():
    frames = np.stack([make_test_frame("ball", 96, 64, i) for i in range(4)])
    dev = JpegEncoder(quality=90, engine="device")
    for i, data in enumerate(dev.encode_gop(frames)):
        img = decode_jpeg(data)
        assert psnr(frames[i], img) > 30


def test_extreme_coefficients():
    """Saturated random extremes exercise max magnitude categories, ZRL
    chains and the cap-overflow fallback path."""
    rng = np.random.default_rng(11)
    frames = (rng.integers(0, 2, size=(1, 32, 32, 3)) * 255).astype(np.uint8)
    h, d = _both(frames, quality=100)
    assert h == d


def test_auto_engine_fallback_on_tiny_cap():
    frames = make_test_frame("noise", 32, 32, 1)[None]
    enc = JpegEncoder(quality=100, engine="auto")
    enc.CAP_LADDER = (8,)  # force overflow
    enc._WORD_BUCKET = 4
    data = enc.encode_gop(frames)
    ref = JpegEncoder(quality=100, engine="host").encode_gop(frames)
    assert data == ref


def test_stuffing_cases():
    """Content engineered to produce 0xFF bytes in the scan exercises the
    host stuffing path; equality with the host coder covers it, but also
    assert no bare 0xFF followed by a marker-like byte inside the scan."""
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(2, 48, 48, 3), dtype=np.uint8)
    h, d = _both(frames, quality=95)
    assert h == d
    for data in d:
        scan = data[data.find(b"\xff\xda") + 14:-2]
        i = 0
        while i < len(scan) - 1:
            if scan[i] == 0xFF:
                assert scan[i + 1] == 0x00, f"unstuffed 0xFF at {i}"
                i += 2
            else:
                i += 1


def test_scan_planes_matches_host_coder():
    """scan_planes (the shared JPEG/FVC entry point for pre-quantized
    coefficient planes) is byte-identical to the host C++ coder."""
    import jax.numpy as jnp
    from flutpu.codec.jpeg import JpegEncoder
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(2, 32, 48, 3), dtype=np.uint8)
    enc = JpegEncoder(quality=85, engine="device")
    coefs = enc._coefs(frames)
    assert enc.scan_planes(coefs) == enc._scans_host(coefs)


@pytest.mark.slow
def test_concat_v2_matches_v1_adversarial():
    """Random block bit-lengths including word-boundary-exact starts and
    many tiny blocks packed into single words."""
    import jax.numpy as jnp
    from flutpu.codec.ops import entropy as E

    rng = np.random.default_rng(123)
    for trial in range(5):
        nb = rng.integers(4, 80, size=400).astype(np.int32)
        if trial == 1:
            nb[:50] = 4            # 8 block starts per word
        if trial == 2:
            nb[:] = 32             # every start boundary-exact
        if trial == 3:
            nb[10] = 64 * 20       # a very long block spanning many words
        buf = np.zeros((400, E._BLOCK_WORDS), np.uint32)
        for i, n in enumerate(nb):
            bits = rng.integers(0, 2, size=int(n))
            for j, bit in enumerate(bits):
                if bit:
                    buf[i, j // 32] |= np.uint32(1) << np.uint32(31 - (j % 32))
        out_words = int((nb.sum() + 31) // 32) + 4
        v1 = E._concat_blocks(jnp.asarray(buf), jnp.asarray(nb), out_words,
                              max_span=9)
        v2 = E._concat_blocks_v2(jnp.asarray(buf), jnp.asarray(nb),
                                 out_words, min_block_bits=4)
        np.testing.assert_array_equal(np.asarray(v1[0]), np.asarray(v2[0]))
        assert int(v1[1]) == int(v2[1])


def test_concat_v3_bit_identical_to_v1():
    """The scatter-formulation concat (round 3) matches the gather
    formulations word-for-word, including word-aligned block starts (the
    ceil-word scatter case) and the past-the-window drop path."""
    import jax.numpy as jnp
    from flutpu.codec.ops.entropy import _concat_blocks, _concat_blocks_v3

    rng = np.random.default_rng(23)
    b, ow = 500, 300
    nbits = rng.integers(6, 1800, b).astype(np.int32)
    nbits[:4] = (32, 64, 31, 33)   # aligned + near-aligned starts
    buf = rng.integers(0, 2 ** 32, (b, 64), dtype=np.uint64) \
        .astype(np.uint32)
    for i in range(b):
        nb = int(nbits[i])
        wfull = nb // 32
        if nb % 32:
            buf[i, wfull] &= np.uint32(0xFFFFFFFF) << np.uint32(
                32 - nb % 32)
            buf[i, wfull + 1:] = 0
        else:
            buf[i, wfull:] = 0
    o1, t1 = _concat_blocks(jnp.asarray(buf), jnp.asarray(nbits), ow)
    o3, t3 = _concat_blocks_v3(jnp.asarray(buf), jnp.asarray(nbits), ow)
    assert int(t1) == int(t3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o3))
