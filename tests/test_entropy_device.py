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
