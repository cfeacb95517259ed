"""Fused front-end kernel (convert + 4:2:0 + DCT + quantize) — round 4.

Contracts:
  - interpret-mode kernel ≡ front_end_reference (the plain-XLA replica of
    the kernel's exact math) bit for bit, with and without the overlay
    fold;
  - overlay fold ≡ overlay_on_planes → kernel (the blend replicates the
    intermediate u8 round byte for byte);
  - on the CPU backend (exact f32 everywhere) the kernel also matches the
    product XLA arm (encode_gop_planes_to_coefs) exactly — on TPU the
    product arm runs bf16_3x DCT, so streams may differ by ±1-coefficient
    rounding ties there (the bf16_3x-vs-HIGHEST quality-gate contract,
    PERF.md round 2);
  - coefficients feed the unchanged entropy/decode path: full roundtrip
    reconstructs above 30 dB.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flutpu.codec.ops.frontend_pallas import (front_end_fits,
                                              front_end_pallas,
                                              front_end_reference)
from flutpu.codec.ops.quant import (CHROMA_QTABLE, LUMA_QTABLE,
                                    scale_qtable)


@pytest.fixture(scope="module")
def qtabs():
    return (jnp.asarray(scale_qtable(LUMA_QTABLE, 85)),
            jnp.asarray(scale_qtable(CHROMA_QTABLE, 85)))


def _planes(f=2, h=64, w=256, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.integers(0, 256, (f, h, w), np.uint8))
                 for _ in range(3))


class TestFrontEndKernel:
    def test_fits_gate(self):
        assert front_end_fits(1088, 1920)
        assert front_end_fits(2176, 3840)
        assert not front_end_fits(1080, 1920)   # H % 32
        assert not front_end_fits(1088, 1930)   # W % 128
        assert not front_end_fits(64, 128)      # W < 256

    def test_matches_reference_exactly(self, qtabs):
        r, g, b = _planes()
        got = front_end_pallas(r, g, b, *qtabs, interpret=True)
        want = front_end_reference(r, g, b, *qtabs)
        for a, c, n in zip(got, want, ("y", "cb", "cr")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                          err_msg=n)

    def test_nonaligned_chroma_width_pad(self, qtabs):
        """W = 640 → chroma 320 padded to 384 lanes in-kernel and sliced;
        the pad region must not leak."""
        r, g, b = _planes(h=32, w=640, seed=3)
        got = front_end_pallas(r, g, b, *qtabs, interpret=True)
        want = front_end_reference(r, g, b, *qtabs)
        assert got[1].shape == (2, 16, 320)
        for a, c in zip(got, want):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_overlay_fold_byte_identical_to_blend_then_encode(self, qtabs):
        from flutpu.ttml.render.composite import overlay_on_planes
        r, g, b = _planes(seed=1)
        rng = np.random.default_rng(2)
        ov = rng.integers(0, 256, (64, 256, 4), np.uint8)
        ovp = tuple(jnp.asarray(ov[..., c]) for c in (2, 1, 0, 3))
        folded = front_end_pallas(r, g, b, *qtabs, overlay_planes=ovp,
                                  interpret=True)
        rb, gb, bb = overlay_on_planes(r, g, b, jnp.asarray(ov))
        staged = front_end_pallas(rb, gb, bb, *qtabs, interpret=True)
        for a, c, n in zip(folded, staged, ("y", "cb", "cr")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c),
                                          err_msg=n)
        ref = front_end_reference(r, g, b, *qtabs, overlay_planes=ovp)
        for a, c in zip(folded, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_mod16_height_pad_and_slice(self, qtabs):
        """Coded heights are %16 but the kernel needs %32 (4K = 2160):
        pad to the next 32-multiple, slice the coefficient rows back —
        exact, because 8x8 blocks are independent (the
        jpeg._planes_front_end route)."""
        from flutpu.codec.jpeg import encode_gop_planes_to_coefs
        from flutpu.codec.ops.dct import blockize
        from flutpu.codec.ops.quant import zigzag_flatten
        r, g, b = _planes(h=48, w=256, seed=6)
        pads = tuple(jnp.pad(p, ((0, 0), (0, 16), (0, 0)), mode="edge")
                     for p in (r, g, b))
        yp, cbp, crp = front_end_pallas(*pads, *qtabs, interpret=True)
        yp, cbp, crp = yp[:, :48], cbp[:, :24], crp[:, :24]
        got = [np.asarray(zigzag_flatten(blockize(p)))
               for p in (yp, cbp, crp)]
        want = encode_gop_planes_to_coefs(r, g, b, *qtabs,
                                          pad_h=48, pad_w=256)
        for a, c, n in zip(got, want, ("y", "cb", "cr")):
            np.testing.assert_array_equal(a, np.asarray(c), err_msg=n)

    def test_matches_product_arm_on_cpu(self, qtabs):
        """Exact f32 everywhere on CPU: the kernel's formulation and the
        product planar arm agree bit for bit (on TPU the product arm's
        bf16_3x precision makes this a ±1-tie contract instead)."""
        from flutpu.codec.jpeg import encode_gop_planes_to_coefs
        from flutpu.codec.ops.dct import blockize
        from flutpu.codec.ops.quant import zigzag_flatten
        r, g, b = _planes(seed=4)
        yp, cbp, crp = front_end_pallas(r, g, b, *qtabs, interpret=True)
        kz = [np.asarray(zigzag_flatten(blockize(p)))
              for p in (yp, cbp, crp)]
        xz = encode_gop_planes_to_coefs(r, g, b, *qtabs,
                                        pad_h=64, pad_w=256)
        for a, c, n in zip(kz, xz, ("y", "cb", "cr")):
            np.testing.assert_array_equal(a, np.asarray(c), err_msg=n)

    def test_roundtrip_decodes(self, qtabs):
        """Kernel coefficients → entropy scan → decode → >30 dB."""
        from flutpu.codec.decode import coefs_to_rgb
        from flutpu.codec.jpeg import psnr
        from flutpu.codec.ops.dct import blockize
        from flutpu.codec.ops.quant import zigzag_flatten
        from flutpu.core.elements import make_test_frame
        qy, qc = qtabs
        frames = np.stack([np.asarray(make_test_frame("ball", 256, 64, i))
                           for i in range(2)])
        r, g, b = (jnp.asarray(frames[..., c]) for c in range(3))
        yp, cbp, crp = front_end_pallas(r, g, b, qy, qc, interpret=True)
        yz = zigzag_flatten(blockize(yp.astype(jnp.int32)))
        cbz = zigzag_flatten(blockize(cbp.astype(jnp.int32)))
        crz = zigzag_flatten(blockize(crp.astype(jnp.int32)))
        out = np.asarray(coefs_to_rgb(yz[0], cbz[0], crz[0],
                                      qy, qc, 64, 256))
        assert psnr(frames[0], out) > 30
