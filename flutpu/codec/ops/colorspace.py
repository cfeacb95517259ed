"""Colorspace conversion ops — batched, fusable, MXU-friendly.

RGB↔YCbCr (BT.601 full-range, the JPEG/JFIF convention) expressed as a 3x3
matmul so XLA can fuse it with neighbouring ops and lower it onto the MXU for
batched frames; 4:2:0 chroma down/upsampling via reshape-mean / repeat.

Reference analog: the colorspace stage the reference delegates to
GStreamer's videoconvert in front of its encoders (hype/README.md pipeline);
here it is the first stage of the fused on-device encode path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 full-range RGB -> YCbCr (JFIF)
_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168735892, -0.331264108, 0.5],
     [0.5, -0.418687589, -0.081312411]], dtype=np.float32)
_YCBCR2RGB = np.linalg.inv(_RGB2YCBCR).astype(np.float32)
_CHROMA_OFFSET = np.array([0.0, 128.0, 128.0], dtype=np.float32)


def rgb_to_ycbcr(rgb: jax.Array) -> jax.Array:
    """[..., H, W, 3] uint8/float RGB → float32 YCbCr (Y in [0,255],
    Cb/Cr centred at 128)."""
    x = rgb.astype(jnp.float32)
    m = jnp.asarray(_RGB2YCBCR.T)
    return x @ m + jnp.asarray(_CHROMA_OFFSET)


def ycbcr_to_rgb(ycbcr: jax.Array) -> jax.Array:
    """[..., H, W, 3] float YCbCr → float32 RGB in [0,255] (unclipped)."""
    x = ycbcr.astype(jnp.float32) - jnp.asarray(_CHROMA_OFFSET)
    m = jnp.asarray(_YCBCR2RGB.T)
    return x @ m


def subsample_420(plane: jax.Array) -> jax.Array:
    """[..., H, W] → [..., H/2, W/2] by 2x2 box mean (JPEG-style chroma
    subsampling). H and W must be even."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 2, 2, w // 2, 2)
    return x.mean(axis=(-3, -1))


def upsample_420(plane: jax.Array) -> jax.Array:
    """[..., H/2, W/2] → [..., H, W] by nearest-neighbour replication."""
    x = jnp.repeat(plane, 2, axis=-2)
    return jnp.repeat(x, 2, axis=-1)


def rgb_to_i420(rgb: jax.Array):
    """[..., H, W, 3] RGB → (Y [...,H,W], Cb [...,H/2,W/2], Cr) planes."""
    ycc = rgb_to_ycbcr(rgb)
    y = ycc[..., 0]
    cb = subsample_420(ycc[..., 1])
    cr = subsample_420(ycc[..., 2])
    return y, cb, cr


def i420_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """I420 planes → [..., H, W, 3] float RGB in [0,255] (unclipped)."""
    ycc = jnp.stack([y, upsample_420(cb), upsample_420(cr)], axis=-1)
    return ycbcr_to_rgb(ycc)


def scale_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize of [..., H, W] or [..., H, W, C] (align_corners=False,
    half-pixel centres). Static output shape — jit/XLA friendly."""
    has_c = img.ndim >= 3 and img.shape[-1] <= 4
    x = img if has_c else img[..., None]
    *lead, h, w, c = x.shape
    x = x.reshape(-1, h, w, c)
    out = jax.image.resize(
        x.astype(jnp.float32),
        (x.shape[0], out_h, out_w, c), method="bilinear")
    out = out.reshape(*lead, out_h, out_w, c)
    return out if has_c else out[..., 0]
