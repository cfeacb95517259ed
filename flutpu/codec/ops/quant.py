"""Quantization tables, quality scaling, zigzag — the rate control knobs.

Standard JPEG Annex-K base tables with IJG quality scaling; zigzag
reordering done as a single static gather so it fuses into the device encode
pipeline (coefficients leave the chip already zigzagged, int16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ITU-T T.81 Annex K.1 example quantization tables (public constants)
LUMA_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

CHROMA_QTABLE = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)


@functools.lru_cache()
def zigzag_order(n: int = 8) -> np.ndarray:
    """Indices that map a row-major flattened n*n block into zigzag order."""
    order = sorted(
        ((i, j) for i in range(n) for j in range(n)),
        key=lambda ij: (ij[0] + ij[1],
                        ij[1] if (ij[0] + ij[1]) % 2 == 0 else ij[0]))
    return np.array([i * n + j for i, j in order], dtype=np.int32)


@functools.lru_cache()
def inverse_zigzag_order(n: int = 8) -> np.ndarray:
    zz = zigzag_order(n)
    inv = np.empty_like(zz)
    inv[zz] = np.arange(n * n, dtype=np.int32)
    return inv


def scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled table clamped to [1, 255]."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def quantize(coefs: jax.Array, qtable: jax.Array) -> jax.Array:
    """Round-to-nearest quantization of [..., 8, 8] DCT coefficients."""
    return jnp.round(coefs / qtable.astype(jnp.float32)).astype(jnp.int32)


def dequantize(qcoefs: jax.Array, qtable: jax.Array) -> jax.Array:
    return qcoefs.astype(jnp.float32) * qtable.astype(jnp.float32)


def zigzag_flatten(blocks: jax.Array) -> jax.Array:
    """[..., 8, 8] → [..., 64] in zigzag order (static gather, fuses)."""
    n = blocks.shape[-1]
    flat = blocks.reshape(*blocks.shape[:-2], n * n)
    return flat[..., jnp.asarray(zigzag_order(n))]


def zigzag_unflatten(flat: jax.Array, n: int = 8) -> jax.Array:
    """[..., 64] zigzag → [..., 8, 8] row-major blocks."""
    inv = jnp.asarray(inverse_zigzag_order(n))
    # value at row-major position p came from zigzag position inv[p]
    return flat[..., inv].reshape(*flat.shape[:-1], n, n)


def quant_map(qtable: jax.Array, h: int, w: int) -> jax.Array:
    """(8, 8) quant table tiled to a plane-layout (h, w) divisor map."""
    return jnp.tile(qtable.astype(jnp.float32), (h // 8, w // 8))


def quantize_planar(coefs: jax.Array, qtable: jax.Array) -> jax.Array:
    """Round-to-nearest quantization of PLANE-LAYOUT [..., H, W] DCT
    coefficients (see dct.plane_dct_planar)."""
    *_, h, w = coefs.shape
    return jnp.round(coefs / quant_map(qtable, h, w)).astype(jnp.int32)


def dequantize_planar(qcoefs: jax.Array, qtable: jax.Array) -> jax.Array:
    *_, h, w = qcoefs.shape
    return qcoefs.astype(jnp.float32) * quant_map(qtable, h, w)
