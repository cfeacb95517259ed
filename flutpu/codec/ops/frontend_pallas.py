"""Pallas TPU kernel: fused encode front end for MATERIALIZED inputs.

The product encode path fuses testsrc → convert → DCT → quantize into one
XLA program, and for a FUSED on-device source that formulation is at its
measured floor (PERF.md round 4: coefs front end ≈ 8.7 of 19.8 ms/GOP).
But two product paths read *materialized* channel planes instead:

  - host-fed frames (real video arriving over the link), and
  - subtitle burn-in, whose per-interval overlay is a program ARGUMENT —
    any op between the fused source and the convert stage materializes
    the planes (the measured ~7 ms/GOP argument-read boundary, PERF.md).

For those, XLA's formulation pays the materialized read AND the DCT's
HBM-resident intermediates (two dense block-diagonal matmuls with an f32
plane between them, plus the quantize pass). This kernel performs
(optional premultiplied-alpha blend) → RGB→YCbCr → 4:2:0 subsample →
8x8 DCT → quantize for a 32-row band entirely in VMEM: the planes are
read once (u8), the quantized coefficients written once (int16), nothing
else touches HBM.

Formulation notes (this is codec *formulation*, like planar vs 8x8 —
JPEG/FVC-v1 consumers are intra/coefficient-domain, so no P-chain drift
can arise; see fvc.py flags bit 3 for why motion's in-loop recon is
different):

  - H-direction DCT: left-multiply by a 32-wide block-diagonal C8 (4
    blocks) — full band, one (32, 32) @ (32, W) MXU dot.
  - W-direction DCT: right-multiply by a 128-wide block-diagonal C8^T in
    static 128-lane chunks — every chunk is a full (…, 128) @ (128, 128)
    MXU tile and the same constant serves all chunks (the 8-block
    structure is 128-periodic).
  - chroma: the 2x2 subsample FOLDS INTO the DCT matrices. Rows:
    RH = blockdiag16(C8) @ R, R the (16, 32) row-pair-mean map. Columns:
    SWE (256, 128) maps 256 input lanes to 128 coefficient lanes,
    SWE[j, v] = 0.5 * C[v%8, (j//2)%8] within matching 8-blocks — one
    matmul performs pair-mean and DCT at once, sidestepping the
    lane-strided subsample Mosaic cannot express.
  - all dots run precision=HIGHEST (exact-f32 class; in-kernel HIGH is
    not supported — CLAUDE.md). The kernel's own exact reference is
    front_end_reference (identical matrices/grouping in plain XLA);
    against the product XLA arm the coefficients may differ by ±1 on
    rounding razor ties (different but equally valid streams — the same
    contract as the bf16_3x-vs-HIGHEST quality gate, PERF.md round 2).

Shape gates (front_end_fits): H % 32 == 0 (u8 input tiles are (32, 128);
int16 chroma outputs need 16-row blocks), W % 128 == 0. 1080p coded
frames (1088 x 1920) and 4K (2176 x 3840) pass; pad upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .colorspace import _RGB2YCBCR
from .dct import dct_matrix
from .quant import quant_map

_BAND = 32          # luma rows per grid step
_HP = jax.lax.Precision.HIGHEST


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache()
def _bd_left(rows: int) -> np.ndarray:
    """(rows, rows) block-diagonal C8 — left-multiply = H-direction DCT."""
    c = dct_matrix(8)
    m = np.zeros((rows, rows), np.float32)
    for b in range(rows // 8):
        m[b * 8:(b + 1) * 8, b * 8:(b + 1) * 8] = c
    return m


@functools.lru_cache()
def _bd_right128() -> np.ndarray:
    """(128, 128) block-diagonal C8^T — right-multiply = W-direction DCT."""
    return _bd_left(128).T.copy()


@functools.lru_cache()
def _rh() -> np.ndarray:
    """(16, 32) fold of vertical 2x2-pair mean + chroma H-DCT."""
    r = np.zeros((16, 32), np.float32)
    for i in range(16):
        r[i, 2 * i] = r[i, 2 * i + 1] = 0.5
    return (_bd_left(16) @ r).astype(np.float32)


@functools.lru_cache()
def _swe() -> np.ndarray:
    """(256, 128) fold of horizontal pair mean + chroma W-DCT (see module
    docstring)."""
    c = dct_matrix(8)
    m = np.zeros((256, 128), np.float32)
    for j in range(256):
        s = j // 2
        for v in range(8 * (s // 8), 8 * (s // 8) + 8):
            m[j, v] = 0.5 * c[v % 8, s % 8]
    return m


def front_end_fits(pad_h: int, pad_w: int) -> bool:
    """Shape gate for the fused front-end kernel."""
    return pad_h % _BAND == 0 and pad_w % 128 == 0 and pad_w >= 256


def _u8f(x):
    # Mosaic has no direct uint8->float32 cast; route through int32
    return x.astype(jnp.int32).astype(jnp.float32)


def _kernel(r_ref, g_ref, b_ref, qy_ref, qc_ref, bd32_ref, bd128_ref,
            rh_ref, swe_ref, y_ref, cb_ref, cr_ref, *, w, cw, overlay):
    if overlay:
        # blend exactly as ttml.render.composite.overlay_on_planes —
        # including the intermediate u8 round, so burn-in through the
        # kernel is byte-identical to blend-then-encode
        ovr_ref, ovg_ref, ovb_ref, ova_ref = overlay
        a = _u8f(ova_ref[0]) / 255.0

        def blend(p_ref, ov_ref):
            o = _u8f(p_ref[0]) * (1 - a) + _u8f(ov_ref[0]) * a
            # the u8 round of overlay_on_planes, without leaving f32
            # (Mosaic's f32->u8 cast is also unsupported): clip + floor
            return jnp.floor(jnp.clip(o + 0.5, 0, 255))

        r = blend(r_ref, ovr_ref)
        g = blend(g_ref, ovg_ref)
        b = blend(b_ref, ovb_ref)
    else:
        r = _u8f(r_ref[0])
        g = _u8f(g_ref[0])
        b = _u8f(b_ref[0])

    m = _RGB2YCBCR
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    cb = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b + 128.0
    cr = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b + 128.0

    # luma: H-DCT over the whole band, W-DCT + quantize per 128-lane chunk
    t = jnp.dot(bd32_ref[...], y - 128.0, precision=_HP,
                preferred_element_type=jnp.float32)
    for c in range(w // 128):
        sl = slice(c * 128, (c + 1) * 128)
        seg = jnp.dot(t[:, sl], bd128_ref[...], precision=_HP,
                      preferred_element_type=jnp.float32)
        y_ref[0, :, sl] = jnp.round(seg / qy_ref[:, sl]).astype(jnp.int16)

    # chroma: folded subsample+DCT (see module docstring)
    wp2 = 2 * cw

    def one_chroma(plane, out_ref):
        xr = jnp.dot(rh_ref[...], plane - 128.0, precision=_HP,
                     preferred_element_type=jnp.float32)   # (16, w)
        if wp2 > w:
            xr = jnp.concatenate(
                [xr, jnp.zeros((16, wp2 - w), jnp.float32)], axis=1)
        for c in range(cw // 128):
            seg = jnp.dot(xr[:, c * 256:(c + 1) * 256], swe_ref[...],
                          precision=_HP,
                          preferred_element_type=jnp.float32)
            sl = slice(c * 128, (c + 1) * 128)
            out_ref[0, :, sl] = jnp.round(
                seg / qc_ref[:, sl]).astype(jnp.int16)

    one_chroma(cb, cb_ref)
    one_chroma(cr, cr_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def front_end_pallas(r: jax.Array, g: jax.Array, b: jax.Array,
                     qy: jax.Array, qc: jax.Array,
                     overlay_planes=None, interpret: bool = False):
    """(r, g, b) uint8 planes (F, H, W) → plane-layout quantized DCT
    coefficients: y (F, H, W) int16, cb/cr (F, H/2, W/2) int16. With
    ``overlay_planes`` = (ov_r, ov_g, ov_b, ov_a) uint8 (H, W) planes the
    per-band blend runs in-kernel first (byte-identical to
    overlay_on_planes → encode)."""
    f, h, w = r.shape
    assert front_end_fits(h, w), (h, w)
    cw = 128 * _cdiv(w // 2, 128)

    qy_map = quant_map(qy, _BAND, w)
    # chroma divisor map padded periodically to cw (pad lanes divide
    # zeros — sliced away by the caller)
    qc_map = jnp.tile(quant_map(qc, 16, 8), (1, cw // 8))

    grid = (f, h // _BAND)
    band_in = pl.BlockSpec((1, _BAND, w), lambda i, j: (i, j, 0))
    const2d = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0))
    in_specs = [band_in, band_in, band_in,
                const2d((_BAND, w)), const2d((16, cw)),
                const2d((_BAND, _BAND)), const2d((128, 128)),
                const2d((16, 32)), const2d((256, 128))]
    args = [r, g, b, qy_map, qc_map,
            jnp.asarray(_bd_left(_BAND)), jnp.asarray(_bd_right128()),
            jnp.asarray(_rh()), jnp.asarray(_swe())]
    overlay = bool(overlay_planes)
    if overlay:
        ov_band = pl.BlockSpec((1, _BAND, w), lambda i, j: (0, j, 0))
        for p in overlay_planes:
            in_specs.append(ov_band)
            args.append(p.reshape(1, h, w))

    def kern(*refs):
        ins, outs = refs[:-3], refs[-3:]
        _kernel(*ins[:9], *outs, w=w, cw=cw,
                overlay=ins[9:] if overlay else None)

    y, cb, cr = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, _BAND, w), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 16, cw), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 16, cw), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, h, w), jnp.int16),
            jax.ShapeDtypeStruct((f, h // 2, cw), jnp.int16),
            jax.ShapeDtypeStruct((f, h // 2, cw), jnp.int16),
        ],
        interpret=interpret,
    )(*args)
    return y, cb[:, :, :w // 2], cr[:, :, :w // 2]


def front_end_reference(r, g, b, qy, qc, overlay_planes=None):
    """Plain-XLA replica of the kernel's exact math (same matrices, same
    grouping) — the kernel's bit-exactness reference for tests."""
    f, h, w = r.shape
    cw = 128 * _cdiv(w // 2, 128)

    def planes():
        if overlay_planes is None:
            return (r.astype(jnp.float32), g.astype(jnp.float32),
                    b.astype(jnp.float32))
        ovr, ovg, ovb, ova = overlay_planes
        a = ova.astype(jnp.float32) / 255.0
        out = []
        for p, ov in ((r, ovr), (g, ovg), (b, ovb)):
            o = p.astype(jnp.float32) * (1 - a) + ov.astype(jnp.float32) * a
            out.append(jnp.clip(o + 0.5, 0, 255).astype(jnp.uint8)
                       .astype(jnp.float32))
        return out

    rp, gp, bp = planes()
    m = _RGB2YCBCR
    y = m[0, 0] * rp + m[0, 1] * gp + m[0, 2] * bp
    cb = m[1, 0] * rp + m[1, 1] * gp + m[1, 2] * bp + 128.0
    cr = m[2, 0] * rp + m[2, 1] * gp + m[2, 2] * bp + 128.0

    bands = y.reshape(f, h // _BAND, _BAND, w) - 128.0
    t = jnp.einsum("rk,fbkw->fbrw", jnp.asarray(_bd_left(_BAND)), bands,
                   precision=_HP, preferred_element_type=jnp.float32)
    segs = t.reshape(f, h // _BAND, _BAND, w // 128, 128)
    yc = jnp.einsum("fbrck,kv->fbrcv", segs, jnp.asarray(_bd_right128()),
                    precision=_HP, preferred_element_type=jnp.float32)
    yc = yc.reshape(f, h // _BAND, _BAND, w)
    yq = jnp.round(yc / quant_map(qy, _BAND, w)).astype(jnp.int16)
    yq = yq.reshape(f, h, w)

    qc_map = jnp.tile(quant_map(qc, 16, 8), (1, cw // 8))

    def one_chroma(plane):
        bands = plane.reshape(f, h // _BAND, _BAND, w) - 128.0
        xr = jnp.einsum("rk,fbkw->fbrw", jnp.asarray(_rh()), bands,
                        precision=_HP, preferred_element_type=jnp.float32)
        if 2 * cw > w:
            xr = jnp.pad(xr, ((0, 0), (0, 0), (0, 0), (0, 2 * cw - w)))
        segs = xr.reshape(f, h // _BAND, 16, cw // 128, 256)
        cc = jnp.einsum("fbrck,kv->fbrcv", segs, jnp.asarray(_swe()),
                        precision=_HP, preferred_element_type=jnp.float32)
        cc = cc.reshape(f, h // _BAND, 16, cw)
        q = jnp.round(cc / qc_map).astype(jnp.int16)
        return q.reshape(f, h // 2, cw)[:, :, :w // 2]

    return yq, one_chroma(cb), one_chroma(cr)
