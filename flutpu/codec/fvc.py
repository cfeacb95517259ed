"""FVC — the framework's GOP video codec (I + P frames, DCT domain).

Where MJPEG (flutpu.codec.jpeg) is intra-only, FVC adds temporal
prediction: P frames carry the difference of *quantized* DCT coefficients
against the previous reconstructed frame, accumulated losslessly on both
sides (no drift: encoder and decoder integrate the same clamped residuals).
This is what makes hype's GOP chunking semantically real — a P frame
depends on its predecessors, so chunks are only independently decodable
because the scatter forces an I frame at every chunk start
(reference hype/src/outputselector/imp.rs:39-43), and stitching is
bit-exact by construction.

TPU design: the temporal accumulation is a lax.scan over the GOP on device
(carry = reconstructed coefficient planes); residual planes then reuse the
whole JPEG entropy pipeline (MCU ordering, DC prediction, zigzag RLE,
device bit packing when on TPU). Residuals clamp to ±1023 so every value
stays within the standard Huffman tables' magnitude categories; an I frame
is simply a residual against the zero state.

Bitstream (container): per-GOP chunk header
    'FVC1' | u8 version | u8 flags(bit0=subsample) | u16 width |
    u16 height | u8 quality | u8 n_frames
then per frame: u8 frame_type (0=I 1=P) | u32 payload_len | payload
(payload = byte-stuffed entropy scan of the residual planes).
"""

from __future__ import annotations

import functools
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Buffer, BufferFlags, Caps, PropertySpec, register
from .base import VideoEncoder
from .decode import coefs_to_rgb, decode_scan_to_coefs
from .jpeg import _pad_to, encode_gop_to_coefs, encode_scan
from .ops.quant import CHROMA_QTABLE, LUMA_QTABLE, scale_qtable

MAGIC = b"FVC1"
VERSION = 1
_CLAMP = 1023  # keeps every residual within standard-table magnitude range


@jax.jit
def fvc_residuals(yq, cbq, crq):
    """Quantized coefficient planes (F, BH, BW, 64) → clamped residual
    planes (int16) via a device scan. The zero initial state makes frame 0
    the I frame; each subsequent frame codes against the reconstruction."""

    def step(carry, xs):
        outs = []
        new_carry = []
        for coef, rec in zip(xs, carry):
            resid = jnp.clip(coef.astype(jnp.int32) - rec, -_CLAMP, _CLAMP)
            new_carry.append(rec + resid)
            outs.append(resid.astype(jnp.int16))
        return tuple(new_carry), tuple(outs)

    init = tuple(jnp.zeros(a.shape[1:], jnp.int32) for a in (yq, cbq, crq))
    _, (ry, rcb, rcr) = jax.lax.scan(step, init, (yq, cbq, crq))
    return ry, rcb, rcr


@jax.jit
def fvc_accumulate(ry, rcb, rcr):
    """Decoder-side: residual planes → absolute coefficient planes
    (cumulative sum over the frame axis — the inverse scan)."""
    return (jnp.cumsum(ry.astype(jnp.int32), axis=0),
            jnp.cumsum(rcb.astype(jnp.int32), axis=0),
            jnp.cumsum(rcr.astype(jnp.int32), axis=0))


class FvcEncoder:
    """Encode GOP chunks of RGB frames into FVC bitstream chunks."""

    def __init__(self, quality: int = 85, subsample: bool = True):
        self.quality = quality
        self.subsample = subsample
        self.qy = scale_qtable(LUMA_QTABLE, quality)
        self.qc = scale_qtable(CHROMA_QTABLE, quality)
        self._qy_dev = jnp.asarray(self.qy)
        self._qc_dev = jnp.asarray(self.qc)

    def encode_chunk(self, frames: np.ndarray) -> bytes:
        """(F, H, W, 3) uint8 → one FVC chunk (frame 0 is the I frame)."""
        f, h, w, _ = frames.shape
        mult = 16 if self.subsample else 8
        ph, pw = _pad_to(h, mult), _pad_to(w, mult)
        coefs = encode_gop_to_coefs(jnp.asarray(frames), self._qy_dev,
                                    self._qc_dev, pad_h=ph, pad_w=pw,
                                    subsample=self.subsample)
        ry, rcb, rcr = fvc_residuals(*coefs)
        ry = np.asarray(ry)
        rcb = np.asarray(rcb)
        rcr = np.asarray(rcr)
        flags = 1 if self.subsample else 0
        out = [MAGIC, struct.pack(">BBHHBB", VERSION, flags, w, h,
                                  self.quality, f)]
        for i in range(f):
            payload = encode_scan(ry[i], rcb[i], rcr[i], self.subsample)
            out.append(struct.pack(">BI", 0 if i == 0 else 1, len(payload)))
            out.append(payload)
        return b"".join(out)


class FvcDecoder:
    """Decode FVC chunks back to RGB frames (host entropy decode + device
    reconstruction)."""

    def decode_chunk(self, data: bytes) -> Tuple[np.ndarray, dict]:
        if data[:4] != MAGIC:
            raise ValueError("not an FVC chunk")
        version, flags, w, h, quality, f = struct.unpack(">BBHHBB", data[4:12])
        subsample = bool(flags & 1)
        mult = 16 if subsample else 8
        ph, pw = _pad_to(h, mult), _pad_to(w, mult)
        ybw, ybh = pw // 8, ph // 8
        cbw, cbh = (pw // 16, ph // 16) if subsample else (ybw, ybh)
        off = 12
        planes = []
        types = []
        for i in range(f):
            ftype, plen = struct.unpack(">BI", data[off:off + 5])
            off += 5
            payload = data[off:off + plen]
            off += plen
            coefs = decode_scan_to_coefs(payload, ybw, ybh, cbw, cbh,
                                         subsample)
            if coefs is None:
                raise ValueError(f"corrupt FVC payload (frame {i})")
            planes.append(coefs)
            types.append(ftype)
        ry = jnp.asarray(np.stack([p[0] for p in planes]))
        rcb = jnp.asarray(np.stack([p[1] for p in planes]))
        rcr = jnp.asarray(np.stack([p[2] for p in planes]))
        yq, cbq, crq = fvc_accumulate(ry, rcb, rcr)
        qy = jnp.asarray(scale_qtable(LUMA_QTABLE, quality))
        qc = jnp.asarray(scale_qtable(CHROMA_QTABLE, quality))
        frames = [np.asarray(coefs_to_rgb(yq[i], cbq[i], crq[i], qy, qc,
                                          h=h, w=w, subsample=subsample))
                  for i in range(f)]
        return np.stack(frames), {"quality": quality, "types": types,
                                  "width": w, "height": h}

    def decode_stream(self, data: bytes) -> np.ndarray:
        """Concatenated chunks → all frames in order (the stitch reader)."""
        out = []
        off = 0
        while off < len(data):
            if len(data) - off < 12 or data[off:off + 4] != MAGIC:
                raise ValueError(f"bad or truncated chunk boundary at {off}")
            _, _, w, h, _, f = struct.unpack(">BBHHBB", data[off + 4:off + 12])
            end = off + 12
            for _ in range(f):
                if len(data) - end < 5:
                    raise ValueError(f"truncated frame header at {end}")
                _, plen = struct.unpack(">BI", data[end:end + 5])
                end += 5 + plen
            if end > len(data):
                raise ValueError("truncated chunk payload")
            frames, _ = self.decode_chunk(data[off:end])
            out.append(frames)
            off = end
        return np.concatenate(out, axis=0)


@register
class FvcEnc(VideoEncoder):
    """fvcenc — GOP codec element. Batches each hype chunk into one device
    dispatch; ForceKeyUnit (chunk start) begins a new chunk with an I
    frame."""

    FACTORY = "fvcenc"
    SINK_CAPS = "video/x-raw, format=RGB"
    SRC_CAPS = "video/x-fvc"
    PROPERTIES = [
        PropertySpec("quality", 85),
        PropertySpec("gop-size", 8, "frames per chunk when not driven by "
                                    "hype scene events"),
    ]

    def __init__(self, name=None, **props):
        super().__init__(name, **props)
        self._encoder: Optional[FvcEncoder] = None
        self._pending: List[Buffer] = []
        self._chunk_gop: Optional[int] = None

    def _enc(self) -> FvcEncoder:
        if self._encoder is None:
            self._encoder = FvcEncoder(int(self.get_property("quality")))
        return self._encoder

    def set_format(self, caps: Caps):
        fields = {k: v for k, v in caps.fields.items()
                  if k in ("width", "height", "framerate")}
        return Caps.new("video/x-fvc", **fields)

    def encode_frame(self, buf: Buffer, keyframe: bool) -> Optional[Buffer]:
        if keyframe and self._pending:
            self._flush_chunk()  # new sync point closes the open chunk
        self._pending.append(buf)
        target = self._chunk_gop or int(self.get_property("gop-size"))
        if len(self._pending) >= target:
            self._flush_chunk()
        return None

    def on_custom_event(self, event) -> None:
        from ..hype.events import SceneNewEvent
        scene = SceneNewEvent.parse(event)
        if scene is not None:
            self._chunk_gop = scene.gop_size

    def drain(self) -> None:
        self._flush_chunk()

    def finish(self):
        self._flush_chunk()
        return []

    def _flush_chunk(self) -> None:
        if not self._pending:
            return
        batch, self._pending = self._pending, []
        frames = np.stack([np.asarray(b.data) for b in batch])
        chunk = self._enc().encode_chunk(frames)
        first = batch[0]
        last = batch[-1]
        duration = None
        if first.pts is not None and last.pts is not None:
            duration = last.pts - first.pts + (last.duration or 0)
        out = Buffer(chunk, pts=first.pts, dts=first.dts, duration=duration,
                     offset=first.offset)
        out.meta["n_frames"] = len(batch)
        out.meta["frame_pts"] = [b.pts for b in batch]
        self.srcpad.push(out)
