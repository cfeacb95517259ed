"""tpuhype — the device-mesh GOP-parallel encoder.

Where the ``hype`` bin reproduces the reference's thread-per-branch scatter/
gather (one GStreamer streaming thread per encoder), ``tpuhype`` is the
TPU-first expression of the same contract: C GOP chunks are batched into one
(C, F, H, W, 3) array, encoded by a single SPMD dispatch one-chunk-per-chip
over the ``chunk`` mesh axis (flutpu.parallel.gop), and entropy-coded on the
host in strict chunk order by a thread pool (the ordered-gather role of the
reference's scenecollector, reference hype/src/scenecollector/imp.rs:71-99).

Latency note: batching C chunks trades latency for throughput exactly like
the reference's round-robin over C branches — output stalls at most
C*gop_size frames behind input, the same bound as the reference's
SCENE_BUFFER_SIZE queueing.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..codec.base import VideoEncoder
from ..codec.jpeg import (JpegEncoder, encode_scan, jpeg_headers)
from ..core import (Buffer, Caps, PropertySpec, register)
from ..parallel.gop import encode_chunks_sharded
from ..parallel.mesh import make_chunk_mesh


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@register
class TpuHype(VideoEncoder):
    FACTORY = "tpuhype"
    SINK_CAPS = "video/x-raw, format=RGB"
    SRC_CAPS = "image/jpeg"
    PROPERTIES = [
        PropertySpec("gop-size", 8),
        PropertySpec("quality", 85),
        PropertySpec("chunks", 0, "parallel chunks (0 = all local devices)"),
    ]

    def __init__(self, name: Optional[str] = None, **props):
        super().__init__(name, **props)
        self._frames: List[Buffer] = []
        self._jenc: Optional[JpegEncoder] = None
        self._mesh = None
        self._pool = ThreadPoolExecutor(max_workers=8)

    def _setup(self):
        if self._jenc is None:
            self._jenc = JpegEncoder(quality=int(self.get_property("quality")))
        if self._mesh is None:
            n = int(self.get_property("chunks")) or len(jax.devices())
            self._mesh = make_chunk_mesh(n)
        return self._jenc, self._mesh

    def set_format(self, caps: Caps):
        fields = {k: v for k, v in caps.fields.items()
                  if k in ("width", "height", "framerate")}
        return Caps.new("image/jpeg", parsed=True, **fields)

    @property
    def _batch_target(self) -> int:
        n = int(self.get_property("chunks")) or len(jax.devices())
        return n * int(self.get_property("gop-size"))

    def encode_frame(self, buf: Buffer, keyframe: bool) -> Optional[Buffer]:
        self._frames.append(buf)
        if len(self._frames) >= self._batch_target:
            self._flush()
        return None

    def drain(self) -> None:
        self._flush()

    def finish(self):
        self._flush()
        return []

    def _flush(self) -> None:
        if not self._frames:
            return
        batch, self._frames = self._frames, []
        jenc, mesh = self._setup()
        gop = int(self.get_property("gop-size"))
        n_chunks = mesh.devices.size
        frames = np.stack([np.asarray(b.data) for b in batch])
        n, h, w, _ = frames.shape
        total = n_chunks * gop
        if n < total:  # pad the tail batch (outputs dropped below)
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], total - n, axis=0)], axis=0)
        ph, pw = _pad_to(h, 16), _pad_to(w, 16)
        if (ph, pw) != (h, w):
            frames = np.pad(frames, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)),
                            mode="edge")
        chunks = frames.reshape(n_chunks, gop, ph, pw, 3)
        yq, cbq, crq = encode_chunks_sharded(
            jnp.asarray(chunks), jnp.asarray(jenc.qy), jnp.asarray(jenc.qc),
            mesh=mesh)
        yq = np.asarray(yq)
        cbq = np.asarray(cbq)
        crq = np.asarray(crq)
        hdr = jpeg_headers(h, w, jenc.qy, jenc.qc, True)

        def scan(idx):
            c, f = divmod(idx, gop)
            return hdr + encode_scan(yq[c, f], cbq[c, f], crq[c, f], True) + b"\xff\xd9"

        # pool preserves submission order → strict in-order gather
        payloads = list(self._pool.map(scan, range(n)))
        for src, data in zip(batch, payloads):
            self.srcpad.push(Buffer(data, pts=src.pts, dts=src.dts,
                                    duration=src.duration, offset=src.offset))
