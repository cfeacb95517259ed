"""FVC v2 motion-compensated encode vs v1: size and quality on moving
content.

Usage: python examples/fvc_motion.py [n_frames]  (FLUTPU_CPU=1 for CPU)
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
if os.environ.get("FLUTPU_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from flutpu.codec import FvcDecoder
from flutpu.codec.fvc import FvcEncoder
from flutpu.codec.jpeg import psnr
from flutpu.core.elements import make_test_frame


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    frames = np.stack([make_test_frame("ball", 160, 96, i)
                       for i in range(n)])

    v1 = FvcEncoder(quality=85).encode_chunk(frames)
    v2 = FvcEncoder(quality=85, motion=True,
                    search_range=7).encode_chunk(frames)
    v2b = FvcEncoder(quality=85, motion=True, search_range=7,
                     bframes=2).encode_chunk(frames)
    print(f"v1 (DCT residuals):        {len(v1):7d} bytes")
    print(f"v2 (motion-compensated):   {len(v2):7d} bytes "
          f"({100 * len(v2) / len(v1):.1f}% of v1)")
    print(f"v2 + B frames (bframes=2): {len(v2b):7d} bytes "
          f"({100 * len(v2b) / len(v1):.1f}% of v1)")

    dec = FvcDecoder()
    for name, blob in (("v1", v1), ("v2", v2), ("v2b", v2b)):
        out, info = dec.decode_chunk(blob)
        ps = [psnr(frames[i], out[i]) for i in range(n)]
        print(f"{name}: frame types {info['types'][:6]}..., "
              f"psnr min/mean {min(ps):.1f}/{np.mean(ps):.1f} dB")


if __name__ == "__main__":
    main()
