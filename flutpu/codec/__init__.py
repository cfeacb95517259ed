"""flutpu.codec — the TPU-native encode path.

Where the reference delegates to off-the-shelf CPU encoders (x264 etc.), this
framework owns the encoder: colorspace conversion, scaling, 8x8 DCT and
quantization run as batched JAX/Pallas kernels on the MXU; entropy coding and
bitstream packing run on the host (C++ fast path in native/bitstream).
"""

from .base import VideoEncoder
from .encoder import TpuJpegEnc
from .fvc import FvcDecoder, FvcEnc, FvcEncoder
from .decoders import FvcDec, JpegDec
from .avimux import AviDemux, AviMux
from .ladder import FvcLadderEnc, Rung, encode_ladder_chunk, parse_rungs

__all__ = ["VideoEncoder", "TpuJpegEnc", "FvcDecoder", "FvcEnc",
           "FvcEncoder", "FvcDec", "JpegDec", "AviMux", "AviDemux",
           "FvcLadderEnc", "Rung", "encode_ladder_chunk", "parse_rungs"]
