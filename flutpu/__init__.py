"""flutpu — TPU-native media pipeline framework.

A ground-up rebuild of the capabilities of Fluendo's flu-plugins-oss
GStreamer suite, designed TPU-first:

- ``flutpu.core``     host dataflow (elements/pads/caps/events/queues/harness)
- ``flutpu.hype``     GOP-chunk parallel encoder: scatter / per-chip encode /
                      ordered gather (reference: hype Rust plugin)
- ``flutpu.codec``    the TPU encode path — JAX/Pallas colorspace, DCT,
                      quantization kernels + host C++ entropy coding
- ``flutpu.ttml``     TTML subtitle parse (host) and render (device kernels)
- ``flutpu.inject``   flow-synchronized hot-swap (reference: injectbin)
- ``flutpu.io``       downloader + bandwidth meter (reference: fludownloader,
                      fluc bwmeter)
- ``flutpu.fluc``     native concurrency/metrics SDK bindings
- ``flutpu.parallel`` device mesh utilities, shard_map runners
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
