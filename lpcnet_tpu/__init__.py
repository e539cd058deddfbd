"""lpcnet_tpu: a TPU-native neural speech codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of xiph/LPCNet:
feature extraction, the 1.6 kb/s codec, neural vocoder synthesis, packet
loss concealment, DRED redundancy coding, and the training stack -- built
around batched stream processing on TPU instead of single-stream SIMD C.
"""

__version__ = "0.1.0"

from . import dsp  # noqa: F401
