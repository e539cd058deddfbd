"""lpcnet_tpu: a TPU-native neural speech codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of xiph/LPCNet:
feature extraction, the 1.6 kb/s codec, neural vocoder synthesis, packet
loss concealment, DRED redundancy coding, and the training stack -- built
around batched stream processing on TPU instead of single-stream SIMD C.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LPCNET_TPU_CPU"):
    # Explicit CPU request (tests, debugging). If jax is not imported yet we
    # can still steer platform selection; otherwise pin the default device
    # (the TPU plugin environment forces JAX_PLATFORMS on startup).
    import sys as _sys
    if "jax" not in _sys.modules:
        _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax as _jax
    _jax.config.update("jax_default_device", _jax.devices("cpu")[0])

from . import dsp  # noqa: F401
