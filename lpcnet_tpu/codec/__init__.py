"""Codec layer: feature extraction, quantization, packets, encode/decode."""

from . import features  # noqa: F401
