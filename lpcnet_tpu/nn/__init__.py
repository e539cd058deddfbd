"""Functional NN layers, initializers, and sparsity/quantization utilities."""

from . import init, layers  # noqa: F401
