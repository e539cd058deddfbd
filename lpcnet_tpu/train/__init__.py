"""Training stack: losses, data pipeline, sparsification, drivers."""

from . import losses  # noqa: F401
