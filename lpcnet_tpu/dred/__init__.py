"""DRED: deep redundancy coding (RDO-VAE latents piggybacked on packets)."""

from . import coder, entropy  # noqa: F401
