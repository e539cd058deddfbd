"""Model zoo: LPCNet vocoder, PLC feature predictor, DRED RDO-VAE."""

from . import lpcnet  # noqa: F401
