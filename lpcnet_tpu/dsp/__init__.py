"""TPU-native DSP primitives (windows, FFT bands, LPC, Burg, pitch, u-law)."""

from . import burg, constants, lpc, mulaw, pitch, spectrum  # noqa: F401
from .constants import (  # noqa: F401
    FRAME_SIZE,
    LPC_ORDER,
    NB_BANDS,
    NB_FEATURES,
    NB_TOTAL_FEATURES,
    PREEMPHASIS,
    WINDOW_SIZE,
)
