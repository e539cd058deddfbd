"""Precision helpers.

On TPU the default matmul precision is bfloat16; DSP math (band energies,
DCT, correlation) needs true float32, so every DSP matmul goes through
``fdot`` which requests Precision.HIGHEST. Neural-net layers choose their
own precision explicitly (see lpcnet_tpu.nn.layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32_PRECISION = jax.lax.Precision.HIGHEST


def fdot(a, b):
    """Full-precision matmul/dot for DSP math."""
    return jnp.matmul(a, b, precision=F32_PRECISION)
