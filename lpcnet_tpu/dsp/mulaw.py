"""u-law companding, exact and bit-parity variants.

The reference uses 255-level u-law with bias 128 (src/common.h:37-58) and a
polynomial log2 approximation inside lin2ulaw. We provide:

* ``lin2ulaw`` / ``ulaw2lin``   - exact-log float implementations (default
  for training; differentiable variants live in train/losses.py).
* ``lin2ulaw_approx``           - replicates the reference's log2_approx bit
  trick so C fixtures can be matched sample-for-sample.

All functions are elementwise and shape-polymorphic (work under vmap/jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG256 = 5.5451774445
_SCALE = 255.0 / 32768.0
_SCALE_1 = 32768.0 / 255.0


def ulaw2lin(u):
    """Map u-law code (float or int in [0, 255]) to linear [-32768, 32768]."""
    u = jnp.asarray(u, jnp.float32) - 128.0
    s = jnp.sign(u) + (u == 0)
    u = jnp.abs(u)
    return s * _SCALE_1 * (jnp.exp(u / 128.0 * LOG256) - 1.0)


def _log2_approx(x):
    """Bit-twiddled log2 matching the reference's log2_approx (src/common.h:18-33)."""
    xf = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.int32)
    integer = (bits >> 23) - 127
    bits = bits - (integer << 23)
    frac = jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.5
    poly = -0.41445418 + frac * (0.95909232 + frac * (-0.33951290 + frac * 0.16541097))
    return 1.0 + integer.astype(jnp.float32) + poly


def _lin2ulaw_impl(x, log2_fn):
    x = jnp.asarray(x, jnp.float32)
    s = jnp.where(x >= 0, 1.0, -1.0)
    mag = jnp.abs(x)
    logv = 0.69315 * log2_fn(1.0 + _SCALE * mag)
    u = 128.0 + s * (128.0 * logv / LOG256)
    u = jnp.clip(u, 0.0, 255.0)
    return jnp.floor(0.5 + u).astype(jnp.int32)


def lin2ulaw(x):
    """Linear float -> u-law code in [0, 255] (exact log)."""
    return _lin2ulaw_impl(x, jnp.log2)


def lin2ulaw_approx(x):
    """Bit-parity variant of the reference's lin2ulaw (src/common.h:47-58)."""
    return _lin2ulaw_impl(x, _log2_approx)
