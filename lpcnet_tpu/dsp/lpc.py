"""LPC math: Levinson-Durbin, cepstrum->LPC, reflection coefficients.

Mirrors the behavior of the reference's lpcn_lpc / lpc_from_bands /
lpc_from_cepstrum (src/freq.c:86-320) and rc2lpc (src/lpcnet.c:57-79), as
pure batched JAX functions with static control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import FREQ_SIZE, LPC_ORDER, WINDOW_SIZE
from .spectrum import band_energy_from_cepstrum, interp_band_gain, inverse_transform


def levinson(ac):
    """Levinson-Durbin with the reference's 30 dB early-exit guard.

    Args:
      ac: [..., LPC_ORDER+1] autocorrelation.
    Returns:
      (lpc [..., LPC_ORDER], rc [..., LPC_ORDER], error [...])

    The reference (src/freq.c:86-127) breaks out of the recursion once the
    prediction error drops below .001*ac[0]; under jit we keep iterating but
    freeze the state with a `done` mask, which yields identical results.
    """
    ac = jnp.asarray(ac, jnp.float32)
    batch = ac.shape[:-1]
    lpc = jnp.zeros(batch + (LPC_ORDER,), jnp.float32)
    rc = jnp.zeros(batch + (LPC_ORDER,), jnp.float32)
    error = ac[..., 0]
    ac0 = ac[..., 0]
    # Degenerate zero-energy frames: C leaves lpc = 0 (ac[0] == 0 branch).
    done0 = ac0 == 0.0

    # Unrolled recursion: with static i every index is a static slice/flip
    # (no per-iteration gathers; ~16 tiny fused VPU ops per order).
    done = done0
    for i in range(LPC_ORDER):
        # rr = sum_{j<i} lpc[j] * ac[i-j] + ac[i+1]
        if i > 0:
            rr = jnp.sum(lpc[..., :i] * jnp.flip(ac[..., 1:i + 1], axis=-1),
                         axis=-1) + ac[..., i + 1]
        else:
            rr = ac[..., 1]
        r = -rr / jnp.where(error == 0, 1.0, error)
        # reference's half-loop swap (src/freq.c:111-118) == uniform rule
        # lpc[k] += r * lpc[i-1-k] for k < i (pre-update values), lpc[i] = r
        if i > 0:
            head = lpc[..., :i] + r[..., None] * jnp.flip(lpc[..., :i], axis=-1)
            new_lpc = jnp.concatenate(
                [head, r[..., None], lpc[..., i + 1:]], axis=-1)
        else:
            new_lpc = jnp.concatenate([r[..., None], lpc[..., 1:]], axis=-1)
        new_rc = rc.at[..., i].set(r)
        new_error = error * (1.0 - r * r)
        step_done = done | (new_error < 0.001 * ac0)
        lpc = jnp.where(done[..., None], lpc, new_lpc)
        rc = jnp.where(done[..., None], rc, new_rc)
        error = jnp.where(done, error, new_error)
        done = step_done
    return lpc, rc, error


def lpc_from_bands(band_e):
    """Band energies -> LPC via spectral autocorrelation (src/freq.c:275-297)."""
    xr = interp_band_gain(band_e)
    xr = xr.at[..., FREQ_SIZE - 1].set(0.0)
    x_auto = inverse_transform(xr.astype(jnp.complex64))
    ac = x_auto[..., : LPC_ORDER + 1]
    # -40 dB noise floor + lag windowing
    ac0 = ac[..., 0] * (1.0 + 1e-4) + WINDOW_SIZE / 12.0 / 38.0
    lags = jnp.arange(1, LPC_ORDER + 1, dtype=jnp.float32)
    ac_rest = ac[..., 1:] * (1.0 - 6e-5 * lags * lags)
    ac = jnp.concatenate([ac0[..., None], ac_rest], axis=-1)
    lpc, _, err = levinson(ac)
    return lpc, err


def lpc_from_cepstrum(ceps):
    """18-dim cepstrum -> 16 LPC coefficients (src/freq.c:310-320)."""
    lpc, _ = lpc_from_bands(band_energy_from_cepstrum(ceps))
    return lpc


def lpc_weighting(lpc, gamma):
    """Bandwidth expansion: lpc[i] *= gamma^(i+1) (src/freq.c:299-308)."""
    g = jnp.power(jnp.float32(gamma), jnp.arange(1, LPC_ORDER + 1, dtype=jnp.float32))
    return lpc * g


def rc2lpc(rc):
    """Reflection coefficients -> LPC (end-to-end models; src/lpcnet.c:57-79).

    step-up recursion: a_i(j) = a_{i-1}(j) + k_i * a_{i-1}(i-j-1).
    """
    rc = jnp.asarray(rc, jnp.float32)
    batch = rc.shape[:-1]
    tmp = rc
    idx = jnp.arange(LPC_ORDER)

    def body(i, tmp):
        rev = jnp.clip(i - idx - 1, 0, LPC_ORDER - 1)
        tmp_rev = jnp.take_along_axis(tmp, jnp.broadcast_to(rev, batch + (LPC_ORDER,)), axis=-1)
        upd = tmp + tmp[..., i][..., None] * tmp_rev
        return jnp.where(idx <= i - 1, upd, tmp)

    return jax.lax.fori_loop(0, LPC_ORDER, body, tmp)
