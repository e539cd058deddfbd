"""Pitch estimation: excitation cross-correlation + Viterbi tracking.

Replicates the behavior of the reference's pitch pipeline:
* LPC-residual excitation with a 0.7 pitch comb pre-filter
  (src/lpcnet_enc.c:527-537),
* half-frame normalized cross-correlation with 3x sinc-interpolated peak
  sharpening (src/lpcnet_enc.c:539-570, src/pitch.c:44-83),
* per-subframe Viterbi tracking with octave suppression, +-4 lag
  transitions with quadratic cost, and a "restart" path 6 below the running
  best (src/lpcnet_enc.c:604-643).

Everything here is single-stream, pure, and static-shaped; the codec layer
vmaps over streams. Lags are indexed as i = PITCH_MAX_PERIOD - period.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .precision import fdot
from .constants import (
    FRAME_SIZE,
    PITCH_INTERP,
    PITCH_MAX_PERIOD,
    PITCH_MIN_PERIOD,
)

N_LAGS = PITCH_MAX_PERIOD                       # 256 correlation lags
N_STATES = PITCH_MAX_PERIOD - PITCH_MIN_PERIOD  # 224 Viterbi states


def half_frame_xcorr(exc_buf, offset: int):
    """Normalized cross-correlation of one 80-sample half-frame.

    Args:
      exc_buf: [PITCH_BUF_SIZE=416] excitation history; the current frame
        occupies the last FRAME_SIZE samples.
      offset: 0 or 80 (static), half-frame offset.

    Returns:
      (xc [256] normalized correlation, ener0 scalar frame weight)
    """
    half = FRAME_SIZE // 2
    cur = jax.lax.dynamic_slice(exc_buf, (PITCH_MAX_PERIOD + offset,), (half,))
    # xcorr[i] = <cur, exc_buf[offset+i : offset+i+half]>; build as matmul
    # over a [256, 80] window matrix: TPU-friendly (one small GEMM).
    idx = jnp.arange(N_LAGS)[:, None] + jnp.arange(half)[None, :] + offset
    windows = exc_buf[idx]
    xcorr = fdot(windows, cur)
    ener0 = jnp.dot(cur, cur)
    # lagged-window energy: ener1(i) = sum exc[off+i : off+i+80]^2
    ener1 = jnp.sum(windows * windows, axis=-1)
    ener = 1.0 + ener0 + ener1
    xc = 2.0 * xcorr / ener
    # 3x sinc interpolation, keep the max of {xc, shifted interp} (peaks only)
    taps = jnp.asarray(PITCH_INTERP)
    val1 = jnp.convolve(xc, taps[::-1], mode="same")       # sum xc[i-3+j]*h[j]
    val2 = jnp.convolve(xc, taps, mode="same")             # sum xc[i+3-j]*h[j]
    interp = jnp.maximum(xc, jnp.maximum(val1, val2))
    i = jnp.arange(N_LAGS)
    keep = (i >= 4) & (i < N_LAGS - 4)
    xc = jnp.where(keep, interp, xc)
    return xc, ener0


def octave_suppress(xc):
    """Attenuate lags whose half-lag correlation is nearly as strong.

    src/lpcnet_enc.c:607-610: for i < 192, if xc[i] < 1.1*max(xc[(256+i)/2],
    xc[(256+i+2)/2], xc[(256+i-1)/2]) then xc[i] *= .8. The reads always hit
    not-yet-modified entries, so this is a parallel update.
    """
    i = jnp.arange(N_LAGS)
    h0 = xc[jnp.clip((N_LAGS + i) // 2, 0, N_LAGS - 1)]
    h1 = xc[jnp.clip((N_LAGS + i + 2) // 2, 0, N_LAGS - 1)]
    h2 = xc[jnp.clip((N_LAGS + i - 1) // 2, 0, N_LAGS - 1)]
    xc_half = jnp.maximum(h0, jnp.maximum(h1, h2))
    active = i < (PITCH_MAX_PERIOD - 2 * PITCH_MIN_PERIOD)
    shrink = active & (xc < xc_half * 1.1)
    return jnp.where(shrink, xc * 0.8, xc)


class ViterbiCarry(NamedTuple):
    """Cross-superframe Viterbi state (part of the encoder state pytree).

    ``path`` is renormalized (max == 0) while ``path_max`` keeps the
    *unnormalized* max of the last subframe -- the reference compares the
    restart path ``path_max - 6`` against renormalized metrics
    (src/lpcnet_enc.c:614, :629-633), and we reproduce that exactly.
    """
    path: jnp.ndarray       # [N_STATES] renormalized path metric
    path_max: jnp.ndarray   # scalar: last subframe's pre-renormalization max
    best_i: jnp.ndarray     # int32: argmax state of the last subframe

    @staticmethod
    def zeros():
        return ViterbiCarry(
            path=jnp.zeros(N_STATES, jnp.float32),
            path_max=jnp.zeros((), jnp.float32),
            best_i=jnp.zeros((), jnp.int32),
        )


_JUMPS = tuple(range(-4, 5))


def viterbi_step(carry: ViterbiCarry, xc, weight):
    """One subframe of the pitch Viterbi.

    Args:
      carry: previous subframe's state.
      xc: [256] octave-suppressed correlation for this subframe.
      weight: scalar normalized frame weight.

    Returns:
      (new_carry, prev_idx [N_STATES] backpointers)
    """
    i = jnp.arange(N_STATES)
    restart_val = carry.path_max - 6.0
    # shifted path reads path[i+j] for static j: STATIC slices of a padded
    # vector, not gathers (dynamic-index gathers vectorize terribly on TPU
    # and dominated the whole encoder/PLC profile before this rewrite)
    padded = jnp.pad(carry.path, (4, 4), constant_values=-jnp.inf)
    cand_vals = [jnp.full((N_STATES,), restart_val)]
    for j in _JUMPS:
        cand_vals.append(padded[4 + j: 4 + j + N_STATES] - 0.02 * j * j)
    vals = jnp.stack(cand_vals)          # [10, N_STATES]
    choice = jnp.argmax(vals, axis=0)    # first max wins == C's strict-> scan
    max_prev = jnp.max(vals, axis=0)
    # candidate k=0 is the restart (prev = best_i); k>0 is jump j = k-5
    prev_idx = jnp.where(choice == 0, carry.best_i, i + choice - 5)
    prev_idx = prev_idx.astype(jnp.int32)
    path1 = max_prev + weight * xc[:N_STATES]
    best = jnp.argmax(path1).astype(jnp.int32)
    max_all = jnp.max(path1)
    new_carry = ViterbiCarry(path=path1 - max_all, path_max=max_all, best_i=best)
    return new_carry, prev_idx


def viterbi_track(carry: ViterbiCarry, xcs, weights):
    """Run n_sub subframes of tracking and the backward pass.

    Args:
      carry: ViterbiCarry from the previous superframe.
      xcs: [n_sub, 256] correlations (already octave-suppressed).
      weights: [n_sub] normalized frame weights.

    Returns:
      (new_carry, periods [n_sub] int32, frame_corr scalar)
    """
    def step(c, xw):
        xc, w = xw
        c2, prev = viterbi_step(c, xc, w)
        return c2, (prev, c2.best_i)

    new_carry, (prevs, _) = jax.lax.scan(step, carry, (xcs, weights))
    n_sub = xcs.shape[0]

    # backward pass with one-hot reductions instead of per-step dynamic
    # scalar gathers (gather-free for the same TPU reason as viterbi_step)
    lane = jnp.arange(N_STATES)

    def back(best_i, sub):
        oh = (lane == best_i)
        period = PITCH_MAX_PERIOD - best_i
        corr = weights[sub] * jnp.sum(jnp.where(oh, xcs[sub, :N_STATES], 0.0))
        prev_i = jnp.sum(jnp.where(oh, prevs[sub], 0)).astype(jnp.int32)
        return prev_i, (period, corr)

    best_i = new_carry.best_i
    periods = []
    corrs = []
    for sub in range(n_sub - 1, -1, -1):
        best_i, (p, c) = back(best_i, sub)
        periods.append(p)
        corrs.append(c)
    periods = jnp.stack(periods[::-1]).astype(jnp.int32)
    frame_corr = jnp.sum(jnp.stack(corrs)) / n_sub
    return new_carry, periods, frame_corr
