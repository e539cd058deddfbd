"""Burg LPC analysis (SILK float variant) and the Burg cepstrum features.

The reference implements silk_burg_analysis in double precision
(src/burg.c:98-245) and wraps it into 2x half-frame "Burg cepstrum"
side-features for the PLC model (src/freq.c:156-199).

Two implementations are provided:

* ``burg_analysis_np``  - float64 NumPy, bit-faithful to the C code; used on
  the host (PLC control loop, dataset generation, parity tests).
* ``burg_cepstral_analysis`` - batched float32 JAX version of the full
  feature computation for on-device pipelines.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .constants import (
    FRAME_SIZE,
    LPC_ORDER,
    PREEMPHASIS,
    WINDOW_SIZE,
)
from .spectrum import (
    compute_band_energy_inverse,
    dct,
    forward_transform,
    log_band_energy,
)

FIND_LPC_COND_FAC = 1e-5


def burg_analysis_np(x: np.ndarray, order: int = LPC_ORDER,
                     min_inv_gain: float = 1e-3) -> tuple[np.ndarray, float]:
    """Single-subframe SILK Burg analysis, float64.

    Args:
      x: [n] input signal (one subframe).
      order: prediction order D.
      min_inv_gain: minimum inverse prediction gain.

    Returns:
      (A [order] prediction coefficients, residual energy)
    """
    x = np.asarray(x, np.float64)
    n_samples = len(x)
    D = order
    C0 = float(np.dot(x, x))
    C_first = np.zeros(D)
    for n in range(1, D + 1):
        C_first[n - 1] = np.dot(x[: n_samples - n], x[n:])
    C_last = C_first.copy()
    CAf = np.zeros(D + 1)
    CAb = np.zeros(D + 1)
    Af = np.zeros(D)
    CAb[0] = CAf[0] = C0 + FIND_LPC_COND_FAC * C0 + 1e-9
    inv_gain = 1.0
    reached_max_gain = False

    for n in range(D):
        tmp1 = x[n]
        tmp2 = x[n_samples - n - 1]
        for k in range(n):
            C_first[k] -= x[n] * x[n - k - 1]
            C_last[k] -= x[n_samples - n - 1] * x[n_samples - n + k]
            tmp1 += x[n - k - 1] * Af[k]
            tmp2 += x[n_samples - n + k] * Af[k]
        for k in range(n + 1):
            CAf[k] -= tmp1 * x[n - k]
            CAb[k] -= tmp2 * x[n_samples - n + k - 1]
        tmp1 = C_first[n]
        tmp2 = C_last[n]
        for k in range(n):
            tmp1 += C_last[n - k - 1] * Af[k]
            tmp2 += C_first[n - k - 1] * Af[k]
        CAf[n + 1] = tmp1
        CAb[n + 1] = tmp2

        num = CAb[n + 1]
        nrg_b = CAb[0]
        nrg_f = CAf[0]
        for k in range(n):
            num += CAb[n - k] * Af[k]
            nrg_b += CAb[k + 1] * Af[k]
            nrg_f += CAf[k + 1] * Af[k]
        rc = -2.0 * num / (nrg_f + nrg_b)

        tmp1 = inv_gain * (1.0 - rc * rc)
        if tmp1 <= min_inv_gain:
            rc = np.sqrt(1.0 - min_inv_gain / inv_gain)
            if num > 0:
                rc = -rc
            inv_gain = min_inv_gain
            reached_max_gain = True
        else:
            inv_gain = tmp1

        newAf = Af.copy()
        for k in range((n + 1) >> 1):
            t1, t2 = Af[k], Af[n - k - 1]
            newAf[k] = t1 + rc * t2
            newAf[n - k - 1] = t2 + rc * t1
        newAf[n] = rc
        Af = newAf

        if reached_max_gain:
            Af[n + 1:] = 0.0
            break

        for k in range(n + 2):
            t1 = CAf[k]
            CAf[k] += rc * CAb[n - k + 1]
            CAb[n - k + 1] += rc * t1

    if reached_max_gain:
        A = -Af
        C0 -= np.dot(x[:D], x[:D])
        nrg_f = C0 * inv_gain
    else:
        nrg_f = CAf[0]
        tmp1 = 1.0
        for k in range(D):
            nrg_f += CAf[k + 1] * Af[k]
            tmp1 += Af[k] * Af[k]
        A = -Af
        nrg_f -= FIND_LPC_COND_FAC * C0 * tmp1
    return A.astype(np.float64), float(nrg_f)


def _burg_half_frame_jax(x, order=LPC_ORDER, min_inv_gain=1e-3):
    """JAX float32 port of the same recursion, fixed D iterations.

    The early exit on reached_max_gain is replaced by a frozen-state mask.
    Operates on a single [n] vector; callers vmap over batch.
    """
    x = jnp.asarray(x, jnp.float32)
    n_samples = x.shape[-1]
    D = order
    C0 = jnp.dot(x, x)
    C_first0 = jnp.stack(
        [jnp.dot(x[: n_samples - n], x[n:]) for n in range(1, D + 1)])
    state = dict(
        C_first=C_first0,
        C_last=C_first0,
        CAf=jnp.zeros(D + 1).at[0].set(C0 * (1 + FIND_LPC_COND_FAC) + 1e-9),
        CAb=jnp.zeros(D + 1).at[0].set(C0 * (1 + FIND_LPC_COND_FAC) + 1e-9),
        Af=jnp.zeros(D),
        inv_gain=jnp.float32(1.0),
        done=jnp.array(False),
    )
    idx = jnp.arange(D)

    def gather(v, indices):
        return v[jnp.clip(indices, 0, v.shape[0] - 1)]

    def body(n, st):
        C_first, C_last, CAf, CAb, Af = st["C_first"], st["C_last"], st["CAf"], st["CAb"], st["Af"]
        inv_gain, done = st["inv_gain"], st["done"]
        kmask = (idx < n).astype(jnp.float32)
        x_fwd = gather(x, n - idx - 1)          # x[n-k-1]
        x_bwd = gather(x, n_samples - n + idx)  # x[ns-n+k]
        tmp1 = gather(x, jnp.array(n)) + jnp.sum(x_fwd * Af * kmask)
        tmp2 = gather(x, n_samples - n - 1) + jnp.sum(x_bwd * Af * kmask)
        C_first = C_first - jnp.where(idx < n, gather(x, jnp.array(n)) * x_fwd, 0.0)
        C_last = C_last - jnp.where(idx < n, gather(x, n_samples - n - 1) * x_bwd, 0.0)
        k1 = jnp.arange(D + 1)
        CAf = CAf - jnp.where(k1 <= n, tmp1 * gather(x, n - k1), 0.0)
        CAb = CAb - jnp.where(k1 <= n, tmp2 * gather(x, n_samples - n + k1 - 1), 0.0)
        t1 = gather(C_first, jnp.array(n)) + jnp.sum(gather(C_last, n - idx - 1) * Af * kmask)
        t2 = gather(C_last, jnp.array(n)) + jnp.sum(gather(C_first, n - idx - 1) * Af * kmask)
        CAf = CAf.at[n + 1].set(t1)
        CAb = CAb.at[n + 1].set(t2)

        num = t2 + jnp.sum(gather(CAb, n - idx) * Af * kmask)
        nrg_b = CAb[0] + jnp.sum(gather(CAb, idx + 1) * Af * kmask)
        nrg_f = CAf[0] + jnp.sum(gather(CAf, idx + 1) * Af * kmask)
        rc = -2.0 * num / (nrg_f + nrg_b)

        gain_next = inv_gain * (1.0 - rc * rc)
        hit = gain_next <= min_inv_gain
        rc_clamped = jnp.sqrt(jnp.maximum(0.0, 1.0 - min_inv_gain / inv_gain))
        rc = jnp.where(hit, jnp.where(num > 0, -rc_clamped, rc_clamped), rc)
        inv_gain_new = jnp.where(hit, jnp.float32(min_inv_gain), gain_next)

        Af_rev = gather(Af, n - idx - 1)
        Af_new = jnp.where(idx < n, Af + rc * Af_rev, Af)
        Af_new = jnp.where(idx == n, rc, Af_new)

        CAb_rev = gather(CAb, n - k1 + 1)
        CAf_upd = jnp.where(k1 <= n + 1, CAf + rc * CAb_rev, CAf)
        CAf_rev = gather(CAf, n - k1 + 1)
        CAb_upd = jnp.where(k1 <= n + 1, CAb + rc * CAf_rev, CAb)

        new = dict(
            C_first=jnp.where(done, st["C_first"], C_first),
            C_last=jnp.where(done, st["C_last"], C_last),
            CAf=jnp.where(done | hit, jnp.where(done, st["CAf"], CAf), CAf_upd),
            CAb=jnp.where(done | hit, jnp.where(done, st["CAb"], CAb), CAb_upd),
            Af=jnp.where(done, st["Af"], Af_new),
            inv_gain=jnp.where(done, inv_gain, inv_gain_new),
            done=done | hit,
        )
        return new

    st = jax.lax.fori_loop(0, D, body, state)
    Af, CAf, done, inv_gain = st["Af"], st["CAf"], st["done"], st["inv_gain"]
    A = -Af
    nrg_plain = CAf[0] + jnp.sum(CAf[1:] * Af) - FIND_LPC_COND_FAC * C0 * (1.0 + jnp.sum(Af * Af))
    nrg_gain = (C0 - jnp.dot(x[:D], x[:D])) * inv_gain
    nrg = jnp.where(done, nrg_gain, nrg_plain)
    return A, nrg


def _burg_cepstrum_half(pcm):
    """[..., 80] raw pcm -> [..., 18] Burg cepstrum (src/freq.c:156-186)."""
    n = pcm.shape[-1]
    burg_in = pcm[..., 1:] - PREEMPHASIS * pcm[..., :-1]
    flat = burg_in.reshape((-1, n - 1))
    A, g = jax.vmap(_burg_half_frame_jax)(flat)
    A = A.reshape(pcm.shape[:-1] + (LPC_ORDER,))
    g = g.reshape(pcm.shape[:-1]) / (n - 2 * (LPC_ORDER - 1))
    decay = jnp.power(jnp.float32(0.995), jnp.arange(1, LPC_ORDER + 1, dtype=jnp.float32))
    x = jnp.zeros(pcm.shape[:-1] + (WINDOW_SIZE,), jnp.float32)
    x = x.at[..., 0].set(1.0)
    x = x.at[..., 1 : LPC_ORDER + 1].set(-A * decay)
    spec = forward_transform(x)
    e_burg = compute_band_energy_inverse(spec)
    e_burg = e_burg * (0.45 * g[..., None] / float(WINDOW_SIZE) ** 3)
    ly = log_band_energy(e_burg)
    ceps = dct(ly)
    return ceps.at[..., 0].add(-4.0)


def burg_cepstral_analysis(pcm):
    """[..., 160] frame -> [..., 36] sum/diff Burg cepstra (src/freq.c:188-199)."""
    c0 = _burg_cepstrum_half(pcm[..., : FRAME_SIZE // 2])
    c1 = _burg_cepstrum_half(pcm[..., FRAME_SIZE // 2 :])
    return jnp.concatenate([0.5 * (c0 + c1), c0 - c1], axis=-1)
