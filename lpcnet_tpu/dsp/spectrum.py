"""Spectral analysis primitives: windowed FFT, band energies, cepstrum.

TPU-first design notes:
* the reference runs a vendored 320-point KISS FFT per frame per stream
  (src/kiss_fft.c, src/freq.c:242-273); here a single batched jnp.fft.rfft
  call covers [B, T] frames at once and XLA lowers it to its native FFT.
* band energy / interpolation are expressed as small dense matmuls
  ([..., 161] @ [161, 18]) instead of scalar triangle loops
  (src/freq.c:131-154, :202-215) -- MXU-friendly and fusable.

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .precision import fdot

from .constants import (
    BAND_ENERGY_MATRIX,
    BAND_INTERP,
    COMPENSATION,
    DCT_MATRIX,
    FULL_WINDOW,
    NB_BANDS,
    WINDOW_SIZE,
)


def forward_transform(x):
    """rfft of a 320-sample window, scaled by 1/WINDOW_SIZE.

    Equivalent to the reference forward_transform (src/freq.c:242-254): the
    KISS FFT forward pass includes a 1/nfft scale factor.
    """
    x = jnp.asarray(x, jnp.float32)
    return jnp.fft.rfft(x, n=WINDOW_SIZE, axis=-1) / WINDOW_SIZE


def inverse_transform(spec):
    """Real 'IDFT without 1/N' of a half spectrum: out = N * irfft(spec).

    Matches src/freq.c:256-273 (forward FFT of the conjugate-symmetric
    extension, times WINDOW_SIZE; for the real-even spectra used here the
    output-order reversal is the identity).
    """
    return jnp.fft.irfft(spec, n=WINDOW_SIZE, axis=-1) * WINDOW_SIZE


def apply_window(x):
    """Vorbis power-complementary window over the full 320 samples."""
    return jnp.asarray(x, jnp.float32) * jnp.asarray(FULL_WINDOW)


def compute_band_energy(spec):
    """[..., 161] complex spectrum -> [..., 18] triangular band energies."""
    p = spec.real * spec.real + spec.imag * spec.imag
    return fdot(p, jnp.asarray(BAND_ENERGY_MATRIX))


def compute_band_energy_inverse(spec):
    """Band-weighted sum of 1/|X|^2 (used by Burg cepstrum; src/freq.c:60-84)."""
    p = spec.real * spec.real + spec.imag * spec.imag
    inv = 1.0 / (p + 1e-9)
    return fdot(inv, jnp.asarray(BAND_ENERGY_MATRIX))


def interp_band_gain(band_e):
    """[..., 18] band gains -> [..., 161] per-bin gains (triangular interp)."""
    return fdot(band_e, jnp.asarray(BAND_INTERP).T)


def dct(x):
    """Orthonormal DCT-II over the last axis (18 bands)."""
    return fdot(x, jnp.asarray(DCT_MATRIX))


def idct(x):
    """Orthonormal DCT-III (inverse of dct) over the last axis."""
    return fdot(x, jnp.asarray(DCT_MATRIX).T)


def log_band_energy(band_e):
    """log10 band energies with the reference's floor/follow smoothing.

    Replicates the sequential clamp in src/lpcnet_enc.c:513-520 (and the
    identical loop in src/freq.c:178-183): each band's log energy is floored
    by (running max - 8) and by (previous 'follow' - 2.5).

    The 18-step dependency is a lax.scan over bands; everything is
    vectorized over leading batch dims.
    """
    ly_raw = jnp.log10(1e-2 + band_e)

    def step(carry, ly):
        log_max, follow = carry
        ly = jnp.maximum(log_max - 8.0, jnp.maximum(follow - 2.5, ly))
        log_max = jnp.maximum(log_max, ly)
        follow = jnp.maximum(follow - 2.5, ly)
        return (log_max, follow), ly

    batch_shape = ly_raw.shape[:-1]
    init = (jnp.full(batch_shape, -2.0, jnp.float32),
            jnp.full(batch_shape, -2.0, jnp.float32))
    _, ly = jax.lax.scan(step, init, jnp.moveaxis(ly_raw, -1, 0))
    return jnp.moveaxis(ly, 0, -1)


def cepstrum_from_band_energy(band_e):
    """Band energies -> 18-dim cepstrum with the -4 DC offset.

    Matches src/lpcnet_enc.c:513-522: smoothing + DCT + c0 -= 4.
    """
    ceps = dct(log_band_energy(band_e))
    return ceps.at[..., 0].add(-4.0)


def band_energy_from_cepstrum(ceps):
    """Inverse of the cepstrum mapping: 10^idct(ceps + 4dc) * compensation.

    Matches lpc_from_cepstrum's front half (src/freq.c:310-318).
    """
    tmp = jnp.asarray(ceps, jnp.float32)[..., :NB_BANDS].at[..., 0].add(4.0)
    ex = idct(tmp)
    return jnp.power(10.0, ex) * jnp.asarray(COMPENSATION)


def frame_analysis(frame, overlap_mem):
    """One 10 ms analysis step.

    Args:
      frame: [..., 160] current (pre-emphasized) frame.
      overlap_mem: [..., 160] previous frame's samples.

    Returns:
      (spec [..., 161] complex, band_e [..., 18], new_overlap_mem)
    Matches src/lpcnet_enc.c:488-496.
    """
    x = jnp.concatenate([overlap_mem, frame], axis=-1)
    spec = forward_transform(apply_window(x))
    band_e = compute_band_energy(spec)
    return spec, band_e, frame
