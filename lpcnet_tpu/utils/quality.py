"""Intrusive speech-quality proxies for model A/Bs.

The north-star claim for the reference is listening-test MOS
(/root/reference/README.md:20-29); offline we approximate it with three
complementary intrusive metrics over aligned original/synthesized PCM:

- band-LSD: mean |dB| distance over the codec's own 18 Opus-style bands
  (the round-1/2 metric, kept for cross-round comparability);
- MCD: mel-cepstral distortion over DCT cepstra of the log band energies
  (the standard vocoder objective's formula, 10*sqrt(2)/ln(10) *
  ||c_a - c_b||_2 excluding c0, mean over frames).  NOTE: computed on the
  codec's OWN 18 Opus-style bands, not a 24-40 channel mel filterbank, so
  absolute values run higher than published MCDs -- valid for A/Bs within
  this repo, not for cross-paper comparison;
- fwSegSNR: frequency-weighted segmental SNR (Hu & Loizou 2008 form),
  per-band SNR weighted by the clean-signal band energy^0.2, clamped to
  [-10, 35] dB -- among classic intrusive measures it correlates best
  with subjective quality for vocoded/enhanced speech.

All three run off one batched band-energy analysis (20 ms windows, the
codec's apply_window/forward_transform/compute_band_energy), so a full-clip
eval is 2 batched FFT dispatches regardless of length.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

_EPS = 1e-2  # matches the historical band-LSD floor (round-1 evals)


def _band_log_energies(pcm: np.ndarray) -> np.ndarray:
    """(10*log10 band energies, raw band energies), each [T, 18], over
    non-overlapping 20 ms windows."""
    import jax.numpy as jnp

    from ..dsp import spectrum

    n = len(pcm) // 320 * 320
    w = np.asarray(pcm[:n], np.float32).reshape(-1, 320)
    e = np.asarray(spectrum.compute_band_energy(
        spectrum.forward_transform(spectrum.apply_window(jnp.asarray(w)))))
    return 10.0 * np.log10(e + _EPS), e


def quality_metrics(ref_pcm: np.ndarray, test_pcm: np.ndarray
                    ) -> Dict[str, float]:
    """All metrics between a reference clip and a synthesized clip.

    Clips must already be time-aligned (callers strip the model lookahead);
    trailing samples beyond the common 20 ms grid are ignored.
    """
    n = min(len(ref_pcm), len(test_pcm))
    la, ea = _band_log_energies(ref_pcm[:n])
    lb, eb = _band_log_energies(test_pcm[:n])

    # band-LSD (dB)
    band_lsd = float(np.mean(np.abs(la - lb)))

    # MCD (dB): DCT-II orthonormal cepstra of ln band energies, c1..c17.
    # Uses ln (not log10) inside the DCT and the 10*sqrt(2)/ln10 scale so
    # values are comparable to published MCD numbers.
    def ceps(ldb):
        ln_e = ldb * (math.log(10.0) / 10.0)      # back to ln domain
        t, b = ln_e.shape
        k = np.arange(b)
        basis = np.cos(math.pi * (np.arange(b)[:, None] + 0.5) * k[None, :]
                       / b) * math.sqrt(2.0 / b)
        basis[:, 0] /= math.sqrt(2.0)
        return ln_e @ basis
    ca, cb = ceps(la), ceps(lb)
    mcd = float(np.mean(np.sqrt(np.sum((ca[:, 1:] - cb[:, 1:]) ** 2, axis=1)))
                * 10.0 * math.sqrt(2.0) / math.log(10.0))

    # fwSegSNR (dB): weight = clean band energy^0.2 (gamma=0.2, Hu&Loizou),
    # per-band SNR from energy difference of the (windowed) band responses.
    diff = np.maximum(np.abs(ea - eb), 1e-10)
    snr = 10.0 * np.log10(np.maximum(ea, 1e-10) / diff)
    snr = np.clip(snr, -10.0, 35.0)
    w = np.power(np.maximum(ea, 1e-10), 0.2)
    # segmental: drop silent frames (bottom 5% total energy) like classic
    # segSNR implementations gate on speech activity
    frame_e = np.sum(ea, axis=1)
    act = frame_e > np.percentile(frame_e, 5.0)
    fw = np.sum(w * snr, axis=1) / np.sum(w, axis=1)
    fwsegsnr = float(np.mean(fw[act])) if act.any() else float(np.mean(fw))

    return {"band_lsd_db": band_lsd, "mcd_db": mcd,
            "fwsegsnr_db": fwsegsnr}


def format_metrics(m: Dict[str, float]) -> str:
    return (f"band-LSD {m['band_lsd_db']:.3f} dB  "
            f"MCD {m['mcd_db']:.3f} dB  fwSegSNR {m['fwsegsnr_db']:.2f} dB")
