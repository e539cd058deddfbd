"""Sanity properties of the intrusive quality proxies (utils/quality.py).

The reference's quality evidence is listening-test MOS
(/root/reference/README.md:20-29); these metrics are its offline stand-ins,
so the tests pin the properties that make them usable as A/B judges:
identity optimum, monotonicity in distortion, and scale behavior.
"""

import numpy as np

from lpcnet_tpu.utils.quality import format_metrics, quality_metrics


def _speechlike(n=16000 * 2, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    sig = np.zeros(n)
    for h in range(1, 8):
        sig += np.sin(2 * np.pi * np.cumsum(f0) / 16000 * h) / h
    sig += 0.05 * rng.randn(n)
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t) ** 2
    return (sig * env * 8000).astype(np.float32)


def test_identity_is_optimal():
    x = _speechlike()
    m = quality_metrics(x, x)
    assert m["band_lsd_db"] < 1e-4
    assert m["mcd_db"] < 1e-3
    assert m["fwsegsnr_db"] == 35.0  # clamp ceiling


def test_monotone_in_noise():
    x = _speechlike()
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x)).astype(np.float32)
    prev = quality_metrics(x, x)
    for snr_amp in (0.01, 0.05, 0.2, 1.0):
        m = quality_metrics(x, x + snr_amp * np.std(x) * noise)
        assert m["band_lsd_db"] >= prev["band_lsd_db"]
        assert m["mcd_db"] >= prev["mcd_db"]
        assert m["fwsegsnr_db"] <= prev["fwsegsnr_db"]
        prev = m
    # heavy noise must look clearly bad
    assert prev["band_lsd_db"] > 3.0
    assert prev["mcd_db"] > 4.0
    assert prev["fwsegsnr_db"] < 10.0


def test_spectral_tilt_registers():
    """A first-order de-emphasis (spectral tilt) changes the spectrum but
    not much the waveform scale: MCD must see it."""
    x = _speechlike()
    y = np.empty_like(x)
    y[0] = x[0]
    y[1:] = x[1:] - 0.6 * x[:-1]
    m = quality_metrics(x, y)
    assert m["mcd_db"] > 1.0
    assert m["band_lsd_db"] > 1.0


def test_format_metrics_mentions_all():
    s = format_metrics({"band_lsd_db": 1.0, "mcd_db": 2.0,
                        "fwsegsnr_db": 3.0})
    assert "band-LSD" in s and "MCD" in s and "fwSegSNR" in s
