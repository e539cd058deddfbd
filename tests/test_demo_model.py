"""Quality gate on the shipped demo checkpoint: analysis/synthesis of a
harmonic signal must reconstruct the spectral envelope far better than
chance (random weights sit at ~50 dB band-LSD)."""

import os

import numpy as np
import pytest

DEMO = os.path.join(os.path.dirname(__file__), "..", "lpcnet_tpu", "data",
                    "demo_model.npz")


@pytest.mark.slow
def test_demo_model_synthesis_quality():
    if not os.path.exists(DEMO):
        pytest.skip("demo model not present")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from eval_demo import band_lsd, synth_from_features

    rng = np.random.RandomState(0)
    t = np.arange(16000 * 2)
    f0 = 130 + 20 * np.sin(2 * np.pi * t / 16000 / 1.3)
    phase = np.cumsum(f0 / 16000)
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0) * 500.0
    sig = np.zeros(len(t))
    y1 = y2 = 0.0
    a1 = 2 * 0.93 * np.cos(2 * np.pi * 700 / 16000)
    exc = pulses + 30 * rng.randn(len(t))
    for i in range(len(t)):
        v = exc[i] + a1 * y1 - 0.93 * 0.93 * y2
        y2, y1 = y1, v
        sig[i] = v
    pcm = np.clip(sig / np.abs(sig).max() * 8000, -32767, 32767).astype(np.int16)

    out = synth_from_features(DEMO, pcm)
    lsd = band_lsd(pcm[3200:].astype(np.float32), out[3200:])
    assert lsd < 20.0, f"demo model band LSD {lsd:.1f} dB (random ~50 dB)"


def test_demo_e2e_model_loads_and_synthesizes():
    """The shipped e2e checkpoint (the END2END zoo variant, round-5 run)
    must load with its e2e config and run the differentiable-LPC synthesis
    path (rc head -> rc2lpc inside the frame network)."""
    p = os.path.join(os.path.dirname(DEMO), "demo_e2e_model.npz")
    if not os.path.exists(p):
        pytest.skip("e2e demo model not present")
    from lpcnet_tpu import api

    fused, cfg = api.load_model(p)
    assert cfg.e2e
    synth = api.Synthesizer(fused=fused, cfg=cfg, batch=1)
    feats = np.zeros((1, 36), np.float32)
    feats[0, 18] = 0.2
    out = np.concatenate([synth.synthesize(feats)[0] for _ in range(4)])
    assert out.shape == (640,)
    assert np.isfinite(out.astype(np.float64)).all()
