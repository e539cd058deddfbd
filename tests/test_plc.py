"""PLC state machine tests (structure + continuity; model weights random)."""

import numpy as np
import pytest

from lpcnet_tpu.plc.driver import make_plc, run_plc_stream


def synth_tone(n, f=200.0, amp=3000.0):
    t = np.arange(n)
    sig = amp * np.sin(2 * np.pi * f * t / 16000.0)
    return sig.astype(np.int16)


@pytest.mark.parametrize("options", ["causal", "causal_dc"])
def test_plc_causal_runs(options):
    pcm = synth_tone(160 * 12)
    losses = np.array([0, 0, 1, 0, 0, 1, 1, 0], np.int32)
    plc = make_plc(options)
    out = run_plc_stream(plc, pcm, losses)
    assert out.shape == (160 * 12,)
    assert np.isfinite(out).all()
    assert np.max(np.abs(out)) <= 32768


@pytest.mark.parametrize("options", ["noncausal", "noncausal_dc"])
def test_plc_noncausal_runs(options):
    pcm = synth_tone(160 * 8)
    losses = np.array([0, 1, 0, 1], np.int32)
    plc = make_plc(options)
    out = run_plc_stream(plc, pcm, losses)
    assert out.shape == (160 * 8,)
    assert np.isfinite(out).all()


def test_plc_no_loss_passthrough():
    """With zero loss, causal PLC without DC filter returns input frames."""
    pcm = synth_tone(160 * 8)
    losses = np.zeros(4, np.int32)
    plc = make_plc("causal")
    out = run_plc_stream(plc, pcm, losses)
    np.testing.assert_allclose(out, pcm.astype(np.float32), atol=1.0)


def test_plc_fec_queue():
    plc = make_plc("causal")
    feats = np.zeros(20, np.float32)
    plc.fec_add(feats)
    plc.fec_add(None)         # skip marker
    plc.fec_add(feats + 1)
    assert len(plc.fec) == 2
    assert plc.fec_skip == 1
    plc.fec_clear()
    assert len(plc.fec) == 0 and plc.fec_skip == 0
