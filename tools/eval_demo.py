#!/usr/bin/env python3
"""Evaluate a trained vocoder checkpoint: analysis/synthesis spectral match.

Computes band-energy log-spectral distance between original audio and
features->synthesis reconstruction (the codec's analysis/synthesis loop),
compared against a random-weight model as the floor. A crude MOS proxy --
real evaluation needs listening tests, but this shows learning transfers to
the synthesis loop.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_lsd(a: np.ndarray, b: np.ndarray) -> float:
    """Mean log-spectral distance over 18 bands of 20ms windows (dB)."""
    from lpcnet_tpu.utils.quality import quality_metrics
    return quality_metrics(a, b)["band_lsd_db"]


def synth_from_features(model_path, pcm, batch_frames=None):
    from lpcnet_tpu import api

    enc = api.lpcnet_encoder_create()
    synth = api.Synthesizer(model_path, batch=1)
    n = len(pcm) // 160
    out = []
    for t in range(n):
        feats = api.lpcnet_compute_single_frame_features(
            enc, pcm[t * 160:(t + 1) * 160])
        out.append(synth.synthesize(feats[None])[0])
    return np.concatenate(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="artifacts/train_demo/model.npz")
    ap.add_argument("--audio", default="artifacts/train_demo/corpus.s16")
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()

    pcm = np.fromfile(args.audio, np.int16)[: int(args.seconds * 16000)]
    print("synthesizing with trained model...", flush=True)
    out_trained = synth_from_features(args.model, pcm)
    print("synthesizing with random model...", flush=True)
    out_random = synth_from_features(None, pcm)

    skip = 3200  # warmup
    from lpcnet_tpu.utils.quality import format_metrics, quality_metrics
    m_t = quality_metrics(pcm[skip:], out_trained[skip:])
    m_r = quality_metrics(pcm[skip:], out_random[skip:])
    lsd_t, lsd_r = m_t["band_lsd_db"], m_r["band_lsd_db"]
    print(f"trained: {format_metrics(m_t)}")
    print(f"random:  {format_metrics(m_r)}")
    # beside the AUDIO, not the model: a model under lpcnet_tpu/data/
    # must not grow eval byproducts in package data
    out_trained.astype(np.int16).tofile(args.audio + ".resynth.s16")
    assert lsd_t < lsd_r, "trained model should beat random weights"
    print("OK: training improves analysis/synthesis spectral match")


if __name__ == "__main__":
    main()
