#!/usr/bin/env python3
"""PLC quality eval: concealment with trained models vs silence baseline.

Runs the causal PLC over corpus audio with a burst loss pattern and scores
band-LSD of the concealed 20 ms packets against the true audio; 'zero'
concealment (silence) is the reference floor.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.eval_demo import band_lsd  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="artifacts/train_demo/corpus.s16")
    ap.add_argument("--model", default="lpcnet_tpu/data/demo_model.npz")
    ap.add_argument("--plc-model", default="artifacts/plc_demo/plc_model.npz")
    ap.add_argument("--out", default="artifacts/plc_demo/plc_eval_out.s16")
    args = ap.parse_args()
    from lpcnet_tpu.plc.driver import make_plc, run_plc_stream

    pcm = np.fromfile(args.corpus, np.int16)[: 16000 * 6]
    n_packets = len(pcm) // 320
    rng = np.random.RandomState(3)
    losses = np.zeros(n_packets, np.int32)
    i = 8
    while i < n_packets - 2:           # periodic 1-2 packet bursts, ~15%
        if rng.rand() < 0.12:
            losses[i] = 1
            if rng.rand() < 0.4:
                losses[i + 1] = 1
            i += 4
        i += 1

    plc = make_plc("causal", model_path=args.model,
                   plc_model_path=args.plc_model)
    out = run_plc_stream(plc, pcm, losses)

    lost_mask = np.repeat(losses.astype(bool), 320)[: len(pcm)]
    # score only concealed spans (packet-aligned)
    seg_true = pcm[lost_mask].astype(np.float32)
    seg_out = out[: len(pcm)][lost_mask]
    lsd = band_lsd(seg_true, seg_out)
    lsd_zero = band_lsd(seg_true, np.zeros_like(seg_out))
    n_lost = int(losses.sum())
    print(f"{n_lost} lost packets; concealment band-LSD {lsd:.2f} dB "
          f"(silence baseline {lsd_zero:.2f} dB)")
    out.astype(np.int16).tofile(args.out)
    assert lsd < lsd_zero, "PLC should beat silence"
    print("OK")


if __name__ == "__main__":
    main()
