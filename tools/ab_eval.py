#!/usr/bin/env python3
"""Multi-checkpoint vocoder A/B on the standard held-out validator.

Builds ONE HeldOutValidator (4 unseen-seed clips, the same protocol that
produced the round-4 6.515/7.321 dB numbers) and scores every checkpoint
through it -- one compile, many evaluations, so a whole-round A/B costs
minutes instead of an hour of per-model tunnel compiles.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", required=True)
    ap.add_argument("--val-seeds", default="1234,4321,9999,7777")
    ap.add_argument("--val-seconds", type=float, default=8.0)
    ap.add_argument("--corpus-version", type=int, default=2)
    ap.add_argument("--per-clip", action="store_true")
    args = ap.parse_args()

    from lpcnet_tpu.models.lpcnet import LPCNetConfig
    from lpcnet_tpu.train.corpus import synth_corpus
    from lpcnet_tpu.train.validation import HeldOutValidator
    from lpcnet_tpu.weights.checkpoint import load_checkpoint

    seeds = [int(s) for s in args.val_seeds.split(",")]
    clips = [synth_corpus(args.val_seconds, seed=s,
                          version=args.corpus_version) for s in seeds]
    cfg = None
    validator = None
    for path in args.models:
        params, mcfg = load_checkpoint(path)
        mcfg = mcfg or LPCNetConfig()
        if validator is None or mcfg != cfg:
            cfg = mcfg
            validator = HeldOutValidator(cfg, clips)
        m = validator.evaluate(params)
        print(f"{path}: band-LSD {m['band_lsd_db']:.3f} dB  "
              f"fwSegSNR {m['fwsegsnr_db']:.2f} dB  "
              f"MCD {m['mcd_db']:.2f}", flush=True)
        if args.per_clip:
            for s, pm in zip(seeds, validator.evaluate_per_clip(params)):
                print(f"  clip{s}: band-LSD {pm['band_lsd_db']:.3f} "
                      f"fwSegSNR {pm['fwsegsnr_db']:.2f}", flush=True)


if __name__ == "__main__":
    main()
