#!/usr/bin/env python3
"""Post-hoc checkpoint averaging + held-out selection.

Round-4 observation (artifacts/train_r4b): the best held-out band-LSD of
the whole run was the EMA at step 2000 -- i.e. a heavily AVERAGED set of
params beat every individual checkpoint, while the raw curve plateaued
~0.6 dB higher.  Uniform tail averaging (Polyak) over periodic snapshots
is the stronger post-hoc version of that: average the last K
`model_<step>.npz` snapshots for K = 1..N, score each candidate on the
same HeldOutValidator the trainer used, and ship the winner.

Usage:
  python tools/avg_checkpoints.py --rundir artifacts/train_r4b \
      [--val-seeds 1234,4321,9999,7777] [--val-seconds 8] [--out model_avg.npz]

Prints one line per candidate and writes the best to <rundir>/<out>.
"""

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rundir", required=True)
    ap.add_argument("--val-seeds", default="1234,4321,9999,7777")
    ap.add_argument("--val-seconds", type=float, default=8.0)
    ap.add_argument("--grua-size", type=int, default=384)
    ap.add_argument("--out", default="model_avg.npz")
    ap.add_argument("--include-best", action="store_true",
                    help="also score model_best.npz standalone for reference")
    args = ap.parse_args()

    from lpcnet_tpu.models.lpcnet import LPCNetConfig
    from lpcnet_tpu.train.corpus import synth_corpus
    from lpcnet_tpu.train.validation import HeldOutValidator
    from lpcnet_tpu.weights.checkpoint import load_checkpoint, save_checkpoint

    snaps = []
    for p in glob.glob(os.path.join(args.rundir, "model_*.npz")):
        m = re.match(r"model_(\d+)\.npz$", os.path.basename(p))
        if m:
            snaps.append((int(m.group(1)), p))
    snaps.sort()
    if not snaps:
        sys.exit(f"no model_<step>.npz snapshots in {args.rundir}")
    print(f"{len(snaps)} snapshots: steps {[s for s, _ in snaps]}", flush=True)

    cfg = LPCNetConfig(rnn_units1=args.grua_size)
    clips = [synth_corpus(args.val_seconds, seed=int(s))
             for s in args.val_seeds.split(",")]
    validator = HeldOutValidator(cfg, clips)

    def score(params, name):
        m = validator.evaluate(params)
        print(f"{name}: band-LSD {m['band_lsd_db']:.3f} dB "
              f"MCD {m['mcd_db']:.2f} fwSegSNR {m['fwsegsnr_db']:.2f}",
              flush=True)
        return m["band_lsd_db"]

    candidates = []
    if args.include_best:
        bp = os.path.join(args.rundir, "model_best.npz")
        if os.path.exists(bp):
            params, _ = load_checkpoint(bp)
            candidates.append(("model_best", params,
                               score(params, "model_best")))

    import jax

    def tree_avg(trees):
        return jax.tree_util.tree_map(
            lambda *xs: np.mean([np.asarray(x, np.float64) for x in xs],
                                axis=0).astype(np.asarray(xs[0]).dtype),
            *trees)

    loaded = {p: load_checkpoint(p)[0] for _, p in snaps}
    for k in range(1, len(snaps) + 1):
        tail = [loaded[p] for _, p in snaps[-k:]]
        avg = tree_avg(tail)
        name = f"avg-last-{k} (steps>={snaps[-k][0]})"
        candidates.append((name, avg, score(avg, name)))
    # head windows too: when quality peaks early in the run (the r4
    # signature), the informative averages are over the EARLY snapshots
    for k in range(2, min(4, len(snaps)) + 1):
        head = [loaded[p] for _, p in snaps[:k]]
        avg = tree_avg(head)
        name = f"avg-first-{k} (steps<={snaps[k - 1][0]})"
        candidates.append((name, avg, score(avg, name)))

    best = min(candidates, key=lambda c: c[2])
    print(f"WINNER: {best[0]} at {best[2]:.3f} dB", flush=True)
    outp = os.path.join(args.rundir, args.out)
    save_checkpoint(outp, best[1], cfg)
    print(f"wrote {outp}", flush=True)


if __name__ == "__main__":
    main()
