#!/usr/bin/env python3
"""Demo-scale RDO-VAE training with held-out validation + R-D curve.

Round-5 upgrades (VERDICT round-4 #5): the round-3 demo checkpoint was a
4k-step run predating the validation machinery.  Here the last --val-seqs
sequences are held out, hard-quantized distortion at a fixed mid-grid q is
scored every --val-every steps with best-checkpoint selection, and after
training a rate-distortion curve over the full 16-lambda grid (hard rate
bits vs hard distortion on the SAME held-out batch) is written to
<outdir>/rd_curve.md.  Match: torch/rdovae/train_rdovae.py:120-270 (loss
reporting; the reference has no val split either -- this is the repo's
earn-the-weights machinery applied to DRED).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from lpcnet_tpu.models import rdovae as RV
    from lpcnet_tpu.train.train_rdovae import (
        RDOVAEDataset, RDOVAETrainConfig, RDOVAETrainer)
    from lpcnet_tpu.train.validation import BestTracker
    from lpcnet_tpu.weights.checkpoint import load_checkpoint, save_checkpoint

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", default="artifacts/train_demo/features.f32")
    ap.add_argument("--outdir", default="artifacts/rdovae_demo")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seq-length", type=int, default=256)
    ap.add_argument("--val-seqs", type=int, default=32)
    ap.add_argument("--val-every", type=int, default=250)
    ap.add_argument("--val-q", type=int, default=8,
                    help="quant-grid index for the val scalar (mid grid)")
    args = ap.parse_args()
    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)
    cfg = RV.RDOVAEConfig()
    tc = RDOVAETrainConfig(batch_size=args.batch_size,
                           sequence_length=args.seq_length)
    ds = RDOVAEDataset(args.features, tc, cfg, val_seqs=args.val_seqs)
    print(f"{len(ds)} batches/epoch (+{args.val_seqs} held-out val seqs)",
          flush=True)
    tr = RDOVAETrainer(cfg, tc)
    val = ds.val_batch(args.val_q)
    best = BestTracker(metric="dist_hard")
    rng = jax.random.PRNGKey(0)
    step = 0
    t0 = time.time()

    def run_val(step):
        vm = tr.eval_step(val)
        improved = best.update(step, vm)
        if improved:
            save_checkpoint(os.path.join(outdir, "rdovae_model_best.npz"),
                            jax.device_get(tr.state.params))
        print(f"rdovae step {step}: VAL dist_hard={vm['dist_hard']:.4f} "
              f"dist_soft={vm['dist_soft']:.4f} "
              f"rate={vm['hard_rate_bits']:.1f}b "
              f"(best {best.best:.4f} @ {best.best_step}"
              f"{' *' if improved else ''})", flush=True)

    while step < args.steps:
        for batch in ds:
            rng, sub = jax.random.split(rng)
            m = tr.train_step(batch, sub)
            step += 1
            if step % 25 == 0:
                print(f"rdovae step {step}: total={float(m['total']):.4f} "
                      f"dist_h={float(m['dist_hard']):.4f} "
                      f"rate={float(m['hard_rate_bits']):.1f}b "
                      f"({step/(time.time()-t0):.2f} steps/s)", flush=True)
            if val is not None and step % args.val_every == 0:
                run_val(step)
            if step >= args.steps:
                break
    save_checkpoint(os.path.join(outdir, "rdovae_model.npz"),
                    jax.device_get(tr.state.params))
    if best.best is not None:
        print(f"best: step {best.best_step} val dist_hard {best.best:.4f} "
              f"-> rdovae_model_best.npz", flush=True)

    # --- rate-distortion curve over the full quant grid on the best params
    if val is not None:
        best_path = os.path.join(outdir, "rdovae_model_best.npz")
        params = (load_checkpoint(best_path)[0] if os.path.exists(best_path)
                  else jax.device_get(tr.state.params))
        params = jax.tree.map(np.asarray, params)
        rows = []
        for q in range(cfg.quant_levels):
            vm = tr.eval_step(ds.val_batch(q), params=params)
            rows.append((q, vm["hard_rate_bits"], vm["dist_hard"],
                         vm["dist_soft"]))
            print(f"rd q={q}: rate={vm['hard_rate_bits']:.1f}b "
                  f"dist_hard={vm['dist_hard']:.4f}", flush=True)
        with open(os.path.join(outdir, "rd_curve.md"), "w") as f:
            f.write("# RDO-VAE rate-distortion (held-out batch, "
                    "hard-quantized)\n\n| q | rate bits/20ms-frame | "
                    "dist_hard | dist_soft |\n|---|---|---|---|\n")
            for q, r, dh, dsf in rows:
                f.write(f"| {q} | {r:.1f} | {dh:.4f} | {dsf:.4f} |\n")
        print("wrote", os.path.join(outdir, "rd_curve.md"), flush=True)
    print("saved", outdir, flush=True)


if __name__ == "__main__":
    main()
