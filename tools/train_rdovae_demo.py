#!/usr/bin/env python3
"""Demo-scale RDO-VAE training on the demo corpus features."""

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
    from lpcnet_tpu.weights.checkpoint import save_checkpoint

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", default="artifacts/train_demo/features.f32")
    ap.add_argument("--outdir", default="artifacts/rdovae_demo")
    ap.add_argument("--steps", type=int, default=1200)
    args = ap.parse_args()
    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)
    cfg = RV.RDOVAEConfig()
    tc = RDOVAETrainConfig(batch_size=8, sequence_length=128)
    ds = RDOVAEDataset(args.features, tc, cfg)
    print(f"{len(ds)} batches/epoch", flush=True)
    tr = RDOVAETrainer(cfg, tc)
    rng = jax.random.PRNGKey(0)
    step = 0
    t0 = time.time()
    while step < args.steps:
        for batch in ds:
            rng, sub = jax.random.split(rng)
            m = tr.train_step(batch, sub)
            step += 1
            if step % 25 == 0:
                print(f"rdovae step {step}: total={float(m['total']):.4f} "
                      f"dist_h={float(m['dist_hard']):.4f} rate={float(m['hard_rate_bits']):.1f}b "
                      f"({step/(time.time()-t0):.2f} steps/s)", flush=True)
            if step >= args.steps:
                break
    save_checkpoint(os.path.join(outdir, "rdovae_model.npz"),
                    jax.device_get(tr.state.params))
    print("saved", outdir, flush=True)


if __name__ == "__main__":
    main()
