#!/usr/bin/env python3
"""Demo-scale PLC training: burg features from the demo corpus + random
loss traces -> bounded training -> shipped checkpoint."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="artifacts/train_demo/corpus.s16")
    ap.add_argument("--outdir", default="artifacts/plc_demo")
    ap.add_argument("--steps", type=int, default=1500)
    args = ap.parse_args()
    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)
    fpath = os.path.join(outdir, "plc_features.f32")
    lpath = os.path.join(outdir, "lost.s8")

    if not os.path.exists(fpath):
        from lpcnet_tpu.train.dump_data import dump_data
        speech = np.fromfile(args.corpus, np.int16)
        # dump_data(burg=True) returns the per-frame Burg cepstra
        bf = dump_data(speech, os.path.join(outdir, "_feat36b.f32"), None,
                       burg=True, chunk_frames=800)
        feats = np.fromfile(os.path.join(outdir, "_feat36b.f32"),
                            np.float32).reshape(-1, 36)
        n = min(len(bf), len(feats))
        merged = np.concatenate([bf[:n], feats[:n]], axis=1)  # [n, 72]
        merged.astype(np.float32).tofile(fpath)
        # Markov loss traces ~20% loss in bursts
        rng = np.random.RandomState(0)
        lost = np.ones(n, np.int8)
        p_loss, p_rec = 0.06, 0.35
        state = 1
        for i in range(n):
            if state == 1 and rng.rand() < p_loss:
                state = 0
            elif state == 0 and rng.rand() < p_rec:
                state = 1
            lost[i] = state
        lost.tofile(lpath)

    from lpcnet_tpu.train.train_plc import PLCLoader, PLCTrainConfig, PLCTrainer
    from lpcnet_tpu.weights.checkpoint import save_checkpoint
    import jax

    tc = PLCTrainConfig(batch_size=16, seq_length=200)
    loader = PLCLoader(fpath, lpath, tc)
    print(f"{len(loader)} batches/epoch", flush=True)
    tr = PLCTrainer(tc=tc)
    step = 0
    import time
    t0 = time.time()
    while step < args.steps:
        for batch in loader:
            m = tr.train_step(batch)
            step += 1
            if step % 50 == 0:
                print(f"plc step {step}: loss={float(m['loss']):.4f} "
                      f"({step/(time.time()-t0):.2f} steps/s)", flush=True)
            if step >= args.steps:
                break
        loader.on_epoch_end()
    save_checkpoint(os.path.join(outdir, "plc_model.npz"),
                    jax.device_get(tr.state.params))
    print("saved", outdir, flush=True)


if __name__ == "__main__":
    main()
