#!/usr/bin/env python3
"""Demo-scale PLC training: burg features from the demo corpus + random
loss traces -> bounded training with a held-out val split and
best-checkpoint selection -> shipped checkpoint.

Round-4 upgrades: corpus prep via the batched dump_data_streams (the 4-hour
round-4 corpus preps in ~1 min vs ~1 h sequential), a fixed held-out val
batch scored every --val-every steps (deterministic loss traces + burg
dropout, train/train_plc.py::PLCLoader.val_batch), and plc_model_best.npz
kept at the lowest val loss.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="artifacts/train_demo/corpus.s16")
    ap.add_argument("--outdir", default="artifacts/plc_demo")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seq-length", type=int, default=1000)
    ap.add_argument("--val-every", type=int, default=200)
    ap.add_argument("--val-seqs", type=int, default=64)
    ap.add_argument("--streams", type=int, default=32,
                    help="dump_data_streams parallelism (1 = sequential)")
    ap.add_argument("--conceal-val-seeds", default="",
                    help="comma list of synth_corpus seeds; when set, "
                         "best-checkpoint selection uses the batched "
                         "concealment band-LSD on these clips (the "
                         "deployment metric; round-5 sweep showed masked "
                         "val loss does not rank concealment) -- keep "
                         "DISJOINT from the final eval suite")
    ap.add_argument("--seed", type=int, default=0,
                    help="loader + trainer init seed (sweepable: PLC runs "
                         "are cheap and run-to-run spread is real)")
    ap.add_argument("--host-loader", action="store_true",
                    help="per-step host batch assembly (0.96 steps/s "
                         "through the tunnel) instead of the device-"
                         "resident block path")
    args = ap.parse_args()
    outdir = args.outdir
    os.makedirs(outdir, exist_ok=True)
    fpath = os.path.join(outdir, "plc_features.f32")
    lpath = os.path.join(outdir, "lost.s8")

    if not os.path.exists(fpath):
        speech = np.fromfile(args.corpus, np.int16)
        t0 = time.time()
        if args.streams > 1:
            from lpcnet_tpu.train.dump_data import dump_data_streams
            # burg=True merges [burg36 | feats36] rows directly
            dump_data_streams(speech, fpath, None, burg=True,
                              streams=args.streams)
        else:
            from lpcnet_tpu.train.dump_data import dump_data
            bf = dump_data(speech, os.path.join(outdir, "_feat36b.f32"),
                           None, burg=True, chunk_frames=800)
            feats = np.fromfile(os.path.join(outdir, "_feat36b.f32"),
                                np.float32).reshape(-1, 36)
            n = min(len(bf), len(feats))
            merged = np.concatenate([bf[:n], feats[:n]], axis=1)  # [n, 72]
            merged.astype(np.float32).tofile(fpath)
        n = len(np.fromfile(fpath, np.float32)) // 72
        print(f"features: {time.time() - t0:.1f}s ({n} frames)", flush=True)
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

    from lpcnet_tpu.train.train_plc import (PLCDeviceLoader, PLCLoader,
                                            PLCTrainConfig, PLCTrainer)
    from lpcnet_tpu.train.validation import BestTracker
    from lpcnet_tpu.utils.profiling import MetricsLogger
    from lpcnet_tpu.weights.checkpoint import save_checkpoint
    import jax

    tc = PLCTrainConfig(batch_size=args.batch_size, seq_length=args.seq_length)
    loader_cls = PLCLoader if args.host_loader else PLCDeviceLoader
    loader = loader_cls(fpath, lpath, tc, seed=args.seed,
                        val_seqs=args.val_seqs)
    print(f"{len(loader)} batches/epoch "
          f"(+{args.val_seqs} held-out val seqs)", flush=True)
    tr = PLCTrainer(tc=tc, seed=args.seed)
    val = loader.val_batch()
    cval = None
    if args.conceal_val_seeds:
        from lpcnet_tpu.train.corpus import synth_corpus
        from tools.eval_plc_batched import ConcealmentValidator
        clips = [synth_corpus(6.0, seed=int(x))
                 for x in args.conceal_val_seeds.split(",")]
        cval = ConcealmentValidator(clips)
        print(f"concealment validator: {len(clips)} clips", flush=True)
    best = BestTracker(metric="conceal" if cval is not None else "loss")
    mlog = MetricsLogger(os.path.join(outdir, "metrics.jsonl"))
    step = 0
    t0 = time.time()

    def at_boundaries(step, last_loss):
        if step % 50 == 0 or not args.host_loader:
            mlog.flush_async()
            print(f"plc step {step}: loss={last_loss:.4f} "
                  f"({step / (time.time() - t0):.2f} steps/s)", flush=True)
        if val is not None and step % args.val_every == 0:
            vm = tr.eval_step(val)
            txt = f"loss {vm['loss']:.4f}"
            if cval is not None:
                vm["conceal"] = cval.evaluate(jax.device_get(tr.state.params))
                txt += f" conceal {vm['conceal']:.3f}dB"
            improved = best.update(step, vm)
            if improved:
                save_checkpoint(
                    os.path.join(outdir, "plc_model_best.npz"),
                    jax.device_get(tr.state.params))
            mlog.log_async(step=step, kind="val", **vm)
            mlog.flush_async()
            print(f"plc step {step}: VAL {txt} "
                  f"(best {best.best:.4f} @ {best.best_step}"
                  f"{' *' if improved else ''})", flush=True)

    if not args.host_loader:
        # device-resident block path: BLK (assembly + step) scans/dispatch
        BLK = max(1, min(50, len(loader)))
        if args.val_every % BLK:
            args.val_every = (args.val_every // BLK + 1) * BLK
            print(f"val_every rounded to {args.val_every} "
                  f"(device block size {BLK})", flush=True)
        while step < args.steps:
            for sels in loader.index_blocks(BLK):
                ms = tr.train_block(loader, sels)
                step += BLK
                mlog.log_async(step=step, **{
                    k: float(np.mean(np.asarray(v))) for k, v in ms.items()})
                at_boundaries(step, float(np.asarray(ms["loss"])[-1]))
                if step >= args.steps:
                    break
            loader.on_epoch_end()
    else:
        while step < args.steps:
            for batch in loader:
                m = tr.train_step(batch)
                step += 1
                mlog.log_async(step=step, **m)
                if step % 50 == 0 or (val is not None
                                      and step % args.val_every == 0):
                    at_boundaries(step, float(m["loss"]))
                if step >= args.steps:
                    break
            loader.on_epoch_end()
    mlog.flush_async()
    save_checkpoint(os.path.join(outdir, "plc_model.npz"),
                    jax.device_get(tr.state.params))
    if best.best is not None:
        print(f"best: step {best.best_step} val loss {best.best:.4f} "
              f"-> plc_model_best.npz", flush=True)
    print("saved", outdir, flush=True)


if __name__ == "__main__":
    main()
