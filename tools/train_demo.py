#!/usr/bin/env python3
"""Demo-scale end-to-end training run on the local chip.

Generates a synthetic-speech corpus, runs the dump_data augmentation
pipeline, trains the default-architecture vocoder for a bounded number of
steps with metrics logging, and exports npz + DNNw-blob checkpoints.
Not a production recipe (real training uses hours of real speech); this
produces a demonstrably-learning model and artifacts for the demo flow.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(seconds: float, seed: int = 0, version: int = 2) -> np.ndarray:
    from lpcnet_tpu.train.corpus import synth_corpus as gen
    return gen(seconds, seed=seed, version=version)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=240)
    ap.add_argument("--steps", type=int, default=3000)
    # 128 = the reference config (training_tf2/train_lpcnet.py:51); the
    # device loader sustains 14 steps/s at b128 so there is no reason to
    # train smaller (round-3's b32 run was 3x slower AND noisier)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--outdir", default="artifacts/train_demo")
    ap.add_argument("--data-dir", default=None,
                    help="reuse features.f32/data.s16 from another run dir")
    ap.add_argument("--grua-size", type=int, default=384)
    ap.add_argument("--save-every", type=int, default=0,
                    help="save model_<step>.npz every N steps")
    ap.add_argument("--init-from", default=None,
                    help="npz checkpoint to initialize weights from")
    ap.add_argument("--quantize", action="store_true",
                    help="quantize-finetune mode (requires --init-from)")
    ap.add_argument("--schedule-scale", type=float, default=1.0,
                    help="compress the sparsify/quantize schedules")
    ap.add_argument("--corpus-version", type=int, default=2,
                    help="synth_corpus generator version for BOTH training "
                         "shards and validation clips (3 = stochastic "
                         "excitation)")
    ap.add_argument("--corpus-seeds", default="0",
                    help="comma list of synth_corpus shard seeds, or 'N' "
                         "(bare int) for seeds 0..N-1")
    ap.add_argument("--aug-passes", type=int, default=1,
                    help="dump_data augmentation passes over the corpus")
    ap.add_argument("--streams", type=int, default=32,
                    help="dump_data_streams parallelism for corpus prep "
                         "(1 = sequential reference pipeline)")
    ap.add_argument("--val-every", type=int, default=1000,
                    help="run held-out validation every N steps (0 = off)")
    ap.add_argument("--val-seeds", default="1234,4321,9999,7777",
                    help="held-out synth_corpus seeds for validation clips "
                         "(must not overlap --corpus-seeds)")
    ap.add_argument("--val-seconds", type=float, default=8.0)
    ap.add_argument("--val-holdout", type=int, default=4,
                    help="data batches held out of training for the "
                         "teacher-forced val loss (0 = off)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="params EMA decay for eval/ship (0 = off; forced "
                         "off with --quantize: EMA leaves the int8 grid)")
    ap.add_argument("--orbax-every", type=int, default=0,
                    help="save full train state (params+opt+step) every N "
                         "steps to <outdir>/orbax/step_<k>")
    ap.add_argument("--resume", action="store_true",
                    help="resume params+optimizer+step from the latest "
                         "<outdir>/orbax checkpoint")
    ap.add_argument("--density-split", nargs=3, type=float, default=None,
                    help="GRU-A recurrent density triple; 1 1 1 trains "
                         "dense (the TPU inference kernels run dense "
                         "either way -- sparsity is a CPU-SIMD concern)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override TrainConfig.lr (continuation phases "
                         "need a decayed lr, not lr0 -- NOTES.md 08-19)")
    ap.add_argument("--decay", type=float, default=None,
                    help="override TrainConfig.decay (1/(1+decay*t))")
    ap.add_argument("--end2end", action="store_true",
                    help="train the END2END variant (differentiable-LPC rc "
                         "head; src/lpcnet.c:56-80, lossfuncs.py:25-43)")
    ap.add_argument("--lpc-gamma", type=float, default=1.0)
    ap.add_argument("--ss-prob", type=float, default=0.0,
                    help="scheduled-sampling probability: per-sample chance "
                         "the signal history is the model's OWN sampled "
                         "output (train/scheduled.py; 0 = teacher forcing)")
    ap.add_argument("--ss-block", type=int, default=16,
                    help="samples per scheduled-sampling Bernoulli draw")
    ap.add_argument("--ss-hide-exc", action="store_true",
                    help="SS arm (a): feed the CLEAN-history excitation to "
                         "the exc-history input so the model cannot read "
                         "its own sampling deviation off that channel")
    ap.add_argument("--ss-distill", type=float, default=0.0,
                    help="SS arm (b): blend weight of the teacher-student "
                         "tree-KL (clean-history pdf as target) replacing "
                         "the hard correction-CE; 0 = off")
    ap.add_argument("--input-noise", type=float, default=0.3,
                    help="std of the Gaussian noise on the u-law "
                         "(sig,pred,exc) inputs (reference: 0.3)")
    ap.add_argument("--host-loader", action="store_true",
                    help="use the host memmap loader instead of the "
                         "device-resident one (for datasets too big for HBM)")
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    datadir = args.data_dir or args.outdir
    fpath = os.path.join(datadir, "features.f32")
    dpath = os.path.join(datadir, "data.s16")

    if not os.path.exists(dpath):
        if "," in args.corpus_seeds:
            seeds = [int(s) for s in args.corpus_seeds.split(",")]
        else:
            n = int(args.corpus_seeds)
            seeds = list(range(n)) if n > 1 else [n]
        print(f"generating corpus ({len(seeds)} shard(s))...", flush=True)
        t0 = time.time()
        speech = np.concatenate(
            [synth_corpus(args.seconds / len(seeds), seed=s,
                          version=args.corpus_version) for s in seeds])
        speech.tofile(os.path.join(datadir, "corpus.s16"))
        print(f"corpus: {time.time() - t0:.1f}s for {args.seconds:.0f}s",
              flush=True)
        t0 = time.time()
        if args.streams > 1:
            from lpcnet_tpu.train.dump_data import dump_data_streams
            dump_data_streams(speech, fpath, dpath, streams=args.streams,
                              min_samples=args.aug_passes * len(speech))
        else:
            from lpcnet_tpu.train.dump_data import dump_data
            dump_data(speech, fpath, dpath, chunk_frames=800,
                      min_samples=args.aug_passes * len(speech))
        print(f"dump_data: {time.time() - t0:.1f}s", flush=True)

    import jax

    from lpcnet_tpu.models.lpcnet import LPCNetConfig
    from lpcnet_tpu.train.data import DeviceLPCNetLoader, LPCNetLoader
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer, TrainState
    from lpcnet_tpu.weights.checkpoint import load_checkpoint, save_checkpoint
    from lpcnet_tpu.weights.lpcnet_arrays import save_lpcnet_blob

    cfg = LPCNetConfig(rnn_units1=args.grua_size, e2e=args.end2end,
                       lpc_gamma=args.lpc_gamma)
    ema_decay = 0.0 if args.quantize else args.ema
    tc = TrainConfig(batch_size=args.batch_size, quantize=args.quantize,
                     schedule_scale=args.schedule_scale,
                     ema_decay=ema_decay,
                     ss_prob=args.ss_prob, ss_block=args.ss_block,
                     ss_hide_exc=args.ss_hide_exc,
                     ss_distill=args.ss_distill,
                     input_noise=args.input_noise,
                     **({"density": tuple(args.density_split)}
                        if args.density_split else {}),
                     **({"lr": args.lr} if args.lr else {}),
                     **({"decay": args.decay}
                        if args.decay is not None else {}))
    loader_cls = LPCNetLoader if args.host_loader else DeviceLPCNetLoader
    loader = loader_cls(dpath, fpath, batch_size=args.batch_size,
                        holdout_batches=args.val_holdout, e2e=args.end2end)
    print(f"{len(loader)} batches/epoch", flush=True)
    trainer = Trainer(cfg, tc)
    if args.init_from:
        params, _ = load_checkpoint(args.init_from)
        trainer.state = TrainState(jax.device_put(params),
                                   trainer.optimizer.init(params),
                                   trainer.state.step)
        trainer.reset_ema()
        print(f"initialized from {args.init_from}", flush=True)

    from lpcnet_tpu.train.checkpointing import (latest_checkpoint,
                                                restore_train_state,
                                                save_train_state)
    orbax_dir = os.path.join(args.outdir, "orbax")
    start_step = 0
    if args.resume:
        ck = latest_checkpoint(orbax_dir)
        if ck:
            trainer.state = jax.device_put(
                restore_train_state(ck, trainer.state))
            trainer.reset_ema()
            start_step = int(trainer.state.step)
            print(f"resumed full state from {ck} (step {start_step})",
                  flush=True)

    def save(params, tag=""):
        save_checkpoint(os.path.join(args.outdir, f"model{tag}.npz"), params, cfg)
        with open(os.path.join(args.outdir, f"model{tag}.bin"), "wb") as f:
            f.write(save_lpcnet_blob(params, cfg, quantize=args.quantize))

    validator, best = None, None
    if args.val_every:
        from lpcnet_tpu.train.validation import BestTracker, HeldOutValidator
        val_seeds = [int(s) for s in args.val_seeds.split(",")]
        clips = [synth_corpus(args.val_seconds, seed=s,
                              version=args.corpus_version)
                 for s in val_seeds]
        validator = HeldOutValidator(cfg, clips)
        best = BestTracker()
        best_txt = os.path.join(args.outdir, "best.txt")
        if args.resume and os.path.exists(best_txt):
            # a supervisor relaunch must not forget the pre-restart best:
            # a fresh tracker would overwrite model_best.npz with the
            # first post-restart (possibly worse) validation winner
            import re as _re
            m = _re.search(r"step (\d+).*'band_lsd_db': ([0-9.]+)",
                           open(best_txt).read())
            if m:
                best.best_step, best.best = int(m.group(1)), float(m.group(2))
                print(f"resumed best tracker: {best.best:.3f} dB "
                      f"@ {best.best_step}", flush=True)
        print(f"validator: {len(clips)} held-out clips "
              f"(seeds {val_seeds})", flush=True)

    # in quantize mode, checkpoints before t_end are NOT fully on the
    # 1/128 int8 grid (progressive_quantize threshold < 0.5) -- shipping
    # one as the "q" model would be wrong, so best-tracking starts at t_end
    best_from = int(30000 * args.schedule_scale) if args.quantize else 0

    def run_validation(step):
        cand = [("raw", trainer.state.params)]
        if ema_decay > 0.0:
            cand.append(("ema", trainer.ema_params))
        results = {}
        for name, p in cand:
            results[name] = validator.evaluate(p)
        # best-checkpoint selection on the better of raw/EMA
        win = min(results, key=lambda k: results[k]["band_lsd_db"])
        m = results[win]
        improved = step >= best_from and best.update(step, m)
        if improved:
            save(jax.device_get(dict(cand)[win]), "_best")
            with open(os.path.join(args.outdir, "best.txt"), "w") as f:
                f.write(f"step {step} ({win}): {m}\n")
        line = " ".join(f"{n}:{r['band_lsd_db']:.3f}"
                        for n, r in results.items())
        tf_txt = ""
        if args.val_holdout:
            tf = trainer.eval_loss(loader.val_batches())
            if tf:
                mlog.log_async(step=step, kind="val_tf", **tf)
                tf_txt = f" tf-loss {tf['loss']:.4f}"
        best_txt = (f"best {best.best:.3f} @ {best.best_step}"
                    if best.best is not None
                    else f"best tracked from step {best_from}")
        print(f"step {step}: VAL band-LSD {line} dB{tf_txt} "
              f"({best_txt}{' *' if improved else ''})", flush=True)
        for name, r in results.items():
            mlog.log_async(step=step, kind=f"val_{name}", **r)
        mlog.flush_async()

    from lpcnet_tpu.utils.profiling import MetricsLogger
    mlog = MetricsLogger(os.path.join(args.outdir, "metrics.jsonl"))
    rng = jax.random.PRNGKey(1)
    step = start_step
    if args.host_loader:
        for _ in range(step):    # keep the per-step split chain deterministic
            rng, _ = jax.random.split(rng)
    # (block path needs no fast-forward: its rng is fold_in(key, step))
    t0 = time.time()
    t_val = 0.0

    last_print = start_step

    def at_boundaries(step, last_loss):
        nonlocal t_val, last_print
        if step - last_print >= 50 or step % 50 == 0:
            last_print = step
            mlog.flush_async()
            # report the TRAIN rate (validation pauses excluded) so the
            # number is comparable to the bench.py train mode
            dt = time.time() - t0 - t_val
            print(f"step {step}: loss={last_loss:.4f} "
                  f"({(step - start_step) / dt:.2f} steps/s)",
                  flush=True)
        if validator is not None and step % args.val_every == 0:
            tv = time.time()
            run_validation(step)
            t_val += time.time() - tv
        if args.save_every and step % args.save_every == 0:
            save(jax.device_get(trainer.state.params), f"_{step}")
        if args.orbax_every and step % args.orbax_every == 0:
            save_train_state(os.path.join(orbax_dir, f"step_{step}"),
                             trainer.state)

    if not args.host_loader:
        # device-resident fast path: 50 train steps (batch gather included)
        # per dispatch -- the per-step path pays a tunnel round trip per
        # step (6.2 realized vs 14.4 device-bound steps/s, BENCHMARKS.md)
        BLK = max(1, min(50, len(loader)))   # an epoch can be < 50 batches
        for name in ("val_every", "save_every", "orbax_every"):
            v = getattr(args, name)
            if v and v % BLK:
                setattr(args, name, (v // BLK + 1) * BLK)
                print(f"{name} rounded to {getattr(args, name)} "
                      f"(device block size {BLK})", flush=True)
        while step < args.steps:
            for sels in loader.index_blocks(BLK):
                ms = trainer.train_block(loader, sels)
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
                rng, sub = jax.random.split(rng)
                m = trainer.train_step(batch, sub)
                step += 1
                mlog.log_async(step=step, **m)
                if step % 50 == 0:
                    at_boundaries(step, float(m["loss"]))
                elif (validator is not None and step % args.val_every == 0
                      ) or (args.save_every and step % args.save_every == 0
                            ) or (args.orbax_every
                                  and step % args.orbax_every == 0):
                    at_boundaries(step, float(m["loss"]))
                if step >= args.steps:
                    break
            loader.on_epoch_end()

    mlog.flush_async()
    save(jax.device_get(trainer.state.params))
    if validator is not None and best.best is not None:
        print(f"best checkpoint: step {best.best_step} "
              f"({best.best:.3f} dB band-LSD) -> model_best.npz", flush=True)
    print("saved artifacts to", args.outdir, flush=True)


if __name__ == "__main__":
    main()
