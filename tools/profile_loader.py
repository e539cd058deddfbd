#!/usr/bin/env python3
"""Attribute the train-loop gap: device-bound step rate vs loader cost.

Times (a) DeviceLPCNetLoader sampling alone, (b) the host loader's
__getitem__ alone, (c) the real loader+train_step loop, against the
synthetic-batch pipelined rate from bench.py's train mode.

Usage: python tools/profile_loader.py --data-dir artifacts/data_r3
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from lpcnet_tpu.models.lpcnet import LPCNetConfig
    from lpcnet_tpu.train.data import DeviceLPCNetLoader, LPCNetLoader
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="artifacts/data_r3")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()
    dpath = os.path.join(args.data_dir, "data.s16")
    fpath = os.path.join(args.data_dir, "features.f32")

    print("uploading dataset...", flush=True)
    t0 = time.perf_counter()
    dev = DeviceLPCNetLoader(dpath, fpath, batch_size=args.batch)
    b0 = dev[0]
    np.asarray(b0["sig_in"][0, :4])
    print(f"upload+first sample: {time.perf_counter() - t0:.1f}s", flush=True)

    # (a) device sampling alone, pipelined
    for _ in range(3):
        out = dev[0]
    np.asarray(out["sig_in"][0, :4])
    t0 = time.perf_counter()
    n = 40
    for k in range(n):
        out = dev[k % len(dev)]
    np.asarray(out["sig_in"][0, :4])
    dt = (time.perf_counter() - t0) / n
    print(f"device sample: {dt * 1e3:8.2f} ms/batch", flush=True)

    # (b) host loader getitem (host-side work only; excludes transfer)
    host = LPCNetLoader(dpath, fpath, batch_size=args.batch)
    host[0]
    t0 = time.perf_counter()
    for k in range(10):
        host[k % len(host)]
    print(f"host getitem:  {(time.perf_counter() - t0) / 10 * 1e3:8.2f} "
          f"ms/batch (host work, no transfer)", flush=True)

    # (c) the real loop
    cfg = LPCNetConfig()
    trainer = Trainer(cfg, TrainConfig(batch_size=args.batch))
    key = jax.random.PRNGKey(0)
    it = iter(dev)
    for _ in range(3):
        key, sub = jax.random.split(key)
        m = trainer.train_step(next(it), sub)
    float(m["loss"])
    t0 = time.perf_counter()
    done = 0
    for batch in it:
        key, sub = jax.random.split(key)
        m = trainer.train_step(batch, sub)
        done += 1
        if done >= args.steps:
            break
    float(m["loss"])
    dt = (time.perf_counter() - t0) / done
    print(f"loop step:     {dt * 1e3:8.2f} ms/step = {1 / dt:.2f} steps/s",
          flush=True)


if __name__ == "__main__":
    main()
