#!/usr/bin/env python3
"""Same-session A/B of the sampler embedding-contraction variants.

Round-3 lesson (BENCHMARKS.md close-out): cross-process deltas under ~10%
are noise.  This tool benches LPCNET_EMB=v1 (composed [768,3Na] one-hot
contraction) vs factored (rank-128 gather + input-kernel matmul) in ONE
process, interleaved A/B/A/B, and reports per-variant median +- spread.

Usage: python tools/bench_emb_variants.py [--batch 1024] [--frames 24]
       [--rounds 5]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--warmup-frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.nn import quantized as Q

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    fq = Q.quantize_fused(fused)
    b = args.batch
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, 36).astype(np.float32) * 0.3)

    variants = ("v1", "factored")
    bundles = {}
    for v in variants:
        K._EMB = v
        bundles[v] = K.kernel_weights(fq, cfg)
    K._EMB = "v1"
    assert "embf_q8" in bundles["factored"], "factored operands missing"

    @jax.jit
    def step(fs, ss, f, fused, kw):
        fs, _, ca, cb, lpc = M.frame_network(fused, fs, f, cfg)
        ss, pcm = K._synth_pallas(kw, ss, ca, cb, lpc, cfg, 160)
        return fs, ss, pcm

    # distinct jit traces per bundle shape-set; warm both
    states = {}
    for v in variants:
        fs, ss = M.init_frame_state(b, cfg), M.init_sample_state(b, cfg)
        for _ in range(args.warmup_frames):
            fs, ss, pcm = step(fs, ss, feats, fused, bundles[v])
        np.asarray(pcm[0, :4])
        states[v] = (fs, ss)

    rates = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:
            fs, ss = states[v]
            t0 = time.perf_counter()
            for _ in range(args.frames):
                fs, ss, pcm = step(fs, ss, feats, fused, bundles[v])
            np.asarray(pcm[0, :4])      # hard sync on the chained result
            dt = time.perf_counter() - t0
            states[v] = (fs, ss)
            rates[v].append(b * args.frames * 160 / dt)

    out = {}
    for v in variants:
        rs = sorted(rates[v])
        med = rs[len(rs) // 2]
        out[v] = {"median_samples_per_sec": med,
                  "min": rs[0], "max": rs[-1],
                  "spread_pct": 100.0 * (rs[-1] - rs[0]) / med}
        print(f"{v}: median {med / 1e6:.2f} Ms/s "
              f"[{rs[0] / 1e6:.2f}, {rs[-1] / 1e6:.2f}] "
              f"spread {out[v]['spread_pct']:.1f}%", flush=True)
    delta = (out["factored"]["median_samples_per_sec"]
             / out["v1"]["median_samples_per_sec"] - 1.0) * 100.0
    print(f"factored vs v1: {delta:+.1f}%", flush=True)
    print(json.dumps({"batch": b, "rounds": args.rounds,
                      "delta_pct": delta, **out}))


if __name__ == "__main__":
    main()
