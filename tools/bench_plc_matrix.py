#!/usr/bin/env python3
"""Variance-honest PLC flag-matrix benchmark.

Round-3 lesson (BENCHMARKS.md round-3 close-out): PLC default decisions
were made on ~5% deltas measured across separate bench processes with ~10%
run-to-run spread.  This tool runs the whole flag matrix in ONE session
(so configs share chip state and the comparison is paired), with N>=5
timed repeats per config, and reports median / min / max per config.

Usage:
  python tools/bench_plc_matrix.py [--batch 256] [--repeats 5]
      [--frames 250] [--nc] [--configs name1,name2]

Prints one human table plus one JSON line per config (kind=plc_matrix).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, set_plc_flags kwargs); chain/compact are the round-3 decision axes
CONFIGS = [
    ("chain+capauto", dict(fastchain=True, compact="auto")),   # r3 default
    ("compact-auto", dict(fastchain=False, compact="auto")),
    ("compact-64", dict(fastchain=False, compact="64")),
    ("compact-96", dict(fastchain=False, compact="96")),
    ("chain+cap64", dict(fastchain=True, compact="64")),
    ("no-compact", dict(fastchain=False, compact="0")),
]


def bench_config(name, flags, batch, n_frames, repeats, nc, dc):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.nn import quantized as Q
    from lpcnet_tpu.plc import batched as B

    B.set_plc_flags(**flags)
    cfg = M.LPCNetConfig(lookahead=0) if nc else M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = Q.quantize_fused(M.fuse_inference_params(params, cfg))
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    plc = B.BatchedPLC(fused, cfg, plc_params, batch=batch, non_causal=nc,
                       remove_dc=dc)
    rng = np.random.RandomState(0)
    chunk = 25
    n_frames = max(chunk, n_frames // chunk * chunk)
    frames = jnp.asarray((rng.randn(batch, chunk + n_frames, 160) * 2000
                          ).astype(np.float32))
    losses = jnp.asarray(rng.rand(batch, chunk + n_frames) < 0.1)
    frames_w, frames_t = frames[:, :chunk], frames[:, chunk:]
    losses_w, losses_t = losses[:, :chunk], losses[:, chunk:]
    jax.block_until_ready((frames_w, frames_t))
    wo = plc.run(frames_w, losses_w, chunk=chunk, device_out=True)
    np.asarray(wo[-1][0, -1, :4])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = plc.run(frames_t, losses_t, chunk=chunk, device_out=True)
        np.asarray(outs[-1][0, -1, :4])
        times.append(time.perf_counter() - t0)
    sps = sorted(batch * n_frames * 160 / t for t in times)
    return {"config": name, "flags": flags, "batch": batch,
            "median_sps": sps[len(sps) // 2] if repeats % 2 else
            0.5 * (sps[repeats // 2 - 1] + sps[repeats // 2]),
            "min_sps": sps[0], "max_sps": sps[-1], "repeats": repeats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--nc", action="store_true", help="non-causal mode")
    ap.add_argument("--dc", action="store_true", help="DC-filter mode")
    ap.add_argument("--configs", default=None,
                    help="comma list to restrict the matrix")
    args = ap.parse_args()

    sel = set(args.configs.split(",")) if args.configs else None
    results = []
    for name, flags in CONFIGS:
        if sel and name not in sel:
            continue
        r = bench_config(name, flags, args.batch, args.frames,
                         args.repeats, args.nc, args.dc)
        results.append(r)
        rt = r["median_sps"] / (16000.0 * args.batch)
        lo = r["min_sps"] / (16000.0 * args.batch)
        hi = r["max_sps"] / (16000.0 * args.batch)
        print(f"{name:16s} median {r['median_sps'] / 1e6:6.2f} Ms/s "
              f"= {rt:.3f}x RT/stream  [{lo:.3f}, {hi:.3f}] "
              f"(n={args.repeats})", flush=True)
    mode = "nc" if args.nc else ("dc" if args.dc else "causal")
    for r in results:
        print(json.dumps({"kind": "plc_matrix", "mode": mode, **r}))


if __name__ == "__main__":
    main()
