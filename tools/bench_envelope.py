#!/usr/bin/env python3
"""Serving envelope: synthesis + encoder + mixed-loss PLC across batch
sizes, all in ONE session with N timed repeats per point.

Round-3 lesson (BENCHMARKS.md): cross-session numbers on the tunnel carry
~10-40% spread; only same-session medians with recorded min/max are
decision-grade.  This tool produces the round-5 "serving envelope" table:
per config, aggregate samples/s (median [min, max] over N repeats),
per-stream real-time factor, and per-frame dispatch latency (the time one
160-sample frame step takes at that batch -- the latency a serving layer
would add per 10 ms hop).

Usage: python tools/bench_envelope.py [--repeats 5] [--out FILE.md]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stats(rates):
    rates = sorted(rates)
    return rates[len(rates) // 2], rates[0], rates[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--synth-batches", default="256,512,1024,2048")
    ap.add_argument("--enc-batches", default="256,512,1024")
    ap.add_argument("--plc-batches", default="256,512,1024")
    ap.add_argument("--out", default="artifacts/bench_envelope_r5.md")
    args = ap.parse_args()
    os.environ["LPCNET_BENCH_REPEATS"] = str(args.repeats)

    import bench

    rows = []

    def add(workload, batch, rates, frame_samples):
        med, lo, hi = stats(rates)
        rtf = med / batch / 16000.0
        # per-frame latency: one frame-step dispatch at this batch
        lat_ms = batch * frame_samples / med * 1000.0
        rows.append({
            "workload": workload, "batch": batch,
            "median_msps": med / 1e6, "min_msps": lo / 1e6,
            "max_msps": hi / 1e6, "rtf": rtf, "frame_latency_ms": lat_ms,
        })
        print(f"{workload} B={batch}: {med/1e6:.2f} Ms/s "
              f"[{lo/1e6:.2f}, {hi/1e6:.2f}] rtf/stream {rtf:.2f} "
              f"frame latency {lat_ms:.2f} ms", flush=True)

    for b in [int(x) for x in args.synth_batches.split(",") if x]:
        t0 = time.time()
        rates = bench.bench_synthesis(b, args.frames, kernel="q8",
                                      return_all=True)
        print(f"  (synthesis b{b} section {time.time()-t0:.0f}s)",
              flush=True)
        add("synthesis_q8", b, rates, 160)

    for b in [int(x) for x in args.enc_batches.split(",") if x]:
        rates = bench.bench_encode(b, max(args.frames // 4, 5),
                                   return_all=True)
        add("encoder", b, rates, 640)

    for nc in (False, True):
        os.environ["LPCNET_BENCH_NC"] = "1" if nc else "0"
        for b in [int(x) for x in args.plc_batches.split(",") if x]:
            rates = bench.bench_plc(b, max(args.frames // 2, 25),
                                    return_all=True)
            add("plc_nc" if nc else "plc_causal", b, rates, 160)

    with open(args.out, "w") as f:
        f.write("# Serving envelope (one session, N=%d repeats/point)\n\n"
                % args.repeats)
        f.write("| workload | B | Ms/s median [min, max] | RTF/stream | "
                "frame latency ms |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['workload']} | {r['batch']} | "
                    f"{r['median_msps']:.2f} [{r['min_msps']:.2f}, "
                    f"{r['max_msps']:.2f}] | {r['rtf']:.2f} | "
                    f"{r['frame_latency_ms']:.2f} |\n")
        f.write("\nJSON: " + json.dumps(rows) + "\n")
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
