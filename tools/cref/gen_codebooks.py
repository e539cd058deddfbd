#!/usr/bin/env python3
"""Generate deterministic pseudo-random cepstral VQ codebooks.

The reference ships its trained codebooks in a generated file
(ceps_codebooks.c, produced offline by src/ceps_vq_train.c) which is not in
the source tree. For cross-implementation parity testing the *values* do not
matter -- only that the C fixture generator and the JAX codec share them --
so we synthesize deterministic codebooks with realistic scale and emit both
a C source file and an .npz consumed by lpcnet_tpu.codec.

Real deployments train proper codebooks with lpcnet_tpu.codec.vq_train.
"""

import argparse
import os

import numpy as np

NB_BANDS = 18
NB_BANDS_1 = 17


def make_codebooks(seed: int = 1234):
    rng = np.random.RandomState(seed)
    # Cepstral values are roughly in [-4, 4]; stage scales shrink.
    cb1 = (rng.randn(1024, NB_BANDS_1) * 1.2).astype(np.float32)
    cb2 = (rng.randn(1024, NB_BANDS_1) * 0.5).astype(np.float32)
    cb3 = (rng.randn(1024, NB_BANDS_1) * 0.25).astype(np.float32)
    diff4 = (rng.randn(4096, NB_BANDS) * 0.6).astype(np.float32)
    return cb1, cb2, cb3, diff4


def emit_c(path, arrays):
    names = ["ceps_codebook1", "ceps_codebook2", "ceps_codebook3",
             "ceps_codebook_diff4"]
    with open(path, "w") as f:
        f.write("/* Auto-generated deterministic stand-in codebooks"
                " (tools/cref/gen_codebooks.py). */\n\n")
        for name, arr in zip(names, arrays):
            flat = arr.reshape(-1)
            f.write(f"float {name}[{len(flat)}] = {{\n")
            f.write(",\n".join(
                ", ".join(f"{v:.9g}f" for v in flat[i:i + 8])
                for i in range(0, len(flat), 8)))
            f.write("\n};\n\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c-out", default=None)
    ap.add_argument("--npz-out", default=None)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--from-npz", default=None,
                    help="use codebooks from this npz (e.g. real xiph tables "
                         "dropped in artifacts/xiph/ceps_codebooks.npz) "
                         "instead of synthesizing")
    args = ap.parse_args()
    if args.from_npz:
        d = np.load(args.from_npz)
        cb1, cb2, cb3, diff4 = (d["ceps_codebook1"], d["ceps_codebook2"],
                                d["ceps_codebook3"], d["ceps_codebook_diff4"])
    else:
        cb1, cb2, cb3, diff4 = make_codebooks(args.seed)
    if args.c_out:
        emit_c(args.c_out, [cb1, cb2, cb3, diff4])
    if args.npz_out:
        os.makedirs(os.path.dirname(args.npz_out), exist_ok=True)
        np.savez(args.npz_out, ceps_codebook1=cb1, ceps_codebook2=cb2,
                 ceps_codebook3=cb3, ceps_codebook_diff4=diff4)


if __name__ == "__main__":
    main()
