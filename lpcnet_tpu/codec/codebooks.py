"""Cepstral VQ codebooks: loading and (re)training.

The reference ships codebooks as generated C arrays (ceps_codebooks.c,
trained offline by src/ceps_vq_train.c:433+). Here they are an .npz with
keys ceps_codebook1/2/3 ([1024, 17]) and ceps_codebook_diff4 ([4096, 18]).
A deterministic stand-in set ships as package data; train real ones from a
feature corpus with ``train_codebooks``.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_DEFAULT_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "data", "codebooks.npz")


class Codebooks(NamedTuple):
    stage1: jnp.ndarray   # [1024, 17]
    stage2: jnp.ndarray   # [1024, 17]
    stage3: jnp.ndarray   # [1024, 17]
    diff4: jnp.ndarray    # [4096, 18]


def load_codebooks(path: str | None = None) -> Codebooks:
    d = np.load(path or _DEFAULT_PATH)
    return Codebooks(
        stage1=jnp.asarray(d["ceps_codebook1"]),
        stage2=jnp.asarray(d["ceps_codebook2"]),
        stage3=jnp.asarray(d["ceps_codebook3"]),
        diff4=jnp.asarray(d["ceps_codebook_diff4"]),
    )


def save_codebooks(path: str, cb: Codebooks) -> None:
    np.savez(path, ceps_codebook1=np.asarray(cb.stage1),
             ceps_codebook2=np.asarray(cb.stage2),
             ceps_codebook3=np.asarray(cb.stage3),
             ceps_codebook_diff4=np.asarray(cb.diff4))


def _kmeans(data: jnp.ndarray, n_codes: int, iters: int, key) -> jnp.ndarray:
    """Batched k-means on TPU: one [N, K] distance matmul per iteration.

    Replaces the reference's offline scalar trainer (src/ceps_vq_train.c).
    """
    n = data.shape[0]
    perm = jax.random.permutation(key, n)[:n_codes]
    codes = data[perm]

    def step(codes, _):
        d2 = (jnp.sum(data * data, axis=1, keepdims=True)
              - 2.0 * data @ codes.T + jnp.sum(codes * codes, axis=1))
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, n_codes, dtype=data.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ data
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), codes)
        return new, jnp.sum(jnp.min(d2, axis=1))

    codes, _ = jax.lax.scan(step, codes, None, length=iters)
    return codes


def train_codebooks(features: np.ndarray, key=None, iters: int = 30) -> Codebooks:
    """Train the 3-stage + diff codebooks from a feature corpus.

    Args:
      features: [N, >=36] feature frames (unquantized), as produced by
        codec.features.compute_features.

    The layout matches the reference's codec design: stage codebooks cover
    cepstral dims 1..17 of every 4th frame; the diff codebook covers the
    4 interpolation-predictor residuals of the middle frame
    (src/lpcnet_enc.c:704-711).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    f = jnp.asarray(features[:, :18], jnp.float32)
    n = (f.shape[0] // 4) * 4
    f = f[:n]
    endpoints = f[3::4]                          # frames coded absolutely
    x = endpoints[:, 1:]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cb1 = _kmeans(x, 1024, iters, k1)
    r1 = x - cb1[jnp.argmin(_dist2(x, cb1), axis=1)]
    cb2 = _kmeans(r1, 1024, iters, k2)
    r2 = r1 - cb2[jnp.argmin(_dist2(r1, cb2), axis=1)]
    cb3 = _kmeans(r2, 1024, iters, k3)

    # diff codebook: residual of the mid frame vs the mean predictor
    mid = f[1::4]
    left = jnp.concatenate([f[:1], f[3:-4:4]], axis=0)[: mid.shape[0]]
    right = endpoints[: mid.shape[0]]
    target = mid - 0.5 * (left + right)
    cb_diff = _kmeans(target, 4096, iters, k4)
    return Codebooks(cb1, cb2, cb3, cb_diff)


def _dist2(x, codes):
    return (jnp.sum(x * x, axis=1, keepdims=True) - 2.0 * x @ codes.T
            + jnp.sum(codes * codes, axis=1))


def main(argv=None):
    """CLI replacing the reference's offline VQ trainer (src/ceps_vq_train.c):
    train codebooks from a feature file produced by dump_data."""
    import argparse

    ap = argparse.ArgumentParser(prog="lpcnet_tpu.codec.codebooks")
    ap.add_argument("features", help="f32 feature file (36 floats/frame)")
    ap.add_argument("output", help="output .npz codebook file")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--max-frames", type=int, default=200000)
    args = ap.parse_args(argv)

    feats = np.fromfile(args.features, np.float32).reshape(-1, 36)
    feats = feats[: args.max_frames]
    cb = train_codebooks(feats, iters=args.iters)
    save_codebooks(args.output, cb)
    print(f"trained codebooks from {len(feats)} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    main()
