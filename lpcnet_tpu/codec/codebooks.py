"""Cepstral VQ codebooks: loading and (re)training.

The reference ships codebooks as generated C arrays (ceps_codebooks.c,
trained offline by src/ceps_vq_train.c:433+). Here they are an .npz with
keys ceps_codebook1/2/3 ([1024, 17]) and ceps_codebook_diff4 ([4096, 18]).
A deterministic stand-in set ships as package data; train real ones from a
feature corpus with ``train_codebooks``.

Trainer fidelity vs the reference (src/ceps_vq_train.c):

* Stage codebooks use the reference's LBG recipe (``vq_train``, :339-367):
  global-mean init, perturbation split-doubling, 4 Lloyd updates per
  doubling, 20 final updates; stages 2/3 train on the greedy-assignment
  residuals of the previous stages (:488-534).
* Beyond the reference, an **m-best-aware refinement** then coordinate-
  descent-updates all three stage books from the *runtime's* joint beam
  assignments (quantize.quantize_3stage_mbest) -- the trainer the reference
  uses is greedy-1-best per stage while its encoder beams (src/lpcnet_enc.c
  :133-241), so its books are trained for a different quantizer than the one
  that uses them.
* The diff codebook replicates ``vq_train_multi`` with sign search
  (:368-403, :113-296 update_multi): every entry i evaluates against the
  residual of its own predictor group (i&3 of [mean, mean, left, right]) in
  both signs, and Lloyd updates fold the sign in; residual targets are built
  against the *3-stage-quantized* endpoints (qdata, :537-562), computed here
  with the runtime beam quantizer.

All heavy steps are [N, K] distance GEMMs on the MXU; nothing is scalar.
"""

from __future__ import annotations

import functools
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


def _dist2(x, codes):
    return (jnp.sum(x * x, axis=1, keepdims=True) - 2.0 * x @ codes.T
            + jnp.sum(codes * codes, axis=1))


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd(data, codes, iters: int):
    """`iters` Lloyd updates: one [N, K] distance GEMM + one-hot mean each.
    Empty cells keep their centroid (the reference divides by zero there and
    reports the count instead, :226-250)."""
    n_codes = codes.shape[0]

    def step(codes, _):
        d2 = _dist2(data, codes)
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, n_codes, dtype=data.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ data
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), codes)
        return new, jnp.sum(jnp.min(d2, axis=1))

    codes, errs = jax.lax.scan(step, codes, None, length=iters)
    return codes, errs


def _lbg_train(data, n_codes: int, key, split_updates: int = 4,
               final_updates: int = 20):
    """Reference LBG recipe (vq_train, src/ceps_vq_train.c:339-367):
    mean init, +-delta perturbation split to double, `split_updates` Lloyd
    iterations per doubling, `final_updates` at full size."""
    codes = jnp.mean(data, axis=0, keepdims=True)
    e = 1
    while e < n_codes:
        key, sub = jax.random.split(key)
        delta = 0.01 * (jax.random.uniform(sub, codes.shape) - 0.5)
        codes = jnp.concatenate([codes + delta, codes - delta], axis=0)
        e <<= 1
        codes, _ = _lloyd(data, codes, split_updates)
    codes, _ = _lloyd(data, codes, final_updates)
    return codes


@jax.jit
def _beam_assign(x, cb1, cb2, cb3):
    """Joint (i1, i2, i3) from the runtime's m-best beam, vmapped."""
    from .quantize import quantize_3stage_mbest
    idx, recon = jax.vmap(
        lambda v: quantize_3stage_mbest(v, cb1, cb2, cb3))(x)
    return idx, recon


@jax.jit
def _mbest_refine_once(x, cb1, cb2, cb3):
    """One coordinate-descent Lloyd pass on the additive 3-stage model using
    the runtime beam's joint assignments: each stage's entry moves to the
    mean of (x - other stages' contributions) over its beam assignments."""
    idx, _ = _beam_assign(x, cb1, cb2, cb3)

    def upd(cb, k, others):
        one_hot = jax.nn.one_hot(idx[:, k], cb.shape[0], dtype=x.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = one_hot.T @ (x - others)
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts[:, None], 1.0), cb)

    c2 = cb2[idx[:, 1]]
    c3 = cb3[idx[:, 2]]
    cb1 = upd(cb1, 0, c2 + c3)
    c1 = cb1[idx[:, 0]]
    cb2 = upd(cb2, 1, c1 + c3)
    c2 = cb2[idx[:, 1]]
    cb3 = upd(cb3, 2, c1 + c2)
    return cb1, cb2, cb3


def _diff_residuals(mid, left, right):
    """Residual of the mid frame vs each predictor group [N, 4, 18]
    (multi_data2 layout, src/ceps_vq_train.c:551-562: groups 0 and 1 are
    both the mean predictor, 2 = left endpoint, 3 = right endpoint)."""
    mean = 0.5 * (left + right)
    return jnp.stack([mid - mean, mid - mean, mid - left, mid - right],
                     axis=1)


@functools.partial(jax.jit, static_argnames=("iters",))
def _lloyd_multi_sign(res, codes, iters: int):
    """Sign-folded multi-predictor Lloyd (update_multi with sign=1,
    src/ceps_vq_train.c:255-296): entry i scores against res[:, i&3] in both
    signs; updates accumulate sign * residual-of-own-group."""
    n_codes = codes.shape[0]
    group = jnp.arange(n_codes) & 3                       # [K]

    def step(codes, _):
        cross = jnp.einsum("ngd,kd->ngk", res, codes)     # [N, 4, K]
        cross_g = cross[:, group, jnp.arange(n_codes)]    # [N, K]
        rsq = jnp.sum(res * res, axis=2)                  # [N, 4]
        rsq_g = rsq[:, group]                             # [N, K]
        csq = jnp.sum(codes * codes, axis=1)              # [K]
        d_pos = rsq_g - 2.0 * cross_g + csq
        d_neg = rsq_g + 2.0 * cross_g + csq
        entry = jnp.argmin(jnp.concatenate([d_pos, d_neg], axis=1), axis=1)
        idx = entry % n_codes
        sign = jnp.where(entry < n_codes, 1.0, -1.0).astype(res.dtype)
        res_sel = res[jnp.arange(res.shape[0]), idx & 3]  # [N, 18]
        one_hot = jax.nn.one_hot(idx, n_codes, dtype=res.dtype)
        counts = jnp.sum(one_hot, axis=0)
        sums = (one_hot * sign[:, None]).T @ res_sel
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), codes)
        err = jnp.sum(jnp.minimum(jnp.min(d_pos, axis=1),
                                  jnp.min(d_neg, axis=1)))
        return new, err

    codes, errs = jax.lax.scan(step, codes, None, length=iters)
    return codes, errs


def _train_multi_sign(res, n_codes: int, key, split_updates: int = 4,
                      final_updates: int = 20, init_updates: int = 10):
    """vq_train_multi (src/ceps_vq_train.c:368-403): per-group mean init
    (+perturbation), 10 updates at size 4, split-doubling with 4 updates
    each, 20 final updates."""
    key, sub = jax.random.split(key)
    codes = jnp.mean(res, axis=0)                         # [4, 18] group means
    codes = codes + 0.01 * (jax.random.uniform(sub, codes.shape) - 0.5)
    codes, _ = _lloyd_multi_sign(res, codes, init_updates)
    e = 4
    while e < n_codes:
        key, sub = jax.random.split(key)
        delta = 0.01 * (jax.random.uniform(sub, codes.shape) - 0.5)
        # the reference appends the second child at offset e (:160-171);
        # e is a multiple of 4 so (i+e)&3 == i&3 and groups are preserved
        codes = jnp.concatenate([codes + delta, codes - delta], axis=0)
        e <<= 1
        codes, _ = _lloyd_multi_sign(res, codes, split_updates)
    codes, _ = _lloyd_multi_sign(res, codes, final_updates)
    return codes


def quantization_mse(features: np.ndarray, cb: Codebooks) -> dict:
    """Measure endpoint + diff quantization MSE with the *runtime*
    quantizers on a feature corpus -- the apples-to-apples figure for
    comparing codebook sets."""
    from .quantize import quantize_3stage_mbest, quantize_diff
    f = jnp.asarray(np.asarray(features)[:, :18], jnp.float32)
    n = (f.shape[0] - 4) // 4 * 4
    ends = f[3:3 + n:4]
    x = ends[:, 1:]
    _, recon = _beam_assign(x, cb.stage1, cb.stage2, cb.stage3)
    stage_mse = float(jnp.mean(jnp.sum((x - recon) ** 2, axis=1)))
    qends = jnp.concatenate([ends[:, :1], recon], axis=1)
    mid = f[5:5 + n - 4:4]
    left, right = qends[:-1][: mid.shape[0]], qends[1:][: mid.shape[0]]
    _, drecon = jax.vmap(
        lambda m, l, r: quantize_diff(m, l, r, cb.diff4))(mid, left, right)
    diff_mse = float(jnp.mean(jnp.sum((mid - drecon) ** 2, axis=1)))
    return {"stage_mse": stage_mse, "diff_mse": diff_mse}


def train_codebooks(features: np.ndarray, key=None, split_updates: int = 4,
                    final_updates: int = 20, mbest_refine: int = 4,
                    stage_codes: int = 1024, diff_codes: int = 4096
                    ) -> Codebooks:
    """Train the 3-stage + diff codebooks from a feature corpus.

    Args:
      features: [N, >=18] feature frames (unquantized), as produced by
        codec.features.compute_features / the dump_data pipeline.
      mbest_refine: joint coordinate-descent passes using the runtime's
        m-best beam assignments after the reference LBG recipe (0 disables).

    Layout matches the codec (src/lpcnet_enc.c:704-711): stage books cover
    cepstral dims 1..17 of the absolutely-coded endpoint frames (every 4th,
    offset 3); the diff book covers the mid frame (offset +2 between
    consecutive endpoints) against the 4 interpolation predictors with sign,
    targeting residuals vs the *quantized* endpoints.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    f = jnp.asarray(np.asarray(features)[:, :18], jnp.float32)
    n = (f.shape[0] - 4) // 4 * 4
    ends = f[3:3 + n:4]                         # frames coded absolutely
    x = ends[:, 1:]                             # [M, 17]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cb1 = _lbg_train(x, stage_codes, k1, split_updates, final_updates)
    r1 = x - cb1[jnp.argmin(_dist2(x, cb1), axis=1)]
    cb2 = _lbg_train(r1, stage_codes, k2, split_updates, final_updates)
    r2 = r1 - cb2[jnp.argmin(_dist2(r1, cb2), axis=1)]
    cb3 = _lbg_train(r2, stage_codes, k3, split_updates, final_updates)
    for _ in range(mbest_refine):
        cb1, cb2, cb3 = _mbest_refine_once(x, cb1, cb2, cb3)

    # diff codebook targets: mid frame vs predictors built from the
    # *quantized* endpoints (reference qdata, :537-562), with c0 carried
    # through unquantized like the reference (qdata[i*ndim] = data[i*ndim])
    _, recon = _beam_assign(x, cb1, cb2, cb3)
    qends = jnp.concatenate([ends[:, :1], recon], axis=1)   # [M, 18]
    mid = f[5:5 + n - 4:4]                      # midpoints between endpoints
    left = qends[:-1][: mid.shape[0]]
    right = qends[1:][: mid.shape[0]]
    res = _diff_residuals(mid, left, right)     # [N, 4, 18]
    cb_diff = _train_multi_sign(res, diff_codes, k4, split_updates,
                                final_updates)
    return Codebooks(cb1, cb2, cb3, cb_diff)


def main(argv=None):
    """CLI replacing the reference's offline VQ trainer (src/ceps_vq_train.c):
    train codebooks from a feature file produced by dump_data."""
    import argparse

    ap = argparse.ArgumentParser(prog="lpcnet_tpu.codec.codebooks")
    ap.add_argument("features", help="f32 feature file (36 floats/frame)")
    ap.add_argument("output", help="output .npz codebook file")
    ap.add_argument("--split-updates", type=int, default=4)
    ap.add_argument("--final-updates", type=int, default=20)
    ap.add_argument("--mbest-refine", type=int, default=4)
    ap.add_argument("--max-frames", type=int, default=200000)
    ap.add_argument("--eval", action="store_true",
                    help="report runtime-quantizer MSE for the trained set "
                         "and the currently shipped set")
    args = ap.parse_args(argv)

    feats = np.fromfile(args.features, np.float32).reshape(-1, 36)
    feats = feats[: args.max_frames]
    cb = train_codebooks(feats, split_updates=args.split_updates,
                         final_updates=args.final_updates,
                         mbest_refine=args.mbest_refine)
    save_codebooks(args.output, cb)
    print(f"trained codebooks from {len(feats)} frames -> {args.output}")
    if args.eval:
        print("trained:", quantization_mse(feats, cb))
        print("shipped:", quantization_mse(feats, load_codebooks()))
    return 0


if __name__ == "__main__":
    main()
