#!/usr/bin/env python3
"""Decompose the vocoder training step's time on the real chip.

Times (a) the full train step, (b) forward-only loss, (c) the GRU-A
sequence recurrence alone fwd and fwd+bwd, and scan-unroll variants, to
find where the 157 ms at batch 128 goes (VERDICT round-2 weak #8).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.nn import layers as L
from lpcnet_tpu.train import train_lpcnet as T


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])  # sync via host fetch (NOTES.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / iters


def ablation_sweep(cfg, tc, params, batch, key, gru_states):
    """In-graph attribution: fwd+bwd time of the full loss with one
    component replaced by a cheap stand-in (models.lpcnet._abl); the delta
    vs 'none' is that component's cost inside the real compiled graph."""
    from lpcnet_tpu.train import losses as LL

    def make_vg(ablate):
        def loss(p, b, k, g):
            out = M.training_forward(p, cfg, b["sig_in"], b["features"],
                                     b["periods"], lpc=b["lpc"], rng=k,
                                     training=True, gru_states=g,
                                     ablate=ablate)
            if "loss" in ablate:
                return (jnp.sum(out["tree_probs"]) * 1e-6
                        + jnp.mean(out["tensor_preds"] ** 2) * 1e-6)
            return jnp.mean(LL.metric_cel_tree(
                b["sig_out"], out["tensor_preds"], out["tree_probs"]))
        return jax.jit(lambda p, b, k, g: jax.value_and_grad(
            lambda pp: loss(pp, b, k, g))(p))

    base = None
    for ab in ("none", "framenet", "preds", "embed", "gru_a", "gru_b",
               "head", "loss"):
        ablate = () if ab == "none" else (ab,)
        vg = make_vg(ablate)
        dt = timeit(vg, params, batch, key, gru_states)
        if ab == "none":
            base = dt
            print(f"ablate {ab:9s}: {dt*1e3:8.2f} ms")
        else:
            print(f"ablate {ab:9s}: {dt*1e3:8.2f} ms   "
                  f"(component ~{(base-dt)*1e3:6.2f} ms)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--ablate", action="store_true",
                    help="run the in-graph ablation sweep instead")
    args = ap.parse_args()

    cfg = M.LPCNetConfig()
    tc = T.TrainConfig(batch_size=args.batch, chunk_frames=args.frames)
    b, t = args.batch, args.frames * 160
    tf_ = args.frames + 4
    rng = np.random.default_rng(0)
    batch = {
        "sig_in": jnp.asarray(rng.standard_normal((b, t)) * 1000, jnp.float32),
        "sig_out": jnp.asarray(rng.standard_normal((b, t)) * 1000, jnp.float32),
        "features": jnp.asarray(rng.standard_normal((b, tf_, 20)), jnp.float32),
        "periods": jnp.asarray(rng.integers(40, 200, (b, tf_)), jnp.int32),
        "lpc": jnp.asarray(rng.standard_normal((b, args.frames, 16)) * 0.1,
                           jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params = M.init_params(key, cfg)
    gru_states = (jnp.zeros((b, cfg.rnn_units1)), jnp.zeros((b, cfg.rnn_units2)))

    if args.ablate:
        ablation_sweep(cfg, tc, params, batch, key, gru_states)
        return

    # --- full train step
    trainer = T.Trainer(cfg, tc)
    st = trainer.state
    ema = trainer._ema
    st, m, gs, ema = trainer._step(st, batch, key, gru_states, ema)  # compile
    # donated args: rebuild each call through the trainer path
    def run_full():
        nonlocal st, gs, ema
        st, m, gs, ema = trainer._step(st, batch, key, gs, ema)
        return m["loss"]
    for _ in range(2):
        run_full()
    out = run_full(); np.asarray(out)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        out = run_full()
    np.asarray(out)
    dt_full = (time.perf_counter() - t0) / n
    print(f"full train step:       {dt_full*1e3:8.2f} ms  ({1/dt_full:.2f} steps/s)")

    # --- forward-only loss
    fwd = jax.jit(lambda p, b, k, g: T.loss_fn(p, cfg, tc, b, k, g)[0])
    dt = timeit(fwd, params, batch, key, gru_states)
    print(f"forward loss only:     {dt*1e3:8.2f} ms")

    # --- value_and_grad without optimizer (keep a grad leaf live or XLA
    # dead-code-eliminates the whole backward)
    vg = jax.jit(lambda p, b, k, g: jax.value_and_grad(
        lambda pp: T.loss_fn(pp, cfg, tc, b, k, g)[0])(p))
    dt = timeit(vg, params, batch, key, gru_states)
    print(f"fwd+bwd (no opt):      {dt*1e3:8.2f} ms")

    # --- GRU-A recurrence alone
    rnn_in = jnp.asarray(rng.standard_normal((b, t, 3 * 128 + cfg.cond_size)),
                         jnp.float32)
    ga = params["gru_a"]
    for unroll in (1, 4, 8, 16):
        def gseq(p, x, h0, unroll=unroll):
            gate_in = jnp.matmul(x, p["kernel"],
                                 precision=jax.lax.Precision.DEFAULT) + p["bias"][0]
            def step(h, g):
                h2 = L.gru_precomputed_step(p, h, g, "tanh",
                                            jax.lax.Precision.DEFAULT)
                return h2, h2
            hT, hs = jax.lax.scan(step, h0, jnp.moveaxis(gate_in, -2, 0),
                                  unroll=unroll)
            return hs
        f = jax.jit(functools.partial(gseq))
        dt = timeit(f, ga, rnn_in, gru_states[0])
        g = jax.jit(lambda p, x, h0: jax.value_and_grad(
            lambda pp: jnp.sum(gseq(pp, x, h0)))(p)[0])
        dtg = timeit(g, ga, rnn_in, gru_states[0])
        print(f"gru_a seq unroll={unroll:2d}:  fwd {dt*1e3:8.2f} ms   fwd+bwd {dtg*1e3:8.2f} ms")

    # --- frame net + embeddings + pdf head cost (everything but GRUs)
    # time tree_to_pdf+mdense alone: dense pdf vs the target-path gather
    gru2 = jnp.asarray(rng.standard_normal((b, t, cfg.rnn_units2)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 256, (b, t)), jnp.int32)
    def head(p, x):
        from lpcnet_tpu.train import losses as LL
        pd = L.mdense(p["dual_fc"], x, "sigmoid",
                      precision=jax.lax.Precision.DEFAULT)
        return LL.tree_to_pdf(pd)
    f = jax.jit(head)
    dt = timeit(f, params, gru2)
    print(f"dualfc+tree_to_pdf:    {dt*1e3:8.2f} ms (fwd)")
    gh = jax.jit(lambda p, x: jax.grad(lambda pp: jnp.sum(head(pp, x)))(p)["dual_fc"]["kernel"])
    dt = timeit(gh, params, gru2)
    print(f"dualfc+tree_to_pdf:    {dt*1e3:8.2f} ms (fwd+bwd)")

    def head_tree(p, x, lab):
        from lpcnet_tpu.train import losses as LL
        pd = L.mdense(p["dual_fc"], x, "sigmoid",
                      precision=jax.lax.Precision.DEFAULT)
        return -jnp.log(jnp.clip(LL.tree_pdf_at(pd, lab), 1e-7, 1.0))
    f = jax.jit(head_tree)
    dt = timeit(f, params, gru2, labels)
    print(f"dualfc+tree_pdf_at:    {dt*1e3:8.2f} ms (fwd)")
    gh = jax.jit(lambda p, x, lab: jax.grad(
        lambda pp: jnp.sum(head_tree(pp, x, lab)))(p)["dual_fc"]["kernel"])
    dt = timeit(gh, params, gru2, labels)
    print(f"dualfc+tree_pdf_at:    {dt*1e3:8.2f} ms (fwd+bwd)")


if __name__ == "__main__":
    main()
