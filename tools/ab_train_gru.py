#!/usr/bin/env python3
"""A/B the training GRU recurrence: lax.scan vs the Pallas kernel, both the
recurrence alone and the full train step (set LPCNET_TRAIN_GRU before launch
for the full-step arm)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.nn import layers as L


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / iters


def main():
    b, t, n = 128, 2400, 384
    cfg = M.LPCNetConfig()
    rng = np.random.default_rng(0)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    ga = params["gru_a"]
    x = jnp.asarray(rng.standard_normal((b, t, 3 * 128 + cfg.cond_size)),
                    jnp.float32)
    h0 = jnp.zeros((b, n), jnp.float32)

    from lpcnet_tpu.kernels.gru_train import gru_seq_pallas

    def loss_of(seqfn):
        def f(p, x, h0):
            hs, _ = seqfn(p, x, h0=h0)
            return jnp.sum(hs * hs)
        return f

    for name, fn in (("scan", L.gru_seq), ("pallas", gru_seq_pallas)):
        fwd = jax.jit(lambda p, x, h0, fn=fn: fn(p, x, h0=h0)[0])
        dt_f = timeit(fwd, ga, x, h0)
        vg = jax.jit(jax.value_and_grad(loss_of(fn)))
        dt_g = timeit(vg, ga, x, h0)
        print(f"gru_a {name:7s}: fwd {dt_f*1e3:8.2f} ms   "
              f"fwd+bwd {dt_g*1e3:8.2f} ms")
        # numeric check pallas vs scan
    hs_s, ht_s = jax.jit(lambda p, x, h0: L.gru_seq(p, x, h0=h0))(ga, x, h0)
    hs_p, ht_p = jax.jit(lambda p, x, h0: gru_seq_pallas(p, x, h0=h0))(ga, x, h0)
    d = np.abs(np.asarray(hs_s) - np.asarray(hs_p))
    print(f"fwd |scan-pallas| max {d.max():.3e} mean {d.mean():.3e}")
    g_s = jax.jit(jax.grad(loss_of(L.gru_seq)))(ga, x, h0)
    g_p = jax.jit(jax.grad(loss_of(gru_seq_pallas)))(ga, x, h0)
    for k in ("kernel", "recurrent"):
        a, bb = np.asarray(g_s[k]), np.asarray(g_p[k])
        rel = np.abs(a - bb).max() / (np.abs(a).max() + 1e-9)
        print(f"grad[{k}] rel-max diff {rel:.3e}")


if __name__ == "__main__":
    main()
