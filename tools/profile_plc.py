#!/usr/bin/env python3
"""On-chip cost decomposition of the fused batched-PLC frame step.

The mixed-loss PLC is frame-rate-bound (BENCHMARKS.md: int8 sample kernels
changed nothing), so this times each frame-rate component standalone at the
bench batch size, scan-amortized over many frames, with the host-fetch sync
methodology from bench.py. Components:

  burg     burg_cepstral_analysis on [B, 160]
  enc      compute_single_frame_features step
  fnet     one masked frame_network call (x9 per fused step)
  plcpred  one masked PLC-net prediction (x2 per fused step)
  tail80   one 80-step masked sampled Pallas call (x2 per fused step)
  tail160  one 160-step teacher-forced (sampled=False) call (x3 drain, worst
           case; typically inactive-masked but still dispatched)
  full     the fused causal step end-to-end

Usage: [LPCNET_BENCH_BATCH=256] python tools/profile_plc.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, n=50, warm=3, fetch=None):
    import jax
    for _ in range(warm):
        out = fn(*args)
    (fetch or (lambda o: np.asarray(jax.tree.leaves(o)[0]).ravel()[:4]))(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    (fetch or (lambda o: np.asarray(jax.tree.leaves(o)[0]).ravel()[:4]))(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:10s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.codec import features as F
    from lpcnet_tpu.dsp.burg import burg_cepstral_analysis
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc import batched as BP

    b = int(os.environ.get("LPCNET_BENCH_BATCH", "256"))
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    if os.environ.get("LPCNET_BENCH_INT8", "0").strip().lower() not in (
            "", "0", "false"):
        from lpcnet_tpu.nn import quantized as Q
        fused_k = Q.quantize_fused(fused)
        kw = K.kernel_weights(fused_k, cfg)
        print("(int8 kernel bundle)", flush=True)
    else:
        kw = K.kernel_weights(fused, cfg)
    rng = np.random.RandomState(0)
    pcm = jnp.asarray((rng.randn(b, 160) * 2000).astype(np.float32))

    # scan-amortize each component over n_inner iterations inside one jit
    N_IN = 20
    skip_standalone = os.environ.get("LPCNET_PLC_SKIP_STANDALONE", "0") != "0"

    def scanned(step):
        @jax.jit
        def run(*args):
            def body(c, _):
                return step(*c), 0
            c, _ = jax.lax.scan(body, args, None, length=N_IN)
            return c
        return run

    # --- burg ---------------------------------------------------------------
    if skip_standalone:
        return full_section(jax, jnp, np, os, b, cfg, fused, plc_params, kw,
                            pcm, rng, BP, N_IN)

    @scanned
    def burg_s(x):
        f = burg_cepstral_analysis(x)
        return (x.at[:, 0].add(f[:, 0] * 1e-6),)
    t = timed("burg", burg_s, pcm, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call", flush=True)

    # --- enc step -----------------------------------------------------------
    enc0 = F.init_encoder_state(b)

    @scanned
    def enc_s(enc, x):
        enc2, feats = F.compute_single_frame_features(enc, x)
        return enc2, x.at[:, 0].add(feats[:, 0] * 1e-6)
    t = timed("enc", enc_s, enc0, pcm, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call", flush=True)

    # --- frame net (masked wrapper like _fnet_masked) -------------------------
    s0 = None
    fstate = M.init_frame_state(b, cfg)
    feats36 = jnp.zeros((b, 36), jnp.float32)
    active = jnp.asarray(rng.rand(b) < 0.5)

    @scanned
    def fnet_s(fst, f36):
        new_f, _, ca, cb, lpc = M.frame_network(fused, fst, f36, cfg)
        fst2 = jax.tree.map(lambda n, o: jnp.where(
            active.reshape((b,) + (1,) * (n.ndim - 1)), n, o), new_f, fst)
        return fst2, f36.at[:, 0].add(ca[:, 0] * 1e-6)
    t = timed("fnet", fnet_s, fstate, feats36, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call (x9 per step)", flush=True)

    # --- fnet, bf16 MXU passes (precision A/B) -------------------------------
    @scanned
    def fnet_bf16_s(fst, f36):
        new_f, _, ca, cb, lpc = M.frame_network(fused, fst, f36, cfg,
                                                precision=jax.lax.Precision.DEFAULT)
        fst2 = jax.tree.map(lambda n, o: jnp.where(
            active.reshape((b,) + (1,) * (n.ndim - 1)), n, o), new_f, fst)
        return fst2, f36.at[:, 0].add(ca[:, 0] * 1e-6)
    t = timed("fnet_bf16", fnet_bf16_s, fstate, feats36, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call", flush=True)

    # --- plc pred -----------------------------------------------------------
    pstate = PM.init_state(b)
    inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)

    @scanned
    def plc_s(ps, x):
        ps2, pred = PM.compute_plc_pred(plc_params, ps, x)
        ps3 = jax.tree.map(lambda n, o: jnp.where(
            active.reshape((b,) + (1,) * (n.ndim - 1)), n, o), ps2, ps)
        return ps3, x.at[:, 0].add(pred[:, 0] * 1e-6)
    t = timed("plcpred", plc_s, pstate, inp, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call (x2 per step)", flush=True)

    # --- plc pred, bf16 MXU passes -------------------------------------------
    @scanned
    def plc_bf16_s(ps, x):
        ps2, pred = PM.compute_plc_pred(plc_params, ps, x,
                                        precision=jax.lax.Precision.DEFAULT)
        ps3 = jax.tree.map(lambda n, o: jnp.where(
            active.reshape((b,) + (1,) * (n.ndim - 1)), n, o), ps2, ps)
        return ps3, x.at[:, 0].add(pred[:, 0] * 1e-6)
    t = timed("plc_bf16", plc_bf16_s, pstate, inp, n=20)
    print(f"           = {t / N_IN * 1e3:.3f} ms/call", flush=True)

    # --- masked tails ---------------------------------------------------------
    sstate = M.init_sample_state(b, cfg)
    ca = jnp.zeros((b, 3 * cfg.rnn_units1), jnp.float32)
    cb = jnp.zeros((b, 3 * cfg.rnn_units2), jnp.float32)
    lpc = jnp.zeros((b, 16), jnp.float32)

    def tail_bench(n_samp, sampled, label, mult):
        pre = jnp.zeros((b, n_samp), jnp.float32)
        m = jnp.ones((b, n_samp), bool)
        tf = m if not sampled else jnp.zeros_like(m)

        @jax.jit
        def run(st):
            def body(c, _):
                st2, out = K.synthesize_frame_masked_pallas(
                    kw, c, ca, cb, lpc, pre, tf, m, cfg, n_samp,
                    sampled=sampled)
                return st2, 0
            c, _ = jax.lax.scan(body, st, None, length=N_IN)
            return c
        t = timed(label, run, sstate, n=20,
                  fetch=lambda o: np.asarray(o.deemph[:4]))
        print(f"           = {t / N_IN * 1e3:.3f} ms/call ({mult})", flush=True)

    tail_bench(80, True, "tail80", "x2 per step")
    tail_bench(160, False, "tail160tf", "x3 drain per step")

    # --- fast TF kernel (GRU-only prefix teacher-forcing) --------------------
    count = jnp.full((b,), 160, jnp.int32)
    tgt = jnp.asarray((rng.randn(b, 160) * 2000).astype(np.float32))

    @jax.jit
    def run_tf(st):
        def body(c, _):
            return K.teacher_force_prefix_pallas(
                kw, c, ca, cb, lpc, tgt, count, cfg, 160), 0
        c, _ = jax.lax.scan(body, st, None, length=N_IN)
        return c
    t = timed("tf_fast160", run_tf, sstate, n=20,
              fetch=lambda o: np.asarray(o.deemph[:4]))
    print(f"           = {t / N_IN * 1e3:.3f} ms/call (x3 drain per step)", flush=True)

    full_section(jax, jnp, np, os, b, cfg, fused, plc_params, kw, pcm,
                 rng, BP, N_IN)


def full_section(jax, jnp, np, os, b, cfg, fused, plc_params, kw, pcm, rng,
                 BP, N_IN):
    # --- full fused step -------------------------------------------------------
    plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b, fused_step=True)
    st = plc.init_state()
    lost = jnp.asarray(rng.rand(b) < 0.1)

    def make_full():
        @jax.jit
        def full(st):
            def body(c, _):
                c2, out = BP._plc_frame_step_fused(
                    c, fused, plc_params, pcm, lost, cfg, True, plc.delay,
                    plc.plc_buf_size, kw=kw)
                return c2, 0
            c, _ = jax.lax.scan(body, st, None, length=N_IN)
            return c
        return full

    t = timed("full", make_full(), st, n=10,
              fetch=lambda o: np.asarray(o.loss_count[:4]))
    print(f"           = {t / N_IN * 1e3:.3f} ms/step "
          f"(budget for 1x RT: 10 ms)")

    # --- in-graph ablation attribution (BP._ABLATE stand-ins) ---------------
    # LPCNET_PLC_ABLATE=1 sweeps every component; =name1,name2 runs a subset
    # (each variant is a fresh full-step compile, minutes each through the
    # tunnel); "ALL" ablates everything at once (the bookkeeping rump).
    abl = os.environ.get("LPCNET_PLC_ABLATE", "0")
    if abl != "0":
        names = (("burg", "enc", "fnet", "plcnet", "tf", "tails", "ALL")
                 if abl == "1" else tuple(abl.split(",")))
        base = t / N_IN
        print("\nablation attribution (full-step delta when the component "
              "is replaced by a stand-in inside the SAME compiled graph):",
              flush=True)
        everything = frozenset(("burg", "enc", "fnet", "plcnet", "tf",
                                "tails"))
        for name in names:
            BP._ABLATE = everything if name == "ALL" else frozenset({name})
            try:
                ta = timed(f"-{name}", make_full(), st, n=10,
                           fetch=lambda o: np.asarray(o.loss_count[:4]))
                if name == "ALL":
                    print(f"           bookkeeping rump = "
                          f"{ta / N_IN * 1e3:.3f} ms", flush=True)
                else:
                    print(f"           component ~"
                          f"{(base - ta / N_IN) * 1e3:7.3f}"
                          f" ms of {base * 1e3:.3f}", flush=True)
            finally:
                BP._ABLATE = frozenset()


if __name__ == "__main__":
    main()
