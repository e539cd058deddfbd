"""Throughput benchmark: batched neural synthesis on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North star (BASELINE.md): >=256 concurrent 16 kHz streams per chip, each
>1x real-time => >4.096 Msamples/s/chip aggregate. vs_baseline is the ratio
of measured aggregate samples/s to that 4.096 Msamples/s bar (the reference
C implementation is single-stream ~3 GFLOPS real-time on a desktop core;
its per-chip equivalent at 256 streams is the same bar).
"""

import json
import os
import sys
import time

import numpy as np


def _env_flag(name: str) -> bool:
    """Boolean env flag where '0'/''/'false' are off (so FLAG=0 disables)."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false")


def bench_synthesis(batch: int, n_frames: int, warmup_frames: int = 8,
                    kernel: str = "scan", return_all: bool = False):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.codec.decoder import _synthesize_one_frame
    from lpcnet_tpu.models import lpcnet as M

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    fstate = M.init_frame_state(batch, cfg)
    sstate = M.init_sample_state(batch, cfg)
    # realistic feature magnitudes (random conditioning; the compute path is
    # identical regardless of feature content)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(batch, 36).astype(np.float32) * 0.3)

    # NOTE: weights ride as jit ARGUMENTS and timing syncs via a host value
    # fetch -- closure constants serialize dispatch on the axon backend and
    # block_until_ready under-synchronizes there (see NOTES.md).
    if kernel in ("pallas", "q8"):
        from lpcnet_tpu.kernels import sample_loop as K
        if kernel == "q8":
            from lpcnet_tpu.nn import quantized as Q
            fused = Q.quantize_fused(fused)
        kw = K.kernel_weights(fused, cfg)

        @jax.jit
        def step(fs, ss, f, fused, kw):
            fs, _, ca, cb, lpc = M.frame_network(fused, fs, f, cfg)
            # honors LPCNET_KERNEL_MERGED / LPCNET_KERNEL_BT
            ss, pcm = K._synth_pallas(kw, ss, ca, cb, lpc, cfg, 160)
            return fs, ss, pcm

        run = lambda fs, ss: step(fs, ss, feats, fused, kw)
    else:
        step = jax.jit(lambda fs, ss, f, fused: _synthesize_one_frame(
            fused, cfg, fs, ss, f))
        run = lambda fs, ss: step(fs, ss, feats, fused)

    # warmup + state priming
    for _ in range(warmup_frames):
        fstate, sstate, pcm = run(fstate, sstate)
    np.asarray(pcm[0, :4])

    # median of N timed repeats (round-3 lesson: single-shot numbers carry
    # ~10% run-to-run spread; the headline should be the median)
    repeats = int(os.environ.get("LPCNET_BENCH_REPEATS", "3"))
    rates = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        for _ in range(n_frames):
            fstate, sstate, pcm = run(fstate, sstate)
        np.asarray(pcm[0, :4])     # hard sync: waits for the whole chain
        dt = time.perf_counter() - t0
        rates.append(batch * n_frames * 160 / dt)
    if return_all:
        return rates
    rates.sort()
    return rates[len(rates) // 2]


def bench_encode(batch: int, n_super: int, warmup: int = 3,
                 return_all: bool = False):
    """Feature extraction + full quantization throughput (superframes/s)."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.codec import features as F
    from lpcnet_tpu.codec.codebooks import load_codebooks
    from lpcnet_tpu.codec.encoder import encode_superframe

    cbs = load_codebooks()
    state = F.init_encoder_state(batch)
    rng = np.random.RandomState(0)
    pcm = jnp.asarray((rng.randn(batch, 640) * 3000).astype(np.float32))
    step = jax.jit(encode_superframe)
    for _ in range(warmup):
        state, feats, fields = step(state, pcm, cbs)
    np.asarray(fields["c0_id"])
    repeats = int(os.environ.get("LPCNET_BENCH_REPEATS", "1"))
    rates = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        for _ in range(n_super):
            state, feats, fields = step(state, pcm, cbs)
        np.asarray(fields["c0_id"])   # hard sync
        dt = time.perf_counter() - t0
        rates.append(batch * n_super * 640 / dt)   # input samples/s
    if return_all:
        return rates
    rates.sort()
    return rates[len(rates) // 2]


def bench_plc(batch: int, n_frames: int, warmup: int = 4, loss_rate=0.1,
              return_all: bool = False):
    """Mixed-loss batched PLC throughput (every stream its own pattern)."""
    import jax

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc.batched import BatchedPLC

    nc = _env_flag("LPCNET_BENCH_NC")                  # non-causal mode
    cfg = M.LPCNetConfig(lookahead=0) if nc else M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    # int8 (DOT_PROD numerics -- the reference's own inference default) is
    # the benched config; LPCNET_BENCH_INT8=0 selects bf16 for A/B
    if os.environ.get("LPCNET_BENCH_INT8", "1").strip().lower() not in (
            "", "0", "false"):
        from lpcnet_tpu.nn import quantized as Q
        fused = Q.quantize_fused(fused)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    plc = BatchedPLC(fused, cfg, plc_params, batch=batch, non_causal=nc,
                     remove_dc=_env_flag("LPCNET_BENCH_DC"),
                     fused_step=not _env_flag("LPCNET_BENCH_TWOPATH"))
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    chunk = 25
    warmup = chunk                      # warm up with one full chunk so the
    n_frames = max(chunk, n_frames // chunk * chunk)  # timed shapes are cached
    # inputs uploaded once before timing (input transfer is not part of the
    # workload; chunk slices then stay device-side)
    frames = jnp.asarray((rng.randn(batch, warmup + n_frames, 160) * 2000
                          ).astype(np.float32))
    losses = jnp.asarray(rng.rand(batch, warmup + n_frames) < loss_rate)
    frames_w, frames_t = frames[:, :warmup], frames[:, warmup:]
    losses_w, losses_t = losses[:, :warmup], losses[:, warmup:]
    jax.block_until_ready((frames_w, frames_t, losses_w, losses_t))
    wo = plc.run(frames_w, losses_w, chunk=chunk, device_out=True)
    np.asarray(wo[-1][0, -1, :4])   # also warms the slice-fetch executable
    repeats = int(os.environ.get("LPCNET_BENCH_REPEATS", "1"))
    rates = []
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        # keep outputs on device; sync via a host fetch of the last chunk's
        # final samples (same timing barrier as the synthesis bench -- output
        # transfer is not part of the workload, matching how the scan/pallas
        # synthesis benches are measured)
        outs = plc.run(frames_t, losses_t, chunk=chunk, device_out=True)
        np.asarray(outs[-1][0, -1, :4])
        dt = time.perf_counter() - t0
        assert sum(o.shape[1] for o in outs) == n_frames
        rates.append(batch * n_frames * 160 / dt)
    if return_all:
        return rates
    rates.sort()
    return rates[len(rates) // 2]


def bench_dred(batch: int, n_dframes: int, warmup: int = 4):
    """DRED redundancy coder throughput: per 20 ms, one encoder dframe
    (dred_rdovae_encode_dframe) AND one decoder qframe (decode_qframe) per
    stream -- the full send+receive neural cost of the redundancy loop.
    Returns audio samples/s covered (320 samples per dframe per stream)."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import rdovae as RV

    cfg = RV.RDOVAEConfig()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feats2 = jnp.asarray(rng.randn(batch, 2 * cfg.num_features
                                   ).astype(np.float32) * 0.3)

    @jax.jit
    def step(params, est, dst, f2):
        est, z, ini = RV.encode_dframe(params, est, f2, cfg)
        dst, feats = RV.decode_qframe(params, dst, z, cfg)
        return est, dst, z, feats

    est = RV.init_encoder_stream(batch, cfg)
    dst = RV.init_decoder_stream(params, jnp.zeros((batch, cfg.state_dim)),
                                 cfg)
    for _ in range(warmup):
        est, dst, z, feats = step(params, est, dst, feats2)
    np.asarray(feats[0, 0, :4])
    t0 = time.perf_counter()
    for _ in range(n_dframes):
        est, dst, z, feats = step(params, est, dst, feats2)
    np.asarray(feats[0, 0, :4])   # hard sync
    dt = time.perf_counter() - t0
    return batch * n_dframes * 320 / dt


def bench_train(batch: int, n_steps: int, warmup: int = 3):
    """Training-step throughput on the full default (384-unit) vocoder.

    Synthetic in-memory batches (LPCNetLoader shapes) isolate the step
    itself from disk IO. Two numbers per run:
      - pipelined: raw jitted step dispatched back-to-back (fetch at end) --
        the device-side compute rate;
      - synced: the real `Trainer.train_step` API, which fetches metrics to
        host every step (one tunnel round-trip per step).
    Returns (pipelined_steps_per_s, synced_steps_per_s).
    """
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.parallel import mesh as pmesh
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer

    tc = TrainConfig(batch_size=batch)
    trainer = Trainer(M.LPCNetConfig(), tc)
    rng = np.random.RandomState(0)
    nf = tc.chunk_frames
    batch_np = {
        "sig_in": (rng.randn(batch, nf * 160) * 3000).astype(np.float32),
        "sig_out": (rng.randn(batch, nf * 160) * 3000).astype(np.float32),
        "features": (rng.randn(batch, nf + 4, 20) * 0.3).astype(np.float32),
        "periods": rng.randint(40, 220, (batch, nf + 4)).astype(np.int32),
        "lpc": (rng.randn(batch, nf, 16) * 0.1).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)

    # --- synced (public API + a per-step host metric fetch, i.e. a
    # consumer that logs every step -- the pre-async-metrics behavior) ---
    for _ in range(warmup):
        float(trainer.train_step(batch_np, key)["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        float(trainer.train_step(batch_np, key)["loss"])
    synced = n_steps / (time.perf_counter() - t0)

    # --- pipelined (raw jitted step; sync once at the end) ---
    dbatch = pmesh.shard_batch(trainer.mesh,
                               {k: jnp.asarray(v) for k, v in batch_np.items()})
    state, gru, ema = trainer.state, trainer._gru_states, trainer._ema
    for _ in range(warmup):
        state, metrics, gru, ema = trainer._step(state, dbatch, key, gru, ema)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics, gru, ema = trainer._step(state, dbatch, key, gru, ema)
    float(metrics["loss"])   # hard sync on the chained result
    pipelined = n_steps / (time.perf_counter() - t0)
    return pipelined, synced


def main():
    # default = the flagship throughput config (1024 concurrent synthesis
    # streams, each still >1x real-time); override via env for other points
    batch = int(os.environ.get("LPCNET_BENCH_BATCH", "1024"))
    n_frames = int(os.environ.get("LPCNET_BENCH_FRAMES", "50"))
    # q8 = int8-MXU kernel, the reference's own default numerics (DOT_PROD);
    # "pallas" selects the bf16 kernel, "scan" the pure-XLA path
    kernel = os.environ.get("LPCNET_BENCH_KERNEL", "q8")
    mode = os.environ.get("LPCNET_BENCH_MODE", "synthesis")
    if mode == "plc":
        sps = bench_plc(batch, max(n_frames // 2, 10))
        baseline = 256 * 16000.0
        sfx = "_nc" if _env_flag("LPCNET_BENCH_NC") else ""
        sfx += "_dc" if _env_flag("LPCNET_BENCH_DC") else ""
        print(json.dumps({
            "metric": f"plc_mixed_loss_samples_per_sec_chip_b{batch}{sfx}",
            "value": round(sps, 1), "unit": "samples/s",
            "vs_baseline": round(sps / baseline, 4),
            "per_stream_rtf": round(sps / batch / 16000.0, 4),
            "streams": batch,
        }))
        return
    if mode == "dred":
        sps = bench_dred(batch, max(n_frames, 25))
        baseline = 256 * 16000.0
        print(json.dumps({
            "metric": f"dred_encdec_samples_per_sec_chip_b{batch}",
            "value": round(sps, 1), "unit": "samples/s",
            "vs_baseline": round(sps / baseline, 4),
            "per_stream_rtf": round(sps / batch / 16000.0, 4),
            "streams": batch,
        }))
        return
    if mode == "train":
        tb = int(os.environ.get("LPCNET_BENCH_BATCH", "128"))
        pipelined, synced = bench_train(tb, max(n_frames // 2, 20))
        sps = pipelined * tb * 15 * 160
        # vs_baseline: seconds of 16 kHz speech consumed per wall second
        # (the reference trains batch-128 2400-sample chunks on a 1080 Ti,
        # training_tf2/train_lpcnet.py:51-52; no published steps/s)
        print(json.dumps({
            "metric": f"train_steps_per_sec_chip_b{tb}",
            "value": round(pipelined, 3), "unit": "steps/s",
            "vs_baseline": round(sps / 16000.0, 3),
            "samples_per_sec": round(sps, 1),
            "synced_steps_per_sec": round(synced, 3),
            "batch": tb,
        }))
        return
    if mode == "encode":
        sps = bench_encode(batch, max(n_frames // 4, 5))
        baseline = 256 * 16000.0
        print(json.dumps({
            "metric": f"encode_samples_per_sec_chip_b{batch}",
            "value": round(sps, 1), "unit": "samples/s",
            "vs_baseline": round(sps / baseline, 4),
            "streams": batch,
        }))
        return
    try:
        sps = bench_synthesis(batch, n_frames, kernel=kernel)
    except Exception as e:
        if kernel in ("pallas", "q8"):
            print(f"{kernel} path failed ({type(e).__name__}); falling back to scan",
                  file=sys.stderr)
            kernel = "scan"
            sps = bench_synthesis(batch, n_frames, kernel=kernel)
        else:
            raise
    baseline = 256 * 16000.0   # 256 real-time 16 kHz streams per chip
    rtf = sps / batch / 16000.0
    result = {
        "metric": f"synthesis_samples_per_sec_chip_b{batch}_{kernel}",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / baseline, 4),
        "per_stream_rtf": round(rtf, 4),
        "streams": batch,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
