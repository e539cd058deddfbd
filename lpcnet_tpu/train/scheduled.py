"""Sampled-feedback (scheduled-sampling) history for vocoder fine-tuning.

Round-4 diagnosis (BENCHMARKS.md): teacher-forced training is exhausted --
TF val loss improves monotonically over 120k steps while free-running
band-LSD plateaus, because sampling errors compound through the LPC
feedback (exposure bias).  The reference's only defense is noise injection
in the data (src/dump_data.c:69-108, already ported byte-faithfully); this
module is the TPU-era continuation of that idea: for a scheduled fraction
of each training chunk, the signal history fed to the network is the
model's OWN sampled output instead of the ground truth, and the loss
teaches the excitation pdf to steer back toward the true signal from its
own (erroneous) trajectory.

Mechanics (two passes inside the jitted train step):

1. Free-running pass (no gradient): fuse the current params the way
   inference does (models.lpcnet.fuse_inference_params), then run the
   per-sample AR sampler over the chunk with a per-sample Bernoulli
   teacher-force mask -- exactly the C `preload` resync semantics
   (src/lpcnet.c:256-259) that the masked synthesis path already
   implements.  Teacher-forced samples pin the trajectory to the target
   audio, so a mask probability q keeps the sampled trajectory within
   ~1/(1-q) samples of the data manifold while still exposing the model to
   its own feedback.

2. Gradient pass: the standard teacher-forced training graph, but with the
   u-law signal-history input replaced (where pass 1 sampled) by the
   sampled signal.  The LPC prediction is recomputed from the mixed
   history, so the target excitation for a sampled-history position is
   lin2ulaw(sig_true - pred(mixed)) -- the correction that brings the
   output back to the truth.  Gradients stop at the sampled feedback
   (standard scheduled-sampling practice; the sampler is not
   differentiable anyway).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..dsp.constants import PREEMPHASIS
from ..models import lpcnet as M
from ..nn import layers as nn
from ..utils.rng import Kiss99State


def deemphasis_seq(x, axis: int = -1):
    """Run the decoder's de-emphasis IIR out[t] = x[t] + P*out[t-1] over a
    whole sequence via an associative scan (first-order LTI as (A, B) pair
    composition), O(log T) depth instead of a T-step scan."""
    a = jnp.full(x.shape, PREEMPHASIS, x.dtype)

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, a2 * b1 + b2

    _, out = jax.lax.associative_scan(combine, (a, x), axis=axis)
    return out


def _use_pallas() -> bool:
    mode = os.environ.get("LPCNET_SS_KERNEL", "auto")
    if mode in ("scan", "0"):
        return False
    if mode in ("kernel", "1"):
        return True
    dd = jax.config.jax_default_device
    if dd is not None and dd.platform == "cpu":
        return False
    return jax.default_backend() not in ("cpu",)


def sampled_signal(params, cfg: M.LPCNetConfig, batch, tf_mask, rng,
                   gru_states=None, weighting=None):
    """Pass 1: the model's own sampled trajectory over a training chunk.

    Args:
      batch: dict with sig_out [B, T] (clean target, preemphasized domain),
        features [B, Tf, >=20], periods [B, Tf], lpc [B, T//160, 16].
      tf_mask: [B, T] bool -- True = teacher-force this sample to the
        target (C preload semantics); False = feed back the model's own
        sample.
      rng: PRNGKey seeding the per-stream sampler KISS99 state.
      gru_states: optional (h_a, h_b) TBPTT carry to start from.
      weighting: optional [16] LPC_GAMMA tap weighting (match the training
        graph's tensor_preds filter).

    Returns s_hat [B, T]: the trajectory in the preemphasized (pcm) domain,
    aligned with sig_out (s_hat[t] == the model's version of sig_out[t];
    teacher-forced positions reproduce the target up to deemphasis-state
    self-correction and rounding).  No gradients flow (stop_gradient).
    """
    sig_out = jax.lax.stop_gradient(batch["sig_out"])
    b, t = sig_out.shape
    n_frames = t // cfg.frame_size
    p = jax.lax.stop_gradient(params)
    fused = M.fuse_inference_params(p, cfg)
    cfeat = M.frame_network_seq(p, batch["features"], batch["periods"], cfg)
    cfeat = jax.lax.stop_gradient(cfeat)[:, :n_frames]
    cond_a = nn.dense(fused["cond_to_a"], cfeat)          # [B, F, 3Na]
    cond_b = nn.dense(fused["cond_to_b"], cfeat)
    if cfg.e2e:
        from ..dsp import lpc as lpc_mod
        lpc = lpc_mod.rc2lpc(cfeat[..., :16])
    else:
        lpc = jax.lax.stop_gradient(batch["lpc"])[:, :n_frames]
    if weighting is not None:
        lpc = lpc * weighting

    # the masked sampler teacher-forces in the DEEMPHASIZED domain
    # (pcm_tf = target - P*deemph, src/lpcnet.c:256-259); feed it the
    # de-emphasized target so TF samples reproduce sig_out
    target_de = deemphasis_seq(sig_out)

    ks, kz = jax.random.split(rng)
    bits = jax.random.bits(ks, (4, b), jnp.uint32)
    sstate = M.SampleState(
        gru_a=(gru_states[0] if gru_states is not None
               else jnp.zeros((b, cfg.rnn_units1))),
        gru_b=(gru_states[1] if gru_states is not None
               else jnp.zeros((b, cfg.rnn_units2))),
        last_sig=jnp.zeros((b, 16)),
        last_exc=jnp.full((b,), 128, jnp.int32),
        deemph=jnp.zeros((b,)),
        rng=Kiss99State(bits[0], bits[1], bits[2] | jnp.uint32(1), bits[3]),
    )
    sstate = jax.tree.map(jax.lax.stop_gradient, sstate)

    fs = cfg.frame_size
    adv = jnp.ones((b, fs), bool)
    tf_f = jnp.moveaxis(tf_mask.reshape(b, n_frames, fs), 1, 0)
    tgt_f = jnp.moveaxis(target_de.reshape(b, n_frames, fs), 1, 0)
    ca_f = jnp.moveaxis(cond_a, 1, 0)
    cb_f = jnp.moveaxis(cond_b, 1, 0)
    lpc_f = jnp.moveaxis(lpc, 1, 0)

    if _use_pallas():
        from ..kernels.sample_loop import (kernel_weights,
                                           synthesize_frame_masked_auto)
        kw = kernel_weights(fused, cfg)

        def step(sst, xs):
            ca, cb, lp, tg, tf = xs
            sst, out = synthesize_frame_masked_auto(
                kw, sst, ca, cb, lp, tg, tf, adv, cfg)
            return sst, out
    else:
        def step(sst, xs):
            ca, cb, lp, tg, tf = xs
            sst, out = M.synthesize_frame_masked(fused, sst, ca, cb, lp,
                                                 tg, tf, adv)
            return sst, out

    _, out = jax.lax.scan(step, sstate, (ca_f, cb_f, lpc_f, tgt_f, tf_f))
    out = jnp.moveaxis(out, 0, 1).reshape(b, t)       # deemphasized domain
    # back to the preemphasized (training signal) domain:
    # s_hat[t] = out[t] - P*out[t-1]
    prev = jnp.concatenate([jnp.zeros((b, 1)), out[:, :-1]], axis=1)
    return jax.lax.stop_gradient(out - PREEMPHASIS * prev)


def mixed_history(sig_in, s_hat, tf_mask):
    """Pass-2 input: replace the signal history with the sampled trajectory
    where pass 1 free-ran.  sig_in[t] is the (noise-augmented) target
    delayed by one sample, so position t's history sample corresponds to
    pass-1 position t-1: keep sig_in (with its dump_data teacher noise)
    where t-1 was teacher-forced, use s_hat[t-1] where it was sampled."""
    b = sig_in.shape[0]
    use_data = jnp.concatenate(
        [jnp.ones((b, 1), bool), tf_mask[:, :-1]], axis=1)
    shifted = jnp.concatenate(
        [sig_in[:, :1], s_hat[:, :-1]], axis=1)
    return jnp.where(use_data, sig_in, shifted)
