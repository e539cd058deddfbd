"""DRED RDO-VAE: rate-distortion-optimized redundancy coder.

JAX re-design of the reference's RDO-VAE (torch/rdovae/rdovae/rdovae.py,
the C inference in src/dred_rdovae_enc.c:38-95 / src/dred_rdovae_dec.c:37-98
and the TF2 original training_tf2/rdovae.py:201-372):

* CoreEncoder: 2-feature-frame steps through an interleaved dense/GRU stack
  whose *concatenated* hidden outputs feed a causal k=4 conv -> 80 latents
  per 20 ms, plus a 24-d PVQ-coded initial state for the decoder.
* CoreDecoder: mirrored stack, 3 state-init denses, 4 feature frames per
  latent, run over time-reversed latents (redundancy decodes newest-first).
* StatisticalModel: per-quant-level embedding -> quant scale / dead zone /
  Laplace r, theta for rate estimates.

Both sequence (training) and streaming single-step (inference) forms are
provided; streaming state is an explicit pytree (conv ring + GRU states),
batched over streams.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..nn import init as nn_init
from ..nn import layers as nn


@dataclasses.dataclass(frozen=True)
class RDOVAEConfig:
    num_features: int = 20
    latent_dim: int = 80
    quant_levels: int = 16
    cond_size: int = 256
    cond_size2: int = 256
    state_dim: int = 24
    pvq_num_pulses: int = 82
    enc_frames_per_step: int = 2
    dec_frames_per_step: int = 4
    conv_kernel: int = 4
    state_hidden: int = 128

    @property
    def enc_input_dim(self):
        return self.enc_frames_per_step * self.num_features

    @property
    def enc_concat_size(self):
        return 5 * self.cond_size + 3 * self.cond_size2

    @property
    def dec_concat_size(self):
        # x1(c2), x2(c), x3(c2), x4(c), x5(c2), x6(c), x7(c2), x8(c2);
        # the torch reference writes 4c+4c2 which only matches because its
        # defaults have c == c2 (torch rdovae.py:328 with :337-338)
        return 3 * self.cond_size + 5 * self.cond_size2


def init_params(key, cfg: RDOVAEConfig | None = None) -> Dict[str, Any]:
    cfg = cfg or RDOVAEConfig()
    ks = jax.random.split(key, 24)
    c, c2 = cfg.cond_size, cfg.cond_size2
    enc = {
        "dense_1": nn_init.dense_params(ks[0], cfg.enc_input_dim, c2),
        "gru_1": nn_init.gru_params(ks[1], c2, c),
        "dense_2": nn_init.dense_params(ks[2], c, c2),
        "gru_2": nn_init.gru_params(ks[3], c2, c),
        "dense_3": nn_init.dense_params(ks[4], c, c2),
        "gru_3": nn_init.gru_params(ks[5], c2, c),
        "dense_4": nn_init.dense_params(ks[6], c, c),
        "dense_5": nn_init.dense_params(ks[7], c, c),
        "conv1": nn_init.conv1d_params(ks[8], cfg.conv_kernel,
                                       cfg.enc_concat_size, cfg.latent_dim),
        "state_dense_1": nn_init.dense_params(ks[9], cfg.enc_concat_size,
                                              cfg.state_hidden),
        "state_dense_2": nn_init.dense_params(ks[10], cfg.state_hidden,
                                              cfg.state_dim),
    }
    dec = {
        "dense_1": nn_init.dense_params(ks[11], cfg.latent_dim, c2),
        "gru_1": nn_init.gru_params(ks[12], c2, c),
        "dense_2": nn_init.dense_params(ks[13], c, c2),
        "gru_2": nn_init.gru_params(ks[14], c2, c),
        "dense_3": nn_init.dense_params(ks[15], c, c2),
        "gru_3": nn_init.gru_params(ks[16], c2, c),
        "dense_4": nn_init.dense_params(ks[17], c, c2),
        "dense_5": nn_init.dense_params(ks[18], c2, c2),
        "output": nn_init.dense_params(
            ks[19], cfg.dec_concat_size,
            cfg.dec_frames_per_step * cfg.num_features),
        "gru_1_init": nn_init.dense_params(ks[20], cfg.state_dim, c),
        "gru_2_init": nn_init.dense_params(ks[21], cfg.state_dim, c),
        "gru_3_init": nn_init.dense_params(ks[22], cfg.state_dim, c),
    }
    stats = {"quant_embedding": {
        "table": jnp.zeros((cfg.quant_levels, 6 * cfg.latent_dim), jnp.float32)}}
    return {"encoder": enc, "decoder": dec, "statistical_model": stats}


# --------------------------------------------------------------------------
# Quantization / rate utilities (torch rdovae.py:40-149)
# --------------------------------------------------------------------------

def soft_pvq(x, k: int, iters: int = 10):
    """Soft pyramid vector quantizer with straight-through gradients."""
    x_norm2 = x / (1e-15 + jnp.linalg.norm(x, axis=-1, keepdims=True))

    def quantize(x):
        x_norm1 = x / (1e-15 + jnp.sum(jnp.abs(x), axis=-1, keepdims=True))
        scale = jnp.full(x.shape[:-1] + (1,), float(k), x.dtype)

        def body(_, carry):
            scale, x_scaled, x_quant = carry
            abs_q = jnp.abs(x_quant)
            abs_s = jnp.abs(x_scaled)
            l1 = jnp.sum(abs_q, axis=-1)
            plus = 1.0001 * jnp.min((abs_q + 0.5) / (abs_s + 1e-15), axis=-1)
            minus = 0.9999 * jnp.max((abs_q - 0.5) / (abs_s + 1e-15), axis=-1)
            factor = jnp.where(l1 > k, minus, plus)
            factor = jnp.where(l1 == k, 1.0, factor)
            scale = scale * factor[..., None]
            x_scaled = scale * x_norm1
            x_quant = jnp.round(x_scaled)
            return scale, x_scaled, x_quant

        x_scaled = scale * x_norm1
        x_quant = jnp.round(x_scaled)
        _, _, x_quant = jax.lax.fori_loop(0, iters, body,
                                          (scale, x_scaled, x_quant))
        return x_quant / (1e-15 + jnp.linalg.norm(x_quant, axis=-1, keepdims=True))

    q = jax.lax.stop_gradient(quantize(x))
    return x_norm2 + jax.lax.stop_gradient(q - x_norm2)


@functools.lru_cache(maxsize=None)
def pvq_codebook_size(n: int, k: int) -> int:
    if k == 0:
        return 1
    if n == 0:
        return 0
    return (pvq_codebook_size(n - 1, k) + pvq_codebook_size(n, k - 1)
            + pvq_codebook_size(n - 1, k - 1))


def pvq_state_bits(cfg: RDOVAEConfig) -> float:
    return math.log2(pvq_codebook_size(cfg.state_dim, cfg.pvq_num_pulses))


def soft_rate_estimate(z, r, reduce=True):
    rate = jnp.sum(-jnp.log2((1 - r) / (1 + r) * r ** jnp.abs(z) + 1e-6), axis=-1)
    return jnp.mean(rate) if reduce else rate


def hard_rate_estimate(z, r, theta, reduce=True):
    z_q = jnp.round(z)
    p0 = 1 - r ** (0.5 + 0.5 * theta)
    alpha = jax.nn.relu(1 - jnp.abs(z_q)) ** 2
    rate = -jnp.sum(
        alpha * jnp.log2(p0 * r ** jnp.abs(z_q) + 1e-6)
        + (1 - alpha) * jnp.log2(0.5 * (1 - p0) * (1 - r) * r ** (jnp.abs(z_q) - 1) + 1e-6),
        axis=-1)
    return jnp.mean(rate) if reduce else rate


def soft_dead_zone(x, dead_zone):
    d = dead_zone * 0.05
    return x - d * jnp.tanh(x / (0.1 + d))


def hard_quantize(x):
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def noise_quantize(x, rng):
    return x + (jax.random.uniform(rng, x.shape) - 0.5)


def distortion_loss(y_true, y_pred, rate_lambda=None):
    """Feature-weighted distortion (torch rdovae.py:155-173)."""
    ceps_err = y_pred[..., :18] - y_true[..., :18]
    pitch_err = 2 * (y_pred[..., 18:19] - y_true[..., 18:19]) / (2 + y_true[..., 18:19])
    corr_err = y_pred[..., 19:20] - y_true[..., 19:20]
    pitch_weight = jax.nn.relu(y_true[..., 19:20] + 0.5) ** 2
    err = jnp.concatenate(
        [ceps_err ** 2, (10.0 / 18.0) * jnp.abs(pitch_err) * pitch_weight,
         (1.0 / 18.0) * corr_err ** 2], axis=-1)
    loss = jnp.mean(err, axis=-1)
    if rate_lambda is not None:
        loss = loss / jnp.sqrt(rate_lambda)
    return jnp.mean(loss)


# --------------------------------------------------------------------------
# Statistical model
# --------------------------------------------------------------------------

def statistical_model(params, q_ids, cfg: RDOVAEConfig):
    ld = cfg.latent_dim
    x = nn.embedding(params["statistical_model"]["quant_embedding"], q_ids)
    return {
        "quant_embedding": x,
        "quant_scale": jax.nn.softplus(x[..., 0 * ld:1 * ld]),
        "dead_zone": jax.nn.softplus(x[..., 1 * ld:2 * ld]),
        "theta_soft": jax.nn.sigmoid(x[..., 2 * ld:3 * ld]),
        "r_soft": jax.nn.sigmoid(x[..., 3 * ld:4 * ld]),
        "theta_hard": jax.nn.sigmoid(x[..., 4 * ld:5 * ld]),
        "r_hard": jax.nn.sigmoid(x[..., 5 * ld:6 * ld]),
    }


# --------------------------------------------------------------------------
# Sequence (training) forms
# --------------------------------------------------------------------------

def encode_seq(params, features, cfg: RDOVAEConfig):
    """features [B, T, 20] (T even) -> (z [B, T/2, latent], states [B, T/2, 24])."""
    p = params["encoder"]
    b, t, nf = features.shape
    x = features.reshape(b, t // cfg.enc_frames_per_step, cfg.enc_input_dim)
    x1 = nn.dense(p["dense_1"], x, "tanh")
    x2, _ = nn.gru_seq(p["gru_1"], x1)
    x3 = nn.dense(p["dense_2"], x2, "tanh")
    x4, _ = nn.gru_seq(p["gru_2"], x3)
    x5 = nn.dense(p["dense_3"], x4, "tanh")
    x6, _ = nn.gru_seq(p["gru_3"], x5)
    x7 = nn.dense(p["dense_4"], x6, "tanh")
    x8 = nn.dense(p["dense_5"], x7, "tanh")
    x9 = jnp.concatenate([x1, x2, x3, x4, x5, x6, x7, x8], axis=-1)
    states = nn.dense(p["state_dense_1"], x9, "tanh")
    states = nn.dense(p["state_dense_2"], states, "tanh")
    z = nn.conv1d_seq(p["conv1"], x9, "linear", padding="causal")
    return z, states


def decode_seq(params, z, initial_state, cfg: RDOVAEConfig):
    """z [B, Tz, latent] (already in decode order), initial_state [B, 24]
    -> features [B, Tz*4, 20]."""
    p = params["decoder"]
    h1 = jnp.tanh(nn.dense(p["gru_1_init"], initial_state))
    h2 = jnp.tanh(nn.dense(p["gru_2_init"], initial_state))
    h3 = jnp.tanh(nn.dense(p["gru_3_init"], initial_state))
    x1 = nn.dense(p["dense_1"], z, "tanh")
    x2, _ = nn.gru_seq(p["gru_1"], x1, h0=h1)
    x3 = nn.dense(p["dense_2"], x2, "tanh")
    x4, _ = nn.gru_seq(p["gru_2"], x3, h0=h2)
    x5 = nn.dense(p["dense_3"], x4, "tanh")
    x6, _ = nn.gru_seq(p["gru_3"], x5, h0=h3)
    x7 = nn.dense(p["dense_4"], x6, "tanh")
    x8 = nn.dense(p["dense_5"], x7, "tanh")
    x9 = jnp.concatenate([x1, x2, x3, x4, x5, x6, x7, x8], axis=-1)
    out = nn.dense(p["output"], x9)
    b, tz, _ = out.shape
    return out.reshape(b, tz * cfg.dec_frames_per_step, cfg.num_features)


def get_decoder_chunks(z_frames: int, cfg: RDOVAEConfig, chunks_per_offset: int = 4):
    """Stride-congruent split-decoding chunks (torch rdovae.py:467-513)."""
    stride = cfg.dec_frames_per_step // cfg.enc_frames_per_step
    enc_stride = cfg.enc_frames_per_step
    dec_stride = cfg.dec_frames_per_step
    chunks = []
    for offset in range(stride):
        start = offset
        while enc_stride * (start + 1) - dec_stride < 0:
            start += stride
        if start >= z_frames:
            raise ValueError("sequence too short for split decoding")
        stop = z_frames - (z_frames % stride) + offset
        while stop < z_frames:
            stop += stride
        length = stop - start
        split_points = [start + stride * int(i * length / chunks_per_offset / stride)
                        for i in range(chunks_per_offset)] + [stop]
        for i in range(chunks_per_offset):
            chunks.append({
                "z_start": split_points[i],
                "z_stop": split_points[i + 1] - stride + 1,
                "z_stride": stride,
                "features_start": enc_stride * (split_points[i] + 1) - dec_stride,
                "features_stop": enc_stride * (split_points[i + 1] - stride + 1),
            })
    return chunks


def training_forward(params, features, q_ids, rng, cfg: RDOVAEConfig,
                     state_dropout_rate: float = 0.0):
    """Full training graph (torch rdovae.py:516-562).

    Args: features [B, T, 20] (T % 4 == 0), q_ids [B, T/2] int32.
    state_dropout_rate: fault-injection training knob -- zero a sequence's
    quantized decoder-init states with this probability, teaching the
    decoder to survive a lost state (torch rdovae.py:533-537).
    """
    stats = statistical_model(params, q_ids, cfg)
    z, states = encode_seq(params, features, cfg)
    z = z * stats["quant_scale"]
    z = soft_dead_zone(z, stats["dead_zone"])
    rng, drop_rng = jax.random.split(rng)
    z_q = hard_quantize(z) / stats["quant_scale"]
    z_n = noise_quantize(z, rng) / stats["quant_scale"]
    states_q = soft_pvq(states, cfg.pvq_num_pulses)
    if state_dropout_rate > 0:
        drop = jax.random.uniform(drop_rng, (states_q.shape[0],)
                                  ) < state_dropout_rate
        states_q = states_q * (1.0 - drop.astype(states_q.dtype)
                               )[:, None, None]

    chunks = get_decoder_chunks(z.shape[1], cfg)
    outputs_hq, outputs_sq = [], []
    for ch in chunks:
        sel = slice(ch["z_start"], ch["z_stop"], ch["z_stride"])
        init = states_q[:, ch["z_stop"] - 1]
        dec_h = decode_seq(params, jnp.flip(z_q[:, sel], axis=1), init, cfg)
        outputs_hq.append((jnp.flip(dec_h, axis=1), ch["features_start"], ch["features_stop"]))
        dec_s = decode_seq(params, jnp.flip(z_n[:, sel], axis=1), init, cfg)
        outputs_sq.append((jnp.flip(dec_s, axis=1), ch["features_start"], ch["features_stop"]))

    return {"z": z, "states": states, "outputs_hard_quant": outputs_hq,
            "outputs_soft_quant": outputs_sq, "statistical_model": stats}


def rdovae_loss(params, features, rate_lambda, q_ids, rng, cfg: RDOVAEConfig,
                state_dropout_rate: float = 0.0):
    """Total loss (train_rdovae.py:195-228)."""
    out = training_forward(params, features, q_ids, rng, cfg,
                           state_dropout_rate=state_dropout_rate)
    stats = out["statistical_model"]
    z = out["z"]
    lam_up = jnp.repeat(rate_lambda, cfg.enc_frames_per_step, axis=1)

    hard_rate = hard_rate_estimate(z, stats["r_hard"], stats["theta_hard"], reduce=False)
    soft_rate = soft_rate_estimate(z, stats["r_soft"], reduce=False)
    soft_rate_loss = jnp.mean(jnp.sqrt(rate_lambda) * soft_rate)
    hard_rate_loss = jnp.mean(jnp.sqrt(rate_lambda) * hard_rate)
    rate_loss = soft_rate_loss + 0.1 * hard_rate_loss

    dist_h = 0.0
    dist_s = 0.0
    for dec, start, stop in out["outputs_hard_quant"]:
        dist_h += distortion_loss(features[:, start:stop], dec,
                                  lam_up[:, start:stop]) / len(out["outputs_hard_quant"])
    for dec, start, stop in out["outputs_soft_quant"]:
        dist_s += distortion_loss(features[:, start:stop], dec,
                                  lam_up[:, start:stop]) / len(out["outputs_soft_quant"])
    total = rate_loss + (dist_h + dist_s) / 2.0
    metrics = {"rate_loss": rate_loss, "dist_hard": dist_h, "dist_soft": dist_s,
               "hard_rate_bits": jnp.mean(hard_rate), "total": total}
    return total, metrics


# --------------------------------------------------------------------------
# Streaming inference (mirrors src/dred_rdovae_enc.c / _dec.c)
# --------------------------------------------------------------------------

class EncoderStreamState(NamedTuple):
    gru1: jnp.ndarray
    gru2: jnp.ndarray
    gru3: jnp.ndarray
    conv_mem: jnp.ndarray    # [B, k-1, concat]


def init_encoder_stream(batch: int, cfg: RDOVAEConfig) -> EncoderStreamState:
    return EncoderStreamState(
        gru1=jnp.zeros((batch, cfg.cond_size), jnp.float32),
        gru2=jnp.zeros((batch, cfg.cond_size), jnp.float32),
        gru3=jnp.zeros((batch, cfg.cond_size), jnp.float32),
        conv_mem=jnp.zeros((batch, cfg.conv_kernel - 1, cfg.enc_concat_size),
                           jnp.float32),
    )


def encode_dframe(params, state: EncoderStreamState, features2,
                  cfg: RDOVAEConfig):
    """One 20 ms step: features2 [B, 2*20] -> (state, z [B, 80], init_state [B, 24]).

    Matches dred_rdovae_encode_dframe (src/dred_rdovae_enc.c:38-95).
    """
    p = params["encoder"]
    x1 = nn.dense(p["dense_1"], features2, "tanh")
    h1 = nn.gru_step(p["gru_1"], state.gru1, x1)
    x3 = nn.dense(p["dense_2"], h1, "tanh")
    h2 = nn.gru_step(p["gru_2"], state.gru2, x3)
    x5 = nn.dense(p["dense_3"], h2, "tanh")
    h3 = nn.gru_step(p["gru_3"], state.gru3, x5)
    x7 = nn.dense(p["dense_4"], h3, "tanh")
    x8 = nn.dense(p["dense_5"], x7, "tanh")
    x9 = jnp.concatenate([x1, h1, x3, h2, x5, h3, x7, x8], axis=-1)
    z, conv_mem = nn.conv1d_stream(p["conv1"], x9, state.conv_mem, "linear")
    st = nn.dense(p["state_dense_1"], x9, "tanh")
    st = nn.dense(p["state_dense_2"], st, "tanh")
    return EncoderStreamState(h1, h2, h3, conv_mem), z, st


class DecoderStreamState(NamedTuple):
    gru1: jnp.ndarray
    gru2: jnp.ndarray
    gru3: jnp.ndarray


def init_decoder_stream(params, initial_state, cfg: RDOVAEConfig
                        ) -> DecoderStreamState:
    """dred_rdovae_dec_init_states (src/dred_rdovae_dec.c:37-47)."""
    p = params["decoder"]
    return DecoderStreamState(
        gru1=jnp.tanh(nn.dense(p["gru_1_init"], initial_state)),
        gru2=jnp.tanh(nn.dense(p["gru_2_init"], initial_state)),
        gru3=jnp.tanh(nn.dense(p["gru_3_init"], initial_state)),
    )


def decode_qframe(params, state: DecoderStreamState, z, cfg: RDOVAEConfig):
    """One latent -> 4 feature frames (src/dred_rdovae_dec.c:50-98)."""
    p = params["decoder"]
    x1 = nn.dense(p["dense_1"], z, "tanh")
    h1 = nn.gru_step(p["gru_1"], state.gru1, x1)
    x3 = nn.dense(p["dense_2"], h1, "tanh")
    h2 = nn.gru_step(p["gru_2"], state.gru2, x3)
    x5 = nn.dense(p["dense_3"], h2, "tanh")
    h3 = nn.gru_step(p["gru_3"], state.gru3, x5)
    x7 = nn.dense(p["dense_4"], h3, "tanh")
    x8 = nn.dense(p["dense_5"], x7, "tanh")
    x9 = jnp.concatenate([x1, h1, x3, h2, x5, h3, x7, x8], axis=-1)
    out = nn.dense(p["output"], x9)
    b = out.shape[0]
    return DecoderStreamState(h1, h2, h3), out.reshape(
        b, cfg.dec_frames_per_step, cfg.num_features)
