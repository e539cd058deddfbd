"""Streaming feature extraction (the analysis half of the codec).

Replicates compute_frame_features + process_superframe/process_single_frame
(src/lpcnet_enc.c:498-870) as a batched, jit-friendly state machine:

* All state lives in an ``EncoderState`` pytree with leading batch dim.
* The per-frame excitation filter chain is an FIR over the frame plus a
  17-sample history, expressed as one [160, 17] windowed matmul instead of
  the reference's scalar loop (src/lpcnet_enc.c:527-537).
* Pitch correlation is one [256, 80] matmul per half-frame (dsp.pitch).
* The 8-subframe Viterbi runs as a lax.scan (dsp.pitch.viterbi_track).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..dsp import pitch as pitch_mod
from ..dsp import spectrum
from ..dsp.constants import (
    FRAME_SIZE,
    LPC_ORDER,
    NB_BANDS,
    NB_TOTAL_FEATURES,
    OVERLAP_SIZE,
    PITCH_MAX_PERIOD,
    PREEMPHASIS,
    TRAINING_OFFSET,
)
from ..dsp.lpc import lpc_from_cepstrum

EXC_BUF_SIZE = PITCH_MAX_PERIOD + FRAME_SIZE  # 416 live samples


class EncoderState(NamedTuple):
    """Batched encoder analysis state (cf. LPCNetEncState,
    src/lpcnet_private.h:55-75)."""
    analysis_mem: jnp.ndarray    # [B, 160] previous pre-emphasized frame
    mem_preemph: jnp.ndarray     # [B]
    pitch_mem: jnp.ndarray       # [B, 16] recent aligned samples, newest first
    pitch_filt: jnp.ndarray      # [B]
    exc_buf: jnp.ndarray         # [B, 416]
    xc: jnp.ndarray              # [B, 10, 256] correlation ring (0,1 = prev)
    frame_weight: jnp.ndarray    # [B, 10]
    viterbi: pitch_mod.ViterbiCarry  # leaves [B, ...]
    vq_mem: jnp.ndarray          # [B, 18]


def init_encoder_state(batch: int) -> EncoderState:
    vit = pitch_mod.ViterbiCarry.zeros()
    return EncoderState(
        analysis_mem=jnp.zeros((batch, OVERLAP_SIZE), jnp.float32),
        mem_preemph=jnp.zeros((batch,), jnp.float32),
        pitch_mem=jnp.zeros((batch, LPC_ORDER), jnp.float32),
        pitch_filt=jnp.zeros((batch,), jnp.float32),
        exc_buf=jnp.zeros((batch, EXC_BUF_SIZE), jnp.float32),
        xc=jnp.zeros((batch, 10, PITCH_MAX_PERIOD), jnp.float32),
        frame_weight=jnp.zeros((batch, 10), jnp.float32),
        viterbi=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), vit,
            is_leaf=lambda x: isinstance(x, jnp.ndarray)),
        vq_mem=jnp.zeros((batch, NB_BANDS), jnp.float32),
    )


def preemphasis(x, mem):
    """y[i] = x[i] - coef*x[i-1] with carried memory (src/lpcnet_enc.c:872-880).

    Args: x [B, N], mem [B] (stores +prev contribution, i.e. C's *mem).
    Returns: (y [B, N], new_mem [B])
    """
    prev = jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)
    y = x - PREEMPHASIS * prev
    y = y.at[..., 0].set(x[..., 0] + mem)
    return y, -PREEMPHASIS * x[..., -1]


def _excitation(aligned, lpc, pitch_mem, pitch_filt):
    """LPC residual + 0.7 comb filter (src/lpcnet_enc.c:527-537).

    aligned: [B, 160]; lpc: [B, 16]; pitch_mem: [B, 16] newest-first history.
    Returns (exc [B, 160], new_pitch_mem, new_pitch_filt).
    """
    hist = jnp.flip(pitch_mem, axis=-1)           # oldest first
    a_ext = jnp.concatenate([hist, aligned], axis=-1)   # [B, 176]
    idx = jnp.arange(FRAME_SIZE)[:, None] + jnp.arange(LPC_ORDER + 1)[None, :]
    wins = a_ext[..., idx]                        # [B, 160, 17]
    coeffs = jnp.concatenate(
        [jnp.flip(lpc, axis=-1), jnp.ones_like(lpc[..., :1])], axis=-1)
    s = jnp.einsum("bnk,bk->bn", wins, coeffs, precision=jax.lax.Precision.HIGHEST)
    s_prev = jnp.concatenate([pitch_filt[..., None], s[..., :-1]], axis=-1)
    exc = s + 0.7 * s_prev
    new_pitch_mem = jnp.flip(aligned[..., -LPC_ORDER:], axis=-1)
    return exc, new_pitch_mem, s[..., -1]


def frame_features_step(state: EncoderState, frame, pcount: int
                        ) -> Tuple[EncoderState, jnp.ndarray]:
    """Process one raw (NOT pre-emphasized) 10 ms frame.

    Args:
      state: EncoderState [B, ...].
      frame: [B, 160] float PCM.
      pcount: static subframe index within the superframe (0..3).

    Returns (new_state, features [B, 36]) where features[20:36] hold the
    unquantized LPC and [18:20] are zeros (pitch filled by the superframe
    step).
    """
    x, new_preemph = preemphasis(frame, state.mem_preemph)
    # pitch alignment buffer: last 80 samples of previous frame + first 80 of
    # this one (read BEFORE analysis_mem is updated; src/lpcnet_enc.c:510)
    aligned = jnp.concatenate(
        [state.analysis_mem[..., OVERLAP_SIZE - TRAINING_OFFSET:],
         x[..., : FRAME_SIZE - TRAINING_OFFSET]], axis=-1)
    spec, band_e, new_analysis_mem = spectrum.frame_analysis(x, state.analysis_mem)
    ceps = spectrum.cepstrum_from_band_energy(band_e)
    lpc = lpc_from_cepstrum(ceps)

    exc, new_pitch_mem, new_pitch_filt = _excitation(
        aligned, lpc, state.pitch_mem, state.pitch_filt)
    exc_buf = jnp.concatenate([state.exc_buf[..., FRAME_SIZE:], exc], axis=-1)

    xc0, w0 = jax.vmap(lambda e: pitch_mod.half_frame_xcorr(e, 0))(exc_buf)
    xc1, w1 = jax.vmap(lambda e: pitch_mod.half_frame_xcorr(e, TRAINING_OFFSET))(exc_buf)
    xc = state.xc.at[:, 2 + 2 * pcount].set(xc0).at[:, 3 + 2 * pcount].set(xc1)
    fw = state.frame_weight.at[:, 2 + 2 * pcount].set(w0).at[:, 3 + 2 * pcount].set(w1)

    feats = jnp.zeros(frame.shape[:-1] + (NB_TOTAL_FEATURES,), jnp.float32)
    feats = feats.at[..., :NB_BANDS].set(ceps)
    feats = feats.at[..., NB_BANDS + 2:].set(lpc)

    new_state = state._replace(
        analysis_mem=new_analysis_mem, mem_preemph=new_preemph,
        pitch_mem=new_pitch_mem, pitch_filt=new_pitch_filt,
        exc_buf=exc_buf, xc=xc, frame_weight=fw)
    return new_state, feats


def normalized_frame_weights(fw, lo: int, n: int):
    w = fw[..., lo: lo + n]
    return w * (n / (1e-15 + jnp.sum(w, axis=-1, keepdims=True)))


def superframe_pitch(state: EncoderState):
    """Pitch half of process_superframe (unquantized path,
    src/lpcnet_enc.c:602-700): returns (new_state, periods [B,4] float,
    frame_corr [B]). Also rotates the xc ring and updates Viterbi carry.
    """
    w = normalized_frame_weights(state.frame_weight, 2, 8)      # [B, 8]
    xcs = jax.vmap(jax.vmap(pitch_mod.octave_suppress))(state.xc[:, 2:10])

    carry, periods, corr = jax.vmap(pitch_mod.viterbi_track)(
        state.viterbi, xcs, w)

    # per-frame period = half-frame sum, clamped (src/lpcnet_enc.c:693)
    psum = periods[..., 0::2] + periods[..., 1::2]          # [B, 4]
    period_feat = 0.01 * (jnp.clip(psum, 66, 510).astype(jnp.float32) - 200.0)

    # rotate correlation ring: xc[0:2] = (suppressed) xc[8:10]
    xc_new = state.xc.at[:, 2:10].set(xcs)
    xc_new = xc_new.at[:, 0:2].set(xcs[:, 6:8])
    new_state = state._replace(xc=xc_new, viterbi=carry)
    return new_state, period_feat, corr


def compute_features_superframe(state: EncoderState, pcm
                                ) -> Tuple[EncoderState, jnp.ndarray]:
    """Unquantized feature extraction over one 40 ms superframe.

    Args: pcm [B, 640] float. Returns (state, features [B, 4, 36]).
    Matches lpcnet_compute_features (src/lpcnet_enc.c:895-909).
    """
    state, feats = superframe_analysis(state, pcm)
    state, period_feat, corr = superframe_pitch(state)
    feats = feats.at[..., NB_BANDS].set(period_feat)
    feats = feats.at[..., NB_BANDS + 1].set(corr[..., None] - 0.5)
    state = state._replace(vq_mem=feats[..., 3, :NB_BANDS])
    return state, feats


def compute_features(state: EncoderState, pcm):
    """Batched multi-superframe driver: pcm [B, T*640] -> [B, T, 4, 36]."""
    b = pcm.shape[0]
    t = pcm.shape[-1] // (4 * FRAME_SIZE)
    chunks = pcm[..., : t * 4 * FRAME_SIZE].reshape(b, t, 4 * FRAME_SIZE)

    def step(st, chunk):
        st, f = compute_features_superframe(st, chunk)
        return st, f

    state, feats = jax.lax.scan(step, state, jnp.moveaxis(chunks, 1, 0))
    return state, jnp.moveaxis(feats, 0, 1)


def compute_single_frame_features(state: EncoderState, frame
                                  ) -> Tuple[EncoderState, jnp.ndarray]:
    """Per-frame feature path with the 2-subframe Viterbi
    (lpcnet_compute_single_frame_features, src/lpcnet_enc.c:814-870,919-925).

    Args: frame [B, 160] raw float PCM. Returns (state, features [B, 36]).
    """
    state, feats = frame_features_step(state, frame, 0)
    w = normalized_frame_weights(state.frame_weight, 2, 2)
    xcs = jax.vmap(jax.vmap(pitch_mod.octave_suppress))(state.xc[:, 2:4])
    carry, periods, corr = jax.vmap(pitch_mod.viterbi_track)(
        state.viterbi, xcs, w)
    psum = periods[..., 0] + periods[..., 1]
    period_feat = 0.01 * (jnp.clip(psum, 66, 510).astype(jnp.float32) - 200.0)
    feats = feats.at[..., NB_BANDS].set(period_feat)
    feats = feats.at[..., NB_BANDS + 1].set(corr - 0.5)
    xc_new = state.xc.at[:, 2:4].set(xcs)
    state = state._replace(xc=xc_new, viterbi=carry)
    return state, feats


def compute_single_frame_features_seq(state: EncoderState, pcm):
    """Scan driver: pcm [B, T*160] -> (state, features [B, T, 36])."""
    b = pcm.shape[0]
    t = pcm.shape[-1] // FRAME_SIZE
    frames = pcm[..., : t * FRAME_SIZE].reshape(b, t, FRAME_SIZE)

    def step(st, fr):
        st, f = compute_single_frame_features(st, fr)
        return st, f

    state, feats = jax.lax.scan(step, state, jnp.moveaxis(frames, 1, 0))
    return state, jnp.moveaxis(feats, 0, 1)


# --------------------------------------------------------------------------
# Batched superframe analysis (performance path)
# --------------------------------------------------------------------------

def superframe_analysis(state: EncoderState, pcm):
    """All four 10 ms frames of a superframe in batched ops.

    Equivalent to four frame_features_step calls (same state evolution) but
    with one FFT batch, one Levinson batch, one excitation einsum over 640
    samples, and one [8-way] correlation matmul -- the per-frame Python loop
    only survives in the single-frame streaming API.

    Args: pcm [B, 640] raw float PCM.
    Returns (new_state, feats [B, 4, 36]) with pitch columns zeroed.
    """
    b = pcm.shape[0]
    x, new_preemph = preemphasis(pcm, state.mem_preemph)    # [B, 640]

    # 4 overlapping 320-sample windows from [analysis_mem | x]
    ext = jnp.concatenate([state.analysis_mem, x], axis=-1)  # [B, 800]
    widx = (jnp.arange(4)[:, None] * FRAME_SIZE
            + jnp.arange(2 * FRAME_SIZE)[None, :])           # [4, 320]
    wins = ext[:, widx]                                      # [B, 4, 320]
    spec = spectrum.forward_transform(spectrum.apply_window(wins))
    band_e = spectrum.compute_band_energy(spec)
    ceps = spectrum.cepstrum_from_band_energy(band_e)        # [B, 4, 18]
    lpc = lpc_from_cepstrum(ceps)                            # [B, 4, 16]

    # half-frame-aligned signal: aligned_k = ext2[k*160 : k*160+160]
    ext2 = jnp.concatenate(
        [state.analysis_mem[..., OVERLAP_SIZE - TRAINING_OFFSET:],
         x[..., : 4 * FRAME_SIZE - TRAINING_OFFSET]], axis=-1)  # [B, 720]
    # excitation FIR: s[t] = a[t] + sum_j lpc[frame(t), j] * a[t-1-j]
    hist = jnp.concatenate([jnp.flip(state.pitch_mem, axis=-1), ext2], axis=-1)
    tidx = (jnp.arange(4 * FRAME_SIZE)[:, None]
            + jnp.arange(LPC_ORDER + 1)[None, :])            # [640, 17]
    awins = hist[:, tidx]                                    # [B, 640, 17]
    coeffs = jnp.concatenate(
        [jnp.flip(lpc, axis=-1), jnp.ones_like(lpc[..., :1])], axis=-1)
    coeffs_rep = jnp.repeat(coeffs, FRAME_SIZE, axis=1)      # [B, 640, 17]
    s = jnp.einsum("btk,btk->bt", awins, coeffs_rep,
                   precision=jax.lax.Precision.HIGHEST)
    s_prev = jnp.concatenate([state.pitch_filt[..., None], s[..., :-1]], axis=-1)
    exc = s + 0.7 * s_prev                                   # [B, 640]

    full_exc = jnp.concatenate([state.exc_buf, exc], axis=-1)  # [B, 1056]
    # per-frame live excitation buffers (416 samples ending at frame end)
    bidx = ((jnp.arange(4)[:, None] + 1) * FRAME_SIZE
            + jnp.arange(EXC_BUF_SIZE)[None, :])             # [4, 416]
    exc_views = full_exc[:, bidx]                            # [B, 4, 416]

    def xc_both(ebuf):
        xc0, w0 = pitch_mod.half_frame_xcorr(ebuf, 0)
        xc1, w1 = pitch_mod.half_frame_xcorr(ebuf, TRAINING_OFFSET)
        return jnp.stack([xc0, xc1]), jnp.stack([w0, w1])

    xcs, ws = jax.vmap(jax.vmap(xc_both))(exc_views)         # [B,4,2,256],[B,4,2]
    xc_new = state.xc.at[:, 2:10].set(xcs.reshape(b, 8, -1))
    fw_new = state.frame_weight.at[:, 2:10].set(ws.reshape(b, 8))

    feats = jnp.zeros((b, 4, NB_TOTAL_FEATURES), jnp.float32)
    feats = feats.at[..., :NB_BANDS].set(ceps)
    feats = feats.at[..., NB_BANDS + 2:].set(lpc)

    new_state = state._replace(
        analysis_mem=x[..., -OVERLAP_SIZE:],
        mem_preemph=new_preemph,
        pitch_mem=jnp.flip(ext2[..., -LPC_ORDER:], axis=-1),
        pitch_filt=s[..., -1],
        exc_buf=full_exc[..., -EXC_BUF_SIZE:],
        xc=xc_new, frame_weight=fw_new)
    return new_state, feats
