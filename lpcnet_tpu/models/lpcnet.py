"""The LPCNet vocoder model: frame-rate conditioning + sample-rate AR core.

Design: one parameter pytree serves the training graph (sequence form,
differentiable) and inference (streaming form). For inference the params are
*fused* the same way the reference's export step does
(training_tf2/dump_lpcnet.py:333-350): the shared signal embedding is
premultiplied into GRU-A's input weights, yielding three [256, 3*Na] lookup
tables, and the feature columns of GRU-A/GRU-B kernels become per-frame
conditioning matrices. The sample loop then does no input matmul at all --
just three row gathers, one recurrent matmul, and the dual-FC bit-tree
sampler (src/lpcnet.c:146-167, src/nnet.c:163-214).

Layout notes: GRU-A's input is [sig_embed(128) | pred_embed(128) |
exc_embed(128) | cond(128)]; GRU-B's input is [gru_a_out(384) | cond(128)]
(training_tf2/lpcnet.py:275-300).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..dsp import lpc as lpc_mod
from ..dsp import mulaw
from ..dsp.constants import LPC_ORDER, NB_FEATURES, PREEMPHASIS
from ..nn import init as nn_init
from ..nn import layers as nn

PCM_BITS = 8
PCM_LEVELS = 256
EMBED_SIZE = 128


@dataclasses.dataclass(frozen=True)
class LPCNetConfig:
    rnn_units1: int = 384
    rnn_units2: int = 16
    cond_size: int = 128
    nb_used_features: int = NB_FEATURES
    frame_size: int = 160
    conv_kernel: int = 3
    pitch_embed_dim: int = 64
    e2e: bool = False
    lpc_gamma: float = 1.0
    lookahead: int = 2          # FEATURES_DELAY

    @property
    def frame_input_size(self) -> int:
        return self.nb_used_features + self.pitch_embed_dim

    @property
    def gru_a_input_size(self) -> int:
        return 3 * EMBED_SIZE + self.cond_size

    @property
    def gru_b_input_size(self) -> int:
        return self.rnn_units1 + self.cond_size


def init_params(key, cfg: LPCNetConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    return {
        "embed_pitch": nn_init.embedding_params(ks[0], 256, cfg.pitch_embed_dim),
        "feature_conv1": nn_init.conv1d_params(ks[1], cfg.conv_kernel, cfg.frame_input_size, cfg.cond_size),
        "feature_conv2": nn_init.conv1d_params(ks[2], cfg.conv_kernel, cfg.cond_size, cfg.cond_size),
        "feature_dense1": nn_init.dense_params(ks[3], cfg.cond_size, cfg.cond_size),
        "feature_dense2": nn_init.dense_params(ks[4], cfg.cond_size, cfg.cond_size),
        "embed_sig": nn_init.embedding_params(ks[5], 256, EMBED_SIZE, kind="pcm"),
        "gru_a": nn_init.gru_params(ks[6], cfg.gru_a_input_size, cfg.rnn_units1),
        "gru_b": nn_init.gru_params(ks[7], cfg.gru_b_input_size, cfg.rnn_units2),
        "dual_fc": nn_init.mdense_params(ks[8], cfg.rnn_units2, PCM_LEVELS),
    }


# --------------------------------------------------------------------------
# Inference-fused parameters
# --------------------------------------------------------------------------

def fuse_inference_params(params: Dict[str, Any], cfg: LPCNetConfig) -> Dict[str, Any]:
    """Precompute embedding x GRU-A-kernel products and conditioning mats.

    Mirrors training_tf2/dump_lpcnet.py:333-350. Returns a new pytree with:
      embed_sig_a/pred_a/exc_a: [256, 3*Na] fused lookup tables
      cond_to_a: {"kernel": [cond, 3*Na], "bias"}   (bias = gru_a input bias)
      cond_to_b: {"kernel": [cond, 3*Nb], "bias"}   (bias = gru_b input bias)
      gru_a_rec / gru_b_rec: recurrent weights + biases
      dual_fc, frame-net params unchanged.
    """
    e = params["embed_sig"]["table"]
    ka = params["gru_a"]["kernel"]
    fused = {
        "embed_pitch": params["embed_pitch"],
        "feature_conv1": params["feature_conv1"],
        "feature_conv2": params["feature_conv2"],
        "feature_dense1": params["feature_dense1"],
        "feature_dense2": params["feature_dense2"],
        "embed_sig_a": jnp.matmul(e, ka[:EMBED_SIZE], precision=nn.HIGHEST),
        "embed_pred_a": jnp.matmul(e, ka[EMBED_SIZE:2 * EMBED_SIZE], precision=nn.HIGHEST),
        "embed_exc_a": jnp.matmul(e, ka[2 * EMBED_SIZE:3 * EMBED_SIZE], precision=nn.HIGHEST),
        # raw factors of the composed tables above (embed_*_a = e @ ka-block,
        # rank <= EMBED_SIZE): the factored sampler kernel variant
        # (kernels/sample_loop LPCNET_EMB=factored) gathers the 128-dim
        # embedding first and applies the input kernel second, shrinking the
        # one-hot contraction. C-blob-loaded models only have the composed
        # tables (dump_lpcnet.py composes before export), so these keys are
        # optional everywhere.
        "embed_table": e,
        "gru_a_in_kernel": ka[:3 * EMBED_SIZE],
        "cond_to_a": {"kernel": ka[3 * EMBED_SIZE:], "bias": params["gru_a"]["bias"][0]},
        "cond_to_b": {"kernel": params["gru_b"]["kernel"][cfg.rnn_units1:],
                      "bias": params["gru_b"]["bias"][0]},
        "gru_a_rec": {"recurrent": params["gru_a"]["recurrent"],
                      "bias": params["gru_a"]["bias"]},
        "gru_b_in": params["gru_b"]["kernel"][: cfg.rnn_units1],
        "gru_b_rec": {"recurrent": params["gru_b"]["recurrent"],
                      "bias": params["gru_b"]["bias"]},
        "dual_fc": params["dual_fc"],
    }
    return fused


# --------------------------------------------------------------------------
# Frame-rate network
# --------------------------------------------------------------------------

class FrameState(NamedTuple):
    """Streaming conv state + delayed-LPC buffer, batched [B, ...]."""
    conv1_mem: jnp.ndarray     # [B, k-1, frame_input]
    conv2_mem: jnp.ndarray     # [B, k-1, cond]
    old_lpc: jnp.ndarray       # [B, lookahead, 16]
    frame_count: jnp.ndarray   # [B] int32


def init_frame_state(batch: int, cfg: LPCNetConfig) -> FrameState:
    k = cfg.conv_kernel
    return FrameState(
        conv1_mem=jnp.zeros((batch, k - 1, cfg.frame_input_size), jnp.float32),
        conv2_mem=jnp.zeros((batch, k - 1, cfg.cond_size), jnp.float32),
        old_lpc=jnp.zeros((batch, max(cfg.lookahead, 1), LPC_ORDER), jnp.float32),
        frame_count=jnp.zeros((batch,), jnp.int32),
    )


def pitch_index(features):
    """features[..., 18] -> embedding index (src/lpcnet.c:92-94)."""
    p = jnp.floor(0.1 + 50.0 * features[..., NB_FEATURES - 2] + 100.0).astype(jnp.int32)
    return jnp.clip(p, 33, 255)


def frame_network(fused, state: FrameState, features, cfg: LPCNetConfig,
                  precision=None):
    """One frame of conditioning. features: [B, 36] (or [B, >=20]).

    Returns (new_state, cond [B, cond], cond_a [B, 3Na], cond_b [B, 3Nb],
    lpc [B, 16]).

    Replicates run_frame_network (src/lpcnet.c:82-120): conv warmup zeroing,
    delayed LPC via the old_lpc FIFO, optional e2e rc path, lpc_gamma.
    `precision` overrides the matmul mode (default HIGHEST = f32-exact).
    """
    pr = nn.HIGHEST if precision is None else precision
    f20 = features[..., : cfg.nb_used_features]
    pembed = nn.embedding(fused["embed_pitch"], pitch_index(features))
    x = jnp.concatenate([f20, pembed], axis=-1)
    c1, mem1 = nn.conv1d_stream(fused["feature_conv1"], x, state.conv1_mem,
                                precision=pr)
    conv1_delay = (cfg.conv_kernel - 1) // 2
    c1 = jnp.where((state.frame_count < conv1_delay)[..., None], 0.0, c1)
    c2, mem2 = nn.conv1d_stream(fused["feature_conv2"], c1, state.conv2_mem,
                                precision=pr)
    c2 = jnp.where((state.frame_count < cfg.lookahead)[..., None], 0.0, c2)
    d1 = nn.dense(fused["feature_dense1"], c2, "tanh", precision=pr)
    cond = nn.dense(fused["feature_dense2"], d1, "tanh", precision=pr)
    cond_a = nn.dense(fused["cond_to_a"], cond, precision=pr)
    cond_b = nn.dense(fused["cond_to_b"], cond, precision=pr)

    if cfg.e2e:
        # cond is already tanh-bounded; the first 16 units are the RCs
        # (src/lpcnet.c:104-108, training_tf2/tf_funcs.py:45-56)
        lpc = lpc_mod.rc2lpc(cond[..., :LPC_ORDER])
        new_old = state.old_lpc
    else:
        lpc_now = lpc_mod.lpc_from_cepstrum(features[..., :18])
        if cfg.lookahead > 0:
            lpc = state.old_lpc[:, -1]
            new_old = jnp.concatenate(
                [lpc_now[:, None], state.old_lpc[:, :-1]], axis=1)
        else:
            lpc = lpc_now
            new_old = state.old_lpc
    if cfg.lpc_gamma != 1.0:
        lpc = lpc_mod.lpc_weighting(lpc, cfg.lpc_gamma)
    new_state = FrameState(mem1, mem2, new_old,
                           jnp.minimum(state.frame_count + 1, 1000))
    return new_state, cond, cond_a, cond_b, lpc


def frame_network_flush(fused, state: FrameState, ring, count,
                        cfg: LPCNetConfig):
    """`count[i]` consecutive frame_network steps of stream i over known
    inputs, as ONE batched call (count=0 freezes a stream).

    Equivalent to count sequential frame_network calls on ring[:, 0..c-1]
    but the convs run as a single [B, T, k*cin] windowed matmul, the dense
    stack and LPC select run ONCE on the last active position instead of
    per step, and lpc_from_cepstrum batches its irfft over all T rows.
    Built for the batched PLC's deferred-frame-net flush
    (frame_network_deferred drains, src/lpcnet.c:82-120 state semantics).

    Args: ring [B, T, 36] inputs in flush order; count [B] int32 in [0, T].
    Returns (new_state, cond_a, cond_b, lpc) -- cond/lpc of the LAST active
    step (undefined where count=0; caller masks).
    """
    b, T = ring.shape[0], ring.shape[1]
    k = cfg.conv_kernel
    count = jnp.asarray(count, jnp.int32)
    f20 = ring[..., : cfg.nb_used_features]
    pembed = nn.embedding(fused["embed_pitch"], pitch_index(ring))
    x = jnp.concatenate([f20, pembed], axis=-1)          # [B, T, cin1]

    oh_c = (jnp.arange(T + 1)[None, :] == count[:, None]).astype(jnp.float32)

    def conv_seq(params, mem, seq, zero_before):
        """Streaming conv over T steps: [B, T, cout] outputs + the per-step
        warmup zeroing (frame_count advances by t within the flush). The
        terminal-mem window select is a one-hot contraction, not a gather
        (TPU gathers serialize)."""
        ext = jnp.concatenate([mem, seq], axis=1)        # [B, k-1+T, cin]
        win = jnp.stack([ext[:, t:t + k] for t in range(T)], axis=1)
        flat_w = params["kernel"].reshape(-1, params["kernel"].shape[-1])
        y = jnp.matmul(win.reshape(b, T, -1), flat_w,
                       precision=nn.HIGHEST) + params["bias"]
        y = nn.activate(y, "tanh")
        fc_t = state.frame_count[:, None] + jnp.arange(T)[None, :]
        y = jnp.where((fc_t < zero_before)[..., None], 0.0, y)
        # new_mem[:, j] = ext[:, count + j]
        new_mem = jnp.stack(
            [jnp.einsum("bs,bsc->bc", oh_c, ext[:, j:j + T + 1])
             for j in range(k - 1)], axis=1)
        return y, new_mem

    conv1_delay = (cfg.conv_kernel - 1) // 2
    c1, mem1 = conv_seq(fused["feature_conv1"], state.conv1_mem, x,
                        conv1_delay)
    c2, mem2 = conv_seq(fused["feature_conv2"], state.conv2_mem, c1,
                        cfg.lookahead)

    # dense stack once, on the last active position
    last1 = jnp.maximum(count - 1, 0)
    oh = (jnp.arange(T)[None, :] == last1[:, None]).astype(c2.dtype)
    c2_sel = jnp.einsum("bt,btc->bc", oh, c2)
    d1 = nn.dense(fused["feature_dense1"], c2_sel, "tanh")
    cond = nn.dense(fused["feature_dense2"], d1, "tanh")
    cond_a = nn.dense(fused["cond_to_a"], cond)
    cond_b = nn.dense(fused["cond_to_b"], cond)

    if cfg.e2e:
        lpc = lpc_mod.rc2lpc(cond[..., :LPC_ORDER])
        new_old = state.old_lpc
    else:
        lpc_now = lpc_mod.lpc_from_cepstrum(ring[..., :18])  # [B, T, 16]
        if cfg.lookahead > 0:
            # FIFO pushed count times: emitted lpc at step c-1 and the
            # final FIFO rows are windows over [reversed old FIFO | lpc_now]
            # -- selected by one-hot contractions (no TPU gathers)
            ext2 = jnp.concatenate([state.old_lpc[:, ::-1], lpc_now], axis=1)
            la = cfg.lookahead
            w2 = ext2.shape[1]
            oh = (jnp.arange(w2)[None, :] == last1[:, None]).astype(
                jnp.float32)
            lpc = jnp.einsum("bs,bsk->bk", oh, ext2)
            new_old = jnp.stack(
                [jnp.einsum(
                    "bs,bsk->bk",
                    (jnp.arange(w2)[None, :]
                     == (la + last1 - jnp.where(count > 0, 0, 1) - j)[:, None]
                     ).astype(jnp.float32), ext2)
                 for j in range(la)], axis=1)
        else:
            oh = (jnp.arange(T)[None, :] == last1[:, None]).astype(
                jnp.float32)
            lpc = jnp.einsum("bs,bsk->bk", oh, lpc_now)
            new_old = state.old_lpc
    if cfg.lpc_gamma != 1.0:
        lpc = lpc_mod.lpc_weighting(lpc, cfg.lpc_gamma)
    new_state = FrameState(mem1, mem2, new_old,
                           jnp.minimum(state.frame_count + count, 1000))
    return new_state, cond_a, cond_b, lpc


# --------------------------------------------------------------------------
# Sample-rate network (XLA lax.scan reference path)
# --------------------------------------------------------------------------

class SampleState(NamedTuple):
    """Per-stream AR state, batched [B, ...] (cf. LPCNetState,
    src/lpcnet_private.h:28-48)."""
    gru_a: jnp.ndarray        # [B, Na]
    gru_b: jnp.ndarray        # [B, Nb]
    last_sig: jnp.ndarray     # [B, 16] most recent first
    last_exc: jnp.ndarray     # [B] int32 u-law code
    deemph: jnp.ndarray       # [B] de-emphasis memory
    rng: Any                  # Kiss99State with [B] leaves


def init_sample_state(batch: int, cfg: LPCNetConfig) -> SampleState:
    from ..utils.rng import kiss99_srand
    return SampleState(
        gru_a=jnp.zeros((batch, cfg.rnn_units1), jnp.float32),
        gru_b=jnp.zeros((batch, cfg.rnn_units2), jnp.float32),
        last_sig=jnp.zeros((batch, LPC_ORDER), jnp.float32),
        last_exc=jnp.full((batch,), 128, jnp.int32),
        deemph=jnp.zeros((batch,), jnp.float32),
        rng=kiss99_srand(n_streams=batch),
    )


def sampling_logit_table():
    """t[i] = logit(.025 + .95*i/255) (src/lpcnet.c:188-191)."""
    import numpy as np
    i = np.arange(256, dtype=np.float32)
    p = 0.025 + 0.95 * i / 255.0
    return (-np.log((1.0 - p) / p)).astype(np.float32)


_LOGIT_TABLE = sampling_logit_table()


def _logit_table():
    return jnp.asarray(_LOGIT_TABLE)


def sample_excitation(dual_fc, gru_b_state, rng):
    """Bit-tree sampling of the 8-bit u-law excitation (src/nnet.c:163-214).

    Returns (exc [B] int32, new_rng). Two KISS99 draws per sample supply the
    8 threshold bytes, exactly like the C implementation.
    """
    from ..utils.rng import kiss99_step
    table = _logit_table()
    r1, rng = kiss99_step(rng)
    r2, rng = kiss99_step(rng)
    bytes_ = [
        (r1 >> 0) & 0xFF, (r1 >> 8) & 0xFF, (r1 >> 16) & 0xFF, (r1 >> 24) & 0xFF,
        (r2 >> 0) & 0xFF, (r2 >> 8) & 0xFF, (r2 >> 16) & 0xFF, (r2 >> 24) & 0xFF,
    ]
    thresholds = [jnp.take(table, b.astype(jnp.int32)) for b in bytes_]
    val = jnp.zeros(gru_b_state.shape[:-1], jnp.int32)
    for b in range(8):
        rows = (1 << b) | val
        logit = nn.mdense_logits_pair(dual_fc, gru_b_state, rows)
        bit = (thresholds[b] < logit).astype(jnp.int32)
        val = (val << 1) | bit
    return val, rng


def sample_excitation_pdf(dual_fc, gru_b_state, rng, corr):
    """Full-PDF sampling with voicing temperature and tail cutoff, the
    sampling used by the reference's Python synthesis
    (training_tf2/test_lpcnet.py:107-114): pdf ∝ p^(1+max(0,1.5·corr-0.5)),
    then p = max(p-0.002, 0), renormalized, sampled. One KISS99 draw
    supplies the uniform.

    Args: corr [B] pitch-correlation feature (features[..., 19]).
    Returns (exc [B] int32, new_rng).
    """
    from ..train.losses import tree_to_pdf
    from ..utils.rng import kiss99_step
    p_nodes = nn.mdense(dual_fc, gru_b_state)          # sigmoid tree probs
    pdf = tree_to_pdf(p_nodes)
    power = jnp.maximum(0.0, 1.5 * corr - 0.5)[..., None]
    pdf = pdf * jnp.power(jnp.clip(pdf, 1e-18, 1.0), power)
    pdf = pdf / (1e-18 + jnp.sum(pdf, axis=-1, keepdims=True))
    pdf = jnp.maximum(pdf - 0.002, 0.0)
    pdf = pdf / (1e-8 + jnp.sum(pdf, axis=-1, keepdims=True))
    r, rng = kiss99_step(rng)
    u = (r.astype(jnp.float32) + 0.5) / jnp.float32(2 ** 32)
    cdf = jnp.cumsum(pdf, axis=-1)
    exc = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(exc, 0, 255), rng


def sample_network_step(fused, state: SampleState, cond_a, cond_b,
                        sig_u, pred_u, pdf_corr=None):
    """One sample step given u-law codes of last signal and prediction.

    Dispatches on the fused dict's form: float (default) or int8-quantized
    (nn.quantized.quantize_fused) -- the latter matches the reference's
    DOT_PROD numerics (src/vec.h:206-236) with int8 MXU matmuls.

    pdf_corr selects full-PDF sampling (sample_excitation_pdf) instead of
    the C bit-tree sampler.
    """
    from ..nn import quantized as Q
    gate_a = (cond_a
              + jnp.take(fused["embed_sig_a"], sig_u, axis=0)
              + jnp.take(fused["embed_pred_a"], pred_u, axis=0)
              + jnp.take(fused["embed_exc_a"], state.last_exc, axis=0))
    if Q.is_quantized(fused):
        h_a = Q.gru_precomputed_step_q8(fused["gru_a_rec"], state.gru_a, gate_a)
        gate_b = cond_b + Q.qmatmul(Q.quantize_act_int8(h_a),
                                    fused["gru_b_in_q8"])
        h_b = Q.gru_precomputed_step_q8_dense(fused["gru_b_rec"],
                                              state.gru_b, gate_b)
    else:
        h_a = nn.gru_precomputed_step(fused["gru_a_rec"], state.gru_a, gate_a)
        gate_b = cond_b + jnp.matmul(h_a, fused["gru_b_in"],
                                     precision=nn.HIGHEST)
        h_b = nn.gru_precomputed_step(fused["gru_b_rec"], state.gru_b, gate_b)
    if pdf_corr is None:
        exc, rng = sample_excitation(fused["dual_fc"], h_b, state.rng)
    else:
        exc, rng = sample_excitation_pdf(fused["dual_fc"], h_b, state.rng,
                                         pdf_corr)
    return h_a, h_b, exc, rng


def synthesize_frame(fused, state: SampleState, cond_a, cond_b, lpc,
                     n_samples: int = 160, preload=None, pdf_corr=None):
    """Generate one frame of audio for a batch of streams.

    Args:
      state: SampleState [B, ...].
      cond_a/cond_b: per-frame conditioning, [B, 3Na]/[B, 3Nb].
      lpc: [B, 16].
      preload: optional [B, n_samples] float target pcm for teacher forcing
        (the C `preload` path, src/lpcnet.c:256-259) -- when given, the
        excitation/signal fed back is derived from the target instead of the
        model's own sample. Full-frame teacher forcing only (codec PLC uses
        whole frames).
      pdf_corr: optional [B] pitch correlation; switches to the full-PDF
        temperature/tail-cutoff sampler (training_tf2/test_lpcnet.py).

    Returns (new_state, pcm [B, n_samples] float in [-32767, 32767]).

    Matches lpcnet_synthesize_tail_impl (src/lpcnet.c:235-271).
    """
    use_preload = preload is not None
    if preload is None:
        preload = jnp.zeros(cond_a.shape[:-1] + (n_samples,), jnp.float32)

    def step(st: SampleState, target):
        pred = -jnp.sum(st.last_sig * lpc, axis=-1)
        sig_u = mulaw.lin2ulaw(st.last_sig[..., 0])
        pred_u = mulaw.lin2ulaw(pred)
        h_a, h_b, exc, rng = sample_network_step(
            fused, st, cond_a, cond_b, sig_u, pred_u, pdf_corr=pdf_corr)
        if use_preload:
            # teacher forcing: target is the de-emphasized waveform
            pcm = target - PREEMPHASIS * st.deemph
            exc = mulaw.lin2ulaw(pcm - pred)
        else:
            pcm = pred + mulaw.ulaw2lin(exc)
        new_last_sig = jnp.concatenate([pcm[..., None], st.last_sig[..., :-1]], axis=-1)
        out = pcm + PREEMPHASIS * st.deemph
        new_state = SampleState(h_a, h_b, new_last_sig, exc, out, rng)
        out = jnp.clip(out, -32767.0, 32767.0)
        return new_state, out

    new_state, pcm = jax.lax.scan(step, state, jnp.moveaxis(preload, -1, 0))
    pcm = jnp.moveaxis(pcm, 0, -1)
    return new_state, jnp.floor(0.5 + pcm)


def synthesize_frame_masked(fused, state: SampleState, cond_a, cond_b, lpc,
                            preload, preload_mask, advance_mask):
    """synthesize_frame with per-stream, per-sample control masks.

    The batched PLC runs streams whose control flow diverged (each stream has
    its own loss pattern); instead of host-side branching, every stream steps
    through the same fixed-shape scan and masks select the behavior
    (the TPU trade: worst-case compute for full batching).

    Args:
      preload: [B, n] teacher waveform (only read where preload_mask).
      preload_mask: [B, n] bool -- teacher-force this sample (C preload
        semantics, src/lpcnet.c:256-259).
      advance_mask: [B, n] bool -- process this sample at all; where False
        the stream's state (including its RNG) is frozen and the output
        sample is 0, exactly as if the stream had not been stepped.

    Returns (new_state, pcm [B, n]).
    """
    def step(st: SampleState, xs):
        target, tf, adv = xs
        pred = -jnp.sum(st.last_sig * lpc, axis=-1)
        sig_u = mulaw.lin2ulaw(st.last_sig[..., 0])
        pred_u = mulaw.lin2ulaw(pred)
        h_a, h_b, exc, rng = sample_network_step(
            fused, st, cond_a, cond_b, sig_u, pred_u)
        pcm_tf = target - PREEMPHASIS * st.deemph
        exc_tf = mulaw.lin2ulaw(pcm_tf - pred)
        exc = jnp.where(tf, exc_tf, exc)
        pcm = jnp.where(tf, pcm_tf, pred + mulaw.ulaw2lin(exc))
        new_last_sig = jnp.concatenate(
            [pcm[..., None], st.last_sig[..., :-1]], axis=-1)
        out = pcm + PREEMPHASIS * st.deemph
        new_state = SampleState(h_a, h_b, new_last_sig, exc, out, rng)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                adv.reshape(adv.shape + (1,) * (new.ndim - 1)), new, old),
            new_state, st)
        out = jnp.where(adv, jnp.clip(out, -32767.0, 32767.0), 0.0)
        return new_state, out

    xs = (jnp.moveaxis(jnp.asarray(preload, jnp.float32), -1, 0),
          jnp.moveaxis(jnp.asarray(preload_mask, bool), -1, 0),
          jnp.moveaxis(jnp.asarray(advance_mask, bool), -1, 0))
    new_state, pcm = jax.lax.scan(step, state, xs)
    return new_state, jnp.floor(0.5 + jnp.moveaxis(pcm, 0, -1))


# --------------------------------------------------------------------------
# Training graph (sequence form; mirrors training_tf2/lpcnet.py:234-313)
# --------------------------------------------------------------------------

def diff_embed(table, x):
    """Fractional embedding lookup (training_tf2/diffembed.py:35-41).

    Evaluated as a soft-one-hot matmul rather than two row gathers: the
    row-gather + backward scatter-add into the [256, 128] table cost ~40 ms
    fwd+bwd in the batch-128 train step (XLA lowers them to serialized
    dynamic ops on TPU), while the [*, 256] x [256, 128] contraction rides
    the MXU.  Same interpolation arithmetic: weight (1-alpha) at trunc(x)
    and alpha at clip(trunc(x)+1) (f32 accumulation, HIGHEST precision so
    alpha keeps full mantissa)."""
    alpha = (x - jnp.floor(x))[..., None]
    i0 = x.astype(jnp.int32)                       # trunc, like table[i0]
    i0c = jnp.clip(i0, 0, 255)[..., None]          # gather-clamp semantics
    i1c = jnp.clip(i0 + 1, 0, 255)[..., None]
    idx = jnp.arange(256, dtype=jnp.int32)
    w = jnp.where(idx == i0c, 1.0 - alpha, 0.0) + \
        jnp.where(idx == i1c, alpha, 0.0)          # [..., 256] soft one-hot
    return jax.lax.dot_general(
        w, table, dimension_numbers=(((w.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def frame_network_seq(params, features, periods, cfg: LPCNetConfig):
    """Training-mode frame-rate net with 'valid' convs.

    Args: features [B, Tf, 20], periods [B, Tf] int32.
    Returns cfeat [B, Tf-4, cond].
    """
    from ..nn import layers as L
    pembed = L.embedding(params["embed_pitch"], jnp.clip(periods, 0, 255))
    x = jnp.concatenate([features[..., : cfg.nb_used_features], pembed], axis=-1)
    x = L.conv1d_seq(params["feature_conv1"], x, "tanh", padding="valid")
    x = L.conv1d_seq(params["feature_conv2"], x, "tanh", padding="valid")
    x = L.dense(params["feature_dense1"], x, "tanh")
    return L.dense(params["feature_dense2"], x, "tanh")


def _train_gru_impl():
    """Pick the GRU-sequence recurrence for the training graph.

    The Pallas kernel (kernels/gru_train.py, the CuDNNGRU role in
    training_tf2/lpcnet.py:32) is the default on TPU -- the lax.scan path
    compiles to a T-iteration XLA loop whose per-iteration latency binds the
    step rate.  LPCNET_TRAIN_GRU=kernel|scan overrides (scan stays the
    reference semantics; kernel is bf16-operand DEFAULT-precision class).
    """
    import os
    mode = os.environ.get("LPCNET_TRAIN_GRU", "auto")
    if mode == "scan":
        return nn.gru_seq
    if mode == "auto":
        # the axon plugin reports a TPU backend even when tests pin the
        # default device to CPU (conftest) -- check the pin too
        dd = jax.config.jax_default_device
        if dd is not None and dd.platform == "cpu":
            return nn.gru_seq
    if mode in ("kernel", "kernel_a") or (
            mode == "auto" and jax.default_backend() not in ("cpu",)):
        from ..kernels.gru_train import gru_seq_pallas

        if mode == "kernel_a":
            # kernel only for MXU-width GRUs; the 16-unit GRU-B would pay
            # the full 128-lane padded kernel cost, scan it instead
            def pick(params, x, h0=None, precision=None):
                if params["recurrent"].shape[0] >= 128:
                    return gru_seq_pallas(params, x, h0=h0,
                                          precision=precision)
                return nn.gru_seq(params, x, h0=h0, precision=precision)
            return pick
        return gru_seq_pallas
    return nn.gru_seq


def _abl(ablate, name, fn, shape, seed):
    """Profiling hook: when `name` is ablated, skip `fn` entirely and stand
    in a cheap data-dependent broadcast of the *input* mean (same shape), so
    the component's fwd+bwd cost leaves the graph but downstream ops stay
    un-foldable.  Used only by tools/profile_train.py."""
    if name not in ablate:
        return fn()
    return jnp.broadcast_to(jnp.mean(seed) * 1e-3, shape)


def training_forward(params, cfg: LPCNetConfig, sig_in, features, periods,
                     lpc=None, rng=None, training: bool = True,
                     gru_states=None, ablate=(), noise_std: float = 0.3,
                     exc_hist_override=None):
    """Full training graph.

    Args:
      sig_in: [B, T] linear signal input (the target delayed by one sample,
        as produced by the data pipeline -- dump_data writes (in, out) pairs).
      features: [B, Tf, 20] with Tf = T//160 + 4 (conv context).
      periods: [B, Tf] int32 pitch indices.
      lpc: [B, T//160, 16] (required unless cfg.e2e).
      rng: PRNGKey for the Gaussian noise regularizers (training only).
      gru_states: optional (h_a [B, Na], h_b [B, Nb]) for stateful TBPTT.

    Returns dict with pdf [B, T, 256], tensor_preds, real_preds, cfeat, rc,
    and new gru states.
    """
    from ..nn import layers as L
    from ..train import losses as LL

    b, t = sig_in.shape
    cfeat = _abl(ablate, "framenet",
                 lambda: frame_network_seq(params, features, periods, cfg),
                 (b, features.shape[1] - 4, cfg.cond_size), features)
    if cfg.e2e:
        rc = cfeat[..., :LPC_ORDER]
        lpc = lpc_mod.rc2lpc(rc)
    else:
        rc = None
        assert lpc is not None

    weighting = jnp.power(jnp.float32(cfg.lpc_gamma),
                          jnp.arange(1, LPC_ORDER + 1, dtype=jnp.float32))
    real_preds = _abl(ablate, "preds",
                      lambda: LL.diff_pred(sig_in, lpc, cfg.frame_size),
                      (b, t), sig_in)
    tensor_preds = _abl(
        ablate, "preds",
        lambda: LL.diff_pred(sig_in, lpc * weighting, cfg.frame_size),
        (b, t), sig_in)
    if exc_hist_override is None:
        past_errors = LL.tf_l2u(sig_in - jnp.roll(tensor_preds, 1, axis=-1))
    else:
        # scheduled-sampling "hide-exc" arm: the excitation-history channel
        # is supplied by the caller (e.g. computed from the CLEAN signal) so
        # the model cannot read its own sampling deviation off this input
        # (see BENCHMARKS.md round-5 SS mechanism analysis)
        past_errors = exc_hist_override

    cpcm = jnp.stack([LL.tf_l2u(sig_in), LL.tf_l2u(tensor_preds), past_errors],
                     axis=-1)                                    # [B, T, 3]
    if training and rng is not None:
        rng, k1, k2 = jax.random.split(rng, 3)
        cpcm = cpcm + noise_std * jax.random.normal(k1, cpcm.shape)
    emb = _abl(ablate, "embed",
               lambda: diff_embed(params["embed_sig"]["table"],
                                  cpcm).reshape(b, t, 3 * EMBED_SIZE),
               (b, t, 3 * EMBED_SIZE), cpcm)

    rep = jnp.repeat(cfeat, cfg.frame_size, axis=-2)             # [B, T, C]
    rnn_in = jnp.concatenate([emb, rep], axis=-1)
    h_a0 = gru_states[0] if gru_states is not None else None
    h_b0 = gru_states[1] if gru_states is not None else None
    gru_seq = _train_gru_impl()
    if "gru_a" in ablate:
        gru1 = jnp.broadcast_to(jnp.mean(rnn_in) * 1e-3,
                                (b, t, cfg.rnn_units1))
        h_a = jnp.zeros((b, cfg.rnn_units1))
    else:
        gru1, h_a = gru_seq(params["gru_a"], rnn_in, h0=h_a0,
                            precision=jax.lax.Precision.DEFAULT)
    if training and rng is not None:
        gru1 = gru1 + 0.005 * jax.random.normal(k2, gru1.shape)
    gru_b_in = jnp.concatenate([gru1, rep], axis=-1)
    if "gru_b" in ablate:
        gru2 = jnp.broadcast_to(jnp.mean(gru_b_in) * 1e-3,
                                (b, t, cfg.rnn_units2))
        h_b = jnp.zeros((b, cfg.rnn_units2))
    else:
        gru2, h_b = gru_seq(params["gru_b"], gru_b_in, h0=h_b0,
                            precision=jax.lax.Precision.DEFAULT)
    p = _abl(ablate, "head",
             lambda: L.mdense(params["dual_fc"], gru2, "sigmoid"),
             (b, t, 256), gru2)
    # NOTE: the full [B, T, 256] pdf (tree_to_pdf) is deliberately NOT
    # materialized here -- it is pure HBM traffic (~315 MB at batch 128) and
    # the losses only ever read it at 1-2 target indices per sample.  Use
    # losses.tree_pdf_at / metric_cel_tree on `tree_probs` instead; callers
    # that really want the dense pdf can apply losses.tree_to_pdf themselves.
    return {"tree_probs": p, "tensor_preds": tensor_preds,
            "real_preds": real_preds, "cfeat": cfeat, "rc": rc,
            "gru_states": (h_a, h_b)}
