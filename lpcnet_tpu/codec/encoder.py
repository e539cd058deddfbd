"""Batched 1.6 kb/s encoder: features -> quantized superframe -> packet.

Mirrors lpcnet_encode / process_superframe(encode=1, quantize=1)
(src/lpcnet_enc.c:579-743, :882-893) over a stream batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.constants import FRAME_SIZE, NB_BANDS
from ..dsp.lpc import lpc_from_cepstrum
from . import features as F
from . import packet as P
from . import quantize as Q
from .codebooks import Codebooks, load_codebooks


def encode_superframe(state: F.EncoderState, pcm, cbs: Codebooks
                      ) -> Tuple[F.EncoderState, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One 40 ms superframe: pcm [B, 640] -> (state, features_q, wire fields)."""
    state, feats = F.superframe_analysis(state, pcm)

    from ..dsp import pitch as pitch_mod
    w = F.normalized_frame_weights(state.frame_weight, 2, 8)
    xcs = jax.vmap(jax.vmap(pitch_mod.octave_suppress))(state.xc[:, 2:10])
    carry, periods, corr = jax.vmap(pitch_mod.viterbi_track)(state.viterbi, xcs, w)
    corr = jnp.maximum(corr, 0.0)                     # quantize path clamp

    pq = jax.vmap(Q.quantize_pitch)(periods.astype(jnp.float32), w, corr)
    feats = feats.at[..., NB_BANDS].set(pq.period_feat)
    feats = feats.at[..., NB_BANDS + 1].set(pq.corr_feat[..., None])

    f3 = feats[:, 3, :NB_BANDS]
    c0_id, f3c0 = Q.quantize_c0(f3[..., 0])
    vq_end, recon3 = jax.vmap(
        lambda x: Q.quantize_3stage_mbest(x, cbs.stage1, cbs.stage2, cbs.stage3)
    )(f3[..., 1:])
    f3q = jnp.concatenate([f3c0[..., None], recon3], axis=-1)

    f1 = feats[:, 1, :NB_BANDS]
    vq_mid, f1q = jax.vmap(
        lambda x, l, r: Q.quantize_diff(x, l, r, cbs.diff4)
    )(f1, state.vq_mem, f3q)

    interp_id = jax.vmap(Q.double_interp_search)(
        feats[:, 0, :NB_BANDS], feats[:, 2, :NB_BANDS], state.vq_mem, f1q, f3q)
    f0q, f2q = jax.vmap(Q.apply_double_interp)(state.vq_mem, f1q, f3q, interp_id)

    ceps_q = jnp.stack([f0q, f1q, f2q, f3q], axis=1)  # [B, 4, 18]
    feats = feats.at[..., :NB_BANDS].set(ceps_q)
    feats = feats.at[..., NB_BANDS + 2:].set(lpc_from_cepstrum(ceps_q))

    xc_new = state.xc.at[:, 2:10].set(xcs).at[:, 0:2].set(xcs[:, 6:8])
    state = state._replace(xc=xc_new, viterbi=carry, vq_mem=f3q)

    fields = {
        "c0_id": c0_id + 64,
        "main_pitch": pq.main_pitch,
        "modulation": jnp.where(pq.voiced, pq.modulation + 4, 0),
        "corr_id": pq.corr_id,
        "vq_end0": vq_end[..., 0],
        "vq_end1": vq_end[..., 1],
        "vq_end2": vq_end[..., 2],
        "vq_mid": vq_mid,
        "interp": interp_id,
    }
    return state, feats, fields


class LPCNetEncoder:
    """Stateful batched encoder with the C API's shape (lpcnet_encode)."""

    def __init__(self, batch: int = 1, codebooks: Codebooks | None = None):
        self.batch = batch
        self.cbs = codebooks or load_codebooks()
        self.state = F.init_encoder_state(batch)
        # NOTE: codebooks ride as pytree ARGUMENTS, not jit closure
        # constants -- embedded-constant executables serialize dispatch on
        # the axon backend (~30 ms/call penalty; see NOTES.md)
        self._encode = jax.jit(encode_superframe)
        self._features = jax.jit(F.compute_features)

    def encode(self, pcm: np.ndarray) -> np.ndarray:
        """pcm [B, 640] int16/float -> [B, 8] uint8 packets."""
        pcm = jnp.asarray(np.asarray(pcm, np.float32))
        self.state, _, fields = self._encode(self.state, pcm, self.cbs)
        return P.pack_fields({k: np.asarray(v) for k, v in fields.items()})

    def compute_features(self, pcm: np.ndarray) -> np.ndarray:
        """Unquantized features: pcm [B, T*640] -> [B, T, 4, 36]."""
        pcm = jnp.asarray(np.asarray(pcm, np.float32))
        self.state, feats = self._features(self.state, pcm)
        return np.asarray(feats)
