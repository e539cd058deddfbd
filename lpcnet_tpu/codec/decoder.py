"""Batched packet decoder: 8 bytes -> 4 feature frames -> 640 samples.

Mirrors decode_packet (src/lpcnet_dec.c:81-155) and lpcnet_decode
(src/lpcnet.c:310-319).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.constants import (
    MULTI_MASK,
    NB_BANDS,
    NB_TOTAL_FEATURES,
)
from ..models import lpcnet as M
from . import packet as P
from . import quantize as Q
from .codebooks import Codebooks, load_codebooks


def decode_packet_features(fields, vq_mem, cbs: Codebooks
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wire fields (dict of [B] int32) + vq_mem [B, 18] -> features [B, 4, 36].

    Returns (features, new_vq_mem). LPC columns are left zero; synthesis
    recomputes LPC from the cepstrum, as the reference does.
    """
    c0_id = fields["c0_id"] - 64
    modulation = fields["modulation"] - 4
    voiced = modulation != -4
    modulation = jnp.where(voiced, modulation, 0)
    period_feat, corr_feat = jax.vmap(Q.dequantize_pitch)(
        fields["main_pitch"], modulation, fields["corr_id"], voiced)

    f3 = jnp.concatenate([
        (c0_id.astype(jnp.float32) / 4.0)[..., None],
        cbs.stage1[fields["vq_end0"]] + cbs.stage2[fields["vq_end1"]]
        + cbs.stage3[fields["vq_end2"]],
    ], axis=-1)

    vq_mid = fields["vq_mid"]
    n = cbs.diff4.shape[0]
    sign = jnp.where(vq_mid >= n, -1.0, 1.0)
    idx = vq_mid & (n - 1)
    diff = sign[..., None] * cbs.diff4[idx]
    sel = idx & MULTI_MASK
    mean_p = 0.5 * (vq_mem + f3)
    pred = jnp.where((sel < 2)[..., None], mean_p,
                     jnp.where((sel == 2)[..., None], vq_mem, f3))
    f1 = diff + pred

    f0, f2 = jax.vmap(Q.apply_double_interp)(vq_mem, f1, f3, fields["interp"])

    ceps = jnp.stack([f0, f1, f2, f3], axis=1)        # [B, 4, 18]
    b = ceps.shape[0]
    feats = jnp.zeros((b, 4, NB_TOTAL_FEATURES), jnp.float32)
    feats = feats.at[..., :NB_BANDS].set(ceps)
    feats = feats.at[..., NB_BANDS].set(period_feat)
    feats = feats.at[..., NB_BANDS + 1].set(corr_feat[..., None])
    return feats, f3


def _synthesize_one_frame(fused, cfg, fstate, sstate, feats, preload=None,
                          kernel_weights=None):
    """Frame net + sample loop with the reference's warmup semantics.

    Until the conv pipeline is primed (frame_count <= lookahead after the
    frame-net increment) the reference emits silence and does NOT advance
    the sample-rate state (src/lpcnet.c:239-243); we mask both.

    With `kernel_weights` (from kernels.sample_loop.kernel_weights) the
    free-running path uses the fused Pallas kernel; teacher forcing always
    uses the scan path.
    """
    fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    if kernel_weights is not None and preload is None:
        from ..kernels.sample_loop import synthesize_frame_auto
        new_sstate, pcm = synthesize_frame_auto(
            kernel_weights, sstate, ca, cb, lpc, cfg)
    else:
        new_sstate, pcm = M.synthesize_frame(fused, sstate, ca, cb, lpc,
                                             preload=preload)
    live = fstate.frame_count > cfg.lookahead          # [B] bool
    def sel(new, old):
        mask = live.reshape(live.shape + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)
    sstate = jax.tree.map(sel, new_sstate, sstate)
    return fstate, sstate, jnp.where(live[..., None], pcm, 0.0)


class LPCNetDecoder:
    """Stateful batched decoder (packets -> audio), cf. LPCNetDecState."""

    @classmethod
    def from_fused(cls, fused, cfg: M.LPCNetConfig, batch: int = 1,
                   use_pallas: bool | None = None,
                   with_codebooks: bool = True):
        """Construct directly from fused inference params (skips re-fusing).

        with_codebooks=False builds a synthesis-only instance (no packet
        decoding) -- used by api.Synthesizer."""
        self = cls.__new__(cls)
        self.cfg = cfg
        self.batch = batch
        self.cbs = load_codebooks() if with_codebooks else None
        self.fused = fused
        if use_pallas is None:
            import jax as _jax
            use_pallas = (_jax.default_backend() != "cpu" and batch >= 64)
        self._kw = None
        if use_pallas:
            from ..kernels.sample_loop import kernel_weights as _mk_kw
            self._kw = _mk_kw(fused, cfg)
        self.vq_mem = jnp.zeros((batch, NB_BANDS), jnp.float32)
        self.frame_state = M.init_frame_state(batch, cfg)
        self.sample_state = M.init_sample_state(batch, cfg)
        if with_codebooks:
            self._decode_feats = jax.jit(
                lambda fields, vq: decode_packet_features(fields, vq, self.cbs))
            self._synth = jax.jit(self._synth_packet)
        return self

    def __init__(self, params, cfg: M.LPCNetConfig, batch: int = 1,
                 codebooks: Codebooks | None = None, fused: bool = False,
                 use_pallas: bool | None = None):
        self.cfg = cfg
        self.batch = batch
        self.cbs = codebooks or load_codebooks()
        self.fused = params if fused else M.fuse_inference_params(params, cfg)
        # the fused kernel pays off on TPU from moderate batch sizes; the
        # scan path is better for tiny batches and is the CPU reference
        if use_pallas is None:
            import jax as _jax
            use_pallas = (_jax.default_backend() != "cpu" and batch >= 64)
        self._kw = None
        if use_pallas:
            from ..kernels.sample_loop import kernel_weights as _mk_kw
            self._kw = _mk_kw(self.fused, cfg)
        self.vq_mem = jnp.zeros((batch, NB_BANDS), jnp.float32)
        self.frame_state = M.init_frame_state(batch, cfg)
        self.sample_state = M.init_sample_state(batch, cfg)
        self._decode_feats = jax.jit(decode_packet_features)
        self._synth = jax.jit(self._synth_packet)

    def _synth_packet(self, fstate, sstate, feats):
        pcm = []
        for k in range(4):
            fstate, sstate, frame_pcm = _synthesize_one_frame(
                self.fused, self.cfg, fstate, sstate, feats[:, k],
                kernel_weights=self._kw)
            pcm.append(frame_pcm)
        return fstate, sstate, jnp.concatenate(pcm, axis=-1)

    def decode(self, packets: np.ndarray) -> np.ndarray:
        """packets [B, 8] uint8 -> pcm [B, 640] int16."""
        fields = {k: jnp.asarray(v) for k, v in P.unpack_fields(packets).items()}
        feats, self.vq_mem = self._decode_feats(fields, self.vq_mem, self.cbs)
        self.frame_state, self.sample_state, pcm = self._synth(
            self.frame_state, self.sample_state, feats)
        return np.asarray(pcm).astype(np.int16)

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """features [B, 36] (one frame) -> pcm [B, 160] int16."""
        feats = jnp.asarray(np.asarray(features, np.float32))

        if not hasattr(self, "_synth_one"):
            self._synth_one = jax.jit(
                lambda fs, ss, f: _synthesize_one_frame(
                    self.fused, self.cfg, fs, ss, f, kernel_weights=self._kw))
        self.frame_state, self.sample_state, pcm = self._synth_one(
            self.frame_state, self.sample_state, feats)
        return np.asarray(pcm).astype(np.int16)
