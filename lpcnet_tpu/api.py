"""Public API mirroring the reference C API (include/lpcnet.h) plus the
batched-streams entry points that are this framework's reason to exist.

C-shaped single-stream usage:

    enc = lpcnet_encoder_create()
    pkt = lpcnet_encode(enc, pcm640)
    dec = lpcnet_decoder_create(model)
    pcm = lpcnet_decode(dec, pkt)

Batched production usage:

    synth = Synthesizer(model, batch=256)
    pcm = synth.synthesize(features)          # [256, 160] per call

Model loading accepts a DNNw blob (the reference's binary weight format,
include/lpcnet.h:214) or a native .npz checkpoint.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax

from .codec.decoder import LPCNetDecoder
from .codec.encoder import LPCNetEncoder
from .codec import features as _features
from .dsp.constants import NB_TOTAL_FEATURES
from .dsp.lpc import lpc_from_cepstrum
from .models import lpcnet as M
from .weights.checkpoint import load_checkpoint
from .weights.lpcnet_arrays import load_lpcnet_blob


def load_model(path: Optional[str] = None, seed: int = 0,
               int8: bool = False):
    """Load model weights: .bin DNNw blob, .npz checkpoint, or (path=None)
    deterministic random init for smoke testing.

    int8=True converts the sample-rate network's quantized matrices (GRU-A
    off-diagonal recurrent, GRU-B input) to int8, matching the reference's
    DOT_PROD inference numerics (src/vec.h:206-236) at half the weight
    footprint. Lossless for blob imports and quantize-finetuned checkpoints
    (their weights sit on the 1/128 grid).

    Returns (fused_inference_params, cfg).
    """
    cfg = M.LPCNetConfig()
    if path is None:
        params = M.init_params(jax.random.PRNGKey(seed), cfg)
        fused = M.fuse_inference_params(params, cfg)
    elif path.endswith(".npz"):
        params, cfg = load_checkpoint(path)
        fused = M.fuse_inference_params(params, cfg)
    else:
        with open(path, "rb") as f:
            fused = load_lpcnet_blob(f.read(), cfg)
    if int8:
        from .nn.quantized import quantize_fused
        fused = quantize_fused(fused)
    return fused, cfg


class Synthesizer:
    """Batched vocoder: feature frames in, PCM out (lpcnet_synthesize)."""

    def __init__(self, model_path: Optional[str] = None, batch: int = 1,
                 fused=None, cfg: Optional[M.LPCNetConfig] = None):
        if fused is None:
            fused, cfg = load_model(model_path)
        self.cfg = cfg or M.LPCNetConfig()
        self.batch = batch
        self._dec = LPCNetDecoder.from_fused(fused, self.cfg, batch,
                                             with_codebooks=False)

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """[B, 36] (or [B, >=20]) one frame of features -> [B, 160] int16."""
        feats = np.zeros((self.batch, NB_TOTAL_FEATURES), np.float32)
        feats[:, : features.shape[-1]] = features
        return self._dec.synthesize(feats)

    def reset(self):
        self._dec.frame_state = M.init_frame_state(self.batch, self.cfg)
        self._dec.sample_state = M.init_sample_state(self.batch, self.cfg)


# ---- C-shaped wrappers ----------------------------------------------------

def lpcnet_encoder_create(batch: int = 1) -> LPCNetEncoder:
    return LPCNetEncoder(batch=batch)


def lpcnet_encode(enc: LPCNetEncoder, pcm: np.ndarray) -> np.ndarray:
    """pcm [640] or [B, 640] -> packet(s) uint8 [8] / [B, 8]."""
    pcm = np.asarray(pcm)
    single = pcm.ndim == 1
    out = enc.encode(pcm[None] if single else pcm)
    return out[0] if single else out


def lpcnet_compute_features(enc: LPCNetEncoder, pcm: np.ndarray) -> np.ndarray:
    pcm = np.asarray(pcm)
    single = pcm.ndim == 1
    out = enc.compute_features(pcm[None] if single else pcm)
    return out[0] if single else out


def lpcnet_compute_single_frame_features(enc: LPCNetEncoder, pcm: np.ndarray
                                         ) -> np.ndarray:
    """pcm [160] or [B, 160] -> features [36] / [B, 36]."""
    import jax.numpy as jnp
    pcm = np.asarray(pcm, np.float32)
    single = pcm.ndim == 1
    x = jnp.asarray(pcm[None] if single else pcm)
    if not hasattr(enc, "_single"):
        enc._single = jax.jit(_features.compute_single_frame_features)
    enc.state, feats = enc._single(enc.state, x)
    feats = np.asarray(feats)
    return feats[0] if single else feats


def lpcnet_decoder_create(model_path: Optional[str] = None, batch: int = 1
                          ) -> LPCNetDecoder:
    fused, cfg = load_model(model_path)
    return LPCNetDecoder(fused, cfg, batch=batch, fused=True)


def lpcnet_decode(dec: LPCNetDecoder, packet: np.ndarray) -> np.ndarray:
    packet = np.asarray(packet, np.uint8)
    single = packet.ndim == 1
    out = dec.decode(packet[None] if single else packet)
    return out[0] if single else out


def add_lpc_to_features(features: np.ndarray) -> np.ndarray:
    """-addlpc mode: fill columns 20:36 with LPC from the cepstrum
    (src/lpcnet_demo.c:250-259)."""
    features = np.array(features, np.float32, copy=True)
    features[..., 20:36] = np.asarray(lpc_from_cepstrum(features[..., :18]))
    return features
