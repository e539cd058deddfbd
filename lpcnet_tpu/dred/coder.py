"""DRED encoder/decoder drivers.

Mirrors the C driver surface (include/dred_rdovae.h, src/dred_rdovae.c:38-52)
and the FEC packetizer (torch/rdovae/fec_encoder.py:136-167): the encoder
consumes feature frames 2 at a time, buffers latents + decoder-init states,
and emits redundancy payloads whose older latents are quantized coarser
(q interpolated from q0 for the newest to q1 for the oldest); the decoder
reconstructs 4 feature frames per latent, newest first.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import rdovae as RV
from . import entropy as EC


class DREDEncoder:
    """Streaming DRED encoder (cf. RDOVAEEncState, src/dred_rdovae_enc.h:35-40)."""

    def __init__(self, params, cfg: Optional[RV.RDOVAEConfig] = None,
                 batch: int = 1, max_latents: int = 100):
        self.params = params
        self.cfg = cfg or RV.RDOVAEConfig()
        self.batch = batch
        self.max_latents = max_latents
        self.state = RV.init_encoder_stream(batch, self.cfg)
        self.latents: List[np.ndarray] = []
        self.init_states: List[np.ndarray] = []
        self._frame_buf: Optional[np.ndarray] = None
        self._step = jax.jit(lambda st, f: RV.encode_dframe(
            self.params, st, f, self.cfg))
        self.fixed_stats = EC.stats_fixed_point(self.params, self.cfg)

    def reset(self):
        self.state = RV.init_encoder_stream(self.batch, self.cfg)
        self.latents, self.init_states = [], []
        self._frame_buf = None

    def add_feature_frame(self, features: np.ndarray):
        """features [B, 20]; every second call produces a latent."""
        f = np.asarray(features, np.float32)[..., : self.cfg.num_features]
        if self._frame_buf is None:
            self._frame_buf = f
            return
        pair = np.concatenate([self._frame_buf, f], axis=-1)
        self._frame_buf = None
        self.state, z, st = self._step(self.state, jnp.asarray(pair))
        self.latents.append(np.asarray(z))
        self.init_states.append(np.asarray(st))
        if len(self.latents) > self.max_latents:
            self.latents.pop(0)
            self.init_states.pop(0)

    def produce_payload(self, num_redundancy_frames: int = 52,
                        q0: int = 9, q1: int = 15):
        """Build one redundancy payload from the newest latents.

        Returns dict with zq [B, L, latent] int latents (newest LAST, i.e.
        decode order is reversed downstream), q_ids [L], state [B, 24] (the
        PVQ-quantized unit-norm decoder init), bits [B] estimated payload
        size, and payloads: a list of B entropy-coded byte strings (see
        entropy.encode_payload for the framing).
        """
        n_lat = num_redundancy_frames // 2
        if len(self.latents) < n_lat:
            return None
        z = jnp.asarray(np.stack(self.latents[-n_lat:], axis=1))  # [B, L, 80]
        # oldest latent (index 0) -> coarsest level q1, newest -> q0,
        # matching torch/rdovae/fec_encoder.py:125-127
        q_ids = EC.payload_q_ids(n_lat, q0, q1)
        zq, rates = quantize_latents(self.params, z, jnp.asarray(q_ids), self.cfg)
        zq = np.asarray(zq)
        raw_state = np.asarray(self.init_states[-1])
        k = self.cfg.pvq_num_pulses
        pulses = np.stack([EC.pvq_search(raw_state[b], k)
                           for b in range(zq.shape[0])])
        state = np.stack([EC.pvq_normalize(p) for p in pulses])
        payloads = [EC.encode_payload(zq[b].astype(np.int32), pulses[b],
                                      q0, q1, self.fixed_stats, k)
                    for b in range(zq.shape[0])]
        bits = 8 * jnp.ceil((jnp.sum(rates, axis=(-1,)) + 7 + RV.pvq_state_bits(self.cfg)) / 8)
        return {"zq": zq, "q_ids": q_ids, "state": state,
                "bits": np.asarray(bits), "payloads": payloads}


def quantize_latents(params, z, q_ids, cfg: RV.RDOVAEConfig):
    """z [B, L, latent], q_ids [L] -> (round-quantized symbols, rates [B, L]).
    Matches RDOVAE.quantize (torch rdovae.py:584-595)."""
    stats = RV.statistical_model(params, q_ids, cfg)
    zq = z * stats["quant_scale"]
    zq = RV.soft_dead_zone(zq, stats["dead_zone"])
    zq = jnp.clip(jnp.round(zq), -EC.MAX_MAG, EC.MAX_MAG)
    rates = RV.hard_rate_estimate(zq, stats["r_hard"], stats["theta_hard"],
                                  reduce=False)
    return zq, rates


def unquantize_latents(params, zq, q_ids, cfg: RV.RDOVAEConfig):
    stats = RV.statistical_model(params, q_ids, cfg)
    return zq / stats["quant_scale"]


class DREDDecoder:
    """Redundancy decoder (DRED_rdovae_decode_all, src/dred_rdovae.c:38-52)."""

    def __init__(self, params, cfg: Optional[RV.RDOVAEConfig] = None):
        self.params = params
        self.cfg = cfg or RV.RDOVAEConfig()
        self._decode = jax.jit(self._decode_impl, static_argnames=("n",))

    def _decode_impl(self, z, state, n: int):
        dec = RV.init_decoder_stream(self.params, state, self.cfg)

        def step(dec, zi):
            dec, frames = RV.decode_qframe(self.params, dec, zi, self.cfg)
            return dec, frames

        _, frames = jax.lax.scan(step, dec, jnp.moveaxis(z, 1, 0))
        # [L, B, 4, 20] -> [B, L*4, 20]
        frames = jnp.moveaxis(frames, 1, 0)
        b = frames.shape[0]
        return frames.reshape(b, -1, self.cfg.num_features)

    def decode_all(self, zq, q_ids, state) -> np.ndarray:
        """zq [B, L, latent] quantized symbols newest-last; q_ids [L];
        state [B, 24]. Returns features [B, L*4, 20] in decode order
        (newest latent first, 4 frames per latent)."""
        z = unquantize_latents(self.params, jnp.asarray(zq, jnp.float32),
                               jnp.asarray(q_ids), self.cfg)
        z_rev = jnp.flip(z, axis=1)       # newest first
        return np.asarray(self._decode(z_rev, jnp.asarray(state), n=z.shape[1]))

    def decode_payload(self, payload: bytes) -> np.ndarray:
        """Entropy-coded payload (entropy.encode_payload framing) ->
        features [1, L*4, 20], newest latent first."""
        if not hasattr(self, "_fixed_stats"):
            self._fixed_stats = EC.stats_fixed_point(self.params, self.cfg)
        zq, pulses, q_ids = EC.decode_payload(
            payload, self._fixed_stats, self.cfg.state_dim,
            self.cfg.pvq_num_pulses)
        state = EC.pvq_normalize(pulses)[None]
        return self.decode_all(zq[None], q_ids, state)
