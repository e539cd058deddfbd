"""Stateful vocoder core mirroring the C LPCNetState object
(src/lpcnet_private.h:28-48): holds the current frame conditioning so the
PLC can call the sample-rate tail independently of the frame network
(lpcnet_synthesize_tail_impl), plus the deferred feature buffer
(run_frame_network_deferred/flush, src/lpcnet.c:122-144).

Host-side control flow, jitted device math; jit specializations are cached
per (n_samples, preload?) signature.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..dsp.constants import FRAME_SIZE, LPC_ORDER
from ..models import lpcnet as M


class LPCNetCore:
    def __init__(self, fused, cfg: M.LPCNetConfig, batch: int = 1):
        self.fused = fused
        self.cfg = cfg
        self.batch = batch
        self.reset()
        self._jits: Dict = {}

    # -- state management -------------------------------------------------
    def reset(self):
        b, cfg = self.batch, self.cfg
        self.fstate = M.init_frame_state(b, cfg)
        self.sstate = M.init_sample_state(b, cfg)
        self.cond_a = jnp.zeros((b, 3 * cfg.rnn_units1), jnp.float32)
        self.cond_b = jnp.zeros((b, 3 * cfg.rnn_units2), jnp.float32)
        self.lpc = jnp.zeros((b, LPC_ORDER), jnp.float32)
        self.feature_buffer: List[np.ndarray] = []

    def reset_signal(self):
        """lpcnet_reset_signal (src/lpcnet.c:226-233): clear the sample-rate
        state but keep conditioning and frame counters."""
        b, cfg = self.batch, self.cfg
        s = M.init_sample_state(b, cfg)
        # keep the RNG running (C does not reseed here)
        self.sstate = s._replace(rng=self.sstate.rng)

    def copy_state(self):
        return (self.fstate, self.sstate, self.cond_a, self.cond_b, self.lpc,
                list(self.feature_buffer))

    def restore_state(self, saved):
        (self.fstate, self.sstate, self.cond_a, self.cond_b, self.lpc,
         self.feature_buffer) = saved[0], saved[1], saved[2], saved[3], saved[4], list(saved[5])

    # -- frame network ----------------------------------------------------
    def _jit(self, key, fn):
        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def frame_network(self, features):
        features = jnp.asarray(features, jnp.float32)
        fn = self._jit(("frame",), lambda fs, f: M.frame_network(
            self.fused, fs, f, self.cfg))
        self.fstate, _, self.cond_a, self.cond_b, self.lpc = fn(
            self.fstate, features)

    def frame_network_deferred(self, features):
        max_buf = 2 * (self.cfg.conv_kernel - 1)
        if len(self.feature_buffer) == max_buf:
            self.feature_buffer.pop(0)
        self.feature_buffer.append(np.asarray(features, np.float32))

    def frame_network_flush(self):
        for f in self.feature_buffer:
            self.frame_network(f)
        self.feature_buffer = []

    # -- synthesis --------------------------------------------------------
    def synthesize_tail(self, n: int, preload: Optional[np.ndarray] = None
                        ) -> np.ndarray:
        """Generate n samples with the current conditioning; with `preload`
        [B, n], teacher-force the whole span (the only preload patterns the
        PLC uses are 0 or the full span)."""
        live = np.asarray(self.fstate.frame_count) > self.cfg.lookahead
        if preload is None:
            fn = self._jit(("tail", n), lambda ss, ca, cb, lp: M.synthesize_frame(
                self.fused, ss, ca, cb, lp, n_samples=n))
            new_ss, pcm = fn(self.sstate, self.cond_a, self.cond_b, self.lpc)
        else:
            preload = jnp.asarray(np.asarray(preload, np.float32))
            fn = self._jit(("tailp", n), lambda ss, ca, cb, lp, pre: M.synthesize_frame(
                self.fused, ss, ca, cb, lp, n_samples=n, preload=pre))
            new_ss, pcm = fn(self.sstate, self.cond_a, self.cond_b, self.lpc, preload)
        # reference warmup: no output/state update until conv pipeline primed
        if live.all():
            self.sstate = new_ss
            return np.asarray(pcm)
        mask = jnp.asarray(live)
        self.sstate = jax.tree.map(
            lambda new, old: jnp.where(
                mask.reshape(mask.shape + (1,) * (new.ndim - 1)), new, old),
            new_ss, self.sstate)
        return np.where(live[:, None], np.asarray(pcm), 0.0)

    def synthesize(self, features, n: int = FRAME_SIZE,
                   preload: Optional[np.ndarray] = None) -> np.ndarray:
        """lpcnet_synthesize_impl: frame network + tail."""
        self.frame_network(features)
        return self.synthesize_tail(n, preload)
