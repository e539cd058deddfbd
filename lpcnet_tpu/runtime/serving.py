"""Multi-stream serving session: slot management over a fixed device batch.

Production shape: a `StreamPool` owns a fixed-capacity batch of decoder
state on device (static shapes, one compiled step). Streams attach/detach
from slots; every 10 ms tick, the pool gathers per-stream feature frames (or
packets) into batch order with the native runtime, runs ONE device step for
all slots, and scatters PCM back per stream. Inactive slots still step (TPU
prefers uniform work) but their state is re-zeroed on attach and their
output discarded.

This replaces the reference's one-state-object-per-stream C API for
large-scale serving (the per-stream API remains available in lpcnet_tpu.api).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..codec.decoder import LPCNetDecoder
from ..dsp.constants import NB_TOTAL_FEATURES
from ..models import lpcnet as M


class StreamPool:
    def __init__(self, fused, cfg: M.LPCNetConfig, capacity: int = 256):
        self.cfg = cfg
        self.capacity = capacity
        self.dec = LPCNetDecoder(fused, cfg, batch=capacity, fused=True)
        self.free = list(range(capacity))[::-1]
        self.slot_of: Dict[str, int] = {}
        self._feat_buf = np.zeros((capacity, NB_TOTAL_FEATURES), np.float32)

    # -- stream lifecycle ------------------------------------------------
    def attach(self, stream_id: str) -> int:
        if stream_id in self.slot_of:
            return self.slot_of[stream_id]
        if not self.free:
            raise RuntimeError("stream pool full")
        slot = self.free.pop()
        self.slot_of[stream_id] = slot
        self._reset_slot(slot)
        return slot

    def detach(self, stream_id: str) -> None:
        slot = self.slot_of.pop(stream_id, None)
        if slot is not None:
            self.free.append(slot)

    def _reset_slot(self, slot: int):
        """Zero one slot's state without touching the others."""
        b1 = M.init_frame_state(1, self.cfg)
        s1 = M.init_sample_state(1, self.cfg)

        def put(batched, single):
            import jax
            return jax.tree.map(
                lambda full, one: full.at[slot].set(one[0]), batched, single)

        self.dec.frame_state = put(self.dec.frame_state, b1)
        self.dec.sample_state = put(self.dec.sample_state, s1)
        if getattr(self.dec, "vq_mem", None) is not None:
            self.dec.vq_mem = self.dec.vq_mem.at[slot].set(0.0)
        self._feat_buf[slot] = 0.0

    # -- ticking ---------------------------------------------------------
    def step_features(self, features: Dict[str, np.ndarray]
                      ) -> Dict[str, np.ndarray]:
        """One 10 ms tick: {stream_id: [36] features} -> {stream_id: [160] i16}.

        Streams without a feature frame this tick repeat their last frame
        (concealment should go through the PLC API instead).
        """
        for sid, feat in features.items():
            slot = self.attach(sid)
            self._feat_buf[slot, : len(feat)] = feat
        pcm = self.dec.synthesize(self._feat_buf)          # [capacity, 160]
        return {sid: pcm[slot] for sid, slot in self.slot_of.items()}

    def step_packets(self, packets: Dict[str, np.ndarray]
                     ) -> Dict[str, np.ndarray]:
        """One 40 ms tick: {stream_id: [8] uint8} -> {stream_id: [640] i16}."""
        buf = np.zeros((self.capacity, 8), np.uint8)
        for sid, pkt in packets.items():
            buf[self.attach(sid)] = pkt
        pcm = self.dec.decode(buf)
        return {sid: pcm[slot] for sid, slot in self.slot_of.items()}

    @property
    def n_active(self) -> int:
        return len(self.slot_of)


class PLCStreamPool:
    """Mixed-loss concealment pool over plc.batched.BatchedPLC.

    Every 10 ms tick takes {stream_id: [160] pcm or None (lost)} and returns
    concealed audio for every active stream -- each stream follows its own
    loss pattern inside ONE jitted device step, which the host-control-flow
    PLC cannot do (it would need one dispatch group per distinct pattern).
    """

    def __init__(self, fused, cfg: M.LPCNetConfig, plc_params,
                 capacity: int = 256, enable_blending: bool = True,
                 non_causal: bool = False):
        from ..plc.batched import BatchedPLC
        self.capacity = capacity
        self.plc = BatchedPLC(fused, cfg, plc_params, batch=capacity,
                              enable_blending=enable_blending,
                              non_causal=non_causal)
        self.free = list(range(capacity))[::-1]
        self.slot_of: Dict[str, int] = {}
        self._init_slot_state = None

    def attach(self, stream_id: str) -> int:
        if stream_id in self.slot_of:
            return self.slot_of[stream_id]
        if not self.free:
            raise RuntimeError("PLC pool full")
        slot = self.free.pop()
        self.slot_of[stream_id] = slot
        self._reset_slot(slot)
        return slot

    def detach(self, stream_id: str) -> None:
        slot = self.slot_of.pop(stream_id, None)
        if slot is not None:
            self.free.append(slot)

    def _reset_slot(self, slot: int):
        import jax
        if self._init_slot_state is None:
            self._init_slot_state = self.plc.init_state()
        fresh = self._init_slot_state

        def put_batch(cur, ini):                    # leading-batch [B, ...]
            return cur.at[slot].set(ini[slot])

        def put_ring(cur, ini):                     # ring [R, B, ...]
            return cur.at[:, slot].set(ini[:, slot])

        # select by field, not by shape: plc_ring is the only [R, B, ...]
        # subtree (a shape heuristic breaks when capacity collides with
        # another axis, e.g. capacity == lookahead+1 or == feat-ring depth)
        st = self.plc.state
        new = {
            k: jax.tree.map(put_ring if k == "plc_ring" else put_batch,
                            getattr(st, k), getattr(fresh, k))
            for k in st._fields
        }
        self.plc.state = type(st)(**new)

    def fec_add(self, feats: Dict[str, "np.ndarray | None"]) -> None:
        """Queue one 10 ms redundancy feature frame per stream:
        feats[sid] = [>=20] feature row (e.g. DRED-decoded), or None to mark
        a known-missing slot (keeps the stream's FEC queue time-aligned).
        Streams absent from the dict are untouched."""
        f = np.zeros((self.capacity, 20), np.float32)
        have = np.zeros(self.capacity, bool)
        unknown = np.zeros(self.capacity, bool)
        for sid, row in feats.items():
            slot = self.attach(sid)
            if row is None:
                unknown[slot] = True
            else:
                f[slot] = np.asarray(row, np.float32)[:20]
                have[slot] = True
        self.plc.fec_add(f, have=have, unknown=unknown)

    def step(self, frames: Dict[str, np.ndarray | None]) -> Dict[str, np.ndarray]:
        """frames[sid] = [160] pcm, or None for a lost frame."""
        pcm = np.zeros((self.capacity, 160), np.float32)
        lost = np.ones(self.capacity, bool)       # inactive slots just conceal
        for sid, frame in frames.items():
            slot = self.attach(sid)
            if frame is None:
                lost[slot] = True
            else:
                pcm[slot] = frame
                lost[slot] = False
        out = self.plc.step(pcm, lost)
        return {sid: out[slot] for sid, slot in self.slot_of.items()}

    @property
    def n_active(self) -> int:
        return len(self.slot_of)
