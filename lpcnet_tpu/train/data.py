"""Training data pipeline: memmap'd features/PCM chunking + shuffling.

Mirrors training_tf2/dataloader.py + the slicing in train_lpcnet.py:161-182:
the feature file holds 36-float rows (20 used + 16 LPC); the data file holds
interleaved (sig_in, sig_out) int16 pairs produced by the dump_data
augmentation pipeline (ours: lpcnet_tpu.train.dump_data / the native
runtime). Chunks are 15 frames with 4 context frames of features.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from ..dsp.constants import LPC_ORDER, NB_TOTAL_FEATURES

FRAME = 160


def lpc2rc_np(lpc: np.ndarray) -> np.ndarray:
    """LPC -> reflection coefficients (training_tf2/dataloader.py:5-13)."""
    lpc = np.array(lpc, np.float32, copy=True)
    order = lpc.shape[-1]
    rc = np.zeros_like(lpc)
    for i in range(order, 0, -1):
        rc[..., i - 1] = lpc[..., -1]
        ki = rc[..., i - 1: i]
        lpc = (lpc[..., :-1] - ki * lpc[..., -2::-1]) / (1 - ki * ki)
    return rc


class LPCNetLoader:
    """Shuffled chunk loader over memmap'd training files."""

    def __init__(self, pcm_path: str, feature_path: str, batch_size: int = 128,
                 chunk_frames: int = 15, lookahead: int = 2, e2e: bool = False,
                 seed: int = 0, holdout_batches: int = 0):
        self.batch_size = batch_size
        self.lookahead = lookahead
        self.e2e = e2e
        self.chunk_frames = chunk_frames
        pcm_chunk = FRAME * chunk_frames

        data = np.memmap(pcm_path, dtype="int16", mode="r")
        nb_frames = (len(data) // (2 * pcm_chunk) - 1) // batch_size * batch_size
        features = np.memmap(feature_path, dtype="float32", mode="r")

        data = data[(4 - lookahead) * 2 * FRAME:]
        data = data[: nb_frames * 2 * pcm_chunk]
        self.data = np.reshape(data, (nb_frames, pcm_chunk, 2))

        sizeof = features.strides[-1]
        nf = NB_TOTAL_FEATURES
        self.features = np.lib.stride_tricks.as_strided(
            features, shape=(nb_frames, chunk_frames + 4, nf),
            strides=(chunk_frames * nf * sizeof, nf * sizeof, sizeof))
        self.periods = (0.1 + 50.0 * self.features[:, :, 18:19] + 100).astype("int16")
        self.nb_batches = nb_frames // batch_size
        # held-out teacher-forced split: the LAST holdout_batches*B chunks
        # (the corpus tail) never enter the shuffled training indices and
        # are served fixed/unshuffled by val_batches()
        self.holdout_batches = min(holdout_batches,
                                   max(self.nb_batches - 1, 0))
        self.nb_batches -= self.holdout_batches
        self._n_train_chunks = self.nb_batches * self.batch_size
        self._rng = np.random.RandomState(seed)
        self.on_epoch_end()

    def on_epoch_end(self):
        self.indices = np.arange(self._n_train_chunks)
        self._rng.shuffle(self.indices)

    def val_batches(self):
        """Fixed held-out batches (empty unless holdout_batches > 0)."""
        save = self.indices
        try:
            n = self.holdout_batches * self.batch_size
            self.indices = np.arange(self._n_train_chunks,
                                     self._n_train_chunks + n)
            for i in range(self.holdout_batches):
                yield self[i]
        finally:
            self.indices = save

    def __len__(self):
        return self.nb_batches

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        sel = self.indices[index * self.batch_size:(index + 1) * self.batch_size]
        data = self.data[sel]
        feats = self.features[sel]
        out = {
            "sig_in": data[:, :, 0].astype(np.float32),
            "sig_out": data[:, :, 1].astype(np.float32),
            "features": np.ascontiguousarray(feats[:, :, :20]).astype(np.float32),
            "periods": np.clip(self.periods[sel][:, :, 0], 0, 255).astype(np.int32),
        }
        la = self.lookahead
        lpc = (self.features[sel][:, 4 - la: -la if la else None, 20:20 + LPC_ORDER]
               if la > 0 else self.features[sel][:, 4:, 20:20 + LPC_ORDER])
        lpc = np.ascontiguousarray(lpc).astype(np.float32)
        if self.e2e:
            out["rc"] = lpc2rc_np(lpc)
        else:
            out["lpc"] = lpc
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]


def lpc2rc_jnp(lpc):
    """lpc2rc_np on device (static 16-iteration Levinson-down recursion)."""
    import jax.numpy as jnp

    order = lpc.shape[-1]
    rc = []
    for i in range(order, 0, -1):
        ki = lpc[..., -1:]
        rc.append(ki)
        lpc = (lpc[..., :-1] - ki * lpc[..., -2::-1]) / (1 - ki * ki)
    return jnp.concatenate(rc[::-1], axis=-1)


class DeviceLPCNetLoader:
    """Device-resident variant of LPCNetLoader.

    The host loader's per-step cost -- scattered memmap gathers, int16 ->
    f32 widening, and a ~3 MB host->device transfer -- serializes the train
    loop through a remote-dispatch transport (measured 4.5 steps/s vs 14.4
    device-bound at batch 128).  Here the WHOLE dataset uploads once
    (int16 PCM + f32 features; a 1-hour corpus is ~0.6 GB, far under one
    chip's HBM) and each step ships only the [B] chunk indices; slicing,
    widening, the period quantization, and the lookahead-aligned LPC window
    all run on device inside one jitted gather.

    Same batch dict contract as LPCNetLoader (values are jax arrays).
    """

    def __init__(self, pcm_path: str, feature_path: str, batch_size: int = 128,
                 chunk_frames: int = 15, lookahead: int = 2, e2e: bool = False,
                 seed: int = 0, sharding=None, holdout_batches: int = 0):
        import jax
        import jax.numpy as jnp

        self.batch_size = batch_size
        self.lookahead = lookahead
        self.e2e = e2e
        self.chunk_frames = chunk_frames
        pcm_chunk = FRAME * chunk_frames

        data = np.memmap(pcm_path, dtype="int16", mode="r")
        nb_frames = (len(data) // (2 * pcm_chunk) - 1) // batch_size * batch_size
        data = data[(4 - lookahead) * 2 * FRAME:]
        data = np.reshape(data[: nb_frames * 2 * pcm_chunk],
                          (nb_frames, pcm_chunk, 2))
        # TPU layout: keep the long sample axis minor (a [..., 2] minor dim
        # tiles to 128 lanes, a 64x pad), and make every per-chunk fetch ONE
        # contiguous big-row gather -- small-row gathers serialize on TPU.
        # `sharding` (e.g. parallel.mesh.replicated(mesh)) places the corpus
        # on every chip of a DP mesh so the in-graph gather stays local.
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self._sig_in = put(np.ascontiguousarray(data[:, :, 0]))
        self._sig_out = put(np.ascontiguousarray(data[:, :, 1]))
        feats = np.memmap(feature_path, dtype="float32", mode="r")
        nf = NB_TOTAL_FEATURES
        n_chunk_rows = min(len(feats) // (chunk_frames * nf), nb_frames + 1)
        # [n, cf*nf] flat per-chunk rows; a window (cf+4 frames) is row i
        # plus the first 4 frames of row i+1
        self._features = put(np.reshape(
            feats[: n_chunk_rows * chunk_frames * nf],
            (n_chunk_rows, chunk_frames * nf)))
        self.nb_batches = nb_frames // batch_size
        # same held-out tail split as LPCNetLoader (host-parity test covers
        # the indices contract)
        self.holdout_batches = min(holdout_batches,
                                   max(self.nb_batches - 1, 0))
        self.nb_batches -= self.holdout_batches
        self._n_train_chunks = self.nb_batches * self.batch_size
        self._rng = np.random.RandomState(seed)
        self.on_epoch_end()

        cf, la = chunk_frames, lookahead

        def sample(sig_in_d, sig_out_d, feats_d, sel):
            rows_in = jnp.take(sig_in_d, sel, axis=0)           # [B, S]
            rows_out = jnp.take(sig_out_d, sel, axis=0)
            nxt = jnp.minimum(sel + 1, feats_d.shape[0] - 1)
            f0 = jnp.take(feats_d, sel, axis=0)                 # [B, cf*nf]
            f1 = jnp.take(feats_d, nxt, axis=0)[:, :4 * nf]
            f = jnp.concatenate([f0, f1], axis=1
                                ).reshape(sel.shape[0], cf + 4, nf)
            periods = jnp.clip(
                (0.1 + 50.0 * f[:, :, 18] + 100).astype(jnp.int32), 0, 255)
            lw = f[:, 4 - la: cf + 4 - la, 20:20 + LPC_ORDER]
            out = {
                "sig_in": rows_in.astype(jnp.float32),
                "sig_out": rows_out.astype(jnp.float32),
                "features": f[:, :, :20],
                "periods": periods,
            }
            if e2e:
                out["rc"] = lpc2rc_jnp(lw)
            else:
                out["lpc"] = lw
            return out

        self._sample = jax.jit(sample)
        # un-jitted pure gather for fusion into a caller's traced loop
        # (train_lpcnet.Trainer.train_block scans train steps on device;
        # the per-step batch gather runs inside the same dispatch)
        self.sample_fn = sample

    @property
    def device_arrays(self):
        """(sig_in, sig_out, features) device-resident corpus arrays."""
        return self._sig_in, self._sig_out, self._features

    def index_blocks(self, block_steps: int):
        """Yield [block_steps, B] int32 index blocks covering one epoch
        (drops the last partial block)."""
        bs = self.batch_size
        n = (self.nb_batches // block_steps) * block_steps
        for i in range(0, n, block_steps):
            sel = self.indices[i * bs:(i + block_steps) * bs]
            yield np.reshape(sel, (block_steps, bs)).astype(np.int32)

    def on_epoch_end(self):
        self.indices = np.arange(self._n_train_chunks)
        self._rng.shuffle(self.indices)

    def val_batches(self):
        """Fixed held-out batches (empty unless holdout_batches > 0)."""
        save = self.indices
        try:
            n = self.holdout_batches * self.batch_size
            self.indices = np.arange(self._n_train_chunks,
                                     self._n_train_chunks + n)
            for i in range(self.holdout_batches):
                yield self[i]
        finally:
            self.indices = save

    def __len__(self):
        return self.nb_batches

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        sel = self.indices[index * self.batch_size:(index + 1) * self.batch_size]
        return self._sample(self._sig_in, self._sig_out, self._features,
                            jnp.asarray(sel, jnp.int32))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]
