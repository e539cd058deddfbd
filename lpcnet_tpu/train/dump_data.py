"""Training-data generation: the dump_data augmentation pipeline.

Port of the reference tool (src/dump_data.c:110-306) restructured for
throughput: the sequential host-bound pieces (time-varying biquads, the
noisy-excitation teacher loop) run in the native runtime; feature extraction
runs as a batched lax.scan on device in big chunks.

Produces the two training files consumed by train.data.LPCNetLoader:
  features.f32 : 36 floats per 10 ms frame (20 used + 16 LPC)
  data.s16     : interleaved (sig_in, sig_out) int16 pairs, 2 per sample
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..codec import features as F
from ..dsp.constants import FRAME_SIZE, PREEMPHASIS, TRAINING_OFFSET
from ..runtime import runtime

HP_B = np.array([-2.0, 1.0], np.float32)
HP_A = np.array([-1.99599, 0.99600], np.float32)
GAIN_CHANGE_FRAMES = 2821


class AugmentationState:
    def __init__(self, seed: int = 0):
        self.rng = np.random.RandomState(seed)
        self.mem_hp = np.zeros(2, np.float32)
        self.mem_resp = np.zeros(2, np.float32)
        self.a_sig = np.zeros(2, np.float32)
        self.b_sig = np.zeros(2, np.float32)
        self.speech_gain = 1.0
        self.old_speech_gain = 1.0
        self.noise_std = 0.0
        self.gain_change_count = 0

    def maybe_change(self):
        """Random gain / filter / noise refresh (src/dump_data.c:246-257)."""
        self.gain_change_count += 1
        if self.gain_change_count > GAIN_CHANGE_FRAMES:
            r = self.rng
            self.speech_gain = 10.0 ** ((-30 + r.randint(40)) / 20.0)
            if r.randint(2):
                self.speech_gain = -self.speech_gain
            if r.randint(20) == 0:
                self.speech_gain *= 0.01
            if r.randint(100) == 0:
                self.speech_gain = 0.0
            self.gain_change_count = 0
            self.a_sig = (0.75 * (r.rand(2) - 0.5)).astype(np.float32)
            self.b_sig = (0.75 * (r.rand(2) - 0.5)).astype(np.float32)
            t1, t2 = r.rand(), r.rand()
            self.noise_std = abs(-1.5 * np.log(1e-4 + t1) - 0.5 * np.log(1e-4 + t2))

    def process_frame(self, frame: np.ndarray, training: bool = True
                      ) -> np.ndarray:
        """HP filter (always) + random response/gain ramp (training only),
        matching src/dump_data.c:246-265 where only the randomization is
        gated on training mode."""
        if training:
            self.maybe_change()
        x = runtime.biquad(frame.astype(np.float32), HP_B, HP_A, self.mem_hp)
        x = runtime.biquad(x, self.b_sig, self.a_sig, self.mem_resp)
        f = np.arange(FRAME_SIZE, dtype=np.float32) / FRAME_SIZE
        g = f * self.speech_gain + (1 - f) * self.old_speech_gain
        x = x * g
        self.old_speech_gain = self.speech_gain
        return x


def dump_data_streams(speech: np.ndarray, features_out: str,
                      pcm_out: str | None = None, seed: int = 0,
                      chunk_frames: int = 1000, burg: bool = False,
                      min_samples: int | None = None, streams: int = 16):
    """Multi-stream dump_data: same per-stream math, S-way batched analysis.

    The single-stream pipeline is feature-extraction-bound: the scan runs at
    batch 1 and every distinct chunk length costs a device compile (measured
    ~3.4 s per second of audio through the remote-dispatch tunnel, i.e. a
    4-hour corpus would take half a day to prepare).  Here the (cycled)
    input splits into `streams` independent streams, each with its own
    augmentation chain / preemphasis / noise state (the reference's
    sequential semantics hold WITHIN a stream; stream boundaries are
    equivalent to file boundaries), and feature extraction runs as one
    batch-S scan at a FIXED chunk shape -- one compile total, S× the
    per-dispatch throughput.  Outputs are written stream-major, so the
    loaders see S file-boundary discontinuities in ~1e5 chunks (noise).

    Not supported here: quantize mode (codec prep is small; use the
    sequential path).
    """
    speech = np.asarray(speech)
    n_total = (len(speech) if min_samples is None
               else max(min_samples, len(speech)))
    n_frames_total = n_total // FRAME_SIZE
    m = n_frames_total // streams          # frames per stream
    if m < chunk_frames:
        chunk_frames = max(1, m)
    src = speech[: len(speech) // FRAME_SIZE * FRAME_SIZE].astype(np.float32)
    reps = int(np.ceil(streams * m * FRAME_SIZE / len(src)))
    audio = np.tile(src, reps)[: streams * m * FRAME_SIZE]
    audio = audio.reshape(streams, m, FRAME_SIZE)

    training = pcm_out is not None
    # --- per-stream augmentation (host): HP + random response/gain chains
    proc = np.empty_like(audio)
    noise_stds = np.empty((streams, m), np.float32)
    for s in range(streams):
        aug = AugmentationState(seed + 1000 * s + 17)
        for k in range(m):
            proc[s, k] = aug.process_frame(audio[s, k], training=training)
            noise_stds[s, k] = aug.noise_std

    # --- preemphasis + dither, vectorized per stream
    # keep the augmented pre-preemphasis signal: Burg cepstra are computed
    # on it (src/dump_data.c:266-271 runs burg BEFORE the preemphasis at
    # :271-272, and the sequential dump_data above matches); computing them
    # post-preemphasis gives the PLC features a systematic spectral tilt
    aug_proc = proc.reshape(streams, -1)
    rng = np.random.RandomState(seed + 1)
    flat = proc.reshape(streams, -1)
    prev = np.concatenate([np.zeros((streams, 1), np.float32),
                           flat[:, :-1]], axis=1)
    y = flat - PREEMPHASIS * prev
    y += (rng.rand(*y.shape) - 0.5).astype(np.float32)
    proc = y.astype(np.float32)                       # [S, m*160]

    # half-frame-delayed pcm alignment (src/dump_data.c:273-274,297)
    pcm = np.concatenate([np.zeros((streams, TRAINING_OFFSET), np.float32),
                          proc[:, :-TRAINING_OFFSET]], axis=1)
    pcm = np.clip(np.floor(0.5 + pcm), -32767, 32767).astype(np.float32)

    # --- batched feature extraction at ONE fixed shape
    feat_fn = jax.jit(F.compute_single_frame_features_seq)
    enc_state = F.init_encoder_state(streams)
    feats = np.empty((streams, m, 36), np.float32)
    csamp = chunk_frames * FRAME_SIZE
    for c0 in range(0, m, chunk_frames):
        c1 = min(c0 + chunk_frames, m)
        block = proc[:, c0 * FRAME_SIZE: c1 * FRAME_SIZE]
        if c1 - c0 < chunk_frames:                    # pad final chunk
            block = np.concatenate(
                [block, np.zeros((streams, csamp - block.shape[1]),
                                 np.float32)], axis=1)
        enc_state, fb = feat_fn(enc_state, jnp.asarray(block))
        feats[:, c0:c1] = np.asarray(fb)[:, : c1 - c0]

    burg_rows = None
    if burg:
        from ..dsp.burg import burg_cepstral_analysis
        burg_rows = np.empty((streams, m, 36), np.float32)
        for s in range(streams):
            burg_rows[s] = np.asarray(burg_cepstral_analysis(
                jnp.asarray(aug_proc[s].reshape(m, FRAME_SIZE))))

    # --- stream-major output; per-stream native noise/teacher loops
    with open(features_out, "wb") as ffeat:
        if burg:
            merged = np.concatenate([burg_rows, feats], axis=2)
            merged.reshape(-1, 72).astype(np.float32).tofile(ffeat)
        else:
            feats.reshape(-1, 36).astype(np.float32).tofile(ffeat)
    if training:
        with open(pcm_out, "wb") as fpcm:
            for s in range(streams):
                sig_mem = np.zeros(16, np.float32)
                exc_mem = np.zeros(1, np.int32)
                noise = runtime.compute_noise_frames(
                    noise_stds[s], seed=seed + 7919 * s)
                pairs = runtime.write_audio_frames(
                    pcm[s], np.ascontiguousarray(feats[s, :, 20:36]),
                    noise, sig_mem, exc_mem)
                fpcm.write(pairs.tobytes())
    return burg_rows


def dump_data(speech: np.ndarray, features_out: str, pcm_out: str | None = None,
              seed: int = 0, chunk_frames: int = 400, burg: bool = False,
              min_samples: int | None = None, quantize: bool = False):
    """Run the augmentation + feature pipeline over a speech array.

    Args:
      speech: int16 (or float) 16 kHz mono samples.
      features_out: output path for 36-float feature rows.
      pcm_out: output path for int16 (sig_in, sig_out) pairs; None = test
        mode (features only, no augmentation noise loop).
      min_samples: keep cycling through the input until this many samples
        are processed (the reference loops the file; default one pass).
    """
    speech = np.asarray(speech)
    n_total = len(speech) if min_samples is None else max(min_samples, len(speech))
    n_frames_total = n_total // FRAME_SIZE
    if quantize:
        n_frames_total = n_frames_total // 4 * 4

    aug = AugmentationState(seed)
    training = pcm_out is not None
    rng = np.random.RandomState(seed + 1)
    mem_preemph = np.zeros(1, np.float32)
    sig_mem = np.zeros(16, np.float32)
    exc_mem = np.zeros(1, np.int32)
    pcm_carry = np.zeros(TRAINING_OFFSET, np.float32)

    enc_state = F.init_encoder_state(1)
    if quantize:
        # -qtrain/-qtest: features go through the full 40 ms quantize path
        # (src/dump_data.c:288-293); chunks must be superframe-aligned
        from ..codec.codebooks import load_codebooks
        from ..codec.encoder import encode_superframe
        cbs = load_codebooks()
        chunk_frames = max(4, chunk_frames // 4 * 4)

        def feat_fn(st, pcm_flat):
            b = pcm_flat.shape[0]
            t = pcm_flat.shape[-1] // 640
            chunks = pcm_flat[..., : t * 640].reshape(b, t, 640)

            def step(st, chunk):
                st, feats_q, _ = encode_superframe(st, chunk, cbs)
                return st, feats_q

            st, feats = jax.lax.scan(step, st, jnp.moveaxis(chunks, 1, 0))
            feats = jnp.moveaxis(feats, 0, 1)          # [B, T, 4, 36]
            return st, feats.reshape(b, -1, 36)

        feat_fn = jax.jit(feat_fn)
    else:
        feat_fn = jax.jit(F.compute_single_frame_features_seq)

    ffeat = open(features_out, "wb")
    fpcm = open(pcm_out, "wb") if training else None
    fburg = []

    done = 0
    src_pos = 0
    while done < n_frames_total:
        n = min(chunk_frames, n_frames_total - done)
        # assemble n frames of source audio (cycling)
        frames = np.empty((n, FRAME_SIZE), np.float32)
        for k in range(n):
            if src_pos + FRAME_SIZE > len(speech):
                src_pos = 0
            frames[k] = speech[src_pos: src_pos + FRAME_SIZE]
            src_pos += FRAME_SIZE

        noise_stds = np.empty(n, np.float32)
        proc = np.empty_like(frames)
        for k in range(n):
            proc[k] = aug.process_frame(frames[k], training=training)
            noise_stds[k] = aug.noise_std
        if burg:
            from ..dsp.burg import burg_cepstral_analysis
            fburg.append(np.asarray(burg_cepstral_analysis(jnp.asarray(proc))))

        # preemphasis + dither (src/dump_data.c:271-272)
        flat = proc.reshape(-1)
        prev = np.concatenate([[0.0], flat[:-1]]).astype(np.float32)
        y = flat - PREEMPHASIS * prev
        y[0] = flat[0] + mem_preemph[0]
        mem_preemph[0] = -PREEMPHASIS * flat[-1]
        # the reference dithers unconditionally (src/dump_data.c:272)
        y = y + (rng.rand(len(y)) - 0.5).astype(np.float32)
        proc = y.reshape(n, FRAME_SIZE)

        # half-frame-delayed pcm alignment (src/dump_data.c:273-274,297)
        pcm = np.empty_like(proc)
        shifted = np.concatenate([pcm_carry, proc.reshape(-1)[:-TRAINING_OFFSET]])
        pcm = shifted.reshape(n, FRAME_SIZE)
        pcm_carry = proc.reshape(-1)[-TRAINING_OFFSET:].copy()
        pcm = np.clip(np.floor(0.5 + pcm), -32767, 32767)

        # batched feature extraction on device
        enc_state, feats = feat_fn(enc_state, jnp.asarray(proc.reshape(1, -1)))
        feats = np.asarray(feats)[0]                     # [n, 36]
        ffeat.write(feats.astype(np.float32).tobytes())

        if training:
            noise = runtime.compute_noise_frames(noise_stds, seed=seed + done)
            pairs = runtime.write_audio_frames(
                pcm.reshape(-1), feats[:, 20:36].copy(), noise, sig_mem, exc_mem)
            fpcm.write(pairs.tobytes())
        done += n

    ffeat.close()
    if fpcm:
        fpcm.close()
    if burg:
        return np.concatenate(fburg)
    return None


def main(argv=None):
    """CLI mirroring the reference dump_data modes (src/dump_data.c:145-171):
    -train/-test (+ burg variants) and feature-domain -decode."""
    import argparse

    import sys
    argv = list(sys.argv[1:] if argv is None else argv)
    # accept the reference's dash-prefixed modes (-train etc.) despite argparse
    modes = {"train", "test", "btrain", "btest", "decode", "qtrain", "qtest"}
    if argv and argv[0].lstrip("-") in modes:
        argv[0] = argv[0].lstrip("-")
    ap = argparse.ArgumentParser(prog="lpcnet_tpu.train.dump_data")
    ap.add_argument("mode", choices=sorted(modes))
    ap.add_argument("input")
    ap.add_argument("features_out")
    ap.add_argument("pcm_out", nargs="?", default=None)
    ap.add_argument("--seconds", type=float, default=None,
                    help="cycle input until this many seconds are generated")
    ns = ap.parse_args(argv)
    mode = ns.mode.lstrip("-")

    if mode == "decode":
        from ..codec import packet as P
        from ..codec.codebooks import load_codebooks
        from ..codec.decoder import decode_packet_features
        import jax.numpy as jnp
        data = np.fromfile(ns.input, np.uint8).reshape(-1, 8)
        cbs = load_codebooks()
        vq = jnp.zeros((1, 18))
        with open(ns.features_out, "wb") as f:
            for row in data:
                fields = {k: jnp.asarray(v)[None]
                          for k, v in P.unpack_fields(row).items()}
                feats, vq = decode_packet_features(fields, vq, cbs)
                f.write(np.asarray(feats)[0].astype(np.float32).tobytes())
        return 0

    speech = np.fromfile(ns.input, dtype=np.int16)
    training = mode in ("train", "btrain", "qtrain")
    burg = mode in ("btrain", "btest")
    min_samples = int(ns.seconds * 16000) if ns.seconds else None
    burg_feats = dump_data(speech, ns.features_out,
                           ns.pcm_out if training else None,
                           burg=burg, min_samples=min_samples,
                           quantize=mode in ("qtrain", "qtest"))
    if burg and burg_feats is not None:
        # btrain interleaves burg rows before the feature rows per frame;
        # here they are emitted as a sidecar file for the PLC trainer
        feats = np.fromfile(ns.features_out, np.float32).reshape(-1, 36)
        n = min(len(feats), len(burg_feats))
        merged = np.concatenate([burg_feats[:n], feats[:n]], axis=1)
        merged.astype(np.float32).tofile(ns.features_out)
    return 0


if __name__ == "__main__":
    main()
