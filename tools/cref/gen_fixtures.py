#!/usr/bin/env python3
"""Generate golden parity fixtures from the reference C implementation.

Runs tools/cref/build/harness (built by build.sh) on deterministic synthetic
speech and saves .npz fixtures under tests/fixtures/. Fixtures are committed
so the test suite does not require a C toolchain.
"""

import os
import subprocess
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
HARNESS = os.path.join(HERE, "build", "harness")
FIXDIR = os.path.abspath(os.path.join(HERE, "..", "..", "tests", "fixtures"))

FRAME = 160
SUPER = 640


def synth_speech(n_samples: int, seed: int = 7) -> np.ndarray:
    """Deterministic synthetic speech-ish signal: pitch pulses through a
    time-varying AR filter plus breath noise, 16 kHz, int16 range."""
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples)
    # pitch sweeping 80..220 Hz with vibrato, voiced/unvoiced alternation
    f0 = 120 + 60 * np.sin(2 * np.pi * t / 16000 / 1.7) + 10 * np.sin(2 * np.pi * t / 400)
    phase = np.cumsum(f0 / 16000)
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float64)
    voicing = 0.5 + 0.5 * np.sign(np.sin(2 * np.pi * t / 16000 / 0.9) + 0.3)
    exc = pulses * voicing * 600 + rng.randn(n_samples) * (40 + 160 * (1 - voicing))

    # two slowly-varying resonator sections (always stable, r < 1)
    def resonator(x, center_hz, sweep_hz, period_s, r):
        y = np.zeros_like(x)
        y1 = y2 = 0.0
        for i in range(len(x)):
            f = center_hz + sweep_hz * np.sin(2 * np.pi * i / 16000 / period_s)
            a1 = 2 * r * np.cos(2 * np.pi * f / 16000)
            y0 = x[i] + a1 * y1 - r * r * y2
            y2, y1 = y1, y0
            y[i] = y0
        return y

    out = resonator(exc, 650, 250, 2.3, 0.93)
    out = resonator(out, 1800, 400, 3.1, 0.88)
    # amplitude envelope with silence gaps
    env = np.clip(np.sin(2 * np.pi * t / 16000 / 1.3) * 3, 0, 1)
    out = out * (0.15 + 0.85 * env)
    out = out / np.max(np.abs(out)) * 12000
    return np.round(out).astype(np.int16)


def run(mode, *args):
    subprocess.run([HARNESS, mode, *[str(a) for a in args]], check=True)


def main():
    os.makedirs(FIXDIR, exist_ok=True)
    tmp = tempfile.mkdtemp()
    p = lambda name: os.path.join(tmp, name)

    n_super = 50
    pcm = synth_speech(n_super * SUPER)
    pcm.tofile(p("in.s16"))

    # full feature extraction + codec
    run("features", p("in.s16"), p("feat.f32"))
    run("encode", p("in.s16"), p("bits.bin"))
    run("decode", p("bits.bin"), p("dec.f32"))
    feats = np.fromfile(p("feat.f32"), np.float32).reshape(n_super, 4, 36)
    bits = np.fromfile(p("bits.bin"), np.uint8).reshape(n_super, 8)
    dec = np.fromfile(p("dec.f32"), np.float32).reshape(n_super, 4, 36)

    # per-frame internals
    run("framedbg", p("in.s16"), p("xc.f32"), p("w.f32"), p("exc.f32"), p("pf.f32"))
    n_frames = n_super * 4
    xc = np.fromfile(p("xc.f32"), np.float32).reshape(n_frames, 2, 256)
    fw = np.fromfile(p("w.f32"), np.float32).reshape(n_frames, 2)
    # exc_buf is declared [576] but only the first 416 entries are live
    # (PITCH_MAX_PERIOD + FRAME_SIZE; see src/lpcnet_enc.c:525-537)
    exc = np.fromfile(p("exc.f32"), np.float32).reshape(n_frames, 576)[:, :416].copy()
    pframe = np.fromfile(p("pf.f32"), np.float32).reshape(n_frames, 36)

    np.savez(
        os.path.join(FIXDIR, "codec.npz"),
        pcm=pcm, features=feats, packets=bits, decoded=dec,
        xc=xc, frame_weight=fw, exc_buf=exc, frame_features=pframe,
    )

    # u-law tables
    run("ulaw", p("ulaw.f32"))
    u = np.fromfile(p("ulaw.f32"), np.float32)
    lin_in = np.arange(-32768, 32768, 7, dtype=np.float32)
    np.savez(os.path.join(FIXDIR, "ulaw.npz"),
             lin_in=lin_in, lin2ulaw=u[: len(lin_in)], ulaw2lin=u[len(lin_in):])

    # dct / idct / lpc on real cepstra + mild random vectors
    ceps = feats[:, :, :18].reshape(-1, 18)[: 64].astype(np.float32)
    rng = np.random.RandomState(3)
    extra = (rng.randn(32, 18) * 0.7).astype(np.float32)
    cin = np.concatenate([ceps, extra]).astype(np.float32)
    cin.tofile(p("cin.f32"))
    run("dct", len(cin), p("cin.f32"), p("dct.f32"))
    run("idct", len(cin), p("cin.f32"), p("idct.f32"))
    run("lpc", len(cin), p("cin.f32"), p("lpc.f32"))
    np.savez(os.path.join(FIXDIR, "transforms.npz"),
             cin=cin,
             dct=np.fromfile(p("dct.f32"), np.float32).reshape(-1, 18),
             idct=np.fromfile(p("idct.f32"), np.float32).reshape(-1, 18),
             lpc=np.fromfile(p("lpc.f32"), np.float32).reshape(-1, 16))

    # band energies of raw 320-sample windows
    wins = np.lib.stride_tricks.sliding_window_view(
        pcm.astype(np.float32), 320)[:: 997][:64].copy()
    wins.tofile(p("wins.f32"))
    run("bands", len(wins), p("wins.f32"), p("bands.f32"))
    np.savez(os.path.join(FIXDIR, "bands.npz"), windows=wins,
             bands=np.fromfile(p("bands.f32"), np.float32).reshape(-1, 18))

    # burg cepstra of 160-sample frames
    frames = pcm.astype(np.float32).reshape(-1, 160)[:: 13][:48].copy()
    frames.tofile(p("frames.f32"))
    run("burg", len(frames), p("frames.f32"), p("burg.f32"))
    np.savez(os.path.join(FIXDIR, "burg.npz"), frames=frames,
             burg=np.fromfile(p("burg.f32"), np.float32).reshape(-1, 36))

    print("fixtures written to", FIXDIR)


if __name__ == "__main__":
    main()
