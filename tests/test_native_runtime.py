"""Native runtime: parity with the Python implementations."""

import numpy as np

from lpcnet_tpu.runtime import native_available, runtime
from lpcnet_tpu.codec import packet as P


def test_native_builds():
    assert native_available(), "native runtime failed to build"


def test_pack_matches_python():
    rng = np.random.RandomState(0)
    fields = {name: rng.randint(0, 1 << bits, size=(23,)).astype(np.int32)
              for name, bits in P.FIELDS}
    py = P.pack_fields(fields)
    arr = np.stack([fields[f[0]] for f in P.FIELDS], axis=1)
    nat = runtime.pack_packets(arr)
    np.testing.assert_array_equal(py, nat)
    back = runtime.unpack_packets(nat)
    np.testing.assert_array_equal(back, arr)


def test_biquad_state_carry():
    rng = np.random.RandomState(1)
    x = rng.randn(400).astype(np.float32) * 100
    b = np.array([0.3, -0.2], np.float32)
    a = np.array([-0.5, 0.25], np.float32)
    mem1 = np.zeros(2, np.float32)
    full = runtime.biquad(x, b, a, mem1)
    mem2 = np.zeros(2, np.float32)
    h1 = runtime.biquad(x[:160], b, a, mem2)
    h2 = runtime.biquad(x[160:], b, a, mem2)
    np.testing.assert_allclose(full, np.concatenate([h1, h2]), rtol=1e-6)


def test_write_audio_frames():
    rng = np.random.RandomState(2)
    pcm = (rng.randn(320) * 2000).astype(np.float32)
    lpc = (rng.randn(2, 16) * 0.05).astype(np.float32)
    noise = np.zeros(320, np.int32)
    sig_mem = np.zeros(16, np.float32)
    exc_mem = np.zeros(1, np.int32)
    out = runtime.write_audio_frames(pcm, lpc, noise, sig_mem, exc_mem)
    out = out.reshape(-1, 2)
    # sig_out is the clean target
    np.testing.assert_allclose(out[:, 1], np.round(pcm + 0.5 - 0.5), atol=1.0)
    # sig_in is the (noisy-fed-back) reconstruction delayed by one sample;
    # with zero noise it should track the target closely after warmup
    err = out[16:, 0].astype(float) - pcm[15:-1]
    assert np.sqrt(np.mean(err ** 2)) < 60.0  # u-law quantization noise scale


def test_dump_data_end_to_end(tmp_path):
    from lpcnet_tpu.train.dump_data import dump_data
    rng = np.random.RandomState(3)
    t = np.arange(16000)
    speech = (3000 * np.sin(2 * np.pi * 150 * t / 16000)
              + 200 * rng.randn(16000)).astype(np.int16)
    fpath = str(tmp_path / "feat.f32")
    ppath = str(tmp_path / "data.s16")
    dump_data(speech, fpath, ppath, chunk_frames=50)
    feats = np.fromfile(fpath, np.float32).reshape(-1, 36)
    pairs = np.fromfile(ppath, np.int16).reshape(-1, 2)
    assert feats.shape[0] == 100
    assert pairs.shape[0] == 100 * 160
    assert np.isfinite(feats).all()
    # pitch feature within the legal range
    assert feats[:, 18].min() >= 0.01 * (66 - 200) - 1e-5
