"""Held-out validation machinery: validator determinism, best tracking,
EMA plumbing, dump_data_streams output structure.

These exist because round 3's 100k-step run regressed on held-out audio
with nothing in the loop to notice (BENCHMARKS.md round-3 close-out)."""

import numpy as np
import pytest

from lpcnet_tpu.models.lpcnet import LPCNetConfig, init_params
from lpcnet_tpu.train.validation import BestTracker, HeldOutValidator

CFG = LPCNetConfig(rnn_units1=32, rnn_units2=8, cond_size=16)


def _clip(seed, seconds=0.5):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * 16000))
    x = 3000 * np.sin(2 * np.pi * 150 * t / 16000)
    x += 200 * rng.randn(len(t))
    return x.astype(np.int16)


@pytest.fixture(scope="module")
def validator():
    return HeldOutValidator(CFG, [_clip(1), _clip(2)], seg_seconds=0.25)


def test_validator_deterministic(validator):
    import jax
    params = init_params(jax.random.PRNGKey(0), CFG)
    m1 = validator.evaluate(params)
    m2 = validator.evaluate(params)
    assert set(m1) == {"band_lsd_db", "mcd_db", "fwsegsnr_db"}
    for k in m1:
        assert np.isfinite(m1[k])
        assert m1[k] == m2[k], f"eval must be deterministic ({k})"


def test_validator_discriminates(validator):
    """Different params -> different metric (the eval actually runs the
    model, not a constant)."""
    import jax
    m1 = validator.evaluate(init_params(jax.random.PRNGKey(0), CFG))
    m2 = validator.evaluate(init_params(jax.random.PRNGKey(7), CFG))
    assert m1["band_lsd_db"] != m2["band_lsd_db"]


def test_validator_per_clip(validator):
    import jax
    params = init_params(jax.random.PRNGKey(0), CFG)
    per_clip = validator.evaluate_per_clip(params)
    assert len(per_clip) == 2
    mean = validator.evaluate(params)
    # per-clip means average (segment counts equal here) to the global mean
    np.testing.assert_allclose(
        np.mean([c["band_lsd_db"] for c in per_clip]),
        mean["band_lsd_db"], rtol=1e-6)


def test_best_tracker():
    bt = BestTracker()
    assert bt.update(10, {"band_lsd_db": 5.0})
    assert not bt.update(20, {"band_lsd_db": 6.0})
    assert bt.update(30, {"band_lsd_db": 4.5})
    assert bt.best_step == 30 and bt.best == 4.5


def test_trainer_ema():
    """EMA tree tracks params (same structure, converges toward params)."""
    import jax

    from lpcnet_tpu.parallel import mesh as pmesh
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer

    tc = TrainConfig(batch_size=2, chunk_frames=3, ema_decay=0.5)
    trainer = Trainer(CFG, tc, mesh=pmesh.make_mesh(jax.devices("cpu")[:1]))
    n = tc.chunk_samples
    rng = np.random.RandomState(0)
    batch = {
        "sig_in": rng.randn(2, n).astype(np.float32) * 100,
        "sig_out": rng.randn(2, n).astype(np.float32) * 100,
        "features": rng.randn(2, tc.chunk_frames + 4, 20).astype(np.float32),
        "periods": np.full((2, tc.chunk_frames + 4), 100, np.int32),
        "lpc": np.zeros((2, tc.chunk_frames, 16), np.float32),
    }
    p0 = jax.device_get(trainer.state.params["gru_a"]["recurrent"])
    trainer.train_step(batch, jax.random.PRNGKey(0))
    ema = jax.device_get(trainer.ema_params["gru_a"]["recurrent"])
    p1 = jax.device_get(trainer.state.params["gru_a"]["recurrent"])
    # after one step: ema = 0.5*p0 + 0.5*p1
    np.testing.assert_allclose(ema, 0.5 * p0 + 0.5 * p1, atol=1e-6)
    # resume path: reset_ema snaps EMA back to current params
    trainer.reset_ema()
    np.testing.assert_allclose(
        jax.device_get(trainer.ema_params["gru_a"]["recurrent"]), p1)
    # full_state round-trips the EMA
    full = trainer.full_state()
    assert "ema" in full
    trainer.restore_full_state(full)


def test_trainer_no_ema_default():
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer

    trainer = Trainer(CFG, TrainConfig(batch_size=2, chunk_frames=3))
    assert trainer.ema_params is None
    assert "ema" not in trainer.full_state()


def test_dump_data_streams_structure(tmp_path):
    from lpcnet_tpu.train.dump_data import dump_data_streams

    audio = _clip(3, seconds=4.0)
    fpath = str(tmp_path / "f.f32")
    dpath = str(tmp_path / "d.s16")
    dump_data_streams(audio, fpath, dpath, streams=2, chunk_frames=50,
                      min_samples=2 * len(audio))
    n_frames = (2 * len(audio)) // 160 // 2 * 2   # streams*m
    feats = np.fromfile(fpath, np.float32).reshape(-1, 36)
    assert len(feats) == n_frames
    assert np.isfinite(feats).all()
    pairs = np.fromfile(dpath, np.int16)
    assert len(pairs) == n_frames * 160 * 2
    # sig_out should carry real signal energy (the teacher loop ran)
    sig_out = pairs[1::2].astype(np.float64)
    assert np.sqrt((sig_out ** 2).mean()) > 10.0


def test_dump_data_streams_burg_matches_sequential(tmp_path):
    """Burg cepstra must be computed on the augmented PRE-preemphasis signal
    in both paths (src/dump_data.c:266-271 runs burg before preemphasis).
    Stream 0 of dump_data_streams(seed=0) uses AugmentationState(17), so the
    sequential path with seed=17 reproduces the identical augmentation chain
    (the dither rngs differ but dither is applied after the burg input)."""
    from lpcnet_tpu.train.dump_data import dump_data, dump_data_streams

    audio = _clip(5, seconds=2.0)
    n = len(audio) // 160 * 160
    burg_seq = dump_data(audio[:n], str(tmp_path / "fs.f32"),
                         str(tmp_path / "ds.s16"), seed=17, burg=True)
    burg_str = dump_data_streams(audio[:n], str(tmp_path / "fm.f32"),
                                 str(tmp_path / "dm.s16"), seed=0, streams=1,
                                 chunk_frames=50, burg=True)
    np.testing.assert_allclose(burg_str[0], burg_seq, rtol=0, atol=1e-4)
