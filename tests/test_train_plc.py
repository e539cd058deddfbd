"""PLC training tests."""

import numpy as np

import jax

from lpcnet_tpu.models import plc as PM
from lpcnet_tpu.parallel import mesh as pmesh
from lpcnet_tpu.train.train_plc import PLCTrainConfig, PLCTrainer, plc_loss

import jax.numpy as jnp


def test_plc_loss_masks_received_frames():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 10, 20).astype(np.float32))
    pred = jnp.asarray(rng.randn(2, 10, 20).astype(np.float32))
    no_mask = jnp.zeros((2, 10, 1))
    assert float(plc_loss(y, no_mask, pred)) == 0.0
    full_mask = jnp.ones((2, 10, 1))
    assert float(plc_loss(y, full_mask, pred)) > 0.0


def test_plc_training_loss_decreases():
    cfg = PM.PLCConfig(dense1_size=16, gru1_size=24, gru2_size=24)
    tc = PLCTrainConfig(batch_size=4, seq_length=16)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = PLCTrainer(cfg, tc, mesh=mesh)
    rng = np.random.RandomState(1)
    feats = rng.randn(4, 16, 56).astype(np.float32) * 0.3
    lost = (rng.rand(4, 16, 1) > 0.3).astype(np.float32)
    batch = {
        "plc_input": np.concatenate([feats * lost, lost], -1).astype(np.float32),
        "target": feats[:, :, 36:].astype(np.float32),
        "mask": (1 - lost).astype(np.float32),
    }
    losses = [tr.train_step(batch)["loss"] for _ in range(25)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_plc_eval_step_and_val_split(tmp_path):
    """Held-out val batch is deterministic, excluded from training, and
    eval_step scores it without updating params."""
    from lpcnet_tpu.train.train_plc import PLCLoader

    rng = np.random.RandomState(2)
    n_frames, seq = 160, 16
    feats = (rng.randn(n_frames, 72) * 0.3).astype(np.float32)
    fpath, lpath = str(tmp_path / "f.f32"), str(tmp_path / "l.s8")
    feats.tofile(fpath)
    (rng.rand(n_frames) > 0.2).astype(np.int8).tofile(lpath)

    tc = PLCTrainConfig(batch_size=2, seq_length=seq)
    loader = PLCLoader(fpath, lpath, tc, val_seqs=4)
    # 160/16 = 10 seqs total, 4 held out -> 6 train -> 3 batches of 2
    assert len(loader) == 3
    v1, v2 = loader.val_batch(), loader.val_batch()
    assert v1["plc_input"].shape[0] == 4
    np.testing.assert_array_equal(v1["plc_input"], v2["plc_input"])
    np.testing.assert_array_equal(v1["mask"], v2["mask"])

    cfg = PM.PLCConfig(dense1_size=16, gru1_size=24, gru2_size=24)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = PLCTrainer(cfg, tc, mesh=mesh)
    p0 = jax.device_get(tr.state.params["plc_gru1"]["kernel"])
    m1 = tr.eval_step(v1)
    m2 = tr.eval_step(v1)
    assert np.isfinite(m1["loss"])
    assert m1["loss"] == m2["loss"], "eval must be deterministic"
    np.testing.assert_array_equal(
        jax.device_get(tr.state.params["plc_gru1"]["kernel"]), p0)
