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
