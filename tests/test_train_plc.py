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


def test_plc_device_loader_and_block_path(tmp_path):
    """PLCDeviceLoader: val batch byte-identical to the host loader,
    on-device batch assembly obeys the host loader's mask/flag contract,
    and train_block is block-size invariant (fold_in on the traced step
    counter), matching the vocoder trainer's guarantee."""
    from lpcnet_tpu.train.train_plc import PLCDeviceLoader, PLCLoader

    rng = np.random.RandomState(3)
    n_frames, seq = 320, 16
    feats = (rng.randn(n_frames, 72) * 0.3).astype(np.float32)
    fpath, lpath = str(tmp_path / "f.f32"), str(tmp_path / "l.s8")
    feats.tofile(fpath)
    (rng.rand(n_frames) > 0.2).astype(np.int8).tofile(lpath)

    tc = PLCTrainConfig(batch_size=2, seq_length=seq)
    host = PLCLoader(fpath, lpath, tc, val_seqs=4)
    dev = PLCDeviceLoader(fpath, lpath, tc, val_seqs=4)
    assert len(dev) == len(host)
    hv, dv = host.val_batch(), dev.val_batch()
    for k in hv:
        np.testing.assert_array_equal(hv[k], dv[k])

    # on-device assembly contract
    feats_d, lost_d = dev.device_arrays
    sel = jnp.asarray([0, 3], jnp.int32)
    b = dev.sample_fn(feats_d, lost_d, sel, jax.random.PRNGKey(7))
    x = np.asarray(b["plc_input"])
    f = np.asarray(feats_d)[np.asarray(sel)]
    flag = x[:, :, 56]
    lost = np.abs(flag)          # 0 = received-as-lost marker off
    # flag in {-1, 0, +1}; burg_ok recoverable where lost
    assert set(np.unique(flag)).issubset({-1.0, 0.0, 1.0})
    np.testing.assert_array_equal(np.asarray(b["mask"])[:, :, 0], 1.0 - lost)
    np.testing.assert_allclose(x[:, :, 36:56], f[:, :, 36:56] * lost[:, :, None],
                               rtol=0, atol=0)
    burg_ok = (flag + 1.0) / 2.0  # valid where lost == 1
    exp_burg = f[:, :, :36] * (lost * burg_ok)[:, :, None]
    np.testing.assert_allclose(x[:, :, :36], exp_burg, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(b["target"]), f[:, :, 36:])

    # block-size invariance: 1 block of 4 == 2 blocks of 2, bit-exact
    cfg = PM.PLCConfig(dense1_size=16, gru1_size=24, gru2_size=24)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    sels = np.arange(8, dtype=np.int32).reshape(4, 2) % len(dev.indices)
    dev.indices = np.arange(dev._n_train)   # deterministic
    tr1 = PLCTrainer(cfg, tc, mesh=mesh)
    tr1.train_block(dev, sels)
    tr2 = PLCTrainer(cfg, tc, mesh=mesh)
    tr2.train_block(dev, sels[:2])
    tr2.train_block(dev, sels[2:])
    p1 = jax.device_get(tr1.state.params)
    p2 = jax.device_get(tr2.state.params)
    jax.tree.map(np.testing.assert_array_equal, p1, p2)
    assert int(tr1.state.step) == 4
