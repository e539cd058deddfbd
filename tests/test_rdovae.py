"""RDO-VAE tests: shapes, streaming==sequence equivalence, loss decreases."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import rdovae as RV


def tiny_cfg():
    return RV.RDOVAEConfig(latent_dim=8, cond_size=16, cond_size2=12,
                           state_dim=6, pvq_num_pulses=12, state_hidden=10)


def test_encode_decode_shapes():
    cfg = tiny_cfg()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 20)) * 0.3
    z, states = RV.encode_seq(params, feats, cfg)
    assert z.shape == (2, 8, cfg.latent_dim)
    assert states.shape == (2, 8, cfg.state_dim)
    dec = RV.decode_seq(params, z[:, ::2], states[:, -1], cfg)
    assert dec.shape == (2, 16, 20)


@pytest.mark.slow
def test_streaming_matches_sequence():
    cfg = tiny_cfg()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(2), (3, 12, 20)) * 0.3
    z_seq, st_seq = RV.encode_seq(params, feats, cfg)

    es = RV.init_encoder_stream(3, cfg)
    zs, sts = [], []
    for t in range(6):
        pair = feats[:, 2 * t: 2 * t + 2].reshape(3, -1)
        es, z, st = RV.encode_dframe(params, es, pair, cfg)
        zs.append(np.asarray(z))
        sts.append(np.asarray(st))
    np.testing.assert_allclose(np.stack(zs, 1), np.asarray(z_seq),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.stack(sts, 1), np.asarray(st_seq),
                               rtol=1e-4, atol=1e-5)

    # decoder: stream decode_qframe == decode_seq
    z_dec = z_seq[:, ::2]
    init = st_seq[:, -1]
    ref = np.asarray(RV.decode_seq(params, z_dec, init, cfg))
    ds = RV.init_decoder_stream(params, init, cfg)
    outs = []
    for t in range(z_dec.shape[1]):
        ds, frames = RV.decode_qframe(params, ds, z_dec[:, t], cfg)
        outs.append(np.asarray(frames))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_soft_pvq_properties():
    cfg = tiny_cfg()
    x = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.state_dim))
    q = RV.soft_pvq(x, cfg.pvq_num_pulses)
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_rate_estimates_positive():
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 8)) * 2
    r = jnp.full((2, 6, 8), 0.7)
    theta = jnp.full((2, 6, 8), 0.5)
    assert float(RV.soft_rate_estimate(z, r)) > 0
    assert float(RV.hard_rate_estimate(z, r, theta)) > 0


@pytest.mark.slow
def test_rdovae_loss_and_grad():
    cfg = tiny_cfg()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 20)) * 0.3
    lam = jnp.full((2, 16), 0.001)
    q_ids = jnp.full((2, 16), 3, jnp.int32)
    loss, metrics = RV.rdovae_loss(params, feats, lam, q_ids,
                                   jax.random.PRNGKey(6), cfg)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda p: RV.rdovae_loss(p, feats, lam, q_ids,
                                              jax.random.PRNGKey(6), cfg)[0])(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(l * l)), grads, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_dred_coder_roundtrip():
    from lpcnet_tpu.dred.coder import DREDDecoder, DREDEncoder
    cfg = tiny_cfg()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    # make the statistical model produce nonzero scales
    params["statistical_model"]["quant_embedding"]["table"] = (
        0.1 * jax.random.normal(jax.random.PRNGKey(9),
                                (cfg.quant_levels, 6 * cfg.latent_dim)))
    enc = DREDEncoder(params, cfg, batch=2)
    rng = np.random.RandomState(0)
    for _ in range(16):
        enc.add_feature_frame(rng.randn(2, 20).astype(np.float32) * 0.3)
    payload = enc.produce_payload(num_redundancy_frames=8, q0=3, q1=9)
    assert payload is not None
    assert payload["zq"].shape == (2, 4, cfg.latent_dim)
    assert np.all(payload["bits"] > 0)
    dec = DREDDecoder(params, cfg)
    feats = dec.decode_all(payload["zq"], payload["q_ids"], payload["state"])
    assert feats.shape == (2, 16, 20)
    assert np.isfinite(feats).all()


def test_dataset_val_split_and_batches(tmp_path):
    """val_batch is deterministic, excluded from training iteration, and
    spans the full quant grid with monotone lambda."""
    import os
    from lpcnet_tpu.models import rdovae as RV
    from lpcnet_tpu.train.train_rdovae import RDOVAEDataset, RDOVAETrainConfig

    rng = np.random.RandomState(0)
    cfg = RV.RDOVAEConfig()
    tc = RDOVAETrainConfig(batch_size=2, sequence_length=8)
    feats = rng.randn(8 * 10, 36).astype(np.float32)
    p = str(tmp_path / "f.f32")
    feats.tofile(p)
    ds = RDOVAEDataset(p, tc, cfg, val_seqs=3)
    assert ds.num_sequences == 7
    vb0 = ds.val_batch(4)
    vb1 = ds.val_batch(4)
    np.testing.assert_array_equal(vb0["features"], vb1["features"])
    assert vb0["features"].shape[0] == 3
    # training iteration never touches the held-out rows
    val_rows = feats[7 * 8:, :cfg.num_features]
    for batch in ds:
        for seq in batch["features"]:
            assert not np.isin(seq[:, 0], val_rows[:, 0]).any()
    lam4 = ds.val_batch(4)["rate_lambda"][0, 0]
    lam12 = ds.val_batch(12)["rate_lambda"][0, 0]
    assert lam12 > lam4
