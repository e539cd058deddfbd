"""Aux blob mappings (PLC/DRED) + serving stream pool."""

import numpy as np
import pytest

import jax

from lpcnet_tpu.models import plc as PM
from lpcnet_tpu.models import rdovae as RV
from lpcnet_tpu.weights.aux_arrays import (
    load_plc_blob, load_rdovae_blob, save_plc_blob, save_rdovae_blob,
)


def test_plc_blob_roundtrip():
    params = PM.init_params(jax.random.PRNGKey(0))
    data = save_plc_blob(params, quantize=False)
    back = load_plc_blob(data)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, PM.PLC_INPUT_SIZE)) * 0.3
    st = PM.init_state(2)
    _, out1 = PM.compute_plc_pred(params, st, x)
    _, out2 = PM.compute_plc_pred(back, st, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_rdovae_blob_roundtrip():
    cfg = RV.RDOVAEConfig(latent_dim=8, cond_size=16, cond_size2=12,
                          state_dim=6, pvq_num_pulses=12, state_hidden=10)
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    data = save_rdovae_blob(params, quantize=False)
    back = load_rdovae_blob(data, cfg)
    feats = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 20)) * 0.3
    z1, s1 = RV.encode_seq(params, feats, cfg)
    z2, s2 = RV.encode_seq(back, feats, cfg)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5, atol=1e-5)
    dec1 = RV.decode_seq(params, z1[:, ::2], s1[:, -1], cfg)
    dec2 = RV.decode_seq(back, z2[:, ::2], s2[:, -1], cfg)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_stream_pool():
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.runtime.serving import StreamPool
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    pool = StreamPool(fused, cfg, capacity=4)
    rng = np.random.RandomState(0)
    f = {f"s{i}": rng.randn(36).astype(np.float32) * 0.3 for i in range(3)}
    out = None
    for _ in range(4):
        out = pool.step_features(f)
    assert set(out) == set(f)
    assert out["s0"].shape == (160,)
    assert pool.n_active == 3
    pool.detach("s1")
    assert pool.n_active == 2
    out = pool.step_features({"s0": f["s0"], "s3": f["s2"]})
    assert "s3" in out and "s1" not in out


@pytest.mark.slow
def test_plc_stream_pool():
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.runtime.serving import PLCStreamPool
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    pool = PLCStreamPool(fused, cfg, plc_params, capacity=4)
    rng = np.random.RandomState(0)
    frame = (rng.randn(160) * 1000).astype(np.float32)
    # mixed per-stream losses in one tick
    for k in range(6):
        out = pool.step({
            "a": frame,
            "b": None if k in (2, 3) else frame,   # b loses packets 1
            "c": frame if k < 4 else None,          # c loses the tail
        })
    assert set(out) == {"a", "b", "c"}
    assert all(v.shape == (160,) for v in out.values())
    assert all(np.isfinite(v).all() for v in out.values())
    assert pool.n_active == 3
    pool.detach("b")
    out = pool.step({"a": frame})
    assert set(out) == {"a", "c"}


@pytest.mark.slow
def test_plc_stream_pool_fec():
    """Pool-level FEC: redundancy queued for one stream is consumed during
    its losses (loss counter stays clear) and leaves other streams alone."""
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.runtime.serving import PLCStreamPool
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    pool = PLCStreamPool(fused, cfg, plc_params, capacity=4)
    rng = np.random.RandomState(0)
    frame = (rng.randn(160) * 1000).astype(np.float32)
    feat = (rng.randn(20) * 0.3).astype(np.float32)
    for k in range(6):
        pool.fec_add({"a": feat, "b": None})
        out = pool.step({
            "a": None if k >= 2 else frame,   # a: losses covered by FEC
            "b": None if k >= 2 else frame,   # b: uncovered losses
        })
    assert all(np.isfinite(v).all() for v in out.values())
    lc = np.asarray(pool.plc.state.loss_count)
    sa, sb = pool.slot_of["a"], pool.slot_of["b"]
    assert lc[sa] == 0          # FEC hits reset the loss counter
    assert lc[sb] == 4          # no redundancy -> counter latched
    skip = np.asarray(pool.plc.state.fec_skip)
    assert skip[sb] >= 0 and np.asarray(pool.plc.state.fec_len)[sb] == 0
