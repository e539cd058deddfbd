"""FEC-driven PLC: the lpcnet_plc_fec_add queue path
(src/lpcnet_plc.c:111-173) exercised through the driver harness."""

import os

import numpy as np
import pytest

import conftest
from conftest import load_fixture

import jax

from lpcnet_tpu.dred.fec_file import read_fec_packets, write_fec_packets
from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.models import plc as PM
from lpcnet_tpu.plc.driver import run_plc_fec_stream, run_plc_stream
from lpcnet_tpu.plc.plc import LPCNET_PLC_CAUSAL, PLC


def _make_plc():
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    return PLC(fused, cfg, plc_params, options=LPCNET_PLC_CAUSAL, batch=1)


def _speech(n_frames):
    pcm = load_fixture("codec.npz")["pcm"].astype(np.float32)
    need = n_frames * 160
    return np.tile(pcm, (need // len(pcm) + 1))[:need]


def _true_features(pcm):
    """Per-frame encoder features, as ideal FEC payloads."""
    from lpcnet_tpu.codec import features as F
    import jax.numpy as jnp
    st = F.init_encoder_state(1)
    rows = []
    for k in range(len(pcm) // 160):
        st, f = F.compute_single_frame_features(
            st, jnp.asarray(pcm[None, k * 160:(k + 1) * 160]))
        rows.append(np.asarray(f)[0])
    return np.stack(rows)


@pytest.mark.slow
def test_fec_queue_is_consumed_and_resets_loss_count():
    n_frames = 10
    pcm = _speech(n_frames)
    feats = _true_features(pcm)
    fec_packets = [feats[2 * p:2 * p + 2, :20] for p in range(n_frames // 2)]
    losses = np.array([0, 0, 1, 1, 0])

    plc = _make_plc()
    out = run_plc_fec_stream(plc, pcm, losses, fec_packets)
    assert out.shape == (n_frames * 160,)
    # FEC features were available for every lost frame -> never "lost"
    assert plc.loss_count == 0

    plc2 = _make_plc()
    out2 = run_plc_stream(plc2, pcm, losses)
    # without FEC the concealment ran on predicted features
    assert plc2.loss_count == 0 or not np.allclose(out, out2)
    # with FEC, concealment synthesis used the true features: the PLC's
    # feature estimate at the end of the burst matches the queued ones
    assert np.isfinite(out).all() and np.isfinite(out2).all()


@pytest.mark.slow
def test_fec_features_override_prediction():
    """During a loss, _get_fec_or_pred must return queued features rather
    than predictions. The first conceal's drain loop consumes several queue
    entries (the PLC pipeline runs features_delay+TO ahead of wall clock,
    src/lpcnet_plc.c:300-316), so the redundancy must cover a span -- as the
    reference's 20-52-frame DRED payloads do."""
    n_frames = 12
    pcm = _speech(n_frames)
    feats = _true_features(pcm)
    plc = _make_plc()
    # feed 3 good packets + queue all 12 frames' redundancy
    for k in range(n_frames):
        plc.fec_add(feats[k][None, :20])
    for k in range(6):
        plc.update(pcm[None, k * 160:(k + 1) * 160])
    assert plc.fec_read_pos == 6          # one entry consumed per good frame
    plc.conceal()
    # every get_fec_or_pred found real features: no prediction was used
    assert plc.loss_count == 0
    consumed = plc.fec_read_pos
    assert consumed > 6
    np.testing.assert_allclose(plc.features[0], feats[consumed - 1, :20],
                               atol=1e-5)
    plc.conceal()
    assert plc.loss_count == 0
    assert plc.fec_read_pos == consumed + 1
    np.testing.assert_allclose(plc.features[0], feats[consumed, :20],
                               atol=1e-5)


def test_fec_file_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    packets = [rng.randn(2, 20).astype(np.float32) for _ in range(5)]
    rates = [100 + i for i in range(5)]
    path = os.path.join(tmp_path, "t.fec")
    write_fec_packets(path, packets, rates)
    got, grates = read_fec_packets(path)
    assert grates == rates
    for a, b in zip(packets, got):
        np.testing.assert_array_equal(a, b)
