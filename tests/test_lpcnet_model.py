"""LPCNet model unit tests: fusion equivalence, synthesis determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.nn import layers as nn
from lpcnet_tpu.utils.rng import kiss99_srand, kiss99_step


def small_cfg():
    return M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                          pitch_embed_dim=8)


def test_fused_equals_unfused():
    """gru_a via fused embedding tables == gru_a via explicit concat input."""
    cfg = small_cfg()
    key = jax.random.PRNGKey(0)
    params = M.init_params(key, cfg)
    fused = M.fuse_inference_params(params, cfg)

    b = 3
    rng = jax.random.PRNGKey(1)
    sig_u = jax.random.randint(rng, (b,), 0, 256)
    pred_u = jax.random.randint(jax.random.PRNGKey(2), (b,), 0, 256)
    exc_u = jax.random.randint(jax.random.PRNGKey(3), (b,), 0, 256)
    cond = jax.random.normal(jax.random.PRNGKey(4), (b, cfg.cond_size))
    h = jax.random.normal(jax.random.PRNGKey(5), (b, cfg.rnn_units1)) * 0.1

    # reference: explicit concat input through the training-layout GRU
    e = params["embed_sig"]["table"]
    x = jnp.concatenate([e[sig_u], e[pred_u], e[exc_u], cond], axis=-1)
    h_ref = nn.gru_step(params["gru_a"], h, x)

    # fused path
    cond_a = nn.dense(fused["cond_to_a"], cond)
    gate_a = (cond_a + fused["embed_sig_a"][sig_u]
              + fused["embed_pred_a"][pred_u] + fused["embed_exc_a"][exc_u])
    h_fused = nn.gru_precomputed_step(fused["gru_a_rec"], h, gate_a)

    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_fused),
                               rtol=1e-5, atol=1e-5)


def test_gru_seq_matches_steps():
    cfg = small_cfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)["gru_b"]
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, cfg.gru_b_input_size))
    ys, hT = nn.gru_seq(params, x)
    h = jnp.zeros((2, cfg.rnn_units2))
    for t in range(7):
        h = nn.gru_step(params, h, x[:, t])
        np.testing.assert_allclose(np.asarray(ys[:, t]), np.asarray(h),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h), rtol=1e-5, atol=1e-5)


def test_kiss99_matches_reference_algorithm():
    st = kiss99_srand()
    vals = []
    for _ in range(4):
        v, st = kiss99_step(st)
        vals.append(int(v))
    # self-consistency: deterministic
    st2 = kiss99_srand()
    v0, _ = kiss99_step(st2)
    assert int(v0) == vals[0]
    assert len(set(vals)) == 4


@pytest.mark.slow
def test_synthesis_runs_and_is_deterministic():
    cfg = small_cfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    b = 4
    feats = jax.random.normal(jax.random.PRNGKey(7), (b, 36)) * 0.3

    def run():
        fstate = M.init_frame_state(b, cfg)
        sstate = M.init_sample_state(b, cfg)
        pcm_frames = []
        for _ in range(3):
            fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
            sstate, pcm = M.synthesize_frame(fused, sstate, ca, cb, lpc)
            pcm_frames.append(np.asarray(pcm))
        return np.concatenate(pcm_frames, axis=-1)

    p1, p2 = run(), run()
    assert p1.shape == (b, 480)
    np.testing.assert_array_equal(p1, p2)
    assert np.isfinite(p1).all()
    # streams have independent RNG -> outputs differ across batch
    assert not np.array_equal(p1[0], p1[1])


@pytest.mark.slow
def test_teacher_forcing_tracks_target():
    """With preload, the fed-back state must follow the target waveform."""
    cfg = small_cfg()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    b = 2
    feats = jax.random.normal(jax.random.PRNGKey(8), (b, 36)) * 0.3
    target = (jax.random.normal(jax.random.PRNGKey(9), (b, 160)) * 1000.0)

    fstate = M.init_frame_state(b, cfg)
    sstate = M.init_sample_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    sstate, _ = M.synthesize_frame(fused, sstate, ca, cb, lpc, preload=target)
    # deemph memory must equal the last target sample exactly
    np.testing.assert_allclose(np.asarray(sstate.deemph),
                               np.asarray(target[:, -1]), rtol=1e-4)


def test_pdf_sampling_mode():
    """Full-PDF sampling (training_tf2/test_lpcnet.py:107-114): runs, is
    deterministic, differs from bit-tree sampling, and respects the
    voicing-temperature knob (high corr -> lower-entropy pdf)."""
    import jax.numpy as jnp
    from lpcnet_tpu.models import lpcnet as M

    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    b = 2
    state = M.init_sample_state(b, cfg)
    rng = np.random.RandomState(0)
    ca = jnp.asarray(rng.randn(b, 3 * cfg.rnn_units1).astype(np.float32))
    cb = jnp.asarray(rng.randn(b, 3 * cfg.rnn_units2).astype(np.float32))
    lpc = jnp.asarray((rng.randn(b, 16) * 0.05).astype(np.float32))
    corr = jnp.asarray(np.array([0.9, -0.2], np.float32))

    _, pcm1 = M.synthesize_frame(fused, state, ca, cb, lpc, n_samples=32,
                                 pdf_corr=corr)
    _, pcm2 = M.synthesize_frame(fused, state, ca, cb, lpc, n_samples=32,
                                 pdf_corr=corr)
    np.testing.assert_array_equal(np.asarray(pcm1), np.asarray(pcm2))
    _, pcm3 = M.synthesize_frame(fused, state, ca, cb, lpc, n_samples=32)
    assert not np.array_equal(np.asarray(pcm1), np.asarray(pcm3))
    assert np.isfinite(np.asarray(pcm1)).all()

    # temperature: pdf mass concentrates for high corr
    from lpcnet_tpu.models.lpcnet import sample_excitation_pdf
    h_b = jnp.asarray(np.tanh(rng.randn(b, cfg.rnn_units2)).astype(np.float32))
    exc, _ = sample_excitation_pdf(fused["dual_fc"], h_b, state.rng, corr)
    assert exc.shape == (b,) and int(exc.min()) >= 0 and int(exc.max()) < 256


@pytest.mark.parametrize("lookahead,gamma,e2e", [
    # the (2, 1.0, False) combo duplicates the lookahead-2 path that the
    # e2e case already covers and is the slowest case in the fast tier
    pytest.param(2, 1.0, False, marks=pytest.mark.slow),
    (0, 0.9, False), (2, 1.0, True)])
def test_frame_network_flush_matches_sequential(lookahead, gamma, e2e):
    """frame_network_flush(count) == count sequential frame_network calls:
    conv mems, LPC FIFO, frame_count, and the last step's cond/lpc."""
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         pitch_embed_dim=8, lookahead=lookahead,
                         lpc_gamma=gamma, e2e=e2e)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    b, T = 7, 4
    rng = np.random.RandomState(5)
    ring = jnp.asarray(rng.randn(b, T, 36).astype(np.float32) * 0.4)
    count = jnp.asarray([0, 1, 2, 3, 4, 4, 2], jnp.int32)
    s0 = M.init_frame_state(b, cfg)
    # non-trivial carried state: run two warmup frames first
    for i in range(3):
        warm = jnp.asarray(rng.randn(b, 36).astype(np.float32) * 0.4)
        s0, _, ca0, cb0, lpc0 = M.frame_network(fused, s0, warm, cfg)

    # reference: per-stream sequential calls with masked merge
    ref_s, ref_ca, ref_cb, ref_lpc = s0, ca0, cb0, lpc0
    for i in range(T):
        act = i < count
        new_s, _, ca, cb, lpc = M.frame_network(fused, ref_s, ring[:, i], cfg)
        pick = lambda n, o: jnp.where(
            act.reshape((b,) + (1,) * (n.ndim - 1)), n, o)
        ref_s = jax.tree.map(pick, new_s, ref_s)
        ref_ca, ref_cb, ref_lpc = (pick(ca, ref_ca), pick(cb, ref_cb),
                                   pick(lpc, ref_lpc))

    got_s, got_ca, got_cb, got_lpc = M.frame_network_flush(
        fused, s0, ring, count, cfg)
    act = np.asarray(count) > 0
    np.testing.assert_allclose(np.asarray(got_s.conv1_mem)[act],
                               np.asarray(ref_s.conv1_mem)[act], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s.conv2_mem)[act],
                               np.asarray(ref_s.conv2_mem)[act], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s.old_lpc)[act],
                               np.asarray(ref_s.old_lpc)[act], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_s.frame_count)[act],
                                  np.asarray(ref_s.frame_count)[act])
    np.testing.assert_allclose(np.asarray(got_ca)[act],
                               np.asarray(ref_ca)[act], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cb)[act],
                               np.asarray(ref_cb)[act], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_lpc)[act],
                               np.asarray(ref_lpc)[act], atol=1e-5)
