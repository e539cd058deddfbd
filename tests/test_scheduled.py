"""Scheduled-sampling (sampled-feedback) fine-tune machinery tests.

The round-4 exposure-bias diagnosis motivates training against the model's
own sampled feedback (train/scheduled.py); these tests pin the mechanics:
the de-emphasis scan, the teacher-force limit (full TF reproduces the
target), the history mixing rule, and end-to-end train steps with
ss_prob > 0 on the tiny config.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.dsp.constants import PREEMPHASIS
from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.train.scheduled import (deemphasis_seq, mixed_history,
                                        sampled_signal)
from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer, loss_fn


def tiny_cfg():
    return M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                          pitch_embed_dim=8)


def fake_batch(rng, b=4, frames=5):
    """Training-shaped batch whose signal is a PREEMPHASIZED bounded
    waveform (like real data.s16): the de-emphasized trajectory must stay
    inside int16 range or the sampler's output clip (matching the C
    synthesis clamp) breaks the teacher-force reproduction property."""
    t = frames * 160
    audio = np.clip(np.cumsum(rng.randn(b, t + 2), axis=1) * 100,
                    -8000, 8000).astype(np.float32)
    sig = audio[:, 1:] - np.float32(PREEMPHASIS) * audio[:, :-1]
    return {
        "sig_in": sig[:, :-1],
        "sig_out": sig[:, 1:],
        "features": rng.randn(b, frames + 4, 20).astype(np.float32) * 0.3,
        "periods": rng.randint(33, 255, (b, frames + 4)).astype(np.int32),
        "lpc": (rng.randn(b, frames, 16) * 0.05).astype(np.float32),
    }


def test_deemphasis_seq_matches_sequential():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 47).astype(np.float32) * 1000
    out = np.asarray(deemphasis_seq(jnp.asarray(x)))
    ref = np.zeros_like(x)
    for b in range(x.shape[0]):
        acc = 0.0
        for t in range(x.shape[1]):
            acc = x[b, t] + PREEMPHASIS * acc
            ref[b, t] = acc
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-2)


def test_full_teacher_force_reproduces_target():
    """tf_mask all-True: the sampled trajectory is the target signal (up to
    per-sample output rounding, which the deemphasis recursion bounds)."""
    cfg = tiny_cfg()
    rng = np.random.RandomState(1)
    batch = {k: jnp.asarray(v) for k, v in fake_batch(rng).items()}
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    tf_mask = jnp.ones(batch["sig_out"].shape, bool)
    s_hat = sampled_signal(params, cfg, batch, tf_mask,
                           jax.random.PRNGKey(7))
    err = np.abs(np.asarray(s_hat) - np.asarray(batch["sig_out"]))
    assert err.max() <= 1.0, err.max()


def test_sampled_positions_diverge_from_target():
    """tf_mask all-False with random weights: the trajectory is the model's
    own (and differs from the target)."""
    cfg = tiny_cfg()
    rng = np.random.RandomState(2)
    batch = {k: jnp.asarray(v) for k, v in fake_batch(rng).items()}
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    tf_mask = jnp.zeros(batch["sig_out"].shape, bool)
    s_hat = np.asarray(sampled_signal(params, cfg, batch, tf_mask,
                                      jax.random.PRNGKey(7)))
    assert np.isfinite(s_hat).all()
    err = np.abs(s_hat - np.asarray(batch["sig_out"]))
    assert err.mean() > 10.0   # random model can't track the target


def test_mixed_history_rule():
    rng = np.random.RandomState(3)
    sig_in = jnp.asarray(rng.randn(2, 9).astype(np.float32))
    s_hat = jnp.asarray(rng.randn(2, 9).astype(np.float32))
    tf = jnp.asarray(rng.rand(2, 9) > 0.5)
    mixed = np.asarray(mixed_history(sig_in, s_hat, tf))
    # position 0 always keeps the data history
    np.testing.assert_array_equal(mixed[:, 0], np.asarray(sig_in)[:, 0])
    for b in range(2):
        for t in range(1, 9):
            want = (np.asarray(sig_in)[b, t] if bool(tf[b, t - 1])
                    else np.asarray(s_hat)[b, t - 1])
            assert mixed[b, t] == want
    # all-TF mask: unchanged input
    all_tf = np.asarray(mixed_history(sig_in, s_hat,
                                      jnp.ones((2, 9), bool)))
    np.testing.assert_array_equal(all_tf, np.asarray(sig_in))


def test_loss_fn_ss_finite_and_differs():
    cfg = tiny_cfg()
    rng = np.random.RandomState(4)
    batch = {k: jnp.asarray(v)
             for k, v in fake_batch(rng, b=2, frames=2).items()}
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(5)
    l0, _ = loss_fn(params, cfg, TrainConfig(ss_prob=0.0), batch, key)
    l1, _ = loss_fn(params, cfg, TrainConfig(ss_prob=0.5), batch, key)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(l0) != float(l1)
    g = jax.grad(lambda p: loss_fn(p, cfg, TrainConfig(ss_prob=0.5),
                                   batch, key)[0])(params)
    flat = jax.tree.leaves(jax.tree.map(lambda x: float(jnp.abs(x).sum()), g))
    assert all(np.isfinite(v) for v in flat)
    assert sum(flat) > 0.0


@pytest.mark.slow
def test_trainer_steps_with_ss():
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, chunk_frames=5, ss_prob=0.3,
                     density=(1.0, 1.0, 1.0), grub_density=(1.0, 1.0, 1.0))
    trainer = Trainer(cfg, tc)
    rng = np.random.RandomState(5)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(3):
        key, sub = jax.random.split(key)
        m = trainer.train_step(fake_batch(rng), sub)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)


def test_tree_distill_kl_matches_dense():
    """Level-by-level tree KL == KL of the dense 256-way pdfs."""
    from lpcnet_tpu.train import losses as LL
    rng = np.random.RandomState(6)
    q = jnp.asarray(0.05 + 0.9 * rng.rand(3, 7, 256).astype(np.float32))
    p = jnp.asarray(0.05 + 0.9 * rng.rand(3, 7, 256).astype(np.float32))
    got = np.asarray(LL.tree_distill_kl(q, p))
    pq = np.asarray(LL.tree_to_pdf(q))
    pp = np.asarray(LL.tree_to_pdf(p))
    want = np.sum(pq * (np.log(pq) - np.log(pp)), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # KL(q||q) == 0
    zero = np.asarray(LL.tree_distill_kl(q, q))
    np.testing.assert_allclose(zero, 0.0, atol=1e-5)


def test_exc_hist_override_identity():
    """Passing the internally-computed exc history as the override leaves
    training_forward bitwise unchanged (the hide-exc hook is inert when fed
    the default channel)."""
    from lpcnet_tpu.train import losses as LL
    cfg = tiny_cfg()
    rng = np.random.RandomState(7)
    batch = {k: jnp.asarray(v)
             for k, v in fake_batch(rng, b=2, frames=2).items()}
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    weighting = jnp.power(jnp.float32(cfg.lpc_gamma),
                          jnp.arange(1, 17, dtype=jnp.float32))
    preds = LL.diff_pred(batch["sig_in"], batch["lpc"] * weighting, 160)
    exc = LL.tf_l2u(batch["sig_in"] - jnp.roll(preds, 1, axis=-1))
    base = M.training_forward(params, cfg, batch["sig_in"],
                              batch["features"], batch["periods"],
                              lpc=batch["lpc"], training=False)
    over = M.training_forward(params, cfg, batch["sig_in"],
                              batch["features"], batch["periods"],
                              lpc=batch["lpc"], training=False,
                              exc_hist_override=exc)
    np.testing.assert_array_equal(np.asarray(base["tree_probs"]),
                                  np.asarray(over["tree_probs"]))


def test_loss_fn_ss_arms_finite():
    """Arm (a) hide-exc and arm (b) distillation: finite loss+grads, and
    each arm changes the loss vs plain SS."""
    cfg = tiny_cfg()
    rng = np.random.RandomState(8)
    batch = {k: jnp.asarray(v)
             for k, v in fake_batch(rng, b=2, frames=2).items()}
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(9)
    base, _ = loss_fn(params, cfg, TrainConfig(ss_prob=0.5), batch, key)
    hide, _ = loss_fn(params, cfg,
                      TrainConfig(ss_prob=0.5, ss_hide_exc=True), batch, key)
    dist, (m, _) = loss_fn(params, cfg,
                           TrainConfig(ss_prob=0.5, ss_distill=0.5),
                           batch, key)
    for v in (base, hide, dist):
        assert np.isfinite(float(v))
    assert float(hide) != float(base)
    assert float(dist) != float(base)
    assert np.isfinite(float(m["distill_kl"])) and float(m["distill_kl"]) > 0
    for tc in (TrainConfig(ss_prob=0.5, ss_hide_exc=True),
               TrainConfig(ss_prob=0.5, ss_distill=1.0)):
        g = jax.grad(lambda p: loss_fn(p, cfg, tc, batch, key)[0])(params)
        flat = jax.tree.leaves(jax.tree.map(
            lambda x: float(jnp.abs(x).sum()), g))
        assert all(np.isfinite(v) for v in flat)
        assert sum(flat) > 0.0
