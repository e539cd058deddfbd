"""Training-graph tests: loss decreases, sparsify structure, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.train import losses as LL
from lpcnet_tpu.train.sparsify import (
    SparsifySchedule,
    sparsify_gru_a_recurrent,
    weight_clip_constraint,
)
from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer
from lpcnet_tpu.parallel import mesh as pmesh


def tiny_cfg():
    return M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                          pitch_embed_dim=8)


def fake_batch(rng, b=4, frames=5):
    t = frames * 160
    sig = np.cumsum(rng.randn(b, t + 1), axis=1).astype(np.float32) * 100
    return {
        "sig_in": sig[:, :-1],
        "sig_out": sig[:, 1:],
        "features": rng.randn(b, frames + 4, 20).astype(np.float32) * 0.3,
        "periods": rng.randint(33, 255, (b, frames + 4)).astype(np.int32),
        "lpc": (rng.randn(b, frames, 16) * 0.05).astype(np.float32),
    }


def test_tree_to_pdf_normalized():
    rng = np.random.RandomState(0)
    p = jax.nn.sigmoid(jnp.asarray(rng.randn(3, 7, 256), jnp.float32))
    pdf = LL.tree_to_pdf(p)
    np.testing.assert_allclose(np.asarray(jnp.sum(pdf, -1)), 1.0, rtol=1e-5)
    assert float(jnp.min(pdf)) >= 0.0


def test_tree_pdf_at_matches_dense_tree():
    """The target-path gather is bitwise the dense tree_to_pdf at the label,
    and the tree losses match their dense counterparts."""
    rng = np.random.RandomState(2)
    p = jax.nn.sigmoid(jnp.asarray(rng.randn(3, 11, 256), jnp.float32))
    labels = jnp.asarray(rng.randint(0, 256, (3, 11)), jnp.int32)
    dense = jnp.take_along_axis(LL.tree_to_pdf(p), labels[..., None],
                                axis=-1)[..., 0]
    path = LL.tree_pdf_at(p, labels)
    np.testing.assert_array_equal(np.asarray(path), np.asarray(dense))

    sig_out = jnp.asarray(rng.randn(3, 11) * 3000, jnp.float32)
    tp = jnp.asarray(rng.randn(3, 11) * 2500, jnp.float32)
    rp = tp + jnp.asarray(rng.randn(3, 11) * 500, jnp.float32)
    pdf = LL.tree_to_pdf(p)
    # the tree losses run in log-domain (multi-hot masks); equal to the
    # dense-product path up to exp/log roundoff
    np.testing.assert_allclose(
        np.asarray(LL.metric_cel_tree(sig_out, tp, p)),
        np.asarray(LL.metric_cel(sig_out, tp, pdf)), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(LL.interp_mulaw_loss_tree(sig_out, tp, rp, p)),
        np.asarray(LL.interp_mulaw_loss(sig_out, tp, rp, pdf)),
        rtol=2e-5, atol=2e-5)
    # saturated-pdf clamp mirrors the dense eps clip
    p_sat = jnp.full((1, 1, 256), 1e-30, jnp.float32)
    lab = jnp.full((1, 1), 255, jnp.int32)   # all-ones path hits log(p)
    ce_sat = float(LL.tree_neg_log_pdf(p_sat, lab)[0, 0])
    np.testing.assert_allclose(ce_sat, -np.log(1e-7), rtol=1e-6)


def test_diff_embed_matches_gather_form():
    """Soft-one-hot diff_embed == the two-row-gather formulation, including
    the noise-driven out-of-range edges (x<0, x>255)."""
    from lpcnet_tpu.models.lpcnet import diff_embed

    rng = np.random.RandomState(3)
    table = jnp.asarray(rng.randn(256, 128).astype(np.float32))
    x = jnp.asarray(np.concatenate([
        rng.uniform(0, 255, 500), [-1.2, -0.4, 0.0, 255.0, 255.7, 256.2],
    ]).astype(np.float32).reshape(11, 46))

    def ref(table, x):
        alpha = (x - jnp.floor(x))[..., None]
        i0 = jnp.clip(x.astype(jnp.int32), 0, 255)   # jit gather clamps
        i1 = jnp.clip(x.astype(jnp.int32) + 1, 0, 255)
        return (1.0 - alpha) * table[i0] + alpha * table[i1]

    got = np.asarray(jax.jit(diff_embed)(table, x))
    want = np.asarray(jax.jit(ref)(table, x))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_diff_pred_matches_definition():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 320).astype(np.float32)
    lpc = rng.randn(2, 2, 16).astype(np.float32) * 0.1
    pred = np.asarray(LL.diff_pred(jnp.asarray(x), jnp.asarray(lpc)))
    # manual at a few positions
    for b in (0, 1):
        for t in (0, 5, 159, 160, 300):
            fr = t // 160
            acc = 0.0
            for i in range(16):
                if t - i >= 0:
                    acc -= lpc[b, fr, i] * x[b, t - i]
            np.testing.assert_allclose(pred[b, t], acc, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_training_loss_decreases():
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=4, chunk_frames=5)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, tc, mesh=mesh)
    rng = np.random.RandomState(0)
    batch = fake_batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        m = tr.train_step(batch, sub)
        losses.append(m["loss"])
    assert losses[-1] < losses[0] - 0.1, losses[::10]
    assert np.isfinite(losses).all()


@pytest.mark.slow  # gate budget: test_multichip::test_sharded_train_block covers the DP path
def test_training_multidevice_sharded():
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=8, chunk_frames=3)
    devs = jax.devices("cpu")
    if len(devs) < 2:
        pytest.skip("needs multiple cpu devices")
    mesh = pmesh.make_mesh(devs[:8])
    tr = Trainer(cfg, tc, mesh=mesh)
    batch = fake_batch(np.random.RandomState(2), b=8, frames=3)
    m = tr.train_step(batch, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])


def test_sparsify_structure():
    rng = np.random.RandomState(3)
    n = 32
    w = jnp.asarray(rng.randn(n, 3 * n).astype(np.float32))
    sched = SparsifySchedule(0, 10, 1, (0.1, 0.1, 0.2))
    out = np.asarray(sparsify_gru_a_recurrent(w, sched, step=100))
    for k in range(3):
        a = out[:, k * n:(k + 1) * n]
        # diagonal survives
        assert np.all(np.abs(np.diag(a)) > 0)
        offdiag = a - np.diag(np.diag(a))
        density = np.mean(offdiag != 0)
        assert density < 0.45, density


def test_quantize_schedule_snaps_to_grid():
    """Past t_end the progressive quantizer snaps every weight onto the
    1/128 grid (training_tf2/lpcnet.py:118-126) -- the state int8 inference
    loads losslessly."""
    from lpcnet_tpu.train.sparsify import progressive_quantize
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(16, 48).astype(np.float32) * 0.3)
    sched = SparsifySchedule.quantize_finetune((0.2, 0.2, 0.2), scale=0.001)
    out = np.asarray(progressive_quantize(w, sched, step=1000))
    np.testing.assert_allclose(out * 128.0, np.round(out * 128.0), atol=1e-5)
    # mid-ramp: only residuals under the threshold snap
    mid = np.asarray(progressive_quantize(w, sched, step=sched.t_start))
    assert np.any(mid * 128.0 != np.round(mid * 128.0))


def test_weight_clip():
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(8, 24).astype(np.float32) * 3)
    c = 0.992
    out = np.asarray(weight_clip_constraint(w, c))
    pair = np.abs(out[:, 0::2]) + np.abs(out[:, 1::2])
    assert np.all(pair <= 2 * c + 1e-5)


@pytest.mark.slow
def test_training_e2e_variant():
    """End-to-end (differentiable LPC) variant trains: rc head + interp loss."""
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=20,
                         pitch_embed_dim=8, e2e=True)
    tc = TrainConfig(batch_size=2, chunk_frames=3)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, tc, mesh=mesh)
    rng = np.random.RandomState(5)
    b, frames = 2, 3
    t = frames * 160
    sig = np.cumsum(rng.randn(b, t + 1), axis=1).astype(np.float32) * 100
    batch = {
        "sig_in": sig[:, :-1],
        "sig_out": sig[:, 1:],
        "features": rng.randn(b, frames + 4, 20).astype(np.float32) * 0.3,
        "periods": rng.randint(33, 255, (b, frames + 4)).astype(np.int32),
        "rc": (rng.randn(b, frames, 16) * 0.05).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        losses.append(tr.train_step(batch, sub)["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("e2e,lookahead", [(False, 2), (True, 0)])
def test_device_loader_matches_host_loader(tmp_path, e2e, lookahead):
    """DeviceLPCNetLoader must produce batch-for-batch the same values as
    the host memmap loader (same shuffle seed), entirely on device."""
    from lpcnet_tpu.train.data import DeviceLPCNetLoader, LPCNetLoader

    rng = np.random.RandomState(0)
    cf, nf = 15, 36
    n_chunks = 14
    n_rows = n_chunks * cf + 8
    feats = (rng.randn(n_rows, nf) * 0.3).astype(np.float32)
    feats[:, 20:] *= 0.05                          # keep rc stable for e2e
    data = rng.randint(-3000, 3000,
                       (n_chunks * cf * 160 + 800, 2)).astype(np.int16)
    fpath, dpath = str(tmp_path / "f.f32"), str(tmp_path / "d.s16")
    feats.tofile(fpath)
    data.tofile(dpath)

    kw = dict(batch_size=4, chunk_frames=cf, lookahead=lookahead, e2e=e2e,
              seed=3)
    host = LPCNetLoader(dpath, fpath, **kw)
    dev = DeviceLPCNetLoader(dpath, fpath, **kw)
    assert len(host) == len(dev) >= 2
    for k in range(len(host)):
        hb, db = host[k], dev[k]
        assert set(hb) == set(db)
        for key in hb:
            np.testing.assert_allclose(
                np.asarray(db[key]), hb[key], rtol=1e-6, atol=1e-6,
                err_msg=f"batch {k} key {key}")
    # epoch reshuffle stays in lockstep (same seed stream)
    host.on_epoch_end()
    dev.on_epoch_end()
    np.testing.assert_array_equal(host.indices, dev.indices)


def test_apply_schedules_traced_matches_host():
    """The in-graph schedule transform (traced step) must match the host
    apply_schedules at mid-ramp, post-t_end, and quantize-mode steps."""
    from lpcnet_tpu.train.sparsify import (apply_schedules,
                                           apply_schedules_traced)
    rng = np.random.RandomState(7)
    n, cond = 32, 12
    params = {
        "gru_a": {"recurrent": jnp.asarray(
            rng.randn(n, 3 * n).astype(np.float32) * 0.3)},
        "gru_b": {"kernel": jnp.asarray(
            rng.randn(n + cond, 3 * 16).astype(np.float32) * 0.3)},
    }
    cases = [
        (SparsifySchedule(20, 100, 10, (0.1, 0.1, 0.2)),
         SparsifySchedule(20, 200, 10, (0.5, 0.5, 0.5)), [25, 60, 150, 250]),
        (SparsifySchedule.quantize_finetune((0.1, 0.1, 0.2), scale=0.01),
         SparsifySchedule.quantize_finetune((1.0, 1.0, 1.0), scale=0.01),
         [5, 150, 400]),
    ]
    for sched_a, sched_b, steps in cases:
        for step in steps:
            host = apply_schedules(params, step, sched_a, sched_b, n)
            traced = jax.jit(
                lambda p, s: apply_schedules_traced(p, s, sched_a, sched_b, n)
            )(params, jnp.int32(step))
            np.testing.assert_allclose(
                np.asarray(traced["gru_a"]["recurrent"]),
                np.asarray(host["gru_a"]["recurrent"]), atol=1e-6,
                err_msg=f"gru_a step {step} q={sched_a.quantize}")
            np.testing.assert_allclose(
                np.asarray(traced["gru_b"]["kernel"]),
                np.asarray(host["gru_b"]["kernel"]), atol=1e-6,
                err_msg=f"gru_b step {step} q={sched_a.quantize}")


def test_in_graph_schedule_sparsifies():
    """Training past t_end produces the block-sparse structure without any
    host-side apply call (the transform lives inside the jitted step)."""
    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=2, chunk_frames=3, schedule_scale=0.001,
                     density=(0.2, 0.2, 0.3))
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, tc, mesh=mesh)
    batch = fake_batch(np.random.RandomState(1), b=2, frames=3)
    key = jax.random.PRNGKey(0)
    for _ in range(45):   # t_end = 40 at scale 0.001 for gru_b
        key, sub = jax.random.split(key)
        tr.train_step(batch, sub)
    rec = np.asarray(jax.device_get(tr.state.params["gru_a"]["recurrent"]))
    n = rec.shape[0]
    off = rec[:, :n] - np.diag(np.diag(rec[:, :n]))
    assert np.mean(off != 0) < 0.6, "z-gate off-diagonal should be pruned"


def test_loader_holdout_split(tmp_path):
    """holdout_batches excludes the corpus tail from training indices, both
    loaders serve identical fixed val batches, and eval_loss consumes them."""
    from lpcnet_tpu.train.data import DeviceLPCNetLoader, LPCNetLoader
    rng = np.random.RandomState(0)
    bs, cf, nchunks = 4, 5, 25   # device loader needs chunk_frames >= 4
    pcm = rng.randint(-3000, 3000, nchunks * cf * 160 * 2).astype(np.int16)
    nf = 36
    feats = rng.randn((nchunks + 1) * cf * nf).astype(np.float32) * 0.3
    dpath, fpath = str(tmp_path / "d.s16"), str(tmp_path / "f.f32")
    pcm.tofile(dpath)
    feats.tofile(fpath)
    host = LPCNetLoader(dpath, fpath, batch_size=bs, chunk_frames=cf,
                        holdout_batches=2)
    dev = DeviceLPCNetLoader(dpath, fpath, batch_size=bs, chunk_frames=cf,
                             holdout_batches=2)
    assert host.nb_batches == dev.nb_batches
    n_train = host.nb_batches * bs
    assert np.max(host.indices) < n_train
    hv = list(host.val_batches())
    dv = list(dev.val_batches())
    assert len(hv) == len(dv) == 2
    for h, d in zip(hv, dv):
        for k in h:
            np.testing.assert_allclose(np.asarray(d[k]), h[k], atol=1e-5,
                                       err_msg=k)
    # training indices untouched after serving val batches
    assert np.max(host.indices) < n_train
    assert np.max(dev.indices) < n_train

    cfg = tiny_cfg()
    tc = TrainConfig(batch_size=bs, chunk_frames=cf)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, tc, mesh=mesh)
    m = tr.eval_loss(hv)
    assert np.isfinite(m["loss"])
    m2 = tr.eval_loss(hv)
    assert m == m2, "eval_loss must be deterministic"


@pytest.mark.slow  # gate budget: invariance property, covered per-release not per-commit
def test_train_block_size_invariant(tmp_path):
    """train_block scans (gather + step) on device; the per-step rng is
    fold_in(key, step-counter), so 1 block of 4 steps must produce params
    IDENTICAL to 2 blocks of 2."""
    from lpcnet_tpu.train.data import DeviceLPCNetLoader
    rng = np.random.RandomState(0)
    bs, cf, nchunks = 4, 5, 25
    pcm = rng.randint(-3000, 3000, nchunks * cf * 160 * 2).astype(np.int16)
    feats = rng.randn((nchunks + 1) * cf * 36).astype(np.float32) * 0.3
    dpath, fpath = str(tmp_path / "d.s16"), str(tmp_path / "f.f32")
    pcm.tofile(dpath)
    feats.tofile(fpath)

    def run(block_sizes):
        loader = DeviceLPCNetLoader(dpath, fpath, batch_size=bs,
                                    chunk_frames=cf, seed=3)
        cfg = tiny_cfg()
        tc = TrainConfig(batch_size=bs, chunk_frames=cf, ema_decay=0.999)
        tr = Trainer(cfg, tc, mesh=pmesh.make_mesh(jax.devices("cpu")[:1]))
        blocks = iter(loader.index_blocks(1))
        sels = np.concatenate([next(blocks) for _ in range(4)], axis=0)
        off = 0
        losses = []
        for k in block_sizes:
            ms = tr.train_block(loader, sels[off:off + k])
            losses += list(np.asarray(ms["loss"]))
            off += k
        assert tr._host_step == 4
        return jax.device_get(tr.state.params), losses

    p1, l1 = run([4])
    p2, l2 = run([2, 2])
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p1, p2)
