"""Multi-chip inference sharding: batched synthesis over a device mesh.

Streams shard across chips on the batch axis (the same layout the serving
fleet uses); parameters are replicated. Runs on the virtual 8-device CPU
mesh (the scan path; the Pallas kernel is per-chip identical under
shard_map on real hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.parallel import mesh as pmesh


@pytest.mark.slow
def test_sharded_synthesis():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 cpu devices")
    mesh = pmesh.make_mesh(devs[:8])
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)

    b = 16   # 2 streams per device
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    sstate = M.init_sample_state(b, cfg)

    dsh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    fused = jax.device_put(fused, repl)
    fstate = jax.device_put(fstate, dsh)
    sstate = jax.device_put(sstate, dsh)
    feats = jax.device_put(feats, dsh)

    @jax.jit
    def step(fused, fstate, sstate, feats):
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
        sstate, pcm = M.synthesize_frame(fused, sstate, ca, cb, lpc)
        return fstate, sstate, pcm

    fstate, sstate, pcm = step(fused, fstate, sstate, feats)
    # output keeps the batch sharding (no cross-chip traffic in the AR loop)
    assert pcm.shape == (b, 160)
    assert np.isfinite(np.asarray(pcm)).all()
    shard_devs = {s.device for s in pcm.addressable_shards}
    assert len(shard_devs) == 8, "synthesis did not stay batch-sharded"

    # per-stream results must match the unsharded run exactly
    fstate1 = M.init_frame_state(b, cfg)
    sstate1 = M.init_sample_state(b, cfg)
    with jax.default_device(devs[0]):
        f2, _, ca, cb, lpc = M.frame_network(
            jax.device_get(fused), fstate1, jax.device_get(feats), cfg)
        _, pcm_ref = M.synthesize_frame(jax.device_get(fused), sstate1, ca, cb, lpc)
    np.testing.assert_allclose(np.asarray(pcm), np.asarray(pcm_ref), atol=1.0)


@pytest.mark.slow  # gate budget: sharded serving covered by test_sharded_synthesis_matches_single
def test_sharded_int8_synthesis():
    """The int8 quantized inference path under batch sharding: int8 weight
    tables replicate; the int8 matmuls stay per-chip."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 cpu devices")
    from lpcnet_tpu.nn.quantized import quantize_fused
    mesh = pmesh.make_mesh(devs[:8])
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    qfused = quantize_fused(M.fuse_inference_params(params, cfg))

    b = 16
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    sstate = M.init_sample_state(b, cfg)
    dsh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    qfused = jax.device_put(qfused, repl)
    fstate = jax.device_put(fstate, dsh)
    sstate = jax.device_put(sstate, dsh)
    feats = jax.device_put(feats, dsh)

    @jax.jit
    def step(fused, fstate, sstate, feats):
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
        sstate, pcm = M.synthesize_frame(fused, sstate, ca, cb, lpc)
        return fstate, sstate, pcm

    _, _, pcm = step(qfused, fstate, sstate, feats)
    assert pcm.shape == (b, 160)
    assert np.isfinite(np.asarray(pcm)).all()
    assert len({s.device for s in pcm.addressable_shards}) == 8


@pytest.mark.slow
def test_sharded_batched_plc():
    """The mixed-loss batched PLC step under batch sharding: every stream
    carries its own loss pattern; state and audio shard on the stream axis
    and parameters replicate (the serving-pool layout, SURVEY 2.4)."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 cpu devices")
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc.batched import BatchedPLC
    mesh = pmesh.make_mesh(devs[:8])
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))

    b = 16
    plc = BatchedPLC(fused, cfg, plc_params, batch=b, use_kernel=False)
    dsh = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    plc.fused = jax.device_put(plc.fused, repl)
    plc.plc_params = jax.device_put(plc.plc_params, repl)
    # ring buffers keep the ring axis leading ([delay+1, B, ...]); shard
    # whichever axis is the stream axis
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        axis = next(i for i, d in enumerate(x.shape) if d == b)
        spec = P(*([None] * axis + ["data"]))
        return jax.device_put(x, NamedSharding(mesh, spec))
    plc.state = jax.tree.map(put, plc.state)

    rng = np.random.RandomState(7)
    t = 6
    pcm = (rng.randn(b, t, 160) * 3000).astype(np.float32)
    # every stream a different pattern; stream 0 all-good, stream 1 all-lost
    lost = rng.rand(b, t) < 0.3
    lost[0], lost[1] = False, True
    pcm_d = jax.device_put(jnp.asarray(pcm), dsh)
    lost_d = jax.device_put(jnp.asarray(lost), dsh)
    outs = plc.run(pcm_d, lost_d, device_out=True)

    # state and output keep the stream sharding end to end
    assert all(len({s.device for s in o.addressable_shards}) == 8
               for o in outs)
    assert len({s.device
                for s in plc.state.sstate.gru_a.addressable_shards}) == 8
    out = np.concatenate([np.asarray(o) for o in outs], axis=1)
    assert np.isfinite(out).all()

    # parity vs the unsharded run
    plc1 = BatchedPLC(fused, cfg, plc_params, batch=b, use_kernel=False)
    with jax.default_device(devs[0]):
        ref = plc1.run(pcm, lost)
    np.testing.assert_allclose(out, ref, atol=1.0)


def test_sharded_train_block(tmp_path):
    """train_block on an 8-device DP mesh: replicated corpus, in-graph
    batch gather pinned to the data axis, params replicated after the
    scanned update chain."""
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 cpu devices")
    from lpcnet_tpu.train.data import DeviceLPCNetLoader
    from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer

    mesh = pmesh.make_mesh(devs[:8])
    rng = np.random.RandomState(0)
    bs, cf, nchunks = 16, 5, 70
    pcm = rng.randint(-3000, 3000, nchunks * cf * 160 * 2).astype(np.int16)
    feats = rng.randn((nchunks + 1) * cf * 36).astype(np.float32) * 0.3
    dpath, fpath = str(tmp_path / "d.s16"), str(tmp_path / "f.f32")
    pcm.tofile(dpath)
    feats.tofile(fpath)
    loader = DeviceLPCNetLoader(dpath, fpath, batch_size=bs, chunk_frames=cf,
                                sharding=pmesh.replicated(mesh))
    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    tc = TrainConfig(batch_size=bs, chunk_frames=cf, ema_decay=0.999)
    tr = Trainer(cfg, tc, mesh=mesh)
    sels = next(iter(loader.index_blocks(4)))
    ms = tr.train_block(loader, sels)
    losses = np.asarray(ms["loss"])
    assert losses.shape == (4,) and np.isfinite(losses).all()
    assert tr._host_step == 4
    # params stay replicated (fully addressable on every device)
    p = tr.state.params["gru_a"]["recurrent"]
    assert p.sharding.is_fully_replicated
