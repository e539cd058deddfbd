"""Full-framework integration: data gen -> train -> export -> synthesize.

This is the vertical slice the reference achieves with dump_data +
train_lpcnet.py + dump_lpcnet.py + lpcnet_demo, compressed to a tiny model
and a few steps. Checks plumbing, shapes, and file formats -- not quality.
"""

import numpy as np
import pytest

import jax

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.parallel import mesh as pmesh
from lpcnet_tpu.train.data import LPCNetLoader
from lpcnet_tpu.train.dump_data import dump_data
from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer
from lpcnet_tpu.weights import load_lpcnet_blob, save_lpcnet_blob


@pytest.mark.slow
def test_dump_train_export_synthesize(tmp_path):
    rng = np.random.RandomState(0)
    t = np.arange(160 * 16 * 24)
    speech = (4000 * np.sin(2 * np.pi * 140 * t / 16000)
              + 300 * rng.randn(len(t))).astype(np.int16)

    fpath = str(tmp_path / "features.f32")
    dpath = str(tmp_path / "data.s16")
    dump_data(speech, fpath, dpath, chunk_frames=128)

    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    tc = TrainConfig(batch_size=4, chunk_frames=15)
    loader = LPCNetLoader(dpath, fpath, batch_size=4, chunk_frames=15)
    assert len(loader) >= 1
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    trainer = Trainer(cfg, tc, mesh=mesh)
    key = jax.random.PRNGKey(0)
    first = last = None
    for i, batch in enumerate(loader):
        key, sub = jax.random.split(key)
        m = trainer.train_step(batch, sub)
        if first is None:
            first = m["loss"]
        last = m["loss"]
        if i >= 7:
            break
    assert np.isfinite(last)

    # export to a C-format blob, reload, synthesize from real features
    params = jax.device_get(trainer.state.params)
    blob = save_lpcnet_blob(params, cfg, quantize=False)
    fused = load_lpcnet_blob(blob, cfg)

    feats = np.fromfile(fpath, np.float32).reshape(-1, 36)[:6]
    fstate = M.init_frame_state(1, cfg)
    sstate = M.init_sample_state(1, cfg)
    out = []
    for row in feats:
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, row[None], cfg)
        sstate, pcm = M.synthesize_frame(fused, sstate, ca, cb, lpc)
        out.append(np.asarray(pcm)[0])
    wave = np.concatenate(out)
    assert wave.shape == (6 * 160,)
    assert np.isfinite(wave).all()
    assert np.max(np.abs(wave)) <= 32767
