"""Full-state checkpoint/resume round trip."""

import numpy as np
import pytest

import jax

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.parallel import mesh as pmesh
from lpcnet_tpu.train.checkpointing import restore_train_state, save_train_state
from lpcnet_tpu.train.train_lpcnet import TrainConfig, Trainer


@pytest.mark.slow
def test_save_restore_resume(tmp_path):
    cfg = M.LPCNetConfig(rnn_units1=16, rnn_units2=16, cond_size=8,
                         pitch_embed_dim=4)
    tc = TrainConfig(batch_size=2, chunk_frames=2)
    mesh = pmesh.make_mesh(jax.devices("cpu")[:1])
    tr = Trainer(cfg, tc, mesh=mesh)
    rng = np.random.RandomState(0)
    b, frames = 2, 2
    t = frames * 160
    sig = np.cumsum(rng.randn(b, t + 1), axis=1).astype(np.float32) * 100
    batch = {
        "sig_in": sig[:, :-1], "sig_out": sig[:, 1:],
        "features": rng.randn(b, frames + 4, 20).astype(np.float32) * 0.3,
        "periods": rng.randint(33, 255, (b, frames + 4)).astype(np.int32),
        "lpc": (rng.randn(b, frames, 16) * 0.05).astype(np.float32),
    }
    key = jax.random.PRNGKey(7)
    tr.train_step(batch, key)
    path = str(tmp_path / "ckpt" / "step_1")
    save_train_state(path, tr.full_state())

    # continue two paths: live vs restored; they must match exactly
    tr2 = Trainer(cfg, tc, mesh=mesh)
    tr2.train_step(batch, key)  # materialize carry structure for restore
    tr2.restore_full_state(restore_train_state(path, tr2.full_state()))
    m1 = tr.train_step(batch, key)
    m2 = tr2.train_step(batch, key)
    assert abs(m1["loss"] - m2["loss"]) < 1e-6
    assert int(tr2.state.step) == 2
