"""Training GRU-sequence Pallas kernel vs the lax.scan path (interpret mode
on CPU): forward parity and custom-VJP gradient parity, full-size (384) and
padded small (16, GRU-B) units.

The kernel runs bf16-operand matmuls (DEFAULT-precision semantics, matching
the training graph); the exactness reference is a scan that applies the
same casts, and a loose drift bound covers the f32 HIGHEST path.
"""

import os

os.environ["LPCNET_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.kernels import gru_train as GK
from lpcnet_tpu.nn import layers as L


def _mk(key, n, nin, b, t):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "kernel": jax.random.normal(k1, (nin, 3 * n)) * 0.2,
        "recurrent": jax.random.normal(k2, (n, 3 * n)) * 0.2,
        "bias": jax.random.normal(k3, (2, 3 * n)) * 0.1,
    }
    x = jax.random.normal(k4, (b, t, nin))
    h0 = jax.random.normal(k5, (b, n)) * 0.3
    return params, x, h0


def _bf16_dot(a, b):
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _scan_ref(params, x, h0):
    """lax.scan reference with the kernel's exact cast placement."""
    n = params["recurrent"].shape[0]
    gate_in = _bf16_dot(x, params["kernel"]) + params["bias"][0]
    wr, br = params["recurrent"], params["bias"][1]

    def step(h, g):
        zrec = _bf16_dot(h, wr) + br
        z = jax.nn.sigmoid(g[:, :n] + zrec[:, :n])
        r = jax.nn.sigmoid(g[:, n:2 * n] + zrec[:, n:2 * n])
        hcand = jnp.tanh(g[:, 2 * n:] + r * zrec[:, 2 * n:])
        h2 = z * h + (1.0 - z) * hcand
        return h2, h2

    ht, hs = jax.lax.scan(step, h0, jnp.moveaxis(gate_in, 1, 0))
    return jnp.moveaxis(hs, 0, 1), ht


@pytest.mark.parametrize("n,nin,b,t", [(384, 512, 8, 32), (16, 400, 8, 32)])
def test_forward_matches_scan(n, nin, b, t):
    params, x, h0 = _mk(jax.random.PRNGKey(0), n, nin, b, t)
    hs_ref, ht_ref = _scan_ref(params, x, h0)
    hs, ht = GK.gru_seq_pallas(params, x, h0=h0)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht_ref), atol=2e-5)


@pytest.mark.parametrize("n,nin,b,t", [(384, 512, 8, 16), (16, 400, 8, 16)])
def test_grads_match_scan(n, nin, b, t):
    params, x, h0 = _mk(jax.random.PRNGKey(1), n, nin, b, t)
    w = jax.random.normal(jax.random.PRNGKey(2), (b, t, n))

    def loss_ref(p, x, h0):
        hs, ht = _scan_ref(p, x, h0)
        return jnp.sum(hs * w) + jnp.sum(ht ** 2)

    def loss_k(p, x, h0):
        hs, ht = GK.gru_seq_pallas(p, x, h0=h0)
        return jnp.sum(hs * w) + jnp.sum(ht ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, x, h0)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2))(params, x, h0)
    for (pth, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_k)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1e-3, np.abs(a).max())
        np.testing.assert_allclose(
            bb / scale, a / scale, atol=1e-2,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pth)}")


def test_time_block_carry():
    # multi-time-block carry: T spans several TBLK blocks
    params, x, h0 = _mk(jax.random.PRNGKey(3), 384, 512, 8, 64)
    hs_ref, ht_ref = _scan_ref(params, x, h0)
    hs, ht = GK.gru_seq_pallas(params, x, h0=h0)
    np.testing.assert_allclose(np.asarray(ht), np.asarray(ht_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(hs[:, -1]),
                               np.asarray(hs_ref[:, -1]), atol=2e-5)


@pytest.mark.slow
def test_training_forward_kernel_vs_scan(monkeypatch):
    """Full training loss+grads, kernel GRU recurrence vs the scan path
    (tiny config, interpret mode): same class of numerics, close grads."""
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.train import train_lpcnet as T

    cfg = M.LPCNetConfig(rnn_units1=32, rnn_units2=16, cond_size=16,
                         pitch_embed_dim=8)
    tc = T.TrainConfig(batch_size=8, chunk_frames=3)
    rng = np.random.RandomState(0)
    b, frames = 8, 3
    t = frames * 160
    sig = np.cumsum(rng.randn(b, t + 1), axis=1).astype(np.float32) * 100
    batch = {
        "sig_in": jnp.asarray(sig[:, :-1]),
        "sig_out": jnp.asarray(sig[:, 1:]),
        "features": jnp.asarray(rng.randn(b, frames + 4, 20).astype(np.float32)),
        "periods": jnp.asarray(rng.randint(40, 200, (b, frames + 4)), jnp.int32),
        "lpc": jnp.asarray(rng.randn(b, frames, 16).astype(np.float32) * 0.1),
    }
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)

    def loss(p):
        return T.loss_fn(p, cfg, tc, batch, None)[0]

    monkeypatch.setenv("LPCNET_TRAIN_GRU", "scan")
    l_ref, g_ref = jax.value_and_grad(loss)(params)
    monkeypatch.setenv("LPCNET_TRAIN_GRU", "kernel")
    l_k, g_k = jax.value_and_grad(loss)(params)
    assert abs(float(l_k) - float(l_ref)) < 2e-2 * max(1.0, abs(float(l_ref)))
    for (pth, a), (_, bb) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_k)):
        a, bb = np.asarray(a), np.asarray(bb)
        scale = max(1e-3, np.abs(a).max())
        d = np.abs(bb - a) / scale
        assert d.max() < 0.05, (jax.tree_util.keystr(pth), d.max())
