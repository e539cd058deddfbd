"""Int8 quantized inference vs the C DOT_PROD semantics (src/vec.h:206-236).

A numpy integer reference implements exactly what the C quantized GEMV
computes; the jnp int8 path must match it. Gate-level and one-step
model-level checks (the AR loop is chaotic, so step-level is the right
granularity for cross-implementation comparison)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.nn import quantized as Q


def _np_qgemv(w, x):
    """C sgemv_accum8x4 DOT_PROD semantics in exact integer arithmetic."""
    w_q = np.clip(np.round(np.asarray(w, np.float64) * 128), -128, 127)
    x_q = np.clip(np.floor(0.5 + 127 * np.asarray(x, np.float64)), -128, 127)
    return (x_q @ w_q) / (128.0 * 127.0)


def test_qmatmul_matches_integer_reference():
    rng = np.random.RandomState(0)
    w = rng.randn(96, 48).astype(np.float32) / 10
    x = np.tanh(rng.randn(4, 96)).astype(np.float32)
    got = np.asarray(Q.qmatmul(Q.quantize_act_int8(jnp.asarray(x)),
                               Q.quantize_weights_int8(jnp.asarray(w))))
    np.testing.assert_allclose(got, _np_qgemv(w, x), atol=1e-6)


def test_round_half_up_matches_c():
    # floor(.5 + 127x), not round-half-even
    x = jnp.asarray([0.5 / 127, -0.5 / 127, 1.5 / 127, -1.5 / 127])
    np.testing.assert_array_equal(np.asarray(Q.quantize_act_int8(x)),
                                  [1, 0, 2, -1])


def test_gru_step_q8_matches_integer_reference():
    rng = np.random.RandomState(1)
    n, b = 32, 3
    recurrent = (rng.randn(n, 3 * n) / 8).astype(np.float32)
    bias = (rng.randn(2, 3 * n) / 8).astype(np.float32)
    h = np.tanh(rng.randn(b, n)).astype(np.float32)
    gate_in = (rng.randn(b, 3 * n)).astype(np.float32)

    params = {"recurrent": jnp.asarray(recurrent), "bias": jnp.asarray(bias)}
    qp = {"bias": jnp.asarray(bias)}
    off, diag = Q.split_diag(jnp.asarray(recurrent))
    qp["recurrent_q8"] = Q.quantize_weights_int8(off)
    qp["recurrent_diag"] = diag
    got = np.asarray(Q.gru_precomputed_step_q8(qp, jnp.asarray(h),
                                               jnp.asarray(gate_in)))

    # integer reference with float diagonal
    off_np = np.asarray(off)
    diag_np = np.asarray(diag)
    zrec = _np_qgemv(off_np, h) + diag_np * np.tile(h, 3) + bias[1]
    def sig(v):
        return 1 / (1 + np.exp(-v))
    z = sig(gate_in[:, :n] + zrec[:, :n])
    r = sig(gate_in[:, n:2 * n] + zrec[:, n:2 * n])
    hc = np.tanh(gate_in[:, 2 * n:] + r * zrec[:, 2 * n:])
    ref = z * h + (1 - z) * hc
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_quantized_synthesis_runs_and_is_close_per_step():
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    qfused = Q.quantize_fused(fused)
    b = 2
    state = M.init_sample_state(b, cfg)
    rng = np.random.RandomState(2)
    cond_a = jnp.asarray(rng.randn(b, 3 * cfg.rnn_units1).astype(np.float32))
    cond_b = jnp.asarray(rng.randn(b, 3 * cfg.rnn_units2).astype(np.float32))
    sig_u = jnp.asarray(rng.randint(0, 256, b))
    pred_u = jnp.asarray(rng.randint(0, 256, b))

    ha_f, hb_f, exc_f, _ = M.sample_network_step(
        fused, state, cond_a, cond_b, sig_u, pred_u)
    ha_q, hb_q, exc_q, _ = M.sample_network_step(
        qfused, state, cond_a, cond_b, sig_u, pred_u)
    # quantization noise is ~1/254 per activation; one step stays close
    np.testing.assert_allclose(np.asarray(ha_q), np.asarray(ha_f), atol=0.05)
    np.testing.assert_allclose(np.asarray(hb_q), np.asarray(hb_f), atol=0.1)

    # full-frame synthesis with the quantized weights runs and is finite
    lpc = jnp.zeros((b, 16), jnp.float32)
    st2, pcm = M.synthesize_frame(qfused, state, cond_a, cond_b, lpc,
                                  n_samples=32)
    assert np.isfinite(np.asarray(pcm)).all()
    # int8 weights really are int8 (half the bytes of f32)
    assert qfused["gru_a_rec"]["recurrent_q8"].dtype == jnp.int8
    assert qfused["gru_b_in_q8"].dtype == jnp.int8


def test_grid_weights_quantize_exactly():
    """Weights already on the 1/128 grid (quantize-finetuned checkpoints,
    blob imports) convert to int8 and back without loss."""
    rng = np.random.RandomState(3)
    w = np.round(rng.randn(24, 72) * 20) / 128.0
    w_q = np.asarray(Q.quantize_weights_int8(jnp.asarray(w, jnp.float32)))
    np.testing.assert_array_equal(w_q, np.clip(np.round(w * 128), -128, 127))
