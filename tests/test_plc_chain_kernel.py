"""plc_chain_pallas vs the step-by-step compute_plc_pred reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpcnet_tpu.models import plc as PM

pytestmark = pytest.mark.usefixtures("pallas_interpret")


@pytest.fixture()
def pallas_interpret(monkeypatch):
    from lpcnet_tpu.kernels import plc_chain as PC
    monkeypatch.setattr(PC, "_INTERPRET", True)


@pytest.mark.parametrize("k_steps", [1, 4])
def test_chain_matches_stepwise(k_steps):
    from lpcnet_tpu.kernels.plc_chain import (plc_chain_pallas,
                                              plc_chain_weights)

    rng = np.random.RandomState(0)
    b = 8
    params = PM.init_params(jax.random.PRNGKey(3))
    cw = plc_chain_weights(params)
    h1 = jnp.asarray(np.tanh(rng.randn(b, 256)).astype(np.float32))
    h2 = jnp.asarray(np.tanh(rng.randn(b, 256)).astype(np.float32))
    inputs = jnp.asarray(
        (rng.randn(b, k_steps, PM.PLC_INPUT_SIZE) * 0.5).astype(np.float32))
    masks = jnp.asarray(rng.rand(b, k_steps) < 0.6)

    h1_seq, h2_seq, outs = plc_chain_pallas(cw, h1, h2, inputs, masks,
                                            k_steps, bt=8)

    # reference: sequential masked compute_plc_pred (WITHOUT the +0.1
    # correlation boost, which the kernel leaves to the caller)
    st = PM.PLCNetState(h1, h2)
    for k in range(k_steps):
        new_st, out = PM.compute_plc_pred(params, st, inputs[:, k])
        out = out.at[:, PM.NB_FEATURES - 1].set(
            out[:, PM.NB_FEATURES - 1])  # shape passthrough
        # undo the boost for the raw-output comparison
        raw_last = jnp.matmul(new_st.gru2, params["plc_out"]["kernel"]
                              )[:, PM.NB_FEATURES - 1] \
            + params["plc_out"]["bias"][PM.NB_FEATURES - 1]
        out = out.at[:, PM.NB_FEATURES - 1].set(raw_last)
        m = masks[:, k][:, None]
        st = PM.PLCNetState(jnp.where(m, new_st.gru1, st.gru1),
                            jnp.where(m, new_st.gru2, st.gru2))
        np.testing.assert_allclose(np.asarray(h1_seq[:, k]),
                                   np.asarray(st.gru1), atol=2e-5,
                                   err_msg=f"h1 step {k}")
        np.testing.assert_allclose(np.asarray(h2_seq[:, k]),
                                   np.asarray(st.gru2), atol=2e-5,
                                   err_msg=f"h2 step {k}")
        np.testing.assert_allclose(np.asarray(outs[:, k]), np.asarray(out),
                                   atol=2e-4, err_msg=f"out step {k}")


def test_chain_frozen_stream_is_inert():
    from lpcnet_tpu.kernels.plc_chain import (plc_chain_pallas,
                                              plc_chain_weights)

    rng = np.random.RandomState(1)
    b, k = 8, 3
    params = PM.init_params(jax.random.PRNGKey(4))
    cw = plc_chain_weights(params)
    h1 = jnp.asarray(np.tanh(rng.randn(b, 256)).astype(np.float32))
    h2 = jnp.asarray(np.tanh(rng.randn(b, 256)).astype(np.float32))
    inputs = jnp.asarray(
        (rng.randn(b, k, PM.PLC_INPUT_SIZE) * 0.5).astype(np.float32))
    masks = jnp.zeros((b, k), bool)
    h1_seq, h2_seq, _ = plc_chain_pallas(cw, h1, h2, inputs, masks, k, bt=8)
    for kk in range(k):
        np.testing.assert_array_equal(np.asarray(h1_seq[:, kk]),
                                      np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(h2_seq[:, kk]),
                                      np.asarray(h2))
