"""Torch-RDO-VAE checkpoint interchange vs reference goldens.

Fixtures in tests/fixtures/rdovae_torch.npz are recorded by
tools/record_rdovae_torch.py from the REFERENCE torch model
(torch/rdovae/rdovae/rdovae.py) with random weights: its state dict plus
CoreEncoder / CoreDecoder / StatisticalModel outputs on random inputs.
These tests gate weights/rdovae_import.py's layout conversion (Linear
transpose, GRU gate reorder r,z,n -> z,r,n, Conv1d axis permute) by running
this framework's JAX forward with the converted weights.
"""

import os

import numpy as np
import pytest

from lpcnet_tpu.models import rdovae as R
from lpcnet_tpu.weights import rdovae_import as RI

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "rdovae_torch.npz")


@pytest.fixture(scope="module")
def fx():
    data = np.load(FIX)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    params = RI.params_from_torch_state_dict(sd)
    cfg = R.RDOVAEConfig(quant_levels=16)
    return data, sd, params, cfg


def test_encoder_matches_torch(fx):
    data, _, params, cfg = fx
    z, states = R.encode_seq(params, data["features"], cfg)
    np.testing.assert_allclose(np.asarray(z), data["enc_z"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(states), data["enc_states"],
                               atol=2e-5, rtol=1e-4)


def test_decoder_matches_torch(fx):
    data, _, params, cfg = fx
    out = R.decode_seq(params, data["z_in"], data["init_state"], cfg)
    np.testing.assert_allclose(np.asarray(out), data["dec_out"],
                               atol=2e-5, rtol=1e-4)


def test_statistical_model_matches_torch(fx):
    data, _, params, cfg = fx
    stats = R.statistical_model(params, data["q_ids"], cfg)
    for k in ("quant_scale", "r_hard", "theta_hard", "dead_zone"):
        np.testing.assert_allclose(np.asarray(stats[k]), data["stats_" + k],
                                   atol=2e-5, rtol=1e-4)


def test_streaming_matches_imported_sequence(fx):
    """The converted weights must also serve the streaming C-shaped path."""
    import jax.numpy as jnp
    data, _, params, cfg = fx
    feats = data["features"]
    b, t, _ = feats.shape
    st = R.init_encoder_stream(b, cfg)
    zs = []
    for k in range(t // 2):
        st, z, _ = R.encode_dframe(
            params, st, jnp.asarray(feats[:, 2 * k:2 * k + 2].reshape(b, -1)),
            cfg)
        zs.append(np.asarray(z))
    np.testing.assert_allclose(np.stack(zs, axis=1), data["enc_z"],
                               atol=3e-5, rtol=1e-4)


def test_state_dict_roundtrip(fx):
    _, sd, params, _ = fx
    back = RI.state_dict_from_params(params)
    for k, v in back.items():
        np.testing.assert_array_equal(v, np.asarray(sd[k], np.float32),
                                      err_msg=k)
    again = RI.params_from_torch_state_dict(back)
    leaves1 = sorted(_flat(params).items())
    leaves2 = sorted(_flat(again).items())
    assert [k for k, _ in leaves1] == [k for k, _ in leaves2]
    for (k, a), (_, b) in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=k)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + k + "."))
        else:
            out[prefix + k] = v
    return out
