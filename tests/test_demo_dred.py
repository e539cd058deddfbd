"""Quality gate on the shipped DRED demo checkpoint."""

import os

import numpy as np
import pytest

import jax

DEMO = os.path.join(os.path.dirname(__file__), "..", "lpcnet_tpu", "data",
                    "demo_rdovae_model.npz")


@pytest.mark.slow
def test_demo_dred_roundtrip():
    if not os.path.exists(DEMO):
        pytest.skip("demo rdovae model not present")
    from lpcnet_tpu.dred.coder import DREDDecoder, DREDEncoder
    from lpcnet_tpu.models import rdovae as RV
    from lpcnet_tpu.weights.checkpoint import load_checkpoint

    params, _ = load_checkpoint(DEMO)
    params = jax.tree.map(lambda x: x.astype("float32"), params)
    cfg = RV.RDOVAEConfig()
    feats = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                 "demo_features.npy"))[:120]
    enc = DREDEncoder(params, cfg, batch=1)
    for f in feats:
        enc.add_feature_frame(f[None])
    p = enc.produce_payload(num_redundancy_frames=20, q0=3, q1=12)
    assert p is not None and float(p["bits"][0]) > 0
    dec = DREDDecoder(params, cfg)
    out = dec.decode_all(p["zq"], p["q_ids"], p["state"])
    rec = out[0][::-1][-40:, :18]
    true = feats[-40:, :18]
    mse = float(np.mean((rec - true) ** 2))
    var = float(np.var(true))
    assert np.isfinite(mse)
    assert mse < var, f"DRED should beat zero-predictor: mse={mse} var={var}"
