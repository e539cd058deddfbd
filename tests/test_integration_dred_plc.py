"""DRED -> PLC integration: entropy-coded redundancy payloads decoded and
fed through the PLC's FEC queue -- the full receive-side loop the reference
enables downstream (DRED redundancy replaces PLC prediction during losses).
"""

import numpy as np
import pytest

import conftest
from conftest import load_fixture

import jax

from lpcnet_tpu.dred.coder import DREDDecoder, DREDEncoder
from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.models import plc as PM
from lpcnet_tpu.models import rdovae as RV
from lpcnet_tpu.plc.driver import run_plc_fec_stream
from lpcnet_tpu.plc.plc import LPCNET_PLC_CAUSAL, PLC


@pytest.mark.slow
def test_dred_payload_feeds_plc_fec():
    n_frames = 12
    pcm = load_fixture("codec.npz")["pcm"].astype(np.float32)
    pcm = np.tile(pcm, (n_frames * 160 // len(pcm) + 1))[: n_frames * 160]

    # sender: stream features into DRED, emit one entropy-coded payload
    rcfg = RV.RDOVAEConfig(cond_size=32, cond_size2=32, latent_dim=20,
                           state_dim=8, pvq_num_pulses=20)
    rparams = RV.init_params(jax.random.PRNGKey(0), rcfg)
    enc = DREDEncoder(rparams, rcfg, batch=1)
    from lpcnet_tpu.codec import features as F
    import jax.numpy as jnp
    st = F.init_encoder_state(1)
    for k in range(n_frames):
        st, f = F.compute_single_frame_features(
            st, jnp.asarray(pcm[None, k * 160:(k + 1) * 160]))
        enc.add_feature_frame(np.asarray(f)[:, :20])
    out = enc.produce_payload(num_redundancy_frames=n_frames, q0=3, q1=9)
    assert out is not None
    payload = out["payloads"][0]

    # receiver: decode the redundancy bitstream back to per-frame features
    dec = DREDDecoder(rparams, rcfg)
    red_feats = dec.decode_payload(payload)[0]       # newest first, [L*4, 20]
    assert red_feats.shape[0] >= n_frames
    red_by_frame = red_feats[::-1][-n_frames:]       # oldest..newest tail

    # PLC consumes the redundancy instead of predicting
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32)
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(2))
    plc = PLC(fused, cfg, plc_params, options=LPCNET_PLC_CAUSAL, batch=1)
    fec_packets = [red_by_frame[2 * p:2 * p + 2] for p in range(n_frames // 2)]
    losses = np.array([0, 0, 1, 1, 0, 0])
    outpcm = run_plc_fec_stream(plc, pcm, losses, fec_packets)
    assert outpcm.shape == (n_frames * 160,)
    assert np.isfinite(outpcm).all()
    # the redundancy covered every loss: the PLC never fell back to prediction
    assert plc.loss_count == 0
