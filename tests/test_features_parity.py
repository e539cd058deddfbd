"""End-to-end feature extraction parity vs the reference C encoder."""

import numpy as np
import pytest

import jax

from lpcnet_tpu.codec import features as F


@pytest.mark.slow
def test_frame_internals(codec_fixture):
    """Per-frame excitation buffer + xcorr vs C (framedbg fixtures)."""
    pcm = codec_fixture["pcm"].astype(np.float32)
    n_frames = 24  # enough to cover startup + steady state
    state = F.init_encoder_state(1)
    for k in range(n_frames):
        frame = pcm[k * 160:(k + 1) * 160][None]
        state, _ = F.frame_features_step(state, frame, k % 4)
        exc_ref = codec_fixture["exc_buf"][k]
        exc_got = np.asarray(state.exc_buf[0])
        scale = max(1.0, np.abs(exc_ref).max())
        np.testing.assert_allclose(exc_got / scale, exc_ref / scale, atol=2e-3,
                                   err_msg=f"exc_buf frame {k}")
        xc_ref = codec_fixture["xc"][k]          # [2, 256]
        xc_got = np.asarray(state.xc[0, 2 + 2 * (k % 4): 4 + 2 * (k % 4)])
        np.testing.assert_allclose(xc_got, xc_ref, atol=5e-3,
                                   err_msg=f"xc frame {k}")
        w_ref = codec_fixture["frame_weight"][k]
        w_got = np.asarray(state.frame_weight[0, 2 + 2 * (k % 4): 4 + 2 * (k % 4)])
        # ener0 inherits the ~0.1% excitation differences (LPC sensitivity)
        np.testing.assert_allclose(w_got, w_ref, rtol=1e-2,
                                   err_msg=f"weight frame {k}")
        if k % 4 == 3:
            state, _, _ = F.superframe_pitch(state)


def test_features_full(codec_fixture):
    """Full unquantized feature parity over 50 superframes."""
    pcm = codec_fixture["pcm"].astype(np.float32)[None]
    ref = codec_fixture["features"]              # [50, 4, 36]
    state = F.init_encoder_state(1)
    _, got = jax.jit(F.compute_features)(state, pcm)
    got = np.asarray(got)[0]                     # [50, 4, 36]

    # cepstra
    np.testing.assert_allclose(got[..., :18], ref[..., :18], atol=5e-3)
    # pitch period feature: integer Viterbi decisions; allow rare off-by-one
    # period differences from float tie-breaks
    dp = np.abs(got[..., 18] - ref[..., 18])
    assert np.mean(dp < 1e-6) > 0.95, f"period match rate {np.mean(dp < 1e-6)}"
    assert np.max(dp) < 0.3, f"max period diff {np.max(dp)}"
    # correlation
    np.testing.assert_allclose(got[..., 19], ref[..., 19], atol=2e-2)
    # LPC
    np.testing.assert_allclose(got[..., 20:], ref[..., 20:], atol=2e-2)
