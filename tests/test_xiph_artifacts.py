"""Auto-activating artifact-parity tests for REAL xiph pretrained artifacts.

The reference's production model weights and trained cepstral codebooks are
download-only (download_model.sh:1-12; ceps_codebooks.c consumed at
src/lpcnet_private.h:109-113) and unobtainable in this offline image. These
tests skip when the artifacts are absent and flip from algorithm-parity to
artifact-parity automatically when someone drops them in:

- artifacts/xiph/weights_blob.bin — DNNw blob produced by the reference's
  write_lpcnet_weights (src/write_lpcnet_weights.c:47-78) after building
  with the downloaded nnet_data.c/plc_data.c.
- artifacts/xiph/ceps_codebooks.npz — the 4 arrays from the downloaded
  ceps_codebooks.c: ceps_codebook1/2/3 [1024, 17] and
  ceps_codebook_diff4 [4096, 18] (see README "Real xiph artifacts").
"""

import os

import numpy as np
import pytest

XIPH_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts", "xiph")
BLOB = os.path.join(XIPH_DIR, "weights_blob.bin")
CODEBOOKS = os.path.join(XIPH_DIR, "ceps_codebooks.npz")


@pytest.mark.skipif(not os.path.exists(BLOB),
                    reason="real xiph weights_blob.bin not dropped in "
                           "(see README 'Real xiph artifacts')")
def test_xiph_blob_loads_and_synthesizes():
    from lpcnet_tpu import api
    fused, cfg = api.load_model(BLOB)
    synth = api.Synthesizer(fused=fused, cfg=cfg, batch=1)
    feats = np.zeros((1, 36), np.float32)
    feats[:, 18] = 0.5  # mid pitch
    pcm = synth.synthesize(feats)
    assert pcm.shape == (1, 160)
    assert np.isfinite(pcm).all()


@pytest.mark.skipif(not os.path.exists(CODEBOOKS),
                    reason="real xiph ceps_codebooks.npz not dropped in "
                           "(see README 'Real xiph artifacts')")
def test_xiph_codebooks_load_and_encode():
    from lpcnet_tpu.codec.codebooks import load_codebooks
    from lpcnet_tpu.codec.encoder import LPCNetEncoder
    cbs = load_codebooks(CODEBOOKS)
    # stage codebooks are NB_BANDS_1=17 wide, diff4 is NB_BANDS=18 wide
    # (src/lpcnet_enc.c:107-111, src/lpcnet_dec.c:131-150)
    assert cbs.stage1.shape == (1024, 17)
    assert cbs.stage2.shape == (1024, 17)
    assert cbs.stage3.shape == (1024, 17)
    assert cbs.diff4.shape == (4096, 18)
    enc = LPCNetEncoder(batch=1, codebooks=cbs)
    pcm = (np.sin(np.arange(640 * 2) * 0.05) * 8000).astype(np.float32)
    pkts = enc.encode(pcm[None, :640])
    assert pkts.shape == (1, 8)
