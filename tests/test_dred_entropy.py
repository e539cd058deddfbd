"""DRED entropy coding: range coder, PVQ index, payload roundtrips.

The reference leaves actual bitstream coding of DRED latents to its
downstream consumer and only ships fixed-point Laplace tables
(torch/rdovae/export_rdovae_weights.py:55-76); these tests cover the
framework's complete in-tree pipeline: symbols -> payload bytes -> symbols,
plus agreement between the Python reference coder and the native C++ one.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU backend)

from lpcnet_tpu.dred import entropy as E


def _model_symbols(rng, n):
    """Sample symbols roughly from the Laplace model itself."""
    p0 = rng.randint(1000, 32000, n).astype(np.uint16)
    r = rng.randint(1000, 32000, n).astype(np.uint16)
    z = np.where(rng.rand(n) < p0 / 32768.0, 0,
                 np.minimum(rng.geometric(np.maximum(1e-4, 1 - r / 32768.0)),
                            E.MAX_MAG) * rng.choice([-1, 1], n)).astype(np.int32)
    return z, p0, r


def test_range_coder_roundtrip():
    rng = np.random.RandomState(0)
    enc = E.RangeEncoder()
    bits = rng.randint(0, 2, 4000)
    probs = rng.randint(1, 32767, 4000)
    for b, p in zip(bits, probs):
        enc.encode_bit(int(b), int(p))
    data = enc.finish()
    dec = E.RangeDecoder(data)
    out = [dec.decode_bit(int(p)) for p in probs]
    assert np.array_equal(bits, out)


def test_latent_rate_matches_model_estimate():
    """Achieved bytes ~= the hard_rate_estimate the rate-distortion loss
    optimizes (torch rdovae.py:117-132)."""
    rng = np.random.RandomState(3)
    z, p0, r = _model_symbols(rng, 4000)
    enc = E.RangeEncoder()
    E.encode_latents(enc, z, p0, r)
    nbytes = len(enc.finish())
    p0f, rf = p0 / 32768.0, r / 32768.0
    mag = np.abs(z)
    bits = np.where(mag == 0, -np.log2(p0f),
                    -np.log2(0.5 * (1 - p0f) * (1 - rf) * rf ** (mag - 1)))
    assert abs(nbytes - bits.sum() / 8) < 16
    out = E.decode_latents(E.RangeDecoder(enc.finish()), p0, r)
    assert np.array_equal(z, out)


def test_native_matches_python():
    from lpcnet_tpu.runtime.bindings import runtime, native_available
    if not native_available():
        pytest.skip("no native library")
    rng = np.random.RandomState(7)
    for _ in range(5):
        z, p0, r = _model_symbols(rng, int(rng.randint(10, 2500)))
        enc = E.RangeEncoder()
        E.encode_latents(enc, z, p0, r)
        py = enc.finish()
        nat = runtime.dred_encode_latents(z, p0, r)
        assert nat == py
        assert np.array_equal(z, runtime.dred_decode_latents(py, p0, r))
        assert np.array_equal(z, E.decode_latents(E.RangeDecoder(nat), p0, r))


def test_pvq_index_bijective_small():
    from lpcnet_tpu.models.rdovae import pvq_codebook_size

    def gen(n, k):
        if n == 0:
            if k == 0:
                yield ()
            return
        for v in range(-k, k + 1):
            for rest in gen(n - 1, k - abs(v)):
                yield (v,) + rest

    n, k = 4, 3
    vecs = [v for v in gen(n, k) if sum(abs(x) for x in v) == k]
    assert len(vecs) == pvq_codebook_size(n, k)
    seen = set()
    for v in vecs:
        idx = E.pvq_encode_index(v, k)
        assert 0 <= idx < pvq_codebook_size(n, k) and idx not in seen
        seen.add(idx)
        assert tuple(E.pvq_decode_index(idx, n, k)) == v


def test_pvq_search_properties():
    rng = np.random.RandomState(11)
    for _ in range(10):
        x = rng.randn(24)
        y = E.pvq_search(x, 82)
        assert np.abs(y).sum() == 82
        cos = (x @ y) / (np.linalg.norm(x) * np.linalg.norm(y))
        assert cos > 0.98
        idx = E.pvq_encode_index(y, 82)
        assert np.array_equal(y, E.pvq_decode_index(idx, 24, 82))


@pytest.mark.slow
def test_payload_roundtrip_model():
    """Full pipeline with the real RDO-VAE statistical model: encoder
    produces payload bytes; decoding them reproduces the non-entropy path."""
    import jax
    from lpcnet_tpu.models import rdovae as RV
    from lpcnet_tpu.dred.coder import DREDEncoder, DREDDecoder

    cfg = RV.RDOVAEConfig(cond_size=32, cond_size2=32, latent_dim=20,
                          state_dim=8, pvq_num_pulses=20)
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    enc = DREDEncoder(params, cfg, batch=2)
    rng = np.random.RandomState(5)
    for _ in range(12):
        enc.add_feature_frame(rng.randn(2, cfg.num_features).astype(np.float32))
    out = enc.produce_payload(num_redundancy_frames=8, q0=3, q1=9)
    assert out is not None and len(out["payloads"]) == 2
    dec = DREDDecoder(params, cfg)
    ref = dec.decode_all(out["zq"], out["q_ids"], out["state"])
    for b, payload in enumerate(out["payloads"]):
        assert isinstance(payload, bytes) and len(payload) > 3
        feats = dec.decode_payload(payload)
        np.testing.assert_allclose(feats[0], ref[b], atol=1e-5)
    # measured size should be in the ballpark of the rate estimate
    est_bytes = out["bits"] / 8
    for b, payload in enumerate(out["payloads"]):
        assert len(payload) < 4 * est_bytes[b] + 64


def test_stats_fixed_point_layout():
    import jax
    from lpcnet_tpu.models import rdovae as RV

    cfg = RV.RDOVAEConfig()
    params = RV.init_params(jax.random.PRNGKey(0), cfg)
    st = E.stats_fixed_point(params, cfg)
    for k in ["quant_scales_q8", "dead_zone_q10", "r_q15", "p0_q15"]:
        assert st[k].shape == (cfg.quant_levels, cfg.latent_dim)
        assert st[k].dtype == np.uint16
    assert np.all(st["r_q15"] >= 1) and np.all(st["r_q15"] < 32768)
    assert np.all(st["p0_q15"] >= 1) and np.all(st["p0_q15"] < 32768)
