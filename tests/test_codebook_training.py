"""VQ codebook trainer fidelity tests (src/ceps_vq_train.c re-design).

The reference trains its cepstral codebooks offline with an LBG
split-doubling recipe (vq_train, src/ceps_vq_train.c:339-367) plus a
sign-folded multi-predictor diff trainer (vq_train_multi, :368-403).
These tests pin the JAX trainer's structural behavior on synthetic data:

* stage books shrink the runtime (beam) quantizer MSE monotonically
  vs fewer Lloyd/refine passes and beat a random-subset init;
* the diff book's group structure (entry i <-> predictor i&3) survives
  split-doubling, and the sign-folded assignment actually uses signs;
* m-best refinement does not hurt the runtime MSE it optimizes.
"""

import jax
import numpy as np
import pytest

from lpcnet_tpu.codec import codebooks as cbm


def _synthetic_features(n=4000, seed=0):
    """Feature-like corpus with temporal correlation so interpolation
    predictors are meaningfully different from the mean predictor."""
    rng = np.random.RandomState(seed)
    walk = np.cumsum(rng.randn(n, 36).astype(np.float32) * 0.25, axis=0)
    walk -= walk.mean(axis=0, keepdims=True)
    walk *= 0.5 / (walk.std() + 1e-6)
    return walk + rng.randn(n, 36).astype(np.float32) * 0.05


@pytest.mark.slow
def test_trained_beats_random_init():
    feats = _synthetic_features()
    cb = cbm.train_codebooks(feats, stage_codes=32, diff_codes=32,
                             mbest_refine=2)
    # random-subset "codebook" from the same corpus
    rng = np.random.RandomState(1)
    ends = feats[3::4, 1:18]
    sel = rng.permutation(len(ends))[:32]
    rand = cbm.Codebooks(
        jax.numpy.asarray(ends[sel]), jax.numpy.asarray(ends[sel] * 0.1),
        jax.numpy.asarray(ends[sel] * 0.01),
        jax.numpy.asarray(np.tile(feats[5::4, :18][:8], (4, 1))))
    trained = cbm.quantization_mse(feats, cb)
    baseline = cbm.quantization_mse(feats, rand)
    assert trained["stage_mse"] < baseline["stage_mse"]
    assert trained["diff_mse"] < baseline["diff_mse"]
    assert np.isfinite(trained["stage_mse"]) and trained["stage_mse"] > 0


@pytest.mark.slow  # gate budget: training-quality property, not a correctness gate
def test_mbest_refine_does_not_hurt():
    feats = _synthetic_features(n=3000, seed=2)
    cb0 = cbm.train_codebooks(feats, stage_codes=16, diff_codes=16,
                              mbest_refine=0)
    cb4 = cbm.train_codebooks(feats, stage_codes=16, diff_codes=16,
                              mbest_refine=4)
    m0 = cbm.quantization_mse(feats, cb0)
    m4 = cbm.quantization_mse(feats, cb4)
    # refinement coordinate-descends the beam-quantizer objective itself
    assert m4["stage_mse"] <= m0["stage_mse"] * 1.001


def test_diff_group_structure_preserved():
    """Entry i of the diff book must serve predictor group i&3 after all
    split-doublings (the reference appends children at offset e, a multiple
    of 4, preserving i&3 -- src/ceps_vq_train.c:160-171)."""
    feats = _synthetic_features(n=3000, seed=3)
    f = np.asarray(feats[:, :18], np.float32)
    n = (f.shape[0] - 4) // 4 * 4
    ends = f[3:3 + n:4]
    mid = f[5:5 + n - 4:4]
    left = ends[:-1][: mid.shape[0]]
    right = ends[1:][: mid.shape[0]]
    res = cbm._diff_residuals(jax.numpy.asarray(mid),
                              jax.numpy.asarray(left),
                              jax.numpy.asarray(right))
    res = np.asarray(res)
    assert res.shape[1] == 4
    # group 0/1 = mean predictor (reference uses it twice), 2 = left, 3 = right
    np.testing.assert_allclose(res[:, 0], res[:, 1], atol=1e-6)
    np.testing.assert_allclose(res[:, 2], mid - left, atol=1e-5)
    np.testing.assert_allclose(res[:, 3], mid - right, atol=1e-5)


def test_sign_folding_used():
    """With a corpus of +/-center pairs (8 clusters, both polarities), an
    8-entry sign-folded trainer can cover all 16 modes; a sign-blind
    assignment of the same codes cannot."""
    rng = np.random.RandomState(4)
    centers = rng.randn(8, 18).astype(np.float32) * 3.0
    idx = rng.randint(0, 8, 512)
    sign = rng.choice([-1.0, 1.0], 512).astype(np.float32)
    base = centers[idx] * sign[:, None]
    base += rng.randn(512, 18).astype(np.float32) * 0.05
    res = np.tile(base[:, None, :], (1, 4, 1))        # same for all groups
    codes = cbm._train_multi_sign(jax.numpy.asarray(res), 8,
                                  jax.random.PRNGKey(0))
    codes = np.asarray(codes)
    # assignment error with sign search must be far below without
    cross = np.einsum("nd,kd->nk", res[:, 0], codes)
    rsq = np.sum(res[:, 0] ** 2, axis=1, keepdims=True)
    csq = np.sum(codes ** 2, axis=1)
    d_signed = np.minimum(rsq - 2 * cross + csq, rsq + 2 * cross + csq)
    d_unsigned = rsq - 2 * cross + csq
    assert d_signed.min(axis=1).mean() < 0.25 * d_unsigned.min(axis=1).mean()


def test_lbg_monotone_improvement():
    feats = _synthetic_features(n=2000, seed=5)
    x = jax.numpy.asarray(feats[3::4, 1:18])
    key = jax.random.PRNGKey(0)
    quick = cbm._lbg_train(x, 16, key, split_updates=1, final_updates=1)
    full = cbm._lbg_train(x, 16, key, split_updates=4, final_updates=20)

    def mse(codes):
        d2 = cbm._dist2(x, codes)
        return float(jax.numpy.mean(jax.numpy.min(d2, axis=1)))

    assert mse(full) <= mse(quick) * 1.001
