"""Pallas sample-loop kernel vs the lax.scan reference path (interpret mode
on CPU; the real-TPU run is exercised by bench.py and /verify)."""

import os

os.environ["LPCNET_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest
import jax

from lpcnet_tpu.kernels import sample_loop as K
from lpcnet_tpu.models import lpcnet as M


@pytest.mark.slow
def test_pallas_matches_scan():
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    kw = K.kernel_weights(fused, cfg, dtype=jnp.float32)

    b = K.BT
    feats = jax.random.normal(jax.random.PRNGKey(7), (b, 36)) * 0.3

    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)

    s0 = M.init_sample_state(b, cfg)
    n = 32
    s_scan, pcm_scan = M.synthesize_frame(fused, s0, ca, cb, lpc, n_samples=n)
    s_pal, pcm_pal = K.synthesize_frame_pallas(kw, s0, ca, cb, lpc, cfg,
                                               n_samples=n)

    pcm_scan = np.asarray(pcm_scan)
    pcm_pal = np.asarray(pcm_pal)
    # identical RNG + identical math ordering up to float reassociation:
    # demand overwhelming exact agreement and tiny divergence elsewhere
    same = np.mean(pcm_scan == pcm_pal)
    assert same > 0.98, f"sample agreement only {same}"
    np.testing.assert_allclose(np.asarray(s_pal.gru_a),
                               np.asarray(s_scan.gru_a), atol=2e-2)
    assert np.array_equal(np.asarray(s_pal.rng.z), np.asarray(s_scan.rng.z))


@pytest.mark.slow
def test_pallas_bf16_close_to_f32():
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(1), cfg)
    fused = M.fuse_inference_params(params, cfg)
    b = K.BT
    feats = jax.random.normal(jax.random.PRNGKey(8), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    kw32 = K.kernel_weights(fused, cfg, dtype=jnp.float32)
    kw16 = K.kernel_weights(fused, cfg, dtype=jnp.bfloat16)
    _, pcm32 = K.synthesize_frame_pallas(kw32, s0, ca, cb, lpc, cfg, n_samples=16)
    _, pcm16 = K.synthesize_frame_pallas(kw16, s0, ca, cb, lpc, cfg, n_samples=16)
    # same sampler structure; waveform statistics must be comparable (exact
    # bit decisions may differ under bf16 logits)
    r32 = float(np.sqrt(np.mean(np.asarray(pcm32) ** 2)))
    r16 = float(np.sqrt(np.mean(np.asarray(pcm16) ** 2)))
    assert np.isfinite(r16)
    assert abs(r16 - r32) / max(r32, 1.0) < 0.5


@pytest.mark.slow
def test_pallas_q8_matches_quantized_scan():
    """Int8 kernel vs the quantized (DOT_PROD) scan path: the GRU matrices
    use identical integer numerics; only the embedding table differs (int8
    w/ per-column scales vs reference-float), so demand strong sample
    agreement and exact RNG lockstep."""
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    fused = M.fuse_inference_params(params, cfg)
    from lpcnet_tpu.nn import quantized as Q
    fq = Q.quantize_fused(fused)
    kw = K.kernel_weights(fq, cfg)
    assert K.is_q8_bundle(kw)

    b = K.BT
    feats = jax.random.normal(jax.random.PRNGKey(9), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    n = 32
    s_scan, pcm_scan = M.synthesize_frame(fq, s0, ca, cb, lpc, n_samples=n)
    s_pal, pcm_pal = K.synthesize_frame_pallas(kw, s0, ca, cb, lpc, cfg,
                                               n_samples=n)
    same = np.mean(np.asarray(pcm_scan) == np.asarray(pcm_pal))
    assert same > 0.9, f"sample agreement only {same}"
    np.testing.assert_allclose(np.asarray(s_pal.gru_a),
                               np.asarray(s_scan.gru_a), atol=5e-2)
    assert np.array_equal(np.asarray(s_pal.rng.z), np.asarray(s_scan.rng.z))


@pytest.mark.slow
def test_pallas_q8_masked_teacher_forced_exact():
    """Teacher-forced samples are target-derived, so the int8 masked kernel
    must emit them exactly; frozen (non-advancing) streams must not move."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(3), cfg)
    fused = M.fuse_inference_params(params, cfg)
    from lpcnet_tpu.nn import quantized as Q
    kw = K.kernel_weights(Q.quantize_fused(fused), cfg)

    b, n = 256, 16
    feats = jax.random.normal(jax.random.PRNGKey(10), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    target = jax.random.normal(jax.random.PRNGKey(11), (b, n)) * 1000.0
    adv = jnp.zeros((b, n), bool).at[: b // 2].set(True)
    s1, pcm = K.synthesize_frame_masked_pallas(
        kw, s0, ca, cb, lpc, target, adv, adv, cfg, n, sampled=False)
    got = np.asarray(pcm)
    want = np.floor(0.5 + np.clip(np.asarray(target), -32767, 32767))
    assert np.array_equal(got[: b // 2], want[: b // 2])
    assert np.all(got[b // 2:] == 0)
    np.testing.assert_array_equal(np.asarray(s1.gru_a[b // 2:]),
                                  np.asarray(s0.gru_a[b // 2:]))
    assert np.array_equal(np.asarray(s1.rng.z[b // 2:]),
                          np.asarray(s0.rng.z[b // 2:]))


@pytest.mark.slow
def test_tf_fast_path_matches_masked_tf():
    """teacher_force_prefix_pallas == synthesize_frame_masked_pallas
    (sampled=False) with a prefix advance mask: RNG bit-exact, terminal
    sig/exc/deemph exact up to the one documented deemph rounding, GRU
    states within kernel tolerance class."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(7), cfg)
    fused = M.fuse_inference_params(params, cfg)
    kw = K.kernel_weights(fused, cfg)

    b, n = 256, 32
    feats = jax.random.normal(jax.random.PRNGKey(20), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    rngk = jax.random.PRNGKey(21)
    s0 = M.init_sample_state(b, cfg)
    s0 = s0._replace(
        last_sig=jax.random.normal(jax.random.PRNGKey(22), (b, 16)) * 500.0,
        deemph=jax.random.normal(jax.random.PRNGKey(23), (b,)) * 300.0)
    target = jax.random.normal(rngk, (b, n)) * 1000.0
    # mixed prefix lengths incl. frozen streams and full frames
    count = jnp.asarray(
        np.r_[np.zeros(64), np.full(64, n), np.full(64, 8),
              np.full(64, 24)].astype(np.int32))
    adv = jnp.arange(n)[None, :] < count[:, None]

    s_ref, _ = K.synthesize_frame_masked_pallas(
        kw, s0, ca, cb, lpc, target, adv, adv, cfg, n, sampled=False)
    s_tf = K.teacher_force_prefix_pallas(
        kw, s0, ca, cb, lpc, target, count, cfg, n)

    for f in ("z", "w", "jsr", "jcong"):
        assert np.array_equal(np.asarray(getattr(s_tf.rng, f)),
                              np.asarray(getattr(s_ref.rng, f))), f
    np.testing.assert_allclose(np.asarray(s_tf.gru_a),
                               np.asarray(s_ref.gru_a), atol=2e-2)
    np.testing.assert_allclose(np.asarray(s_tf.gru_b),
                               np.asarray(s_ref.gru_b), atol=2e-2)
    np.testing.assert_allclose(np.asarray(s_tf.last_sig),
                               np.asarray(s_ref.last_sig), atol=0.5)
    np.testing.assert_allclose(np.asarray(s_tf.deemph),
                               np.asarray(s_ref.deemph), atol=0.5)
    assert np.abs(np.asarray(s_tf.last_exc)
                  - np.asarray(s_ref.last_exc)).max() <= 1


@pytest.mark.slow
def test_tf_fast_path_q8_and_pad():
    """Int8 bundle + non-256-multiple batch through the padding wrapper."""
    import jax.numpy as jnp
    from lpcnet_tpu.nn import quantized as Q
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(8), cfg)
    fused = M.fuse_inference_params(params, cfg)
    kw = K.kernel_weights(Q.quantize_fused(fused), cfg)

    b, n = 100, 16
    feats = jax.random.normal(jax.random.PRNGKey(30), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    target = jax.random.normal(jax.random.PRNGKey(31), (b, n)) * 800.0
    count = jnp.asarray(np.r_[np.zeros(50), np.full(50, n)].astype(np.int32))
    adv = jnp.arange(n)[None, :] < count[:, None]

    s_ref, _ = K.synthesize_frame_masked_auto(
        kw, s0, ca, cb, lpc, target, adv, adv, cfg, sampled=False)
    s_tf = K.teacher_force_prefix_auto(kw, s0, ca, cb, lpc, target, count,
                                       cfg)
    assert np.array_equal(np.asarray(s_tf.rng.z), np.asarray(s_ref.rng.z))
    np.testing.assert_allclose(np.asarray(s_tf.gru_a),
                               np.asarray(s_ref.gru_a), atol=5e-2)
    # frozen streams bit-identical
    np.testing.assert_array_equal(np.asarray(s_tf.gru_a[:50]),
                                  np.asarray(s0.gru_a[:50]))
    np.testing.assert_array_equal(np.asarray(s_tf.last_sig[:50]),
                                  np.asarray(s0.last_sig[:50]))


@pytest.mark.slow
def test_tf_blocks_matches_sequential_prefix_calls():
    """One multi-block TF call == N sequential single-block TF calls
    (bit-identical: same kernel math, same closed-form chaining)."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(9), cfg)
    fused = M.fuse_inference_params(params, cfg)
    kw = K.kernel_weights(fused, cfg)

    b, n, nblk = 256, 16, 3
    fstate = M.init_frame_state(b, cfg)
    cas, cbs, lpcs = [], [], []
    for k in range(nblk):
        feats = jax.random.normal(jax.random.PRNGKey(40 + k), (b, 36)) * 0.3
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
        cas.append(ca)
        cbs.append(cb)
        lpcs.append(lpc)
    s0 = M.init_sample_state(b, cfg)._replace(
        deemph=jax.random.normal(jax.random.PRNGKey(50), (b,)) * 200.0)
    targets = jax.random.normal(jax.random.PRNGKey(51), (b, nblk * n)) * 900.0
    # drain-shaped counts: prefix within each block, incl. partial + empty
    counts = np.zeros((b, nblk), np.int32)
    counts[:128] = [n, n, 8]
    counts[128:192] = [n, 0, 0]
    counts[192:] = [0, 0, 0]
    # warmup-transition case: frozen block 0, active later blocks
    counts[192:224] = [0, n, n]
    counts = jnp.asarray(counts)

    s_seq = s0
    for k in range(nblk):
        s_seq = K.teacher_force_prefix_pallas(
            kw, s_seq, cas[k], cbs[k], lpcs[k],
            targets[:, k * n:(k + 1) * n], counts[:, k], cfg, n)
    s_blk = K.teacher_force_blocks_pallas(
        kw, s0, jnp.stack(cas, 1), jnp.stack(cbs, 1), jnp.stack(lpcs, 1),
        targets, counts, cfg, n)

    for f in ("z", "w", "jsr", "jcong"):
        assert np.array_equal(np.asarray(getattr(s_blk.rng, f)),
                              np.asarray(getattr(s_seq.rng, f))), f
    np.testing.assert_array_equal(np.asarray(s_blk.gru_a),
                                  np.asarray(s_seq.gru_a))
    np.testing.assert_array_equal(np.asarray(s_blk.gru_b),
                                  np.asarray(s_seq.gru_b))
    np.testing.assert_array_equal(np.asarray(s_blk.last_sig),
                                  np.asarray(s_seq.last_sig))
    np.testing.assert_array_equal(np.asarray(s_blk.last_exc),
                                  np.asarray(s_seq.last_exc))
    np.testing.assert_array_equal(np.asarray(s_blk.deemph),
                                  np.asarray(s_seq.deemph))


@pytest.mark.slow  # gate budget: v2/v3 are recorded-negative ablation variants
@pytest.mark.parametrize("q8", [False, True])
def test_bit_tree_v2_v3_bit_identical(monkeypatch, q8):
    """LPCNET_BITTREE v1/v2/v3 must produce BIT-identical synthesis: v2/v3
    only restructure the sampler's selects (hoisted threshold lookups,
    static subtree slices); every diff is the same two-term f32 sum."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    fused = M.fuse_inference_params(params, cfg)
    if q8:
        from lpcnet_tpu.nn import quantized as Q
        fused = Q.quantize_fused(fused)
    kw = K.kernel_weights(fused, cfg)

    b, n = 128, 24
    feats = jax.random.normal(jax.random.PRNGKey(17), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)

    outs = {}
    for variant in ("v1", "v2", "v3"):
        monkeypatch.setattr(K, "_BITTREE", variant)
        s, pcm = K.synthesize_frame_pallas(kw, s0, ca, cb, lpc, cfg,
                                           n_samples=n, bt=b)
        outs[variant] = (np.asarray(pcm), np.asarray(s.last_exc),
                         np.asarray(s.gru_b))
    for variant in ("v2", "v3"):
        for a, r, name in zip(outs[variant], outs["v1"],
                              ("pcm", "exc", "gru_b")):
            np.testing.assert_array_equal(a, r, f"{variant} {name}")


def test_factored_embedding_operands_close():
    """LPCNET_EMB=factored bundle math: gathering int8 embedding rows and
    applying the scale-folded input kernel must reproduce the composed
    float tables within the double-quantization budget (~2%)."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(5), cfg)
    fused = M.fuse_inference_params(params, cfg)
    from lpcnet_tpu.nn import quantized as Q
    try:
        K._EMB = "factored"
        kw = K.kernel_weights(Q.quantize_fused(fused), cfg)
    finally:
        K._EMB = "v1"
    assert "embf_q8" in kw and "emb_q8" in kw
    e_q8 = np.asarray(kw["embf_q8"], np.int32)          # [256, 128]
    ka_q8 = np.asarray(kw["embf_w_q8"], np.float32)     # [384, 3Na]
    t = np.asarray(kw["embf_scale"])[0]                 # [3Na]
    comp = np.concatenate([np.asarray(fused[k], np.float32) for k in
                           ("embed_sig_a", "embed_pred_a", "embed_exc_a")])
    rng = np.random.RandomState(3)
    idx = rng.randint(0, 256, 64)
    for off in range(3):
        g = e_q8[idx].astype(np.float32)                # gathered int8 rows
        got = g @ ka_q8[off * 128:(off + 1) * 128] * t
        want = comp[off * 256 + idx]
        scale = np.max(np.abs(want))
        np.testing.assert_allclose(got, want, atol=0.02 * scale,
                                   err_msg=f"table block {off}")


@pytest.mark.slow
def test_pallas_q8_factored_close_to_quantized_scan():
    """The factored-embedding q8 kernel variant vs the quantized scan path:
    same GRU integer numerics, embedding differs by double quantization, so
    demand strong (not exact) sample agreement and RNG lockstep."""
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(2), cfg)
    fused = M.fuse_inference_params(params, cfg)
    from lpcnet_tpu.nn import quantized as Q
    fq = Q.quantize_fused(fused)
    try:
        K._EMB = "factored"
        kw = K.kernel_weights(fq, cfg)
    finally:
        K._EMB = "v1"
    assert "embf_q8" in kw

    b = K.BT
    feats = jax.random.normal(jax.random.PRNGKey(9), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    n = 32
    s_scan, pcm_scan = M.synthesize_frame(fq, s0, ca, cb, lpc, n_samples=n)
    s_pal, pcm_pal = K.synthesize_frame_pallas(kw, s0, ca, cb, lpc, cfg,
                                               n_samples=n)
    pcm_scan, pcm_pal = np.asarray(pcm_scan), np.asarray(pcm_pal)
    same = np.mean(pcm_scan == pcm_pal)
    assert same > 0.85, f"sample agreement only {same}"
    # AR feedback drifts freely once one bit decision flips, so bound the
    # state error only on streams whose samples fully agreed
    clean = np.all(pcm_scan == pcm_pal, axis=1)
    assert np.mean(clean) > 0.5, f"only {np.mean(clean)} streams clean"
    np.testing.assert_allclose(np.asarray(s_pal.gru_a)[clean],
                               np.asarray(s_scan.gru_a)[clean], atol=8e-2)
    assert np.array_equal(np.asarray(s_pal.rng.z), np.asarray(s_scan.rng.z))


@pytest.mark.slow  # gate budget: non-default LPCNET_EMB=factored variant
def test_tf_blocks_factored_close_to_composed():
    """The factored-embedding TF kernel: teacher-forced GRU states must
    track the composed-embedding bundle within the double-quantization
    budget (no AR feedback here, so the bound is tight)."""
    import jax.numpy as jnp
    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(4), cfg)
    fused = M.fuse_inference_params(params, cfg)
    from lpcnet_tpu.nn import quantized as Q
    fq = Q.quantize_fused(fused)
    kw_v1 = K.kernel_weights(fq, cfg)
    try:
        K._EMB = "factored"
        kw_f = K.kernel_weights(fq, cfg)
    finally:
        K._EMB = "v1"

    b, n = 256, 16
    feats = jax.random.normal(jax.random.PRNGKey(12), (b, 36)) * 0.3
    fstate = M.init_frame_state(b, cfg)
    fstate, cond, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
    s0 = M.init_sample_state(b, cfg)
    targets = jax.random.normal(jax.random.PRNGKey(13), (b, n)) * 1000.0
    count = jnp.asarray(np.r_[np.full(b // 2, n), np.zeros(b // 2)],
                        jnp.int32)
    s_v1 = K.teacher_force_prefix_pallas(kw_v1, s0, ca, cb, lpc, targets,
                                         count, cfg, n)
    s_f = K.teacher_force_prefix_pallas(kw_f, s0, ca, cb, lpc, targets,
                                        count, cfg, n)
    np.testing.assert_allclose(np.asarray(s_f.gru_a),
                               np.asarray(s_v1.gru_a), atol=5e-2)
    np.testing.assert_allclose(np.asarray(s_f.gru_b),
                               np.asarray(s_v1.gru_b), atol=5e-2)
    # frozen streams identical either way
    np.testing.assert_array_equal(np.asarray(s_f.gru_a[b // 2:]),
                                  np.asarray(s0.gru_a[b // 2:]))
