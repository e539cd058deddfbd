"""Batched mixed-loss PLC vs the host-control-flow PLC.

The host PLC (plc/plc.py) is the audited mirror of src/lpcnet_plc.c; the
batched PLC (plc/batched.py) reimplements the causal state machine as one
jitted masked step so each stream can follow its own loss pattern. These
tests pin the two against each other.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest
from conftest import load_fixture

import jax

from lpcnet_tpu.models import lpcnet as M
from lpcnet_tpu.models import plc as PM
from lpcnet_tpu.plc.batched import BatchedPLC
from lpcnet_tpu.plc.plc import LPCNET_PLC_CAUSAL, LPCNET_PLC_CODEC, PLC


def _make_pair(batch, enable_blending=True, seed=0, non_causal=False):
    lookahead = 0 if non_causal else 2
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         lookahead=lookahead)
    params = M.init_params(jax.random.PRNGKey(seed), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(seed + 1))
    if non_causal:
        from lpcnet_tpu.plc.plc import LPCNET_PLC_NONCAUSAL
        options = LPCNET_PLC_NONCAUSAL
    else:
        options = LPCNET_PLC_CAUSAL if enable_blending else LPCNET_PLC_CODEC
    host = PLC(fused, cfg, plc_params, options=options, batch=batch)
    batched = BatchedPLC(fused, cfg, plc_params, batch=batch,
                         enable_blending=enable_blending,
                         non_causal=non_causal)
    return host, batched


def _speech(n_frames, batch):
    pcm = load_fixture("codec.npz")["pcm"].astype(np.float32)
    need = n_frames * 160
    pcm = np.tile(pcm, (need // len(pcm) + 1))[:need]
    return np.stack([np.roll(pcm, 37 * b) for b in range(batch)])


@pytest.mark.parametrize("enable_blending", [True, False])
def test_batched_matches_host_shared_pattern(enable_blending):
    """All streams share one pattern -> the host PLC can run the same batch;
    outputs agree to 1 LSB. (The batched step is a differently-shaped XLA
    graph than the host PLC -- same math, but fusion reassociation can flip
    the floor(0.5+x) rounding of isolated samples sitting exactly on a tie;
    the fused conceal/update program is bit-exact vs its two-path
    predecessor in eager mode.)"""
    batch, n_frames = 2, 14
    host, batched = _make_pair(batch, enable_blending)
    pcm = _speech(n_frames, batch)
    # pattern covers: initial good run, single loss, recovery, double loss
    lost_per_frame = np.array([0, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0])
    for k in range(n_frames):
        frame = pcm[:, k * 160:(k + 1) * 160]
        if lost_per_frame[k]:
            ref = host.conceal()
        else:
            ref = host.update(frame)
        out = batched.step(frame, np.full(batch, lost_per_frame[k]))
        d = np.abs(out - ref)
        assert d.max() <= 1.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.02, f"frame {k}: too many rounding diffs"


def test_batched_matches_host_non_causal():
    """Host parity within 1 LSB: the host PLC's recovery crossfade runs in
    float64 numpy (plc.py _update_non_causal) while the batched step is
    float32 on device, so isolated samples can round one count apart."""
    batch, n_frames = 2, 14
    host, batched = _make_pair(batch, non_causal=True)
    pcm = _speech(n_frames, batch)
    lost_per_frame = np.array([0, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0])
    for k in range(n_frames):
        frame = pcm[:, k * 160:(k + 1) * 160]
        if lost_per_frame[k]:
            ref = host.conceal()
        else:
            ref = host.update(frame)
        out = batched.step(frame, np.full(batch, lost_per_frame[k]))
        d = np.abs(out - ref)
        assert d.max() <= 1.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.02, f"frame {k}: too many rounding diffs"


def test_batched_mixed_patterns_self_consistent():
    """Stream i of a mixed-pattern batch == stream i of a batch that runs
    pattern i everywhere (per-stream independence; compare the same batch
    index because each stream's sampling RNG is seeded by its index)."""
    n_frames = 12
    patterns = np.array([
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],       # clean
        [0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0],       # periodic loss
        [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0],       # burst
    ])
    batch = patterns.shape[0]
    _, mixed = _make_pair(batch)
    pcm = _speech(n_frames, batch)
    mixed_out = np.stack(
        [mixed.step(pcm[:, k * 160:(k + 1) * 160], patterns[:, k])
         for k in range(n_frames)], axis=1)

    for i in range(batch):
        _, uni = _make_pair(batch)
        pcm_i = np.tile(pcm[i][None], (batch, 1))
        uni_out = np.stack(
            [uni.step(pcm_i[:, k * 160:(k + 1) * 160],
                      np.full(batch, patterns[i, k]))
             for k in range(n_frames)], axis=1)
        np.testing.assert_allclose(mixed_out[i], uni_out[i], atol=1e-3,
                                   err_msg=f"stream {i}")


def test_batched_no_loss_is_passthrough_shape():
    batch, n_frames = 3, 6
    _, batched = _make_pair(batch)
    pcm = _speech(n_frames, batch)
    outs = [batched.step(pcm[:, k * 160:(k + 1) * 160], np.zeros(batch))
            for k in range(n_frames)]
    out = np.concatenate(outs, axis=1)
    assert out.shape == (batch, n_frames * 160)
    # with no losses the causal PLC passes audio through unmodified
    np.testing.assert_allclose(out, np.clip(pcm, -32768, 32767), atol=1e-3)


def _true_features_1(pcm_1d):
    from lpcnet_tpu.codec import features as F
    import jax.numpy as jnp
    st = F.init_encoder_state(1)
    rows = []
    for k in range(len(pcm_1d) // 160):
        st, f = F.compute_single_frame_features(
            st, jnp.asarray(pcm_1d[None, k * 160:(k + 1) * 160]))
        rows.append(np.asarray(f)[0])
    return np.stack(rows)


def test_batched_fec_matches_host():
    """Causal FEC queues: all streams share one pattern and one redundancy
    feed -> must track the host PLC's fec_add/get_fec_or_pred behavior."""
    batch, n_frames = 2, 12
    host, batched = _make_pair(batch)
    pcm = _speech(n_frames, batch)
    feats = _true_features_1(pcm[0])[:, :20]
    loss_pattern = [0, 1, 1, 0, 0, 0]
    for k in range(n_frames):
        if k % 2 == 0:
            pkt = k // 2
            for row in feats[2 * pkt:2 * pkt + 2]:
                host.fec_add(row[None])
                batched.fec_add(np.tile(row[None], (batch, 1)))
        lost = loss_pattern[k // 2]
        frame = pcm[:, k * 160:(k + 1) * 160]
        ref = host.conceal() if lost else host.update(frame)
        out = batched.step(frame, np.full(batch, lost))
        d = np.abs(out - ref)
        assert d.max() <= 1.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.02, f"frame {k}: too many rounding diffs"
    # FEC covered every lost frame -> loss counter never latched
    assert np.all(np.asarray(batched.state.loss_count) == 0)
    assert host.loss_count == 0


def test_batched_fec_per_stream_independence():
    """Stream 0 receives redundancy, stream 1 does not; stream 1's output
    must be identical to a run with no FEC anywhere."""
    batch, n_frames = 2, 10
    _, with_fec = _make_pair(batch)
    _, no_fec = _make_pair(batch)
    pcm = _speech(n_frames, batch)
    feats = _true_features_1(pcm[0])[:, :20]
    loss_pattern = [0, 1, 1, 0, 0]
    outs_f, outs_n = [], []
    for k in range(n_frames):
        if k % 2 == 0:
            pkt = k // 2
            for row in feats[2 * pkt:2 * pkt + 2]:
                with_fec.fec_add(np.tile(row[None], (batch, 1)),
                                 have=np.array([True, False]))
        lost = np.full(batch, loss_pattern[k // 2])
        frame = pcm[:, k * 160:(k + 1) * 160]
        outs_f.append(with_fec.step(frame, lost))
        outs_n.append(no_fec.step(frame, lost))
    of = np.stack(outs_f, 1)
    on = np.stack(outs_n, 1)
    np.testing.assert_array_equal(of[1], on[1])
    assert np.abs(of[0] - on[0]).max() > 1.0  # FEC changed stream 0


def test_batched_dc_filter_matches_host():
    """Causal +DC mode: the batched closed-form DC recurrences (triangular
    matmuls) vs the host's sequential f64 loops, on a signal with a real DC
    offset."""
    from lpcnet_tpu.plc.plc import LPCNET_PLC_DC_FILTER
    batch, n_frames = 2, 14
    lookahead = 2
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         lookahead=lookahead)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    host = PLC(fused, cfg, plc_params,
               options=LPCNET_PLC_CAUSAL | LPCNET_PLC_DC_FILTER, batch=batch)
    batched = BatchedPLC(fused, cfg, plc_params, batch=batch, remove_dc=True)
    pcm = _speech(n_frames, batch) + 300.0      # constant DC offset
    lost_per_frame = np.array([0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 0])
    for k in range(n_frames):
        frame = pcm[:, k * 160:(k + 1) * 160]
        ref = host.conceal() if lost_per_frame[k] else host.update(frame)
        out = batched.step(frame, np.full(batch, lost_per_frame[k]))
        d = np.abs(out - ref)
        assert d.max() <= 2.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.05, f"frame {k}: too many diffs"
    # with no losses the tracker locks onto the input offset (the mixed run
    # above legitimately wanders: conceal injects the random-weight model's
    # own synthesis DC through syn_dc)
    clean = BatchedPLC(fused, cfg, plc_params, batch=batch, remove_dc=True)
    for k in range(8):
        clean.step(pcm[:, k * 160:(k + 1) * 160], np.zeros(batch))
    assert abs(float(np.asarray(clean.state.dc_mem)[0]) - 300.0) < 100.0


def test_batched_dc_filter_matches_host_non_causal():
    """Non-causal +DC mode (the _dc model variants): batched closed-form DC
    recurrences incl. the recovery rewind/re-track vs the host's sequential
    f64 loops."""
    from lpcnet_tpu.plc.plc import LPCNET_PLC_DC_FILTER, LPCNET_PLC_NONCAUSAL
    batch, n_frames = 2, 14
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         lookahead=0)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    host = PLC(fused, cfg, plc_params,
               options=LPCNET_PLC_NONCAUSAL | LPCNET_PLC_DC_FILTER,
               batch=batch)
    batched = BatchedPLC(fused, cfg, plc_params, batch=batch,
                         non_causal=True, remove_dc=True)
    pcm = _speech(n_frames, batch) + 300.0      # constant DC offset
    lost_per_frame = np.array([0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 0])
    for k in range(n_frames):
        frame = pcm[:, k * 160:(k + 1) * 160]
        ref = host.conceal() if lost_per_frame[k] else host.update(frame)
        out = batched.step(frame, np.full(batch, lost_per_frame[k]))
        d = np.abs(out - ref)
        assert d.max() <= 2.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.05, f"frame {k}: too many diffs"
    # a clean run locks the tracker onto the input offset
    clean = BatchedPLC(fused, cfg, plc_params, batch=batch,
                       non_causal=True, remove_dc=True)
    for k in range(8):
        clean.step(pcm[:, k * 160:(k + 1) * 160], np.zeros(batch))
    assert abs(float(np.asarray(clean.state.dc_mem)[0]) - 300.0) < 100.0


def test_batched_dc_mixed_patterns_independent_non_causal():
    """Per-stream independence for nc+DC: stream i of a mixed-pattern batch
    (every stream a different loss mask) == stream i of a batch running
    pattern i everywhere. Exercises the DC rewind/re-track and dc_buf delay
    ring under divergent per-stream control flow."""
    n_frames = 12
    patterns = np.array([
        [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],       # clean
        [0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0],       # periodic loss
        [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0],       # burst
    ])
    batch = patterns.shape[0]
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         lookahead=0)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))

    def make():
        return BatchedPLC(fused, cfg, plc_params, batch=batch,
                          non_causal=True, remove_dc=True)

    pcm = _speech(n_frames, batch) + 300.0      # constant DC offset
    mixed = make()
    mixed_out = np.stack(
        [mixed.step(pcm[:, k * 160:(k + 1) * 160], patterns[:, k])
         for k in range(n_frames)], axis=1)
    for i in range(batch):
        uni = make()
        pcm_i = np.tile(pcm[i][None], (batch, 1))
        uni_out = np.stack(
            [uni.step(pcm_i[:, k * 160:(k + 1) * 160],
                      np.full(batch, patterns[i, k]))
             for k in range(n_frames)], axis=1)
        np.testing.assert_allclose(mixed_out[i], uni_out[i], atol=1e-3,
                                   err_msg=f"stream {i}")


@pytest.mark.parametrize("non_causal", [False, True])
def test_fused_step_matches_two_path(non_causal):
    """The single-state interleaved step vs its evaluate-both-and-merge
    predecessor: same sub-ops in the same per-stream order, so outputs must
    agree essentially exactly (tiny tolerance for XLA fusion reassociation
    between the two differently-shaped graphs)."""
    batch, n_frames = 2, 10
    lookahead = 0 if non_causal else 2
    cfg = M.LPCNetConfig(rnn_units1=64, rnn_units2=16, cond_size=32,
                         lookahead=lookahead)
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    a = BatchedPLC(fused, cfg, plc_params, batch=batch,
                   non_causal=non_causal, fused_step=True)
    b = BatchedPLC(fused, cfg, plc_params, batch=batch,
                   non_causal=non_causal, fused_step=False)
    pcm = _speech(n_frames, batch)
    rng = np.random.RandomState(3)
    lost_per_frame = np.repeat(rng.rand(n_frames // 2 + 1) < 0.4, 2)
    for k in range(n_frames):
        frame = pcm[:, k * 160:(k + 1) * 160]
        lost = np.array([lost_per_frame[k], lost_per_frame[k + 1]])
        oa = a.step(frame, lost)
        ob = b.step(frame, lost)
        d = np.abs(oa - ob)
        assert d.max() <= 1.0, f"frame {k}: max {d.max()}"
        assert (d > 1e-3).mean() < 0.01, f"frame {k}"


def test_fused_kernel_fasttf_passthrough_and_drain(monkeypatch):
    """Kernel-path fused step with the fast-TF drain (interpret mode):
    no-loss frames pass audio through exactly (count=0 TF is inert), and a
    loss/recovery cycle stays in the same tolerance class as the
    LPCNET_PLC_FASTTF=0 kernel path."""
    import os
    os.environ["LPCNET_PALLAS_INTERPRET"] = "1"
    import jax
    import jax.numpy as jnp
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc import batched as BP
    monkeypatch.setattr(K, "_INTERPRET", True)

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(1))
    b, n_frames = 8, 10
    rng = np.random.RandomState(0)
    pcm = (rng.randn(b, n_frames, 160) * 2000).astype(np.float32)
    lost = np.zeros((b, n_frames), bool)
    lost[:4, 4] = True        # one loss + recovery mid-run on half the batch

    def run(fasttf):
        monkeypatch.setattr(BP, "_FASTTF", fasttf)
        plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b,
                            use_kernel=True)
        return plc.run(pcm, lost, chunk=5)

    out_fast = run(True)
    out_ref = run(False)
    # good streams never touched by loss: exact passthrough both ways
    np.testing.assert_array_equal(out_fast[4:], out_ref[4:])
    np.testing.assert_allclose(
        out_fast[4:], np.clip(pcm[4:], -32768, 32767), atol=1e-3)
    # frames before the loss identical on all streams
    np.testing.assert_array_equal(out_fast[:, :4], out_ref[:, :4])


@pytest.mark.slow
@pytest.mark.parametrize("enable_blending", [True, False])
def test_fused_chain_kernel_matches_unfused(monkeypatch, enable_blending):
    """LPCNET_PLC_FASTCHAIN on vs off (kernel path, interpret mode): the
    fused PLC-net chain kernel must reproduce the sequential masked calls'
    features, PLC state, FEC pointers, and concealment audio, including
    blend restores, drain fec consumption, and the lost-frame pred."""
    import os
    os.environ["LPCNET_PALLAS_INTERPRET"] = "1"
    import jax
    from lpcnet_tpu.kernels import plc_chain as PC
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M2
    from lpcnet_tpu.models import plc as PM2
    from lpcnet_tpu.plc import batched as BP
    monkeypatch.setattr(K, "_INTERPRET", True)
    monkeypatch.setattr(PC, "_INTERPRET", True)

    cfg = M2.LPCNetConfig()
    params = M2.init_params(jax.random.PRNGKey(0), cfg)
    fused = M2.fuse_inference_params(params, cfg)
    plc_params = PM2.init_params(jax.random.PRNGKey(1))
    b, n_frames = 8, 12
    rng = np.random.RandomState(2)
    pcm = (rng.randn(b, n_frames, 160) * 2000).astype(np.float32)
    lost = rng.rand(b, n_frames) < 0.35
    lost[0] = False
    fec = (rng.randn(4, 20) * 0.2).astype(np.float32)

    def run(fastchain):
        monkeypatch.setattr(BP, "_FASTCHAIN", fastchain)
        plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b,
                            use_kernel=True,
                            enable_blending=enable_blending)
        if enable_blending:   # also exercise the FEC-row consumption path
            for row in fec:
                plc.fec_add(np.tile(row, (b, 1)),
                            have=np.arange(b) % 2 == 0)
        out = plc.run(pcm, lost, chunk=4)
        return out, plc.state

    out_c, st_c = run(True)
    out_r, st_r = run(False)
    np.testing.assert_allclose(np.asarray(st_c.plc_net.gru1),
                               np.asarray(st_r.plc_net.gru1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_c.plc_net.gru2),
                               np.asarray(st_r.plc_net.gru2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_c.features),
                               np.asarray(st_r.features), atol=2e-4)
    for f in ("fec_read", "fec_keep", "fec_skip", "loss_count"):
        np.testing.assert_array_equal(np.asarray(getattr(st_c, f)),
                                      np.asarray(getattr(st_r, f)), f)
    # stream 0 is all-good: exact passthrough both ways
    np.testing.assert_array_equal(out_c[0], out_r[0])
    # concealment audio in the same tolerance class (float-eps conds can
    # flip knife-edge sampler bits on a small fraction of samples)
    d = np.abs(out_c.astype(np.float64) - out_r.astype(np.float64))
    assert (d > 2).mean() < 0.02, f"diverged: {(d > 2).mean():.1%}"


@pytest.mark.parametrize("enable_blending", [True, False])
def test_sample_section_compaction_matches_full(monkeypatch,
                                                enable_blending):
    """LPCNET_PLC_COMPACT on vs off (kernel path, interpret mode): running
    the sample-rate section on a compacted active-stream sub-batch must
    reproduce the full-batch kernels -- per-stream kernel math is
    row-independent and inactive streams are frozen by the advance masks.
    Integer/pointer state and never-active streams are exact; float GRU
    state is allowed ulp-level drift (the sub-batch runs a different
    matmul tile shape, so K-accumulation order differs -- interpret-mode
    XLA picks a different GEMM blocking for 8-row vs 256-row operands).
    The loss pattern drives both cond branches: sparse-loss frames take the
    compact path, a dense-loss frame overflows capacity and falls back."""
    import os
    os.environ["LPCNET_PALLAS_INTERPRET"] = "1"
    import jax
    from lpcnet_tpu.kernels import plc_chain as PC
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M2
    from lpcnet_tpu.models import plc as PM2
    from lpcnet_tpu.plc import batched as BP
    monkeypatch.setattr(K, "_INTERPRET", True)
    monkeypatch.setattr(PC, "_INTERPRET", True)

    cfg = M2.LPCNetConfig()
    params = M2.init_params(jax.random.PRNGKey(0), cfg)
    fused = M2.fuse_inference_params(params, cfg)
    plc_params = PM2.init_params(jax.random.PRNGKey(1))
    b, n_frames = 16, 10
    rng = np.random.RandomState(5)
    pcm = (rng.randn(b, n_frames, 160) * 2000).astype(np.float32)
    lost = rng.rand(b, n_frames) < 0.2       # sparse: compact branch
    lost[:, 4] = rng.rand(b) < 0.9           # dense: fallback branch
    lost[0] = False
    fec = (rng.randn(3, 20) * 0.2).astype(np.float32)

    def run(compact_env):
        monkeypatch.setattr(BP, "_COMPACT_ENV", compact_env)
        plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b,
                            use_kernel=True,
                            enable_blending=enable_blending)
        for row in fec:   # exercise the FEC pointer replay under compaction
            plc.fec_add(np.tile(row, (b, 1)), have=np.arange(b) % 3 == 0)
        out = plc.run(pcm, lost, chunk=5)
        return out, plc.state

    out_c, st_c = run("8")
    out_r, st_r = run("0")
    # stream 0 never loses a frame: exact passthrough both ways
    np.testing.assert_array_equal(out_c[0], out_r[0])
    # concealment audio in the same tolerance class as the chain test
    # (ulp-level GRU-state drift can flip knife-edge sampler bits)
    d = np.abs(out_c.astype(np.float64) - out_r.astype(np.float64))
    assert (d > 2).mean() < 0.02, f"diverged: {(d > 2).mean():.1%}"
    for f in ("loss_count", "fec_read", "fec_skip", "pcm_fill"):
        np.testing.assert_array_equal(np.asarray(getattr(st_c, f)),
                                      np.asarray(getattr(st_r, f)), f)
    np.testing.assert_allclose(np.asarray(st_c.features),
                               np.asarray(st_r.features), atol=2e-4)
    st_leaves_c = jax.tree.leaves(st_c.sstate)
    st_leaves_r = jax.tree.leaves(st_r.sstate)
    for lc, lr in zip(st_leaves_c, st_leaves_r):
        lc, lr = np.asarray(lc), np.asarray(lr)
        # never-active stream: frozen/advanced identically, bit-exact
        np.testing.assert_array_equal(lc[0], lr[0])
        if np.issubdtype(lc.dtype, np.floating):
            # PCM-scale signal leaves need a PCM-scale ulp allowance
            tol = 1e-5 * max(1.0, np.abs(lr).max())
            np.testing.assert_allclose(lc, lr, atol=tol)
        else:
            np.testing.assert_array_equal(lc, lr)


def test_nc_section_compaction_matches_full(monkeypatch):
    """Non-causal LPCNET_PLC_COMPACT on vs off (kernel path, interpret
    mode): the compacted L|rec sample-rate chain and the compacted
    deferred-resync update must reproduce the full-batch kernels.  Same
    soundness argument and tolerance classes as the causal test above; the
    loss pattern drives sparse frames (compact branch), a dense frame
    (capacity-overflow fallback), and recoveries (queued-resync streams)."""
    import os
    os.environ["LPCNET_PALLAS_INTERPRET"] = "1"
    import jax
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M2
    from lpcnet_tpu.models import plc as PM2
    from lpcnet_tpu.plc import batched as BP
    monkeypatch.setattr(K, "_INTERPRET", True)

    cfg = M2.LPCNetConfig(lookahead=0)
    params = M2.init_params(jax.random.PRNGKey(0), cfg)
    fused = M2.fuse_inference_params(params, cfg)
    plc_params = PM2.init_params(jax.random.PRNGKey(1))
    b, n_frames = 16, 10
    rng = np.random.RandomState(7)
    pcm = (rng.randn(b, n_frames, 160) * 2000).astype(np.float32)
    lost = rng.rand(b, n_frames) < 0.2       # sparse: compact branch
    lost[:, 5] = rng.rand(b) < 0.9           # dense: fallback branch
    lost[0] = False

    def run(compact_env):
        monkeypatch.setattr(BP, "_COMPACT_ENV", compact_env)
        plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b,
                            use_kernel=True, non_causal=True)
        out = plc.run(pcm, lost, chunk=5)
        return out, plc.state

    out_c, st_c = run("8")
    out_r, st_r = run("0")
    # stream 0 never loses a frame: exact passthrough both ways
    np.testing.assert_array_equal(out_c[0], out_r[0])
    d = np.abs(out_c.astype(np.float64) - out_r.astype(np.float64))
    assert (d > 2).mean() < 0.02, f"diverged: {(d > 2).mean():.1%}"
    for f in ("loss_count", "queued"):
        np.testing.assert_array_equal(np.asarray(getattr(st_c, f)),
                                      np.asarray(getattr(st_r, f)), f)
    np.testing.assert_allclose(np.asarray(st_c.features),
                               np.asarray(st_r.features), atol=2e-4)
    # NC feeds synthesized audio back into feature re-analysis, so allowed
    # knife-edge sampler flips (<2% of audio above) propagate small state
    # diffs; a compaction logic bug would produce wholesale wrong rows
    # (O(scale) on most elements), which the fraction + max gates catch.
    for lc, lr in zip(jax.tree.leaves(st_c.sstate),
                      jax.tree.leaves(st_r.sstate)):
        lc, lr = np.asarray(lc), np.asarray(lr)
        np.testing.assert_array_equal(lc[0], lr[0])
        if np.issubdtype(lc.dtype, np.floating):
            scale = max(1.0, np.abs(lr).max())
            d = np.abs(lc.astype(np.float64) - lr.astype(np.float64))
            frac = (d > 1e-5 * scale).mean()
            assert frac < 0.15, f"{frac:.1%} beyond ulp class"
            assert d.max() <= 0.02 * scale, (d.max(), scale)
        else:
            np.testing.assert_array_equal(lc, lr)


def test_nc_kernel_section_matches_scan(monkeypatch):
    """Non-causal kernel fast path (sectioned program) vs the bit-exact
    scan path: good streams and pre-loss frames are exact; concealment
    audio stays in the kernel tolerance class (bf16-matmul sampling can
    flip knife-edge bits on a small fraction of samples)."""
    import os
    os.environ["LPCNET_PALLAS_INTERPRET"] = "1"
    import jax
    from lpcnet_tpu.kernels import sample_loop as K
    from lpcnet_tpu.models import lpcnet as M2
    from lpcnet_tpu.models import plc as PM2
    from lpcnet_tpu.plc import batched as BP
    monkeypatch.setattr(K, "_INTERPRET", True)

    cfg = M2.LPCNetConfig(lookahead=0)
    params = M2.init_params(jax.random.PRNGKey(0), cfg)
    fused = M2.fuse_inference_params(params, cfg)
    plc_params = PM2.init_params(jax.random.PRNGKey(1))
    b, n_frames = 8, 10
    rng = np.random.RandomState(3)
    pcm = (rng.randn(b, n_frames, 160) * 2000).astype(np.float32)
    lost = np.zeros((b, n_frames), bool)
    lost[:4, 4] = True        # loss + recovery + queued resync on half
    lost[:2, 5] = True        # a double loss for continued-conceal cover

    def run(use_kernel):
        plc = BP.BatchedPLC(fused, cfg, plc_params, batch=b,
                            use_kernel=use_kernel, non_causal=True)
        return plc.run(pcm, lost, chunk=5)

    out_k = run(True)
    out_s = run(False)
    np.testing.assert_array_equal(out_k[4:], out_s[4:])
    np.testing.assert_array_equal(out_k[:, :4], out_s[:, :4])
    d = np.abs(out_k.astype(np.float64) - out_s.astype(np.float64))
    assert (d > 2).mean() < 0.05, f"diverged: {(d > 2).mean():.1%}"


def test_default_flags_are_measured_best():
    """The shipped defaults must equal the round-4 flag-matrix winner
    (BENCHMARKS.md round-4: compact cap=b/4, chain kernel OFF -- it
    measured net-negative in both modes). Guards against the round-3
    failure mode where the shipped default and the measured-best config
    silently diverged."""
    from lpcnet_tpu.plc import batched as BP
    assert BP._FASTCHAIN is False
    assert BP._COMPACT_ENV == "auto"
    # b/4 rounded up to the 32-sublane tile; off below the 128 floor
    assert BP._compact_capacity(256) == 64
    assert BP._compact_capacity(1024) == 256
    assert BP._compact_capacity(129) == 32
    assert BP._compact_capacity(128) == 32
    assert BP._compact_capacity(64) == 0
