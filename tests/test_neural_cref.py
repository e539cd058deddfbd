"""Neural-path golden parity gates vs the reference C implementation.

Fixtures in tests/fixtures/neural_cref.npz are recorded by
tools/cref/gen_nn_fixtures.py from the REFERENCE neural sources compiled in
place (src/nnet.c, src/lpcnet.c, src/lpcnet_plc.c, src/dred_rdovae_enc.c,
src/dred_rdovae_dec.c; scalar vec.h float kernels) against DNNw blobs
exported by lpcnet_tpu.weights from deterministic jax-PRNG model weights.
The tests regenerate the identical weights from the same seeds (blob SHAs
assert this) and gate the JAX implementations against the recorded C
behavior.

Gate design notes:
- The free-running AR loop is chaotic: the bit-tree sampler makes knife-edge
  threshold decisions (src/nnet.c:163-214), so any last-bit float difference
  eventually flips one excitation sample, after which trajectories decorrelate
  (measured first flip: sample ~1600 of 6080 on this fixture). The gates
  therefore bound the *windowed PCM error over the first 8 synthesized
  frames* (locked excitation + bounded float drift) instead of demanding
  bit-exactness forever.
- Teacher forcing (preload, src/lpcnet.c:256-259) removes the chaos: the
  full 38-frame GRU state trajectory is gated tightly.
- The random-init fixture model saturates (|deemph| ~1e5), which makes these
  gates *stress* tests of the clipping/μ-law edge behavior.
- The Pallas kernels are gated against the scan path elsewhere
  (test_pallas_kernel, test_quantized); here the f32 kernel is additionally
  gated directly against C (interpret mode).
- C PLC output arrays are `short` and the DC path adds the offset without
  clamping (src/lpcnet_plc.c:333), so PLC comparisons are int16-wraparound
  aware.
"""

import os

os.environ["LPCNET_PALLAS_INTERPRET"] = "1"  # before kernels import

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_fixture

FRAME = 160


@pytest.fixture(scope="module")
def fx():
    return load_fixture("neural_cref.npz")


@pytest.fixture(scope="module")
def voc(fx):
    """(cfg, params, fused) regenerated from the fixture seed, SHA-checked."""
    import hashlib

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.weights import blob as B
    from lpcnet_tpu.weights import lpcnet_arrays as LA

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(1234), cfg)
    blob = B.write_blob(LA.arrays_from_params(params, cfg, quantize=False))
    assert hashlib.sha256(blob).digest() == fx["voc_blob_sha"].tobytes(), (
        "regenerated weights differ from the fixture's (PRNG or exporter "
        "changed) -- re-run tools/cref/gen_nn_fixtures.py")
    fused = LA.fused_from_arrays(B.read_blob(blob), cfg)
    return cfg, params, fused


@pytest.fixture(scope="module", autouse=True)
def cref_activations(fx):
    """All gates run with the C table-approximated tanh/sigmoid."""
    from lpcnet_tpu.nn import layers as L

    L.set_cref_tansig_table(fx["tansig_table"])
    with L.activation_impl("cref"):
        yield


def test_sampling_logit_table(fx):
    from lpcnet_tpu.models.lpcnet import sampling_logit_table

    d = np.abs(sampling_logit_table() - fx["sampling_logit_table"]).max()
    assert d < 5e-7, d


def _run_frames(fx, voc, synth, n_frames=None, preload=None):
    """Drive frame_network (eager) + a per-frame synthesis fn."""
    from lpcnet_tpu.models import lpcnet as M

    cfg, _, fused = voc
    feats = jnp.asarray(fx["synth_features"])
    n_frames = n_frames or feats.shape[0]
    fstate = M.init_frame_state(1, cfg)
    sstate = M.init_sample_state(1, cfg)
    pcm_out, states = [], {}
    for k in range(n_frames):
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate,
                                                 feats[k][None], cfg)
        if k < cfg.lookahead:
            pcm_out.append(np.zeros(FRAME, np.float64))
            continue
        tgt = None if preload is None else jnp.asarray(preload[k][None])
        sstate, pcm = synth(fused, sstate, ca, cb, lpc, tgt)
        pcm_out.append(np.asarray(pcm, np.float64)[0])
        states[k] = np.concatenate([
            np.asarray(sstate.gru_a)[0], np.asarray(sstate.gru_b)[0],
            np.asarray(sstate.last_sig)[0],
            [float(sstate.last_exc[0])], [float(sstate.deemph[0])]])
    return np.concatenate(pcm_out), states


def _gate_free_running(fx, voc, pcm_out, tol=128.0, n_gate_frames=8,
                       max_bad_frames=0):
    """The excitation stream must stay locked to C over the gate window: a
    single flipped bit-tree decision decorrelates the AR loop and produces
    diffs in the thousands on most subsequent samples. Locked excitation
    leaves only bounded float drift (measured: max 30, p99 6 on this
    fixture's near-saturated signal).

    max_bad_frames > 0 admits isolated knife-edge sampler flips whose effect
    decays (the saturated fixture signal re-locks through the mu-law clamp)
    -- but the trajectory must RE-LOCK: the last 4 frames are always gated
    tightly, which decorrelation cannot pass."""
    cfg = voc[0]
    cpcm = fx["synth_free_pcm"].astype(np.float64)[:len(pcm_out)]
    warm = cfg.lookahead * FRAME
    assert np.all(pcm_out[:warm] == 0) and np.all(cpcm[:warm] == 0)
    d = np.abs(pcm_out - cpcm)
    gate = d[warm:warm + n_gate_frames * FRAME]
    assert np.mean(gate > 2) < 0.15, (
        f"excitation stream diverged from C: {np.mean(gate > 2):.1%} of "
        f"samples off by >2 (measured baseline 4.3%)")
    bad = 0
    for w in range(warm, warm + n_gate_frames * FRAME, FRAME):
        if d[w:w + FRAME].max() > tol:
            bad += 1
    assert bad <= max_bad_frames, (
        f"{bad} frames exceed pcm tol {tol} (allowed {max_bad_frames})")
    tail = d[warm + (n_gate_frames - 4) * FRAME:warm + n_gate_frames * FRAME]
    assert tail.max() <= tol, f"tail did not re-lock: max {tail.max()}"


def test_synthesis_free_running_scan(fx, voc):
    """JAX scan path vs C free-running synthesis (src/lpcnet.c:235-271)."""
    from lpcnet_tpu.models import lpcnet as M

    synth_j = jax.jit(M.synthesize_frame)
    pcm_out, _ = _run_frames(
        fx, voc, lambda f, s, a, b, l, t: synth_j(f, s, a, b, l),
        n_frames=voc[0].lookahead + 8)
    _gate_free_running(fx, voc, pcm_out)


@pytest.mark.slow
def test_synthesis_free_running_pallas_f32(fx, voc):
    """Pallas fused AR kernel (f32, interpret mode on CPU) directly vs C."""
    from lpcnet_tpu.kernels import sample_loop as K

    cfg, _, fused = voc
    kw = K.kernel_weights(fused, cfg, dtype=jnp.float32)
    pcm_out, _ = _run_frames(
        fx, voc,
        lambda f, s, a, b, l, t: K.synthesize_frame_auto(kw, s, a, b, l, cfg),
        n_frames=cfg.lookahead + 8)
    _gate_free_running(fx, voc, pcm_out)


def test_synthesis_teacher_forced_states(fx, voc):
    """Teacher-forced (preload) state trajectories track C over all frames.

    No chaos under teacher forcing: gates embeddings, GRU-A/GRU-B math, the
    LPC/feature conditioning chain and μ-law handling end-to-end. exc can
    round one μ-law level differently (float lin2ulaw at bin edges), which
    briefly perturbs the embed_exc row, hence the loose-but-bounded GRU
    tolerances.
    """
    from lpcnet_tpu.models import lpcnet as M

    cfg = voc[0]
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    synth_j = jax.jit(M.synthesize_frame)
    tf_pcm = fx["synth_in_pcm"].astype(np.float32).reshape(-1, FRAME)
    _, states = _run_frames(
        fx, voc, lambda f, s, a, b, l, t: synth_j(f, s, a, b, l, preload=t),
        preload=tf_pcm)
    cst = fx["synth_tf_states"]
    for k, st in states.items():
        d = np.abs(st - cst[k])
        assert d[:na].max() < 0.15, (k, d[:na].max())            # gru_a
        assert d[na:na + nb].max() < 0.10, (k, d[na:na + nb].max())  # gru_b
        assert d[na + nb:na + nb + 16].max() < 1.0, k            # last_sig
        assert d[na + nb + 16] <= 1.0, k                         # last_exc
        assert d[na + nb + 17] < 4.0, k                          # deemph


def test_dred_encoder_decoder(fx):
    """DRED RDO-VAE enc/dec vs C (src/dred_rdovae_enc.c:38-95,
    src/dred_rdovae_dec.c:37-98). Deterministic, so tight tolerances."""
    import hashlib

    from lpcnet_tpu.models import rdovae as RM
    from lpcnet_tpu.weights import aux_arrays as AUX
    from lpcnet_tpu.weights import blob as B

    cfg = RM.RDOVAEConfig()
    params = RM.init_params(jax.random.PRNGKey(91011))
    blob = B.write_blob(AUX.rdovae_arrays_from_params(params, quantize=False))
    assert hashlib.sha256(blob).digest() == fx["dred_blob_sha"].tobytes()

    feats = jnp.asarray(fx["dred_features"])[None]
    z, states = jax.jit(RM.encode_seq, static_argnames=("cfg",))(
        params, feats, cfg)
    assert np.abs(np.asarray(z)[0] - fx["dred_latents"]).max() < 1e-4
    assert np.abs(np.asarray(states)[0] - fx["dred_states"]).max() < 1e-4

    init = jnp.asarray(fx["dred_states"][-1])[None]
    dec = jax.jit(RM.decode_seq, static_argnames=("cfg",))(
        params, z, init, cfg)
    dec = np.asarray(dec)[0].reshape(fx["dred_dec_features"].shape)
    assert np.abs(dec - fx["dred_dec_features"]).max() < 1e-4


# ---------------------------------------------------------------------------
# int8 DOT_PROD gates: the reference's DEPLOYED inference numerics
# (harness_nn_q8: USE_SU_BIAS + DOT_PROD scalar kernels, src/vec.h:206-339).
# The JAX q8 path shares the exact integer weights with the C via the
# quantized blob (SHA-pinned), so the same windowed-gate design applies.

@pytest.fixture(scope="module")
def fx_q8():
    return load_fixture("neural_cref_q8.npz")


@pytest.fixture(scope="module")
def voc_q8(fx_q8):
    """(cfg, q8-fused) from the quantized blob, SHA-checked against the
    fixture's: C consumed these exact int8 weights."""
    import hashlib

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.nn.quantized import quantize_fused
    from lpcnet_tpu.weights import blob as B
    from lpcnet_tpu.weights import lpcnet_arrays as LA

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(1234), cfg)
    blob = B.write_blob(LA.arrays_from_params(params, cfg, quantize=True))
    assert hashlib.sha256(blob).digest() == fx_q8["voc_blob_sha"].tobytes(), (
        "regenerated quantized blob differs from the fixture's -- re-run "
        "tools/cref/gen_nn_fixtures.py")
    # blob int8 -> float grid -> quantize_fused: exact int roundtrip (the
    # grid values are n/128), so the JAX ints == the C's blob ints
    fused = LA.fused_from_arrays(B.read_blob(blob), cfg)
    return cfg, params, quantize_fused(fused)


def test_synthesis_free_running_scan_q8(fx_q8, voc_q8):
    """JAX int8 scan path vs the C DOT_PROD build, free-running."""
    from lpcnet_tpu.models import lpcnet as M

    synth_j = jax.jit(M.synthesize_frame)
    pcm_out, _ = _run_frames(
        fx_q8, voc_q8, lambda f, s, a, b, l, t: synth_j(f, s, a, b, l),
        n_frames=voc_q8[0].lookahead + 8)
    # measured: one decaying sampler flip in frames 1-2, re-locked to max
    # diff <= 6 from frame 3 on
    _gate_free_running(fx_q8, voc_q8, pcm_out, max_bad_frames=2)


def test_synthesis_teacher_forced_states_q8(fx_q8, voc_q8):
    """Teacher-forced state trajectories vs the C DOT_PROD build: gates the
    int8 GEMV numerics (GRU-A sparse + diag, GRU-B input AND recurrent),
    the subias export consumed by USE_SU_BIAS, and the blob int8 layout."""
    from lpcnet_tpu.models import lpcnet as M

    cfg = voc_q8[0]
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    synth_j = jax.jit(M.synthesize_frame)
    tf_pcm = fx_q8["synth_in_pcm"].astype(np.float32).reshape(-1, FRAME)
    _, states = _run_frames(
        fx_q8, voc_q8, lambda f, s, a, b, l, t: synth_j(f, s, a, b, l,
                                                        preload=t),
        preload=tf_pcm)
    cst = fx_q8["synth_tf_states"]
    for k, st in states.items():
        d = np.abs(st - cst[k])
        assert d[:na].max() < 0.15, (k, d[:na].max())            # gru_a
        assert d[na:na + nb].max() < 0.10, (k, d[na:na + nb].max())  # gru_b
        assert d[na + nb:na + nb + 16].max() < 1.0, k            # last_sig
        assert d[na + nb + 16] <= 1.0, k                         # last_exc
        assert d[na + nb + 17] < 4.0, k                          # deemph


@pytest.mark.slow
def test_synthesis_free_running_pallas_q8(fx_q8, voc_q8):
    """Pallas int8 kernel (interpret mode) directly vs the C DOT_PROD build."""
    from lpcnet_tpu.kernels import sample_loop as K

    cfg, _, fused_q = voc_q8
    kw = K.kernel_weights(fused_q, cfg)
    assert K.is_q8_bundle(kw)
    pcm_out, _ = _run_frames(
        fx_q8, voc_q8,
        lambda f, s, a, b, l, t: K.synthesize_frame_auto(kw, s, a, b, l, cfg),
        n_frames=cfg.lookahead + 8)
    _gate_free_running(fx_q8, voc_q8, pcm_out)


# ---------------------------------------------------------------------------
# PLC traces: per 20 ms packet, conceal if lost else update, all 5 mode
# combinations, one shared loss pattern (matches harness_nn.c plc mode).
# Concealed stretches are chaotic (sampled synthesis), so the gate is:
# every packet NOT in a loss-affected window (a lost packet or the 2 packets
# after one: blending + resync, src/lpcnet_plc.c:224-231) must match C
# (wraparound-aware, |diff| <= 2).

PLC_MODES = [("causal", 0), ("causal_dc", 4), ("nc", 1), ("nc_dc", 5),
             ("codec", 2)]


@pytest.mark.slow
@pytest.mark.parametrize("name,flags", PLC_MODES, ids=[m[0] for m in PLC_MODES])
def test_plc_trace(fx, name, flags):
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc.plc import PLC

    cfg = M.LPCNetConfig(lookahead=0) if (flags & 1) else M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(1234), cfg)
    fused = M.fuse_inference_params(params, cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(5678))
    plc = PLC(fused, cfg, plc_params, options=flags, batch=1)

    pcm_in = fx["plc_in_pcm"].astype(np.float32)
    lost = fx["plc_lost"]
    n_frames = len(pcm_in) // FRAME
    out = []
    for k in range(n_frames):
        frame = pcm_in[k * FRAME:(k + 1) * FRAME][None]
        out.append(plc.conceal()[0] if lost[k // 2] else plc.update(frame)[0])
    out = np.concatenate(out)

    ref = fx[f"plc_{name}_pcm"].astype(np.float64)
    d = np.abs(((out - ref + 32768) % 65536) - 32768)
    lost_set = set(np.nonzero(lost)[0].tolist())
    affected = {p + i for p in lost_set for i in range(3)}
    for p in range(len(lost)):
        if p in affected:
            continue
        seg = d[p * 2 * FRAME:(p + 1) * 2 * FRAME]
        assert seg.max() <= 2, (
            f"{name}: clean packet {p} diff {seg.max()} "
            f"(state machine out of sync with C)")
