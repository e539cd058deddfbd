#!/usr/bin/env python3
"""Generate NEURAL golden parity fixtures from the reference C implementation.

Runs tools/cref/build/harness_nn (built by build_nn.sh: the reference's
nnet.c / lpcnet.c / lpcnet_plc.c / dred_rdovae_*.c compiled against DNNw
blobs exported by lpcnet_tpu.weights) and records golden synthesis PCM,
internal state trajectories, PLC traces and DRED latents.

Model weights are NOT stored in the fixture: they are regenerated in the
tests from the same jax PRNG seeds (see model_params()); a blob SHA ties the
fixture to the exact weights so a silent PRNG change fails loudly instead of
producing garbage comparisons.
"""

import hashlib
import os
import subprocess
import sys

# Weight init must happen on the CPU backend: the tests regenerate the same
# params under the pinned-CPU conftest, and init numerics are
# backend-dependent.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
HARNESS = os.path.join(HERE, "build", "harness_nn")
HARNESS_NC = os.path.join(HERE, "build", "harness_nn_nc")   # FEATURES_DELAY=0
DSP_HARNESS = os.path.join(HERE, "build", "harness")
FIXDIR = os.path.abspath(os.path.join(HERE, "..", "..", "tests", "fixtures"))
TMP = os.path.join(HERE, "build", "nn_fix")

sys.path.insert(0, HERE)
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..")))
from gen_fixtures import synth_speech  # noqa: E402

FRAME = 160


def model_params():
    """Deterministic fixture models (regenerated identically by the tests)."""
    import jax
    # the axon TPU plugin ignores JAX_PLATFORMS=cpu; pin the device so init
    # numerics match the pinned-CPU test environment exactly
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.models import rdovae as RM

    cfg = M.LPCNetConfig()          # default sizes = tools/cref/nnet_data.h
    params = M.init_params(jax.random.PRNGKey(1234), cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(5678))
    rdovae_params = RM.init_params(jax.random.PRNGKey(91011))
    return cfg, params, plc_params, rdovae_params


def run(mode, *args, harness=None):
    subprocess.run([harness or HARNESS, mode, *[str(a) for a in args]],
                   check=True)


def p(name):
    return os.path.join(TMP, name)


def main():
    from lpcnet_tpu.weights import aux_arrays as AUX
    from lpcnet_tpu.weights import lpcnet_arrays as LA
    from lpcnet_tpu.weights import blob as B

    os.makedirs(TMP, exist_ok=True)
    os.makedirs(FIXDIR, exist_ok=True)
    cfg, params, plc_params, rdovae_params = model_params()

    voc_arrays = LA.arrays_from_params(params, cfg, quantize=False)
    plc_arrays = AUX.plc_arrays_from_params(plc_params, quantize=False)
    dred_arrays = AUX.rdovae_arrays_from_params(rdovae_params, quantize=False)
    voc_blob = B.write_blob(voc_arrays)
    comb_blob = B.write_blob({**voc_arrays, **plc_arrays})
    dred_blob = B.write_blob(dred_arrays)
    open(p("voc.blob"), "wb").write(voc_blob)
    open(p("comb.blob"), "wb").write(comb_blob)
    open(p("dred.blob"), "wb").write(dred_blob)

    out = {
        "voc_blob_sha": np.frombuffer(
            hashlib.sha256(voc_blob).digest(), np.uint8),
        "comb_blob_sha": np.frombuffer(
            hashlib.sha256(comb_blob).digest(), np.uint8),
        "dred_blob_sha": np.frombuffer(
            hashlib.sha256(dred_blob).digest(), np.uint8),
    }

    # activation tables straight from the compiled reference
    run("tansig", p("tansig.f32"))
    tabs = np.fromfile(p("tansig.f32"), np.float32)
    out["tansig_table"] = tabs[:201]
    out["sampling_logit_table"] = tabs[201:457]

    # input audio + C-extracted features (40 frames = 0.4 s)
    n_frames = 40
    pcm = synth_speech(n_frames * FRAME, seed=21)
    pcm.tofile(p("in.s16"))
    subprocess.run([DSP_HARNESS, "features", p("in.s16"), p("feats.f32")],
                   check=True)
    feats = np.fromfile(p("feats.f32"), np.float32).reshape(-1, 36)
    assert feats.shape[0] >= n_frames, feats.shape
    feats = feats[:n_frames]
    feats.tofile(p("feats_n.f32"))
    out["synth_features"] = feats
    out["synth_in_pcm"] = pcm

    # free-running synthesis
    run("synth", p("voc.blob"), n_frames, p("feats_n.f32"),
        p("pcm_free.s16"), p("st_free.f32"))
    out["synth_free_pcm"] = np.fromfile(p("pcm_free.s16"), np.int16)
    out["synth_free_states"] = np.fromfile(
        p("st_free.f32"), np.float32).reshape(n_frames, -1)

    # per-sample free-running trace [exc, last_sig0, deemph, pcm_out] from
    # the first synthesized frame on (warmup frames skipped)
    run("synth_trace", p("voc.blob"), n_frames, p("feats_n.f32"),
        p("trace.f32"))
    out["synth_trace"] = np.fromfile(
        p("trace.f32"), np.float32).reshape(-1, 4)

    # teacher-forced synthesis (preload = the input audio)
    run("synth", p("voc.blob"), n_frames, p("feats_n.f32"),
        p("pcm_tf.s16"), p("st_tf.f32"), p("in.s16"))
    out["synth_tf_states"] = np.fromfile(
        p("st_tf.f32"), np.float32).reshape(n_frames, -1)

    # PLC traces: one loss pattern, all four mode combinations
    n_packets = 25
    rng = np.random.RandomState(3)
    lost = (rng.rand(n_packets) < 0.25).astype(np.uint8)
    lost[:4] = 0          # warmup with good audio first
    lost[10:12] = 1       # guaranteed burst
    plc_pcm = synth_speech(n_packets * 2 * FRAME, seed=22)
    plc_pcm.tofile(p("plc_in.s16"))
    lost.tofile(p("lost.u8"))
    out["plc_in_pcm"] = plc_pcm
    out["plc_lost"] = lost
    # non-causal modes need the FEATURES_DELAY=0 reference build (the blob
    # is the same; lookahead only changes frame scheduling, not shapes)
    for name, flags, harness in [
            ("causal", 0, HARNESS), ("causal_dc", 4, HARNESS),
            ("nc", 1, HARNESS_NC), ("nc_dc", 5, HARNESS_NC),
            ("codec", 2, HARNESS)]:
        run("plc", p("comb.blob"), flags, n_packets, p("plc_in.s16"),
            p("lost.u8"), p(f"plc_{name}.s16"), harness=harness)
        out[f"plc_{name}_pcm"] = np.fromfile(p(f"plc_{name}.s16"), np.int16)

    # DRED enc/dec on the synthesis features (20 dframes)
    n_dframes = n_frames // 2
    feats[:, :20].astype(np.float32).tofile(p("dred_feats.f32"))
    run("dred", p("dred.blob"), n_dframes, p("dred_feats.f32"),
        p("latents.f32"), p("dstates.f32"), p("decfeats.f32"))
    out["dred_features"] = feats[:, :20]
    out["dred_latents"] = np.fromfile(
        p("latents.f32"), np.float32).reshape(n_dframes, 80)
    out["dred_states"] = np.fromfile(
        p("dstates.f32"), np.float32).reshape(n_dframes, 24)
    out["dred_dec_features"] = np.fromfile(
        p("decfeats.f32"), np.float32).reshape(n_dframes, 80)

    path = os.path.join(FIXDIR, "neural_cref.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in sorted(out.items())))

    # ---- int8 DOT_PROD fixtures (the reference's DEPLOYED numerics) ----
    # same models, quantized blob, harness_nn_q8 (USE_SU_BIAS + DOT_PROD,
    # src/vec.h:206-339); gates the subias export + JAX q8 kernels vs C.
    q8 = {}
    voc_q = LA.arrays_from_params(params, cfg, quantize=True)
    plc_q = AUX.plc_arrays_from_params(plc_params, quantize=True)
    voc_q_blob = B.write_blob(voc_q)
    comb_q_blob = B.write_blob({**voc_q, **plc_q})
    open(p("voc_q.blob"), "wb").write(voc_q_blob)
    open(p("comb_q.blob"), "wb").write(comb_q_blob)
    q8["voc_blob_sha"] = np.frombuffer(
        hashlib.sha256(voc_q_blob).digest(), np.uint8)
    q8["comb_blob_sha"] = np.frombuffer(
        hashlib.sha256(comb_q_blob).digest(), np.uint8)

    HARNESS_Q8 = os.path.join(HERE, "build", "harness_nn_q8")
    HARNESS_Q8_NC = os.path.join(HERE, "build", "harness_nn_q8_nc")
    q8["synth_features"] = feats
    q8["synth_in_pcm"] = pcm
    run("synth", p("voc_q.blob"), n_frames, p("feats_n.f32"),
        p("q_pcm_free.s16"), p("q_st_free.f32"), harness=HARNESS_Q8)
    q8["synth_free_pcm"] = np.fromfile(p("q_pcm_free.s16"), np.int16)
    q8["synth_free_states"] = np.fromfile(
        p("q_st_free.f32"), np.float32).reshape(n_frames, -1)
    run("synth", p("voc_q.blob"), n_frames, p("feats_n.f32"),
        p("q_pcm_tf.s16"), p("q_st_tf.f32"), p("in.s16"),
        harness=HARNESS_Q8)
    q8["synth_tf_states"] = np.fromfile(
        p("q_st_tf.f32"), np.float32).reshape(n_frames, -1)

    q8["plc_in_pcm"] = plc_pcm
    q8["plc_lost"] = lost
    for name, flags, harness in [
            ("causal", 0, HARNESS_Q8), ("causal_dc", 4, HARNESS_Q8),
            ("nc", 1, HARNESS_Q8_NC), ("nc_dc", 5, HARNESS_Q8_NC),
            ("codec", 2, HARNESS_Q8)]:
        run("plc", p("comb_q.blob"), flags, n_packets, p("plc_in.s16"),
            p("lost.u8"), p(f"q_plc_{name}.s16"), harness=harness)
        q8[f"plc_{name}_pcm"] = np.fromfile(p(f"q_plc_{name}.s16"), np.int16)

    path = os.path.join(FIXDIR, "neural_cref_q8.npz")
    np.savez_compressed(path, **q8)
    print(f"wrote {path}: " + ", ".join(
        f"{k}{list(v.shape)}" for k, v in sorted(q8.items())))


if __name__ == "__main__":
    main()
