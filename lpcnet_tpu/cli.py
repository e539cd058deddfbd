"""Command-line demo mirroring the reference's lpcnet_demo
(src/lpcnet_demo.c:87-271), plus batched throughput options.

    python -m lpcnet_tpu.cli encode    <input.pcm> <compressed.lpcnet>
    python -m lpcnet_tpu.cli decode    <compressed.lpcnet> <output.pcm>
    python -m lpcnet_tpu.cli features  <input.pcm> <features.f32>
    python -m lpcnet_tpu.cli synthesis <features.f32> <output.pcm>
    python -m lpcnet_tpu.cli plc       <causal|causal_dc|noncausal|noncausal_dc>
                                       <percent|pattern.txt> <in.pcm> <out.pcm>
    python -m lpcnet_tpu.cli addlpc    <features.f32> <features_lpc.f32>

File formats match the C demo: .pcm = raw 16 kHz s16le mono, .f32 = raw
float32 feature rows of 36, .lpcnet = 8-byte packets.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from . import api
from .dsp.constants import (
    FRAME_SIZE,
    LPCNET_COMPRESSED_SIZE,
    LPCNET_PACKET_SAMPLES,
    NB_TOTAL_FEATURES,
)


def _read_pcm(path):
    return np.fromfile(path, dtype=np.int16)


def _load_rdovae(path):
    if path.endswith(".npz"):
        import numpy as _np
        d = _np.load(path)
        from .weights.checkpoint import unflatten_tree
        return unflatten_tree({k: d[k] for k in d.files if k != "__config__"})
    from .weights.aux_arrays import load_rdovae_blob
    with open(path, "rb") as f:
        return load_rdovae_blob(f.read())


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lpcnet_tpu")
    ap.add_argument("mode", choices=["encode", "decode", "features",
                                     "synthesis", "plc", "addlpc",
                                     "dred-encode", "dred-decode",
                                     "dred-payload", "dred-payload-decode",
                                     "fec-encode"])
    ap.add_argument("args", nargs="+")
    ap.add_argument("--model", default=None,
                    help="model weights (.npz checkpoint or DNNw .bin "
                         "blob); default = the shipped demo vocoder, like "
                         "the reference lpcnet_demo's built-in nnet_data "
                         "(src/lpcnet_demo.c:43-56); pass 'random' for "
                         "deterministic random-init smoke weights")
    ap.add_argument("--batch", type=int, default=1,
                    help="process the file as B interleaved independent streams")
    ap.add_argument("--sampling", choices=["tree", "pdf"], default="tree",
                    help="excitation sampler: C bit-tree (default) or the "
                         "full-PDF voicing-temperature sampler of the "
                         "reference's Python synthesis")
    ap.add_argument("--dred-frames", type=int, default=52,
                    help="redundancy depth in 10ms frames for dred-payload")
    ap.add_argument("--q0", type=int, default=9)
    ap.add_argument("--q1", type=int, default=15)
    ap.add_argument("--silk-delay", type=int, default=91,
                    help="fec-encode: samples of delay to align redundancy "
                         "with SILK-decoded frames (fec_encoder.py:88)")
    ap.add_argument("--extra-delay", type=int, default=0,
                    help="fec-encode: extra alignment delay in samples")
    ap.add_argument("--num-redundancy-frames", type=int, default=64,
                    help="fec-encode: redundancy depth in 20 ms frames; "
                         "sizes the zero history prepended so the first "
                         "packet has a full span (fec_encoder.py:91)")
    ap.add_argument("--no-align", action="store_true",
                    help="fec-encode: skip the SILK delay / zero-history "
                         "padding (raw per-frame packets)")
    ns = ap.parse_args(argv)

    # the reference demo always runs its built-in model data; mirror that
    # by defaulting the vocoder model to the shipped demo checkpoint
    # ("random" keeps the old deterministic smoke-test init)
    vocoder_default = (ns.mode in ("decode", "synthesis")
                       # the shipped demo vocoder has lookahead=2; the
                       # non-causal PLC modes require a lookahead-0 model
                       or (ns.mode == "plc"
                           and ns.args[0].startswith("causal")))
    if ns.model is None and vocoder_default:
        import os as _os
        demo = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "data", "demo_model.npz")
        if _os.path.exists(demo):
            ns.model = demo
    elif ns.model == "random":
        ns.model = None

    if ns.mode == "encode":
        pcm = _read_pcm(ns.args[0])
        enc = api.lpcnet_encoder_create()
        n = len(pcm) // LPCNET_PACKET_SAMPLES
        with open(ns.args[1], "wb") as f:
            for t in range(n):
                pkt = api.lpcnet_encode(
                    enc, pcm[t * LPCNET_PACKET_SAMPLES:(t + 1) * LPCNET_PACKET_SAMPLES])
                f.write(pkt.tobytes())
        print(f"encoded {n} packets ({n * 8} bytes, {n * 40} ms)")

    elif ns.mode == "decode":
        data = np.fromfile(ns.args[0], dtype=np.uint8)
        n = len(data) // LPCNET_COMPRESSED_SIZE
        dec = api.lpcnet_decoder_create(ns.model)
        out = [np.zeros(0, np.int16)]
        for t in range(n):
            out.append(api.lpcnet_decode(
                dec, data[t * 8:(t + 1) * 8]))
        np.concatenate(out).astype(np.int16).tofile(ns.args[1])
        print(f"decoded {n} packets -> {n * LPCNET_PACKET_SAMPLES} samples")

    elif ns.mode == "features":
        pcm = _read_pcm(ns.args[0])
        enc = api.lpcnet_encoder_create()
        n = len(pcm) // FRAME_SIZE
        rows = []
        for t in range(n):
            rows.append(api.lpcnet_compute_single_frame_features(
                enc, pcm[t * FRAME_SIZE:(t + 1) * FRAME_SIZE]))
        np.stack(rows).astype(np.float32).tofile(ns.args[1])
        print(f"wrote {n} feature frames")

    elif ns.mode == "synthesis":
        feats = np.fromfile(ns.args[0], dtype=np.float32)
        n = len(feats) // NB_TOTAL_FEATURES
        feats = feats[: n * NB_TOTAL_FEATURES].reshape(n, NB_TOTAL_FEATURES)
        if ns.sampling == "pdf":
            import jax
            import jax.numpy as jnp
            from .models import lpcnet as M
            fused, cfg = api.load_model(ns.model)
            fstate = M.init_frame_state(1, cfg)
            sstate = M.init_sample_state(1, cfg)

            @jax.jit
            def step(fstate, sstate, f, fused):
                fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, f, cfg)
                new_ss, pcm = M.synthesize_frame(
                    fused, sstate, ca, cb, lpc, pdf_corr=f[:, 19])
                live = fstate.frame_count > cfg.lookahead
                sel = lambda a, b: jnp.where(
                    live.reshape(live.shape + (1,) * (a.ndim - 1)), a, b)
                return fstate, jax.tree.map(sel, new_ss, sstate), \
                    jnp.where(live[:, None], pcm, 0.0)

            out = []
            for t in range(n):
                fstate, sstate, pcm = step(
                    fstate, sstate, jnp.asarray(feats[t][None]), fused)
                out.append(np.asarray(pcm)[0])
        else:
            synth = api.Synthesizer(ns.model, batch=1)
            out = []
            for t in range(n):
                out.append(synth.synthesize(feats[t][None])[0])
        np.concatenate(out).astype(np.int16).tofile(ns.args[1])
        print(f"synthesized {n} frames ({n * FRAME_SIZE} samples)")

    elif ns.mode == "addlpc":
        feats = np.fromfile(ns.args[0], dtype=np.float32)
        n = len(feats) // 36
        out = api.add_lpc_to_features(feats[: n * 36].reshape(n, 36))
        out.astype(np.float32).tofile(ns.args[1])
        print(f"added LPC to {n} frames")

    elif ns.mode == "dred-encode":
        # pcm -> latent symbols + decoder-init states (f32 files), mirroring
        # training_tf2/encode_rdovae.py
        import jax
        from .dred.coder import DREDEncoder
        from .models import rdovae as RV
        pcm = _read_pcm(ns.args[0])
        params = (RV.init_params(jax.random.PRNGKey(0), RV.RDOVAEConfig())
                  if ns.model is None else _load_rdovae(ns.model))
        enc = api.lpcnet_encoder_create()
        dred = DREDEncoder(params)
        n = len(pcm) // FRAME_SIZE
        for t in range(n):
            f = api.lpcnet_compute_single_frame_features(
                enc, pcm[t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            dred.add_feature_frame(f[None, :20])
        z = np.concatenate(dred.latents, 0) if dred.latents else np.zeros((0, 80))
        st = np.concatenate(dred.init_states, 0)
        z.astype(np.float32).tofile(ns.args[1])
        st.astype(np.float32).tofile(ns.args[1] + ".state")
        print(f"dred-encode: {len(dred.latents)} latents")

    elif ns.mode == "dred-decode":
        import jax
        from .dred.coder import DREDDecoder
        from .models import rdovae as RV
        cfg = RV.RDOVAEConfig()
        params = (RV.init_params(jax.random.PRNGKey(0), cfg)
                  if ns.model is None else _load_rdovae(ns.model))
        z = np.fromfile(ns.args[0], np.float32).reshape(1, -1, cfg.latent_dim)
        st = np.fromfile(ns.args[0] + ".state", np.float32).reshape(1, -1, cfg.state_dim)
        dec = DREDDecoder(params, cfg)
        # decode from the newest state over every 2nd latent (dec stride)
        zsel = z[:, ::-2][:, ::-1]
        feats = dec.decode_all(zsel, np.zeros(zsel.shape[1], np.int32), st[:, -1])
        feats[0].astype(np.float32).tofile(ns.args[1])
        print(f"dred-decode: {feats.shape[1]} feature frames")

    elif ns.mode == "dred-payload":
        # pcm -> one entropy-coded redundancy payload (an actual bitstream,
        # the part the reference delegates to its downstream consumer)
        import jax
        from .dred.coder import DREDEncoder
        from .models import rdovae as RV
        pcm = _read_pcm(ns.args[0])
        params = (RV.init_params(jax.random.PRNGKey(0), RV.RDOVAEConfig())
                  if ns.model is None else _load_rdovae(ns.model))
        enc = api.lpcnet_encoder_create()
        dred = DREDEncoder(params)
        n = len(pcm) // FRAME_SIZE
        for t in range(n):
            f = api.lpcnet_compute_single_frame_features(
                enc, pcm[t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            dred.add_feature_frame(f[None, :20])
        out = dred.produce_payload(num_redundancy_frames=ns.dred_frames,
                                   q0=ns.q0, q1=ns.q1)
        if out is None:
            print("input too short for requested redundancy depth")
            return 1
        payload = out["payloads"][0]
        with open(ns.args[1], "wb") as f:
            f.write(payload)
        kbps = len(payload) * 8 / (ns.dred_frames * 0.010) / 1000
        print(f"dred-payload: {len(payload)} bytes covering "
              f"{ns.dred_frames * 10} ms ({kbps:.2f} kbps redundancy)")

    elif ns.mode == "dred-payload-decode":
        import jax
        from .dred.coder import DREDDecoder
        from .models import rdovae as RV
        cfg = RV.RDOVAEConfig()
        params = (RV.init_params(jax.random.PRNGKey(0), cfg)
                  if ns.model is None else _load_rdovae(ns.model))
        with open(ns.args[0], "rb") as f:
            payload = f.read()
        dec = DREDDecoder(params, cfg)
        feats = dec.decode_payload(payload)
        feats[0].astype(np.float32).tofile(ns.args[1])
        print(f"dred-payload-decode: {feats.shape[1]} feature frames "
              f"(newest first)")

    elif ns.mode == "fec-encode":
        # pcm -> .fec packet file of DRED-roundtripped redundancy features,
        # one packet per 20 ms (the torch fec_encoder.py tool equivalent:
        # per-packet quantize -> unquantize -> decode). Feed to the PLC via
        # plc.driver.run_plc_fec_stream.
        import jax
        from .dred.coder import DREDDecoder, DREDEncoder, quantize_latents
        from .dred.fec_file import write_fec_packets
        from .models import rdovae as RV
        cfg = RV.RDOVAEConfig()
        pcm = _read_pcm(ns.args[0])
        if not ns.no_align:
            # input alignment (training_tf2/fec_encoder.py:82-115): 91
            # samples to line up with SILK-decoded frames, a zero history
            # long enough that the first packet has a full redundancy span,
            # minus the feature pipeline's own 10 ms delay; right-pad the
            # tail to a whole 20 ms frame
            frame20 = 2 * FRAME_SIZE
            zero_history = (ns.num_redundancy_frames - 1) * frame20
            total_delay = (ns.silk_delay + zero_history + ns.extra_delay
                           - FRAME_SIZE)
            right = (-(len(pcm) + total_delay)) % frame20
            pcm = np.concatenate([
                np.zeros(total_delay, pcm.dtype), pcm,
                np.zeros(right, pcm.dtype)])
        params = (RV.init_params(jax.random.PRNGKey(0), cfg)
                  if ns.model is None else _load_rdovae(ns.model))
        enc = api.lpcnet_encoder_create()
        dred = DREDEncoder(params, cfg)
        dec = DREDDecoder(params, cfg)
        n = len(pcm) // FRAME_SIZE
        packets, rates = [], []
        import numpy as _np
        for t in range(n):
            f = api.lpcnet_compute_single_frame_features(
                enc, pcm[t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            dred.add_feature_frame(f[None, :20])
            if t % 2 == 1 and dred.latents:
                # newest latent -> its own 2 frames at the requested q0
                import jax.numpy as jnp
                z = jnp.asarray(_np.asarray(dred.latents[-1])[:, None])
                q = _np.array([ns.q0], _np.int32)
                zq, rate = quantize_latents(params, z, jnp.asarray(q), cfg)
                feats = dec.decode_all(_np.asarray(zq), q,
                                       _np.asarray(dred.init_states[-1]))
                # decoded frames are reverse-time; indices [1, 0] are this
                # packet's two frames
                packets.append(_np.asarray(feats[0, :2][::-1]))
                rates.append(int(_np.asarray(rate).sum()))
        write_fec_packets(ns.args[1], packets, rates)
        print(f"fec-encode: {len(packets)} packets "
              f"(mean {np.mean(rates):.0f} bits/packet estimate)")

    elif ns.mode == "plc":
        from .plc.driver import run_plc_file
        run_plc_file(ns.args[0], ns.args[1], ns.args[2], ns.args[3],
                     model_path=ns.model)

    return 0


if __name__ == "__main__":
    sys.exit(main())
