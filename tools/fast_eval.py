#!/usr/bin/env python3
"""Fast analysis/synthesis eval: band log-spectral distance, batched.

Splits the clip into segments and runs them as one stream batch (each
segment warm-starts from silence; the edge effect is identical across
models being compared), so the whole eval is ~2 orders of magnitude fewer
device dispatches than tools/eval_demo.py's per-frame single-stream loop --
the difference matters through a remote-dispatch transport.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_lsd(a, b):
    from lpcnet_tpu.utils.quality import quality_metrics
    return quality_metrics(a, b)["band_lsd_db"]


_STEP_CACHE = {}


def _eval_step(cfg):
    """Module-level jitted step cache so a multi-model sweep (same arch)
    compiles ONCE — each tunnel compile costs minutes, and fused params are
    jit arguments (never closure constants, NOTES.md dispatch poisoning)."""
    if cfg in _STEP_CACHE:
        return _STEP_CACHE[cfg]
    import jax
    from lpcnet_tpu.codec import features as F
    from lpcnet_tpu.models import lpcnet as M

    @jax.jit
    def step(enc, fstate, sstate, fused, pcm_frame):
        enc, feats = F.compute_single_frame_features(enc, pcm_frame)
        fstate, _, ca, cb, lpc = M.frame_network(fused, fstate, feats, cfg)
        sstate, out = M.synthesize_frame(fused, sstate, ca, cb, lpc)
        return enc, fstate, sstate, out

    _STEP_CACHE[cfg] = step
    return step


def eval_model(model_path, pcm, segments=8):
    import jax
    import jax.numpy as jnp
    from lpcnet_tpu.codec import features as F
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.weights.checkpoint import load_checkpoint

    params, cfg = load_checkpoint(model_path)
    fused = M.fuse_inference_params(params, cfg)
    n = len(pcm) // (segments * 160) * segments * 160
    if n == 0:
        raise ValueError(
            f"audio too short: need >= {segments * 160} samples "
            f"({segments} segments x 10 ms), got {len(pcm)}")
    seg = np.asarray(pcm[:n], np.float32).reshape(segments, -1)
    frames = seg.reshape(segments, -1, 160)
    t = frames.shape[1]

    enc = F.init_encoder_state(segments)
    fstate = M.init_frame_state(segments, cfg)
    sstate = M.init_sample_state(segments, cfg)
    step = _eval_step(cfg)

    outs = []
    for k in range(t):
        enc, fstate, sstate, out = step(enc, fstate, sstate, fused,
                                        jnp.asarray(frames[:, k]))
        outs.append(out)
    np.asarray(outs[-1][0, :4])
    synth = np.stack([np.asarray(o) for o in outs], axis=1)  # [S, T, 160]
    # features lead synthesis by lookahead frames; compare aligned region
    la = cfg.lookahead * 160
    orig = seg[:, :]
    syn = synth.reshape(segments, -1)
    if la:
        orig, syn = orig[:, :-la], syn[:, la:]
    from lpcnet_tpu.utils.quality import quality_metrics
    per_seg = [quality_metrics(orig[s], syn[s]) for s in range(segments)]
    return {k: float(np.mean([m[k] for m in per_seg])) for k in per_seg[0]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--audio", required=True)
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    pcm = np.fromfile(args.audio, np.int16)[: int(args.seconds * 16000)]
    from lpcnet_tpu.utils.quality import format_metrics
    m = eval_model(args.model, pcm)
    print(f"{args.model}: {format_metrics(m)}")


if __name__ == "__main__":
    main()
