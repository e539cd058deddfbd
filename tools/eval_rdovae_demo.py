#!/usr/bin/env python3
"""RDO-VAE quality A/B: hard-quantized distortion + rate on held-out
features for one or more checkpoints (the training objective's eval twin;
cf. torch/rdovae/train_rdovae.py loss reporting)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import rdovae as RV
    from lpcnet_tpu.train.dump_data import dump_data
    from lpcnet_tpu.weights.checkpoint import load_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default="artifacts/eval_clip.s16")
    ap.add_argument("--models", nargs="+",
                    default=["lpcnet_tpu/data/demo_rdovae_model.npz"])
    ap.add_argument("--q", type=int, default=8, help="quant level index")
    args = ap.parse_args()

    feat_path = args.clip + ".rdovae_feats.f32"
    if not os.path.exists(feat_path):
        speech = np.fromfile(args.clip, np.int16)
        dump_data(speech, feat_path, None, chunk_frames=800)
    feats = np.fromfile(feat_path, np.float32).reshape(-1, 36)[:, :20]
    cfg = RV.RDOVAEConfig()
    from lpcnet_tpu.train.train_rdovae import RDOVAETrainConfig
    tc = RDOVAETrainConfig()
    sl = 256
    n = len(feats) // sl * sl
    f = jnp.asarray(feats[:n].reshape(-1, sl, 20))
    bs = f.shape[0]
    denom = (cfg.quant_levels - 1) / np.log(tc.lambda_max / tc.lambda_min)
    q_ids = np.full((bs, sl // cfg.enc_frames_per_step), args.q, np.int32)
    lam = (tc.lambda_min * np.exp(q_ids / denom)).astype(np.float32)

    for path in args.models:
        params, _ = load_checkpoint(path)
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
        rng = jax.random.PRNGKey(0)
        _, m = RV.rdovae_loss(params, f, jnp.asarray(lam),
                              jnp.asarray(q_ids), rng, cfg)
        vals = {k: float(v) for k, v in m.items()}
        print(path, " ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items())))


if __name__ == "__main__":
    main()
