"""Held-out validation for vocoder training runs.

Round-3 negative result (BENCHMARKS.md "Round-3 quality runs"): a 100k-step
run degraded held-out quality monotonically while train loss fell, and
nothing caught it because the trainer tracked only train loss.  The
reference is equally blind (training_tf2/train_lpcnet.py saves every epoch,
no eval), but the reference ships known-good weights; this repo has to earn
them, so training needs an in-loop quality signal.

`HeldOutValidator` holds a few fixed held-out clips, precomputes their
feature tracks ONCE (analysis is model-independent), and on `evaluate`
runs the full analysis/synthesis loop as ONE jitted scan over frames --
a single device dispatch per eval regardless of clip length, so the eval
costs ~a second on chip and can run every N training steps.  Metrics are
the repo's standard intrusive proxies (band-LSD / MCD / fwSegSNR,
utils/quality.py); synthesis sampling is deterministic (the sampler RNG
lives in SampleState and starts from the same seed each eval), so the
val curve is comparable step to step.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

FRAME = 160


class HeldOutValidator:
    """Fixed-clip analysis/synthesis eval sharing one compiled step.

    Args:
      cfg: LPCNetConfig of the model under training.
      clips: held-out PCM clips (int16 arrays); each is sliced into
        `seg_seconds` segments and all segments run as one stream batch.
      seg_seconds: segment length; each segment warm-starts from silence
        (the edge effect is identical across checkpoints being compared).
    """

    def __init__(self, cfg, clips: Sequence[np.ndarray],
                 seg_seconds: float = 2.0):
        import jax
        import jax.numpy as jnp

        from ..codec import features as F
        from ..models import lpcnet as M

        self.cfg = cfg
        seg_len = int(seg_seconds * 16000) // FRAME * FRAME
        segs = []
        self._clip_of_seg: List[int] = []
        for ci, clip in enumerate(clips):
            pcm = np.asarray(clip, np.float32)
            n = len(pcm) // seg_len
            if n == 0:
                raise ValueError(
                    f"clip {ci} too short: need >= {seg_len} samples")
            segs.append(pcm[: n * seg_len].reshape(n, seg_len))
            self._clip_of_seg += [ci] * n
        self._orig = np.concatenate(segs, axis=0)           # [B, S]
        b, s = self._orig.shape
        self._t = s // FRAME

        # analysis once: features don't depend on model params
        enc = F.init_encoder_state(b)
        _, feats = F.compute_single_frame_features_seq(
            enc, jnp.asarray(self._orig))
        self._features = jax.device_put(np.asarray(feats))  # [B, T, 36]
        self._b = b

        cfg_ = cfg

        def synth_all(params, features):
            fused = M.fuse_inference_params(params, cfg_)
            fstate = M.init_frame_state(b, cfg_)
            sstate = M.init_sample_state(b, cfg_)

            def step(carry, feats_t):
                fst, sst = carry
                fst, _, ca, cb, lpc = M.frame_network(fused, fst, feats_t,
                                                      cfg_)
                sst, pcm = M.synthesize_frame(fused, sst, ca, cb, lpc)
                return (fst, sst), pcm

            _, pcm = jax.lax.scan(step, (fstate, sstate),
                                  jnp.moveaxis(features, 1, 0))
            return jnp.moveaxis(pcm, 0, 1).reshape(b, -1)   # [B, S]

        self._synth = jax.jit(synth_all)

    def evaluate(self, params) -> Dict[str, float]:
        """Mean quality metrics over all held-out segments (lower
        band-LSD/MCD is better; higher fwSegSNR is better)."""
        from ..utils.quality import quality_metrics

        syn = np.asarray(self._synth(params, self._features))
        la = self.cfg.lookahead * FRAME
        orig, syn = self._orig, syn
        if la:
            orig, syn = orig[:, :-la], syn[:, la:]
        per_seg = [quality_metrics(orig[i], syn[i])
                   for i in range(self._b)]
        return {k: float(np.mean([m[k] for m in per_seg]))
                for k in per_seg[0]}

    def evaluate_per_clip(self, params) -> List[Dict[str, float]]:
        """Per-clip means (for spotting clip-specific regressions)."""
        from ..utils.quality import quality_metrics

        syn = np.asarray(self._synth(params, self._features))
        la = self.cfg.lookahead * FRAME
        orig = self._orig
        if la:
            orig, syn = orig[:, :-la], syn[:, la:]
        per_seg = [quality_metrics(orig[i], syn[i])
                   for i in range(self._b)]
        n_clips = max(self._clip_of_seg) + 1
        out = []
        for ci in range(n_clips):
            ms = [m for m, c in zip(per_seg, self._clip_of_seg) if c == ci]
            out.append({k: float(np.mean([m[k] for m in ms]))
                        for k in ms[0]})
        return out


class BestTracker:
    """Best-checkpoint selection on a validation scalar (lower = better)."""

    def __init__(self, metric: str = "band_lsd_db"):
        self.metric = metric
        self.best: Optional[float] = None
        self.best_step: Optional[int] = None

    def update(self, step: int, metrics: Dict[str, float]) -> bool:
        v = metrics[self.metric]
        if self.best is None or v < self.best:
            self.best, self.best_step = v, step
            return True
        return False
