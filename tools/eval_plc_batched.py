#!/usr/bin/env python3
"""Fast PLC concealment eval: all clips as one batched-PLC run per model.

eval_plc_demo drives the host-mirror PLC one 10 ms frame per dispatch
(~5 min per 6 s clip through the tunnel); this tool runs the SAME
workload through plc.batched.BatchedPLC -- every clip a stream, 25
frames per dispatch -- in seconds, making multi-seed training sweeps
evaluable.  The batched step is C-golden-gated against the host mirror
(tests/test_plc_batched.py), so the scores are protocol-comparable; the
loss patterns are the same burst generator as eval_plc_demo (seed 3).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def burst_losses(n_packets: int, seed: int = 3) -> np.ndarray:
    """eval_plc_demo's burst pattern: periodic 1-2 packet bursts, ~15%."""
    rng = np.random.RandomState(seed)
    losses = np.zeros(n_packets, np.int32)
    i = 8
    while i < n_packets - 2:
        if rng.rand() < 0.12:
            losses[i] = 1
            if rng.rand() < 0.4:
                losses[i + 1] = 1
            i += 4
        i += 1
    return losses


class ConcealmentValidator:
    """In-training-loop concealment eval: score PLC params by the
    DEPLOYMENT metric (band-LSD over concealed packets, batched PLC run
    over held-out clips) instead of the masked feature loss -- the round-5
    sweep showed val loss does not rank concealment across runs.

    One BatchedPLC instance is built per vocoder model and reused; params
    ride as jit arguments so re-evaluating new checkpoints costs no
    recompile.  Use selection clips DISJOINT from the final eval suite
    (selection bias).
    """

    def __init__(self, clips, model_path="lpcnet_tpu/data/demo_model.npz",
                 seconds: float = 6.0, seed: int = 3):
        import jax.numpy as jnp
        from lpcnet_tpu.api import load_model
        from lpcnet_tpu.models import plc as PM
        from lpcnet_tpu.plc.batched import BatchedPLC

        n = int(seconds * 16000) // 320 * 320
        pcms = []
        for c in clips:
            x = (np.fromfile(c, np.int16) if isinstance(c, str)
                 else np.asarray(c, np.int16))[:n].astype(np.float32)
            assert len(x) == n
            pcms.append(x)
        self.pcm = np.stack(pcms)
        b = self.pcm.shape[0]
        self.losses_pkt = np.stack(
            [burst_losses(n // 320, seed=seed) for _ in range(b)])
        self._lost_frames = jnp.asarray(
            np.repeat(self.losses_pkt, 2, axis=1).astype(bool))
        self._frames = jnp.asarray(self.pcm.reshape(b, -1, 160))
        fused, cfg = load_model(model_path)
        self._plc = BatchedPLC(fused, cfg, PM.init_params(
            __import__("jax").random.PRNGKey(0)), batch=b)
        self._init_state = self._plc.state
        self._mask = np.repeat(self.losses_pkt.astype(bool), 320, axis=1)

    def evaluate(self, plc_params) -> float:
        """Mean concealment band-LSD (dB, lower better) over the clips."""
        from lpcnet_tpu.utils.quality import quality_metrics
        self._plc.plc_params = plc_params
        self._plc.state = self._init_state
        out = self._plc.run(self._frames, self._lost_frames, chunk=25)
        out = out.reshape(self.pcm.shape[0], -1)
        vals = [quality_metrics(self.pcm[i][self._mask[i]],
                                out[i][self._mask[i]])["band_lsd_db"]
                for i in range(self.pcm.shape[0])]
        return float(np.mean(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", nargs="+",
                    default=["artifacts/clip1234.s16", "artifacts/clip4321.s16",
                             "artifacts/clip9999.s16", "artifacts/clip7777.s16"])
    ap.add_argument("--plc-models", nargs="+",
                    default=["lpcnet_tpu/data/demo_plc_model.npz"])
    ap.add_argument("--model", default="lpcnet_tpu/data/demo_model.npz")
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.plc.batched import BatchedPLC
    from lpcnet_tpu.utils.quality import quality_metrics
    from lpcnet_tpu.weights.checkpoint import load_checkpoint
    from lpcnet_tpu.api import load_model

    n = int(args.seconds * 16000) // 320 * 320
    pcms = []
    for c in args.clips:
        x = np.fromfile(c, np.int16)[:n].astype(np.float32)
        assert len(x) == n, f"{c} shorter than {args.seconds}s"
        pcms.append(x)
    pcm = np.stack(pcms)                                   # [B, n]
    b = pcm.shape[0]
    n_packets = n // 320
    losses_pkt = np.stack([burst_losses(n_packets) for _ in range(b)])
    lost_frames = np.repeat(losses_pkt, 2, axis=1)         # [B, T frames]
    frames = pcm.reshape(b, -1, 160)

    fused, cfg = load_model(args.model)

    results = {}
    for mp in args.plc_models:
        plc_params, _ = load_checkpoint(mp)
        plc = BatchedPLC(fused, cfg, plc_params, batch=b)
        out = plc.run(frames, lost_frames, chunk=25)       # [B, T, 160]
        out = out.reshape(b, -1)
        mask = np.repeat(losses_pkt.astype(bool), 320, axis=1)
        per_clip = []
        for i in range(b):
            m = quality_metrics(pcm[i][mask[i]], out[i][mask[i]])
            per_clip.append(m["band_lsd_db"])
        mean = float(np.mean(per_clip))
        results[mp] = (per_clip, mean)
        print(f"{mp}: mean {mean:.3f} dB | " +
              " ".join(f"{os.path.basename(c)}:{v:.2f}"
                       for c, v in zip(args.clips, per_clip)), flush=True)
    best = min(results, key=lambda k: results[k][1])
    print(f"best: {best} ({results[best][1]:.3f} dB)")


if __name__ == "__main__":
    main()
