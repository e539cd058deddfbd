"""RDO-VAE training: dataset, DP train step, driver.

Mirrors torch/rdovae/train_rdovae.py: Adam(0.9, 0.99, eps=1e-8) with
1/(1 + 2.5e-5 t) LR decay, per-sequence lambda sampled from the 16 quant
levels (dataset.py:61-67), weight clipping at 0.496, loss =
soft_rate + 0.1*hard_rate (sqrt(lambda)-weighted) + mean of hard/soft
distortions over stride-congruent decoder chunks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import rdovae as RV
from ..parallel import mesh as pmesh
from .sparsify import weight_clip_constraint


@dataclasses.dataclass(frozen=True)
class RDOVAETrainConfig:
    batch_size: int = 32
    sequence_length: int = 256
    lr: float = 3e-4
    lr_decay: float = 2.5e-5
    epochs: int = 100
    lambda_min: float = 2e-4
    lambda_max: float = 0.0104
    weight_clip: float = 0.496
    state_dropout_rate: float = 0.0   # fault injection: drop decoder inits


class RDOVAEDataset:
    """Feature-file dataset with per-sequence lambda/q sampling."""

    def __init__(self, feature_path: str, tc: RDOVAETrainConfig,
                 cfg: RV.RDOVAEConfig, num_features: int = 36, seed: int = 0,
                 val_seqs: int = 0):
        feats = np.fromfile(feature_path, dtype=np.float32).reshape(-1, num_features)
        self.features = feats[:, : cfg.num_features]
        self.tc = tc
        self.cfg = cfg
        nseq = self.features.shape[0] // tc.sequence_length
        # the LAST val_seqs sequences are held out of training entirely
        self.num_sequences = nseq - val_seqs
        self._val_range = (self.num_sequences, nseq) if val_seqs else None
        self.denominator = (cfg.quant_levels - 1) / np.log(tc.lambda_max / tc.lambda_min)
        self._rng = np.random.RandomState(seed)

    def val_batch(self, q: int) -> Optional[Dict[str, np.ndarray]]:
        """The held-out sequences at a FIXED quant level q (deterministic:
        the same batch every call, so val curves are step-comparable and
        rate-distortion points across q are measured on identical data)."""
        if self._val_range is None:
            return None
        lo, hi = self._val_range
        sl = self.tc.sequence_length
        feats = np.stack([self.features[s * sl:(s + 1) * sl]
                          for s in range(lo, hi)])
        bs = feats.shape[0]
        q_ids = np.full((bs, sl // self.cfg.enc_frames_per_step), q)
        lam = self.tc.lambda_min * np.exp(q_ids / self.denominator)
        return {"features": feats.astype(np.float32),
                "rate_lambda": lam.astype(np.float32),
                "q_ids": q_ids.astype(np.int32)}

    def __len__(self):
        return max(self.num_sequences // self.tc.batch_size, 0)

    def __iter__(self):
        order = self._rng.permutation(self.num_sequences)
        bs, sl = self.tc.batch_size, self.tc.sequence_length
        for i in range(len(self)):
            sel = order[i * bs:(i + 1) * bs]
            feats = np.stack([self.features[s * sl:(s + 1) * sl] for s in sel])
            q = self._rng.randint(0, self.cfg.quant_levels, (bs, 1))
            q_ids = np.repeat(q, sl // self.cfg.enc_frames_per_step, axis=1)
            lam = self.tc.lambda_min * np.exp(q_ids / self.denominator)
            yield {"features": feats.astype(np.float32),
                   "rate_lambda": lam.astype(np.float32),
                   "q_ids": q_ids.astype(np.int32)}


class RDOVAETrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def clip_rdovae_weights(params, c: float):
    """Apply the pairwise weight clip to every 2-D kernel (torch
    rdovae.py:201-223 clips Linear + GRU weights)."""
    def clip(path_leaf):
        return path_leaf

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif v.ndim == 2:
                out[k] = weight_clip_constraint(v, c)
            else:
                out[k] = v
        return out

    return walk(params)


class RDOVAETrainer:
    def __init__(self, cfg: Optional[RV.RDOVAEConfig] = None,
                 tc: Optional[RDOVAETrainConfig] = None, seed: int = 0,
                 mesh=None):
        self.cfg = cfg or RV.RDOVAEConfig()
        self.tc = tc or RDOVAETrainConfig()
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        params = RV.init_params(jax.random.PRNGKey(seed), self.cfg)
        sched = lambda t: self.tc.lr / (1.0 + self.tc.lr_decay * t)
        self.optimizer = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-8)
        self.state = RDOVAETrainState(params, self.optimizer.init(params),
                                      jnp.zeros((), jnp.int32))

        def step_fn(state: RDOVAETrainState, batch, rng):
            def loss(p):
                return RV.rdovae_loss(p, batch["features"], batch["rate_lambda"],
                                      batch["q_ids"], rng, self.cfg,
                                      self.tc.state_dropout_rate)
            (_, metrics), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            params = clip_rdovae_weights(params, self.tc.weight_clip)
            return RDOVAETrainState(params, opt_state, state.step + 1), metrics

        self._step = jax.jit(step_fn, donate_argnums=(0,))

        def eval_fn(params, batch):
            _, metrics = RV.rdovae_loss(
                params, batch["features"], batch["rate_lambda"],
                batch["q_ids"], jax.random.PRNGKey(0), self.cfg, 0.0)
            return metrics

        self._eval = jax.jit(eval_fn)
        self.state = jax.device_put(self.state, pmesh.replicated(self.mesh))

    def eval_step(self, batch, params=None) -> Dict[str, float]:
        """Loss metrics on a held-out batch, no update, deterministic rng
        (soft-quant noise fixed) -- step-comparable val curves."""
        params = self.state.params if params is None else params
        batch = pmesh.shard_batch(self.mesh, {k: jnp.asarray(v)
                                              for k, v in batch.items()})
        return {k: float(v) for k, v in self._eval(params, batch).items()}

    def train_step(self, batch: Dict[str, np.ndarray], rng) -> Dict[str, float]:
        batch = pmesh.shard_batch(self.mesh, {k: jnp.asarray(v)
                                              for k, v in batch.items()})
        self.state, metrics = self._step(self.state, batch, rng)
        # device scalars; callers fetch at log intervals (see
        # train_lpcnet.Trainer.train_step)
        return dict(metrics)

    def fit(self, loader, epochs: Optional[int] = None, log_every: int = 20,
            checkpoint_path: Optional[str] = None, logdir: Optional[str] = None):
        metrics_log = None
        if logdir is not None:
            from ..utils.profiling import MetricsLogger
            import os as _os
            metrics_log = MetricsLogger(_os.path.join(logdir, "rdovae_metrics.jsonl"))
        from ..weights.checkpoint import flatten_tree
        rng = jax.random.PRNGKey(42)
        for epoch in range(epochs or self.tc.epochs):
            for i, batch in enumerate(loader):
                rng, sub = jax.random.split(rng)
                m = self.train_step(batch, sub)
                if metrics_log is not None:
                    metrics_log.log_async(step=i, epoch=epoch, **m)
                if i % log_every == 0:
                    if metrics_log is not None:
                        metrics_log.flush_async()
                    msg = " ".join(f"{k}={float(v):.4f}" for k, v in m.items())
                    print(f"rdovae epoch {epoch} step {i}: {msg}", flush=True)
            if metrics_log is not None:
                metrics_log.flush_async()
            if checkpoint_path:
                flat = flatten_tree(jax.device_get(self.state.params))
                np.savez(f"{checkpoint_path}_{epoch + 1:02d}.npz", **flat)
        return self.state
