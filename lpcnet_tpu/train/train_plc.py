"""PLC model training: loss-trace simulation, masked losses, DP step.

Mirrors training_tf2/train_plc.py + plc_loader.py: sequences of
[burg(36) | features(20)] rows, packet-loss traces applied as input masks
with 10% random Burg dropout, and a composite masked loss (L1 + band-domain
IDCT L1 + clipped pitch terms + one-sided correlation penalty) that only
scores the frames the model had to predict (mask = lost frames).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..dsp.spectrum import idct
from ..models import plc as PM
from ..parallel import mesh as pmesh
from .sparsify import weight_clip_constraint

NB_BURG = 36
NB_USED = 20


@dataclasses.dataclass(frozen=True)
class PLCTrainConfig:
    batch_size: int = 128
    seq_length: int = 1000
    lr: float = 1e-3
    decay: float = 2.5e-5
    epochs: int = 120
    band_loss: float = 1.0
    loss_bias: float = 0.0
    quantize: bool = False


def plc_loss(y_true, mask, y_pred, alpha: float = 1.0, bias: float = 0.0):
    """Composite masked loss (train_plc.py:100-109).

    Args: y_true [B, T, 20], mask [B, T, 1] (1 = frame was lost), y_pred.
    """
    e = (y_pred - y_true) * mask
    e_bands = idct(e[..., :18])
    bias_mask = jnp.clip(4.0 * y_true[..., 19:20], 0.0, 1.0)
    l1 = jnp.mean(jnp.abs(e))
    corr_one_sided = 0.1 * jnp.mean(jax.nn.relu(-e[..., 19:20]))
    band = alpha * jnp.mean(jnp.abs(e_bands) + bias * bias_mask * jax.nn.relu(e_bands))
    pitch1 = jnp.mean(jnp.minimum(jnp.abs(e[..., 18:19]), 1.0))
    pitch2 = 8.0 * jnp.mean(jnp.minimum(jnp.abs(e[..., 18:19]), 0.4))
    return l1 + corr_one_sided + band + pitch1 + pitch2


def plc_metrics(y_true, mask, y_pred):
    e = (y_pred - y_true) * mask
    return {
        "l1": jnp.mean(jnp.abs(e)),
        "ceps": jnp.mean(jnp.abs(e[..., :18])),
        "band": jnp.mean(jnp.abs(idct(e[..., :18]))),
        "pitch": jnp.mean(jnp.minimum(jnp.abs(e[..., 18:19]), 0.4)),
    }


class PLCLoader:
    """Loss-trace fault-injection loader (plc_loader.py:31-73).

    features file rows: [burg(36) | used(20) | lpc(16)] per frame
    (produced by dump_data(..., burg=True)); lost file: int8 0/1 per frame
    (0 = lost).
    """

    def __init__(self, feature_path: str, lost_path: str, tc: PLCTrainConfig,
                 seed: int = 0, val_seqs: int = 0):
        nb_features = NB_BURG + NB_USED + 16
        feats = np.fromfile(feature_path, dtype=np.float32)
        nseq = len(feats) // (nb_features * tc.seq_length)
        nseq_train = (nseq - val_seqs) // tc.batch_size * tc.batch_size
        feats = feats[: nseq * tc.seq_length * nb_features]
        all_feats = feats.reshape(nseq, tc.seq_length, nb_features)[
            :, :, : NB_BURG + NB_USED]
        # the LAST val_seqs sequences are held out of training entirely
        self.features = all_feats[:nseq_train]
        self._val_features = (all_feats[nseq - val_seqs:] if val_seqs else None)
        self.lost = np.fromfile(lost_path, dtype=np.int8).astype(np.float32)
        self.lost = self.lost[: (len(self.lost) // tc.seq_length - 1) * tc.seq_length]
        self.tc = tc
        self._rng = np.random.RandomState(seed)
        self.nb_batches = nseq_train // tc.batch_size
        self.on_epoch_end()

    def on_epoch_end(self):
        t = self.features.shape[1]
        self.indices = self._rng.permutation(self.features.shape[0])
        offset = self._rng.randint(0, t)
        self.lost_offset = self.lost[offset: len(self.lost) - t + offset].reshape(-1, t)
        self.lost_indices = self._rng.randint(0, self.lost_offset.shape[0],
                                              self.features.shape[0])

    def val_batch(self) -> Optional[Dict[str, np.ndarray]]:
        """The held-out batch with FIXED loss traces and burg dropout
        (deterministic: the same masks every call, so the val loss curve is
        step-comparable)."""
        if self._val_features is None:
            return None
        rng = np.random.RandomState(12345)
        feats = self._val_features
        b, t, _ = feats.shape
        burg_ok = (rng.rand(b, t, 1) > 0.1).astype(np.float32)
        lo = self.lost[: (len(self.lost) // t) * t].reshape(-1, t)
        lost = lo[rng.randint(0, lo.shape[0], b)][:, :, None]
        in_feats = feats * lost
        in_feats = in_feats.copy()
        in_feats[:, :, :NB_BURG] *= burg_ok
        flag = lost * (2 * burg_ok - 1)
        return {
            "plc_input": np.concatenate([in_feats, flag], axis=-1
                                        ).astype(np.float32),
            "target": feats[:, :, NB_BURG:].astype(np.float32),
            "mask": (1.0 - lost).astype(np.float32),
        }

    def __len__(self):
        return self.nb_batches

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        bs = self.tc.batch_size
        sel = self.indices[index * bs:(index + 1) * bs]
        feats = self.features[sel]
        b, t, _ = feats.shape
        burg_ok = (self._rng.rand(b, t, 1) > 0.1).astype(np.float32)
        lost = self.lost_offset[self.lost_indices[sel]][:, :, None]
        in_feats = feats * lost
        in_feats[:, :, :NB_BURG] *= burg_ok
        flag = lost * (2 * burg_ok - 1)
        return {
            "plc_input": np.concatenate([in_feats, flag], axis=-1).astype(np.float32),
            "target": feats[:, :, NB_BURG:].astype(np.float32),
            "mask": (1.0 - lost).astype(np.float32),
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class PLCTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class PLCTrainer:
    def __init__(self, plc_cfg: Optional[PM.PLCConfig] = None,
                 tc: Optional[PLCTrainConfig] = None, seed: int = 0, mesh=None):
        self.cfg = plc_cfg or PM.PLCConfig()
        self.tc = tc or PLCTrainConfig()
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        params = PM.init_params(jax.random.PRNGKey(seed), self.cfg)
        lr, decay = ((3e-5, 0.0) if self.tc.quantize
                     else (self.tc.lr, self.tc.decay))
        sched = lambda t: lr / (1.0 + decay * t)
        self.optimizer = optax.adam(sched, b1=0.9, b2=0.99, eps=1e-7)
        self.state = PLCTrainState(params, self.optimizer.init(params),
                                   jnp.zeros((), jnp.int32))

        tc = self.tc

        def step_fn(state: PLCTrainState, batch, rng):
            def loss(p):
                st0 = PM.init_state(batch["plc_input"].shape[0], self.cfg)
                _, pred = PM.predict_sequence(p, st0, batch["plc_input"])
                if rng is not None:
                    pass  # GaussianNoise(.005) between GRUs is folded into
                    # predict_sequence for training parity later if needed
                l = plc_loss(batch["target"], batch["mask"], pred,
                             tc.band_loss, tc.loss_bias)
                return l, plc_metrics(batch["target"], batch["mask"], pred)

            (l, metrics), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
            updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
            params = optax.apply_updates(state.params, updates)
            # WeightClip(0.992) on both GRUs' kernels + recurrents
            for g in ("plc_gru1", "plc_gru2"):
                params[g] = dict(params[g],
                                 kernel=weight_clip_constraint(params[g]["kernel"]),
                                 recurrent=weight_clip_constraint(params[g]["recurrent"]))
            metrics["loss"] = l
            return PLCTrainState(params, opt_state, state.step + 1), metrics

        self._step = jax.jit(step_fn, donate_argnums=(0,))

        def eval_fn(params, batch):
            st0 = PM.init_state(batch["plc_input"].shape[0], self.cfg)
            _, pred = PM.predict_sequence(params, st0, batch["plc_input"])
            l = plc_loss(batch["target"], batch["mask"], pred,
                         tc.band_loss, tc.loss_bias)
            m = plc_metrics(batch["target"], batch["mask"], pred)
            m["loss"] = l
            return m

        self._eval = jax.jit(eval_fn)
        self.state = jax.device_put(self.state, pmesh.replicated(self.mesh))

    def eval_step(self, batch) -> Dict[str, float]:
        """Masked val loss/metrics on a held-out batch (no update); batches
        with FIXED loss traces + burg dropout give a step-comparable curve."""
        batch = pmesh.shard_batch(self.mesh, {k: jnp.asarray(v)
                                              for k, v in batch.items()})
        return {k: float(v) for k, v in
                self._eval(self.state.params, batch).items()}

    def train_step(self, batch, rng=None) -> Dict[str, float]:
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
            metrics_log = MetricsLogger(_os.path.join(logdir, "plc_metrics.jsonl"))
        from ..weights.checkpoint import save_checkpoint
        for epoch in range(epochs or self.tc.epochs):
            for i, batch in enumerate(loader):
                m = self.train_step(batch)
                if metrics_log is not None:
                    metrics_log.log_async(step=i, epoch=epoch, **m)
                if i % log_every == 0:
                    if metrics_log is not None:
                        metrics_log.flush_async()
                    msg = " ".join(f"{k}={float(v):.4f}" for k, v in m.items())
                    print(f"plc epoch {epoch} step {i}: {msg}", flush=True)
            if metrics_log is not None:
                metrics_log.flush_async()
            if hasattr(loader, "on_epoch_end"):
                loader.on_epoch_end()
            if checkpoint_path:
                save_checkpoint(f"{checkpoint_path}_{epoch + 1:02d}.npz",
                                jax.device_get(self.state.params))
        return self.state
