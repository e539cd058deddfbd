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


class PLCDeviceLoader:
    """Device-resident variant of PLCLoader.

    The host loader assembles ~37 MB of float batch per step (B=128 x
    T=1000 x 57 rows + masks) on the host and ships it through the
    dispatch transport every step -- measured 0.96 steps/s through the
    axon tunnel.  Here the whole feature set uploads once ([nseq, T, 56]
    f32), the loss-trace stream uploads once, and per-step batch assembly
    (sequence row gather, loss-trace row sampling, 10% Burg dropout, the
    flag channel and the scoring mask) runs on device from a
    fold_in(key, step) rng -- so it can scan inside
    PLCTrainer.train_block with zero per-step host traffic.

    Differences from PLCLoader's augmentation (documented, not bugs):
    loss-trace windows are sampled from two fixed reshape banks (offsets
    0 and T/2 into the trace stream) instead of one per-epoch random
    offset, and Burg dropout / trace choice derive from the jax rng
    rather than numpy.  The val batch is byte-identical to PLCLoader's
    (same fixed numpy seed), so val curves are comparable across loaders.
    """

    def __init__(self, feature_path: str, lost_path: str, tc: PLCTrainConfig,
                 seed: int = 0, val_seqs: int = 0, sharding=None):
        nb_features = NB_BURG + NB_USED + 16
        feats = np.fromfile(feature_path, dtype=np.float32)
        nseq = len(feats) // (nb_features * tc.seq_length)
        nseq_train = (nseq - val_seqs) // tc.batch_size * tc.batch_size
        feats = feats[: nseq * tc.seq_length * nb_features]
        all_feats = feats.reshape(nseq, tc.seq_length, nb_features)[
            :, :, : NB_BURG + NB_USED]
        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
            else jax.device_put
        self._features = put(np.ascontiguousarray(all_feats[:nseq_train]))
        self._val_features = (all_feats[nseq - val_seqs:] if val_seqs else None)
        lost = np.fromfile(lost_path, dtype=np.int8).astype(np.float32)
        t = tc.seq_length
        n_rows = len(lost) // t - 1
        # two reshape banks (offsets 0 and t//2) stand in for the host
        # loader's per-epoch random offset
        bank0 = lost[: n_rows * t].reshape(n_rows, t)
        bank1 = lost[t // 2: t // 2 + n_rows * t].reshape(n_rows, t)
        self._lost_rows = put(np.ascontiguousarray(
            np.concatenate([bank0, bank1], axis=0)))
        self.tc = tc
        self.batch_size = tc.batch_size
        self._rng = np.random.RandomState(seed)
        self.nb_batches = nseq_train // tc.batch_size
        self._n_train = nseq_train
        self.on_epoch_end()

        def sample(feats_d, lost_d, sel, rng):
            f = jnp.take(feats_d, sel, axis=0)              # [B, T, 56]
            b = sel.shape[0]
            r1, r2 = jax.random.split(rng)
            burg_ok = (jax.random.uniform(r1, (b, t, 1)) > 0.1
                       ).astype(jnp.float32)
            rows = jax.random.randint(r2, (b,), 0, lost_d.shape[0])
            lost_b = jnp.take(lost_d, rows, axis=0)[:, :, None]  # [B, T, 1]
            in_feats = f * lost_b
            in_feats = jnp.concatenate(
                [in_feats[:, :, :NB_BURG] * burg_ok,
                 in_feats[:, :, NB_BURG:]], axis=-1)
            flag = lost_b * (2.0 * burg_ok - 1.0)
            return {
                "plc_input": jnp.concatenate([in_feats, flag], axis=-1),
                "target": f[:, :, NB_BURG:],
                "mask": 1.0 - lost_b,
            }

        self.sample_fn = sample
        # for the host-identical val batch: truncated exactly like
        # PLCLoader.__init__ truncates self.lost ((len//t - 1)*t), else the
        # extra trailing row can shift the same-seed randint draws and break
        # the byte-identical val contract for some corpus lengths
        self._lost_host = lost[: (len(lost) // t - 1) * t]

    @property
    def device_arrays(self):
        return self._features, self._lost_rows

    def index_blocks(self, block_steps: int):
        """Yield [block_steps, B] int32 sequence-index blocks covering one
        epoch (drops the last partial block)."""
        bs = self.batch_size
        n = (self.nb_batches // block_steps) * block_steps
        for i in range(0, n, block_steps):
            sel = self.indices[i * bs:(i + block_steps) * bs]
            yield np.reshape(sel, (block_steps, bs)).astype(np.int32)

    def on_epoch_end(self):
        self.indices = self._rng.permutation(self._n_train)

    def val_batch(self) -> Optional[Dict[str, np.ndarray]]:
        """Identical to PLCLoader.val_batch (same fixed rng), so the val
        curve is comparable across loader choices."""
        if self._val_features is None:
            return None
        rng = np.random.RandomState(12345)
        feats = self._val_features
        b, t, _ = feats.shape
        burg_ok = (rng.rand(b, t, 1) > 0.1).astype(np.float32)
        lo = self._lost_host[: (len(self._lost_host) // t) * t].reshape(-1, t)
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
        self._step_fn = step_fn       # raw, for train_block's traced scan

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

    def train_block(self, loader, sels, base_key=None) -> Dict[str, Any]:
        """Run sels.shape[0] train steps as ONE device dispatch.

        Requires a PLCDeviceLoader: the per-step batch assembly
        (loader.sample_fn -- row gathers + on-device loss-trace/Burg
        dropout sampling) runs inside a lax.scan with the train step, so
        the dispatch round trip and the ~37 MB/step host batch transfer
        amortize over the whole block (the per-step host path measured
        0.96 steps/s through the tunnel). Per-step rng is
        fold_in(base_key, step) on the traced step counter, so results
        are block-size invariant. Returns [K]-shaped device metrics.
        """
        if not hasattr(self, "_block_step"):
            sample_fn = loader.sample_fn
            step_fn = self._step_fn
            bsh = pmesh.batch_sharding(self.mesh)

            def block(state, feats_d, lost_d, sels, key):
                def body(state, sel):
                    batch = sample_fn(feats_d, lost_d, sel,
                                      jax.random.fold_in(key, state.step))
                    batch = jax.tree.map(
                        lambda x: jax.lax.with_sharding_constraint(x, bsh),
                        batch)
                    state, metrics = step_fn(state, batch, None)
                    return state, metrics

                state, ms = jax.lax.scan(body, state, sels)
                return state, ms

            self._block_step = jax.jit(block, donate_argnums=(0,))
            self._block_key = jax.random.PRNGKey(4242)
        if base_key is None:
            base_key = self._block_key
        feats_d, lost_d = loader.device_arrays
        self.state, ms = self._block_step(self.state, feats_d, lost_d,
                                          jnp.asarray(sels), base_key)
        return dict(ms)

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
