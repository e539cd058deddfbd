"""LPCNet vocoder training: loss, jitted DP train step, and driver.

Mirrors training_tf2/train_lpcnet.py: Adam(beta1=.5, beta2=.8) with the
Keras-legacy 1/(1+decay*t) schedule, 15-frame truncated-BPTT chunks,
progressive sparsification of GRU-A's recurrent weights and GRU-B's input
weights, optional quantization fine-tuning, weight-clip constraints.

Parallelism: batch sharded over a 1-D device mesh (data parallelism -- the
reference's only strategy); parameters replicated; XLA inserts the psum over
ICI. The whole step, including the sparsify transform, runs jitted on
device -- no get_weights/set_weights host round trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import lpcnet as M
from ..parallel import mesh as pmesh
from . import losses as LL
from .sparsify import (SparsifySchedule, apply_schedules_traced,
                       schedule_active_traced, weight_clip_constraint)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 128
    chunk_frames: int = 15
    lr: float = 1e-3
    decay: float = 5e-5
    beta1: float = 0.5
    beta2: float = 0.8
    epochs: int = 120
    lookahead: int = 2
    quantize: bool = False
    gamma: float = 2.0            # e2e u-law compensation
    density: Tuple[float, float, float] = (0.05, 0.05, 0.2)
    grub_density: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    schedule_scale: float = 1.0   # compresses sparsify/quantize schedules
    ema_decay: float = 0.0        # >0 keeps an EMA of params for eval/ship
    # scheduled sampling: probability that the u-law signal history fed to
    # the network is the model's OWN sampled output instead of ground truth
    # (train/scheduled.py; 0 = pure teacher forcing)
    ss_prob: float = 0.0
    # the Bernoulli TF/free-run decision is drawn per ss_block samples (1 =
    # iid per sample). Per-sample draws give mean own-feedback runs of only
    # 1/(1-p) samples; exposure bias compounds over longer horizons, so
    # block draws (e.g. 16 -> mean run p*16/(1-p)… samples) exercise real
    # error accumulation while TF blocks resync the trajectory
    ss_block: int = 16
    # round-5 SS mechanism follow-ups (BENCHMARKS.md round-5 SS analysis):
    # hide the sampling deviation from the exc-history input channel by
    # feeding the CLEAN-history excitation there (arm a) ...
    ss_hide_exc: bool = False
    # ... and/or replace the hard correction-CE target with a
    # distribution-matching loss against the teacher-forced pdf of the same
    # params on the clean history (arm b); 0 = off, w blends
    # (1-w)*correction-CE + w*KL(teacher || student)
    ss_distill: float = 0.0
    # std of the Gaussian noise on the u-law (sig, pred, exc) inputs; 0.3
    # is the reference's GaussianNoise(.3) (training_tf2/lpcnet.py:264)
    input_noise: float = 0.3

    @property
    def chunk_samples(self) -> int:
        return self.chunk_frames * 160


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(tc: TrainConfig):
    if tc.quantize:
        lr, decay = 3e-5, 0.0
    else:
        lr, decay = tc.lr, tc.decay
    schedule = lambda t: lr / (1.0 + decay * t)
    return optax.adam(schedule, b1=tc.beta1, b2=tc.beta2, eps=1e-7)


def loss_fn(params, cfg: M.LPCNetConfig, tc: TrainConfig, batch, rng,
            gru_states=None):
    sig_in = batch["sig_in"]
    sig_clean = sig_in
    exc_override = None
    ss = tc.ss_prob > 0.0         # static at trace time
    if ss:
        from .scheduled import mixed_history, sampled_signal
        rng, k_mask, k_samp = jax.random.split(rng, 3)
        b, t = sig_in.shape
        blk = max(1, tc.ss_block)
        tf_mask = jnp.repeat(jax.random.bernoulli(
            k_mask, 1.0 - tc.ss_prob, (b, (t + blk - 1) // blk)),
            blk, axis=1)[:, :t]
        weighting = jnp.power(jnp.float32(cfg.lpc_gamma),
                              jnp.arange(1, 17, dtype=jnp.float32))
        s_hat = sampled_signal(params, cfg, batch, tf_mask, k_samp,
                               gru_states=gru_states, weighting=weighting)
        sig_in = mixed_history(sig_in, s_hat, tf_mask)
        if tc.ss_hide_exc:
            # arm (a): exc-history input from the CLEAN signal so the model
            # cannot read its own sampling deviation off that channel
            lpc_w = batch["lpc"] * weighting if not cfg.e2e else None
            if lpc_w is not None:
                preds_clean = LL.diff_pred(sig_clean, lpc_w, cfg.frame_size)
                exc_override = LL.tf_l2u(
                    sig_clean - jnp.roll(preds_clean, 1, axis=-1))
    out = M.training_forward(
        params, cfg, sig_in, batch["features"], batch["periods"],
        lpc=batch.get("lpc"), rng=rng, training=True, gru_states=gru_states,
        noise_std=tc.input_noise, exc_hist_override=exc_override)
    cel = jnp.mean(LL.metric_cel_tree(batch["sig_out"], out["tensor_preds"],
                                      out["tree_probs"]))
    distill = None
    if ss and tc.ss_distill > 0.0 and not cfg.e2e:
        # arm (b): match the clean-history (teacher-forced) excitation
        # DISTRIBUTION of the same params instead of a hard correction
        # target; identical rng so the noise regularizers cancel and only
        # the history differs between teacher and student
        t_out = M.training_forward(
            jax.lax.stop_gradient(params), cfg, sig_clean,
            batch["features"], batch["periods"], lpc=batch.get("lpc"),
            rng=rng, training=True, gru_states=gru_states,
            noise_std=tc.input_noise)
        distill = jnp.mean(LL.tree_distill_kl(
            jax.lax.stop_gradient(t_out["tree_probs"]), out["tree_probs"]))
    if cfg.e2e:
        ce = LL.interp_mulaw_loss_tree(batch["sig_out"], out["tensor_preds"],
                                       out["real_preds"], out["tree_probs"],
                                       tc.gamma)
        lar = LL.loss_matchlar(batch["rc"], out["rc"])
        loss = jnp.mean(ce) + 2.0 * jnp.mean(lar)
    else:
        loss = cel
    if distill is not None:
        w = tc.ss_distill
        loss = (1.0 - w) * loss + w * distill
    metrics = {
        "loss": loss,
        "cel": cel,
        "exc_sd": jnp.mean(LL.metric_exc_sd(batch["sig_out"], out["tensor_preds"])),
    }
    if distill is not None:
        metrics["distill_kl"] = distill
    return loss, (metrics, out["gru_states"])


def apply_constraints(params):
    """Keras-constraint equivalents applied after each update
    (training_tf2/lpcnet.py:286-294): WeightClip(0.992) on GRU-A recurrent
    and GRU-B kernel+recurrent."""
    params = dict(params)
    params["gru_a"] = dict(params["gru_a"],
                           recurrent=weight_clip_constraint(params["gru_a"]["recurrent"]))
    params["gru_b"] = dict(params["gru_b"],
                           kernel=weight_clip_constraint(params["gru_b"]["kernel"]),
                           recurrent=weight_clip_constraint(params["gru_b"]["recurrent"]))
    return params


def make_train_step(cfg: M.LPCNetConfig, tc: TrainConfig, optimizer,
                    sched_a: SparsifySchedule, sched_b: SparsifySchedule):
    """Build the jitted DP train step. Sparsification (and the quantize
    snap) runs INSIDE the step on a lax.cond gated by the schedule's
    interval arithmetic over the traced step counter -- the previous
    host-gated extra dispatch cost one tunnel round trip per application,
    which is EVERY step during quantize finetune and after t_end."""

    def step_fn(state: TrainState, batch, rng, gru_states, ema):
        (loss, (metrics, new_states)), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, tc, batch, rng, gru_states),
            has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = apply_constraints(params)
        new_step = state.step + 1
        # static bypass: an all-dense non-quantize run (the TPU headline
        # config -- the inference kernels run dense; sparsity is a CPU-SIMD
        # interop concern) has nothing to schedule
        dense = (not sched_a.quantize and not sched_b.quantize
                 and all(d >= 1.0 for d in sched_a.density)
                 and all(d >= 1.0 for d in sched_b.density))
        if not dense:
            do = (schedule_active_traced(sched_a, new_step)
                  | schedule_active_traced(sched_b, new_step))
            params = jax.lax.cond(
                do,
                lambda p: apply_schedules_traced(p, new_step, sched_a,
                                                 sched_b, cfg.rnn_units1),
                lambda p: p, params)
        new_states = jax.tree.map(jax.lax.stop_gradient, new_states)
        if tc.ema_decay > 0.0:       # static at trace time
            d = tc.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
        return (TrainState(params, opt_state, new_step), metrics,
                new_states, ema)

    return step_fn


class Trainer:
    """End-to-end training driver with data-parallel sharding."""

    def __init__(self, cfg: Optional[M.LPCNetConfig] = None,
                 tc: Optional[TrainConfig] = None, seed: int = 0,
                 mesh=None):
        self.cfg = cfg or M.LPCNetConfig()
        self.tc = tc or TrainConfig()
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        self.optimizer = make_optimizer(self.tc)
        params = M.init_params(jax.random.PRNGKey(seed), self.cfg)
        self.state = TrainState(params, self.optimizer.init(params),
                                jnp.zeros((), jnp.int32))
        sc = self.tc.schedule_scale
        if self.tc.quantize:
            self.sched_a = SparsifySchedule.quantize_finetune(self.tc.density, sc)
            self.sched_b = SparsifySchedule.quantize_finetune(self.tc.grub_density, sc)
        else:
            self.sched_a = SparsifySchedule.from_scratch_gru_a(self.tc.density, sc)
            self.sched_b = SparsifySchedule.from_scratch_gru_b(self.tc.grub_density, sc)
        step = make_train_step(self.cfg, self.tc, self.optimizer,
                               self.sched_a, self.sched_b)
        # GSPMD: state replicated, batch sharded on the data axis; shardings
        # propagate from the placed arguments through jit.
        self._step = jax.jit(step, donate_argnums=(0, 4))
        self.state = jax.device_put(self.state, pmesh.replicated(self.mesh))
        self._host_step = 0
        # stateful truncated BPTT: GRU states carry across successive chunks
        # (the reference trains with stateful=True, training_tf2/lpcnet.py:286)
        self._gru_states = None
        # EMA of params (device tree); 0.0 scalar when disabled so the jit
        # signature stays fixed
        self._ema = (jax.tree.map(jnp.copy, self.state.params)
                     if self.tc.ema_decay > 0.0 else jnp.zeros(()))

    def train_step(self, batch: Dict[str, np.ndarray], rng) -> Dict[str, float]:
        batch = pmesh.shard_batch(self.mesh, {
            k: jnp.asarray(v) for k, v in batch.items()})
        if self._gru_states is None:
            b = batch["sig_in"].shape[0]
            self._gru_states = (jnp.zeros((b, self.cfg.rnn_units1)),
                                jnp.zeros((b, self.cfg.rnn_units2)))
        self.state, metrics, self._gru_states, self._ema = self._step(
            self.state, batch, rng, self._gru_states, self._ema)
        self._host_step += 1
        # schedule gating + the sparsify/quantize transform run INSIDE the
        # jitted step (make_train_step); no extra dispatch here.
        # metrics stay DEVICE scalars: a per-step host fetch serializes the
        # dispatch pipeline (2.4x step-rate loss measured in bench.py train
        # mode); callers fetch at log intervals (float()/device_get)
        return dict(metrics)

    def train_block(self, loader, sels, base_key=None) -> Dict[str, Any]:
        """Run sels.shape[0] train steps as ONE device dispatch.

        Requires a DeviceLPCNetLoader: the per-step batch gather
        (loader.sample_fn) runs inside a lax.scan with the train step, so
        the remote-dispatch round trip amortizes over the whole block --
        the per-step path realized 6.2 steps/s through the tunnel vs 14.4
        device-bound (BENCHMARKS.md round-3 training). The per-step rng
        derives from fold_in(base_key, step) on device (the step counter
        is traced state), so results are independent of block size.

        Returns metrics as [K]-shaped DEVICE arrays (fetch at log
        intervals).
        """
        if not hasattr(self, "_block_step"):
            step_fn = make_train_step(self.cfg, self.tc, self.optimizer,
                                      self.sched_a, self.sched_b)
            sample_fn = loader.sample_fn

            bsh = pmesh.batch_sharding(self.mesh)

            def block(state, gru, ema, sig_in, sig_out, feats, sels, key):
                def body(carry, sel):
                    state, gru, ema = carry
                    batch = sample_fn(sig_in, sig_out, feats, sel)
                    # the corpus arrays are replicated, so without a
                    # constraint the gathered batch (and the whole loss)
                    # would compute replicated on a multi-chip mesh; pin
                    # the batch axis to the data axis for real DP
                    batch = jax.tree.map(
                        lambda x: jax.lax.with_sharding_constraint(x, bsh),
                        batch)
                    rng = jax.random.fold_in(key, state.step)
                    state, metrics, gru, ema = step_fn(state, batch, rng,
                                                       gru, ema)
                    return (state, gru, ema), metrics

                (state, gru, ema), ms = jax.lax.scan(body, (state, gru, ema),
                                                     sels)
                return state, gru, ema, ms

            self._block_step = jax.jit(block, donate_argnums=(0, 1, 2))
            self._block_key = jax.random.PRNGKey(917)
        if base_key is None:
            base_key = self._block_key
        if self._gru_states is None:
            b = loader.batch_size
            self._gru_states = (jnp.zeros((b, self.cfg.rnn_units1)),
                                jnp.zeros((b, self.cfg.rnn_units2)))
        sig_in, sig_out, feats = loader.device_arrays
        self.state, self._gru_states, self._ema, ms = self._block_step(
            self.state, self._gru_states, self._ema, sig_in, sig_out,
            feats, jnp.asarray(sels), base_key)
        self._host_step += int(sels.shape[0])
        return dict(ms)

    def eval_loss(self, batches, params=None) -> Dict[str, float]:
        """Mean teacher-forced loss over held-out batches (e.g.
        loader.val_batches()) -- the same surface as the train loss, so the
        train/val gap directly reads out memorization; the synthesis-side
        HeldOutValidator complements it with a free-running signal.
        Deterministic: fixed noise rng, fresh GRU states per batch."""
        if not hasattr(self, "_eval_step"):
            def ev(params, batch, gru_states):
                _, (metrics, _) = loss_fn(params, self.cfg, self.tc, batch,
                                          jax.random.PRNGKey(0), gru_states)
                return metrics
            self._eval_step = jax.jit(ev)
        params = self.state.params if params is None else params
        out = None
        n = 0
        for batch in batches:
            batch = pmesh.shard_batch(self.mesh, {
                k: jnp.asarray(v) for k, v in batch.items()})
            b = batch["sig_in"].shape[0]
            states = (jnp.zeros((b, self.cfg.rnn_units1)),
                      jnp.zeros((b, self.cfg.rnn_units2)))
            m = self._eval_step(params, batch, states)
            out = m if out is None else {k: out[k] + m[k] for k in out}
            n += 1
        if out is None:
            return {}
        return {k: float(v) / n for k, v in out.items()}

    @property
    def ema_params(self):
        """EMA of params (None when ema_decay == 0)."""
        return self._ema if self.tc.ema_decay > 0.0 else None

    def reset_ema(self):
        """Re-seed the EMA from the current params (call after replacing
        state from a checkpoint that didn't carry an EMA)."""
        if self.tc.ema_decay > 0.0:
            self._ema = jax.tree.map(jnp.copy, self.state.params)

    def full_state(self):
        """Everything needed for exact resume: TrainState + TBPTT carry
        (+ the params EMA when enabled)."""
        full = {"train_state": self.state, "gru_states": self._gru_states}
        if self.tc.ema_decay > 0.0:
            full["ema"] = self._ema
        return full

    def restore_full_state(self, full):
        self.state = full["train_state"]
        self._gru_states = full["gru_states"]
        if "ema" in full:
            self._ema = full["ema"]
        elif self.tc.ema_decay > 0.0:
            # the restored dict carries no EMA (older checkpoint / EMA-off
            # run): re-seed from the restored params, else _ema stays an
            # EMA of the random init and the validator scores a stale
            # candidate for thousands of steps (decay 0.999)
            self.reset_ema()
        self._host_step = int(self.state.step)

    def fit(self, loader, epochs: Optional[int] = None, log_every: int = 50,
            checkpoint_path: Optional[str] = None, logdir: Optional[str] = None,
            validator=None, val_every: int = 0,
            best_checkpoint_path: Optional[str] = None):
        """Training loop. With `validator` (train.validation.HeldOutValidator)
        and `val_every`, runs a held-out analysis/synthesis eval every N
        steps on raw params (and the EMA when enabled) and, when
        `best_checkpoint_path` is given, keeps the best-band-LSD checkpoint
        there -- the round-3 100k-step run regressed on held-out audio with
        no in-loop signal to catch it (BENCHMARKS.md round-3 close-out)."""
        metrics_log = None
        if logdir is not None:
            from ..utils.profiling import MetricsLogger
            import os as _os
            metrics_log = MetricsLogger(_os.path.join(logdir, "lpcnet_metrics.jsonl"))
        from ..weights.checkpoint import save_checkpoint
        best = None
        if validator is not None and val_every:
            from .validation import BestTracker
            best = BestTracker()
        rng = jax.random.PRNGKey(123)
        epochs = epochs or self.tc.epochs
        for epoch in range(epochs):
            for i, batch in enumerate(loader):
                rng, sub = jax.random.split(rng)
                metrics = self.train_step(batch, sub)
                if metrics_log is not None:
                    metrics_log.log_async(step=self._host_step, epoch=epoch,
                                          **metrics)
                if i % log_every == 0:
                    if metrics_log is not None:
                        metrics_log.flush_async()
                    msg = " ".join(f"{k}={float(v):.4f}"
                                   for k, v in metrics.items())
                    print(f"epoch {epoch} step {i}: {msg}", flush=True)
                if best is not None and self._host_step % val_every == 0:
                    cand = [("raw", self.state.params)]
                    if self.ema_params is not None:
                        cand.append(("ema", self.ema_params))
                    results = {n: validator.evaluate(p) for n, p in cand}
                    win = min(results,
                              key=lambda k: results[k]["band_lsd_db"])
                    if (best.update(self._host_step, results[win])
                            and best_checkpoint_path):
                        save_checkpoint(best_checkpoint_path,
                                        jax.device_get(dict(cand)[win]),
                                        self.cfg)
                    if metrics_log is not None:
                        for n, r in results.items():
                            metrics_log.log_async(step=self._host_step,
                                                  kind=f"val_{n}", **r)
                        metrics_log.flush_async()
                    print(f"step {self._host_step}: val "
                          + " ".join(f"{n}={r['band_lsd_db']:.3f}dB"
                                     for n, r in results.items())
                          + f" (best {best.best:.3f} @ {best.best_step})",
                          flush=True)
            if metrics_log is not None:
                metrics_log.flush_async()
            if checkpoint_path:
                save_checkpoint(f"{checkpoint_path}_{epoch + 1:02d}.npz",
                                jax.device_get(self.state.params), self.cfg)
            if hasattr(loader, "on_epoch_end"):
                loader.on_epoch_end()
        return self.state


def main(argv=None):
    """CLI mirroring training_tf2/train_lpcnet.py."""
    import argparse

    from .data import LPCNetLoader

    ap = argparse.ArgumentParser(prog="lpcnet_tpu.train.train_lpcnet")
    ap.add_argument("features")
    ap.add_argument("data")
    ap.add_argument("output")
    ap.add_argument("--quantize", metavar="<input weights>", default=None)
    ap.add_argument("--retrain", metavar="<input weights>", default=None)
    ap.add_argument("--density-split", nargs=3, type=float,
                    default=(0.05, 0.05, 0.2))
    ap.add_argument("--grua-size", type=int, default=384)
    ap.add_argument("--grub-size", type=int, default=16)
    ap.add_argument("--cond-size", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--decay", type=float, default=None)
    ap.add_argument("--end2end", action="store_true")
    ap.add_argument("--lookahead", type=int, default=2)
    ap.add_argument("--lpc-gamma", type=float, default=1.0)
    ns = ap.parse_args(argv)

    import jax

    from ..models.lpcnet import LPCNetConfig
    from ..weights.checkpoint import load_checkpoint

    cfg = LPCNetConfig(rnn_units1=ns.grua_size, rnn_units2=ns.grub_size,
                       cond_size=ns.cond_size, e2e=ns.end2end,
                       lookahead=ns.lookahead, lpc_gamma=ns.lpc_gamma)
    tc = TrainConfig(batch_size=ns.batch_size, epochs=ns.epochs,
                     lookahead=ns.lookahead, quantize=ns.quantize is not None,
                     density=tuple(ns.density_split),
                     **({"lr": ns.lr} if ns.lr else {}),
                     **({"decay": ns.decay} if ns.decay is not None else {}))
    trainer = Trainer(cfg, tc)
    init_from = ns.quantize or ns.retrain
    if init_from:
        params, _ = load_checkpoint(init_from)
        trainer.state = TrainState(jax.device_put(params),
                                   trainer.optimizer.init(params),
                                   trainer.state.step)
    loader = LPCNetLoader(ns.data, ns.features, batch_size=ns.batch_size,
                          lookahead=ns.lookahead, e2e=ns.end2end)
    trainer.fit(loader, checkpoint_path=f"{ns.output}_{ns.grua_size}")
    return 0


if __name__ == "__main__":
    main()
