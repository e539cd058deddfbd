"""Progressive magnitude pruning + weight-grid quantization schedules.

Replicates the reference's Sparsify / SparsifyGRUB callbacks
(training_tf2/lpcnet.py:73-188) as pure jnp transforms applied to the
parameter pytree at intervals inside the jitted training loop -- no
device<->host weight round trips.

Block structure: 4x8 blocks of the *transposed* per-gate matrix (i.e. 8
state-units x 4 gate-units of the Keras-layout [N, 3N] recurrent kernel),
energy = sum of squares, keep the densest (1-density) quantile, always keep
the diagonal. The density ramps as 1 - (1-d_final)*(1-r^3) between t_start
and t_end (r = remaining fraction).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SparsifySchedule:
    t_start: int
    t_end: int
    interval: int
    density: Tuple[float, float, float]
    quantize: bool = False

    @staticmethod
    def from_scratch_gru_a(density=(0.05, 0.05, 0.2), scale: float = 1.0):
        return SparsifySchedule(int(2000 * scale), int(20000 * scale), 400,
                                density)

    @staticmethod
    def from_scratch_gru_b(density=(1.0, 1.0, 1.0), scale: float = 1.0):
        return SparsifySchedule(int(2000 * scale), int(40000 * scale), 400,
                                density)

    @staticmethod
    def quantize_finetune(density, scale: float = 1.0):
        """Reference schedule (train_lpcnet.py:196-202); `scale` compresses
        it proportionally for short runs."""
        return SparsifySchedule(int(10000 * scale), int(30000 * scale), 100,
                                density, quantize=True)

    def active(self, step: int) -> bool:
        return (self.quantize
                or (step > self.t_start and (step - self.t_start) % self.interval == 0)
                or step >= self.t_end)

    def current_density(self, step: int, k: int) -> float:
        d = self.density[k]
        if step < self.t_end and not self.quantize:
            r = 1.0 - (step - self.t_start) / (self.t_end - self.t_start)
            return 1.0 - (1.0 - d) * (1.0 - r ** 3)
        return d


def _block_mask(a_t, density: float):
    """a_t: [rows, cols] transposed gate matrix; 4x8 block pruning mask."""
    rows, cols = a_t.shape
    blocks = a_t.reshape(rows // 4, 4, cols // 8, 8)
    energy = jnp.sum(blocks * blocks, axis=(1, 3))           # [rows/4, cols/8]
    flat = jnp.sort(energy.reshape(-1))
    k = int(round(rows * cols // 32 * (1.0 - density)))
    k = min(max(k, 0), flat.shape[0] - 1)
    thresh = flat[k]
    mask = (energy >= thresh).astype(a_t.dtype)
    return jnp.repeat(jnp.repeat(mask, 4, axis=0), 8, axis=1)


def sparsify_gru_a_recurrent(recurrent, schedule: SparsifySchedule, step: int):
    """Prune the [N, 3N] GRU-A recurrent kernel, gate by gate, keeping the
    diagonal (training_tf2/lpcnet.py:83-129). Returns the pruned kernel."""
    n = recurrent.shape[0]
    eye = jnp.eye(n, dtype=recurrent.dtype)
    outs = []
    for k in range(3):
        a = recurrent[:, k * n:(k + 1) * n]
        diag = jnp.diag(jnp.diag(a))
        a_nd = a - diag
        mask_t = _block_mask(a_nd.T, schedule.current_density(step, k))
        mask = jnp.minimum(1.0, mask_t.T + eye)
        outs.append(a * mask)
    return jnp.concatenate(outs, axis=1)


def sparsify_gru_b_kernel(kernel, grua_units: int, schedule: SparsifySchedule,
                          step: int):
    """Prune the GRU-A-input rows of GRU-B's [in, 3N] kernel
    (training_tf2/lpcnet.py:142-188)."""
    m = kernel.shape[1] // 3
    outs = []
    for k in range(3):
        a = kernel[:, k * m:(k + 1) * m]      # [in, N] == transposed view
        a2 = a[:grua_units]
        mask = _block_mask(a2, schedule.current_density(step, k))
        outs.append(jnp.concatenate([a2 * mask, a[grua_units:]], axis=0))
    return jnp.concatenate(outs, axis=1)


def progressive_quantize(w, schedule: SparsifySchedule, step: int):
    """Snap weights within `threshold` of the 1/128 grid onto it
    (training_tf2/lpcnet.py:118-126)."""
    if step < schedule.t_end:
        threshold = 0.5 * (step - schedule.t_start) / (schedule.t_end - schedule.t_start)
    else:
        threshold = 0.5
    quant = jnp.round(w * 128.0)
    res = w * 128.0 - quant
    snap = (jnp.abs(res) <= threshold).astype(w.dtype)
    return snap * quant / 128.0 + (1.0 - snap) * w


def weight_clip_constraint(w, c: float = 0.992):
    """Pairwise-saturation weight clip (training_tf2/lpcnet.py:216-232):
    ensures |w[2i]| + |w[2i+1]| <= 2c along axis 1 pairs."""
    pair = jnp.abs(w[:, 1::2]) + jnp.abs(w[:, 0::2])
    denom = jnp.maximum(c, jnp.repeat(pair, 2, axis=1))
    return c * w / denom


def apply_schedules(params, step: int, sched_a: SparsifySchedule,
                    sched_b: SparsifySchedule, grua_units: int):
    """Apply GRU-A/GRU-B pruning (+ optional quantization) for this step.

    Pure function of (params, step); call at schedule intervals.
    """
    ra = sparsify_gru_a_recurrent(params["gru_a"]["recurrent"], sched_a, step)
    if sched_a.quantize and sched_a.active(step):
        ra = progressive_quantize(ra, sched_a, step)
    kb = sparsify_gru_b_kernel(params["gru_b"]["kernel"], grua_units, sched_b, step)
    if sched_b.quantize and sched_b.active(step):
        kb = progressive_quantize(kb, sched_b, step)
    params = dict(params)
    params["gru_a"] = dict(params["gru_a"], recurrent=ra)
    params["gru_b"] = dict(params["gru_b"], kernel=kb)
    return params


# ---- traced (in-graph) variants -------------------------------------------
# The host-gated path above costs one extra dispatch per application, which
# is every step during quantize finetune (active() is always True there) and
# every step after t_end -- one tunnel round trip each.  These variants take
# a TRACED step scalar so the whole schedule (gating included) runs inside
# the jitted train step via lax.cond (train_lpcnet.make_train_step).

def _density_traced(schedule: SparsifySchedule, step, k: int):
    import jax.numpy as jnp
    d = schedule.density[k]
    if schedule.quantize or d >= 1.0:
        return jnp.float32(d)
    r = jnp.clip(1.0 - (step - schedule.t_start)
                 / float(schedule.t_end - schedule.t_start), 0.0, 1.0)
    ramp = 1.0 - (1.0 - d) * (1.0 - r ** 3)
    return jnp.where(step >= schedule.t_end, jnp.float32(d),
                     ramp.astype(jnp.float32))


def _block_mask_traced(a_t, density):
    import jax.numpy as jnp
    rows, cols = a_t.shape
    blocks = a_t.reshape(rows // 4, 4, cols // 8, 8)
    energy = jnp.sum(blocks * blocks, axis=(1, 3))
    flat = jnp.sort(energy.reshape(-1))
    k = jnp.round(rows * cols // 32 * (1.0 - density)).astype(jnp.int32)
    k = jnp.clip(k, 0, flat.shape[0] - 1)
    thresh = jnp.take(flat, k)
    mask = (energy >= thresh).astype(a_t.dtype)
    return jnp.repeat(jnp.repeat(mask, 4, axis=0), 8, axis=1)


def _quantize_traced(w, schedule: SparsifySchedule, step):
    import jax.numpy as jnp
    threshold = jnp.clip(0.5 * (step - schedule.t_start)
                         / float(schedule.t_end - schedule.t_start), 0.0, 0.5)
    threshold = jnp.where(step >= schedule.t_end, jnp.float32(0.5), threshold)
    quant = jnp.round(w * 128.0)
    res = w * 128.0 - quant
    snap = (jnp.abs(res) <= threshold).astype(w.dtype)
    return snap * quant / 128.0 + (1.0 - snap) * w


def schedule_active_traced(schedule: SparsifySchedule, step):
    import jax.numpy as jnp
    if schedule.quantize:
        return jnp.bool_(True)
    return ((step > schedule.t_start)
            & ((step - schedule.t_start) % schedule.interval == 0)
            ) | (step >= schedule.t_end)


def apply_schedules_traced(params, step, sched_a: SparsifySchedule,
                           sched_b: SparsifySchedule, grua_units: int):
    """apply_schedules with a traced step scalar (same math, jnp gating)."""
    import jax.numpy as jnp

    rec = params["gru_a"]["recurrent"]
    n = rec.shape[0]
    eye = jnp.eye(n, dtype=rec.dtype)
    outs = []
    for k in range(3):
        a = rec[:, k * n:(k + 1) * n]
        a_nd = a - jnp.diag(jnp.diag(a))
        mask_t = _block_mask_traced(a_nd.T, _density_traced(sched_a, step, k))
        outs.append(a * jnp.minimum(1.0, mask_t.T + eye))
    ra = jnp.concatenate(outs, axis=1)
    if sched_a.quantize:
        ra = _quantize_traced(ra, sched_a, step)

    kernel = params["gru_b"]["kernel"]
    m = kernel.shape[1] // 3
    outs = []
    for k in range(3):
        a = kernel[:, k * m:(k + 1) * m]
        a2 = a[:grua_units]
        mask = _block_mask_traced(a2, _density_traced(sched_b, step, k))
        outs.append(jnp.concatenate([a2 * mask, a[grua_units:]], axis=0))
    kb = jnp.concatenate(outs, axis=1)
    if sched_b.quantize:
        kb = _quantize_traced(kb, sched_b, step)

    params = dict(params)
    params["gru_a"] = dict(params["gru_a"], recurrent=ra)
    params["gru_b"] = dict(params["gru_b"], kernel=kb)
    return params
