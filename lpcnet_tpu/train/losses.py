"""Training losses/metrics for the vocoder (mirrors training_tf2/lossfuncs.py
and tf_funcs.py): differentiable u-law, LPC prediction, bit-tree pdf, CE."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Python float, NOT jnp: module-level jnp constants initialize the default
# (possibly TPU) backend at import time, which must never be a precondition
# for CPU-mesh dryruns (round-1 MULTICHIP failure).
LOG256 = math.log(256.0)
_SCALE = 255.0 / 32768.0
_SCALE_1 = 32768.0 / 255.0


def tf_l2u(x):
    """Differentiable linear -> u-law (tf_funcs.py:14-19), float output."""
    s = jnp.sign(x)
    u = s * (128.0 * jnp.log1p(_SCALE * jnp.abs(x)) / LOG256)
    return jnp.clip(128.0 + u, 0.0, 255.0)


def tf_u2l(u):
    u = jnp.asarray(u, jnp.float32) - 128.0
    return jnp.sign(u) * _SCALE_1 * (jnp.exp(jnp.abs(u) / 128.0 * LOG256) - 1.0)


def diff_pred(x, lpc, frame_size: int = 160):
    """Differentiable LPC prediction (tf_funcs.py:31-42).

    Args:
      x: [B, T] signal.
      lpc: [B, T // frame_size, 16] per-frame coefficients.
    Returns pred [B, T]: pred[t] = -sum_i lpc[t//160, i] * x[t - i]
    (note: taps start at lag 0, matching the reference's alignment where the
    signal input is already one sample behind the target).
    """
    order = lpc.shape[-1]
    lpc_rep = jnp.repeat(lpc, frame_size, axis=-2)          # [B, T, 16]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(order, 0)])
    # windows[t, i] = x[t - i] = xp[t + order - i]
    t_idx = jnp.arange(x.shape[-1])[:, None]
    i_idx = jnp.arange(order)[None, :]
    wins = xp[..., t_idx + order - i_idx]                   # [B, T, 16]
    return -jnp.einsum("...ti,...ti->...t", lpc_rep, wins,
                       precision=jax.lax.Precision.HIGHEST)


def tree_to_pdf(p):
    """[..., 256] sigmoid bit-tree outputs -> [..., 256] pdf
    (training_tf2/lpcnet.py:50-58); unit 0 is unused."""
    idx = jnp.arange(256)
    pdf = jnp.ones(p.shape, p.dtype)
    for b in range(8):
        node = (idx >> (8 - b)) + (1 << b)     # tree nodes at level b
        bit = (idx >> (7 - b)) & 1
        pb = p[..., node]
        pdf = pdf * jnp.where(bit == 1, pb, 1.0 - pb)
    return pdf


def tree_pdf_at(p, labels):
    """pdf[label] straight from the bit-tree outputs, without materializing
    the dense [..., 256] pdf.

    Walks the 8-level path tree_to_pdf evaluates for every index, but only
    at `labels` [...]: gathers the 8 node probabilities and multiplies them
    in the same level order, so the result is bitwise-identical to
    `take_along_axis(tree_to_pdf(p), labels)` while the fwd+bwd memory
    traffic drops from O(256) to O(8) per sample -- the dense tree was
    ~1/3 of the train step at batch 128 (BENCHMARKS.md training section).
    """
    nodes = jnp.stack([(labels >> (8 - b)) + (1 << b) for b in range(8)],
                      axis=-1)                               # [..., 8]
    bits = jnp.stack([(labels >> (7 - b)) & 1 for b in range(8)], axis=-1)
    pb = jnp.take_along_axis(p, nodes, axis=-1)  # ONE gather over p
    terms = jnp.where(bits == 1, pb, 1.0 - pb)
    # multiply in level order: bitwise-identical to tree_to_pdf's product
    val = jnp.ones(labels.shape, p.dtype)
    for b in range(8):
        val = val * terms[..., b]
    return val


def tree_neg_log_pdf(p, labels, eps: float = 1e-7):
    """-log(pdf[label]) from the bit-tree outputs via multi-hot masks.

    XLA lowers take_along_axis along the lane (256) axis to a slow gather on
    TPU (~40 ms fwd at [128, 2400]); instead, build the 8-node path masks as
    broadcast iota comparisons and reduce  -sum_n mask_pos*log(p) +
    mask_neg*log(1-p)  in one fused pass over p.  log-domain: the product of
    path probabilities becomes a sum of logs; the final value is clamped at
    -log(eps) to mirror the dense path's pdf clipping (values match the
    dense tree CE to ~1e-5 relative; exact only when no term saturates).
    """
    idx = jnp.arange(256, dtype=labels.dtype)
    lab = labels[..., None]                                      # [..., 1]
    pos = jnp.zeros(lab.shape[:-1] + (256,), bool)
    neg = pos
    for b in range(8):
        node = (lab >> (8 - b)) + (1 << b)
        bit = ((lab >> (7 - b)) & 1) == 1
        hit = idx == node                                        # [..., 256]
        pos = pos | (hit & bit)
        neg = neg | (hit & ~bit)
    tiny = 1e-20
    logp = jnp.log(jnp.maximum(p, tiny))
    log1mp = jnp.log(jnp.maximum(1.0 - p, tiny))
    ll = jnp.sum(jnp.where(pos, logp, 0.0) + jnp.where(neg, log1mp, 0.0),
                 axis=-1)
    return jnp.minimum(-ll, -math.log(eps))


def tree_distill_kl(q, p, eps: float = 1e-6):
    """KL(Q || P) between the two 256-way distributions defined by bit-tree
    sigmoid outputs q (teacher) and p (student), computed level-by-level on
    the tree without materializing either dense pdf.

    By the chain rule of KL over the 8 bit decisions,
      KL(Q||P) = sum_b sum_{nodes n at level b} reachQ[n] * KL_Bern(q_n, p_n)
    where reachQ[n] is the teacher's probability of reaching node n.  Nodes
    at level b occupy the contiguous index range [2^b, 2^{b+1}) (see
    tree_to_pdf's node arithmetic), so each level is a static slice; the
    teacher reach probabilities are built by interleaving (1-q)/q children.
    Used by the scheduled-sampling distillation arm: the teacher pass sees
    the clean history, the student sees the model's own sampled history, and
    the loss asks for the same excitation DISTRIBUTION rather than a hard
    error-correcting target (the round-5 failure mechanism of correction-CE
    scheduled sampling -- BENCHMARKS.md round-5 SS analysis).
    """
    qc = jnp.clip(q, eps, 1.0 - eps)
    pc = jnp.clip(p, eps, 1.0 - eps)
    reach = jnp.ones(q.shape[:-1] + (1,), q.dtype)
    total = jnp.zeros(q.shape[:-1], q.dtype)
    for b in range(8):
        sl = slice(1 << b, 2 << b)
        qb, pb = qc[..., sl], pc[..., sl]
        kl = qb * (jnp.log(qb) - jnp.log(pb)) + \
            (1.0 - qb) * (jnp.log1p(-qb) - jnp.log1p(-pb))
        total = total + jnp.sum(reach * kl, axis=-1)
        if b < 7:
            reach = jnp.stack([reach * (1.0 - qb), reach * qb],
                              axis=-1).reshape(q.shape[:-1] + (2 << b,))
    return total


def metric_cel_tree(sig_out, tensor_preds, p, eps: float = 1e-7):
    """metric_cel computed along the target's tree path (no dense pdf)."""
    e_gt = tf_l2u(sig_out - tensor_preds)
    e_gt = jnp.clip(jnp.round(e_gt).astype(jnp.int32), 0, 255)
    return tree_neg_log_pdf(p, e_gt, eps)


def interp_mulaw_loss_tree(sig_out, tensor_preds, real_preds, p,
                           gamma: float = 2.0):
    """interp_mulaw_loss via two target-path gathers (same numerics)."""
    e_gt = tf_l2u(sig_out - tensor_preds)
    exc_gt = tf_l2u(sig_out - real_preds)
    prob_comp = jnp.abs(e_gt - 128.0) / 128.0 * LOG256
    regularization = jnp.abs(exc_gt - 128.0) / 128.0 * LOG256
    alpha = e_gt - jnp.floor(e_gt)
    ei = jnp.clip(e_gt.astype(jnp.int32), 0, 254)
    p0 = jnp.exp(-tree_neg_log_pdf(p, ei))
    p1 = jnp.exp(-tree_neg_log_pdf(p, ei + 1))
    interp = (1.0 - alpha) * p0 + alpha * p1
    ce = -jnp.log(jnp.clip(interp, 1e-7, 1.0))
    return ce + prob_comp + gamma * regularization


def sparse_cat_ce(labels, probs, eps: float = 1e-7):
    """-log(p[label]) like Keras SparseCategoricalCrossentropy on probs."""
    p = jnp.take_along_axis(probs, labels[..., None], axis=-1)[..., 0]
    return -jnp.log(jnp.clip(p, eps, 1.0))


def metric_cel(sig_out, tensor_preds, pdf):
    """Rounded u-law CE on the LPC residual (lossfuncs.py:74-83)."""
    e_gt = tf_l2u(sig_out - tensor_preds)
    e_gt = jnp.clip(jnp.round(e_gt).astype(jnp.int32), 0, 255)
    return sparse_cat_ce(e_gt, pdf)


def interp_mulaw_loss(sig_out, tensor_preds, real_preds, pdf, gamma: float = 2.0):
    """Interpolated u-law CE + probability compensation for e2e training
    (lossfuncs.py:25-43)."""
    e_gt = tf_l2u(sig_out - tensor_preds)
    exc_gt = tf_l2u(sig_out - real_preds)
    prob_comp = jnp.abs(e_gt - 128.0) / 128.0 * LOG256
    regularization = jnp.abs(exc_gt - 128.0) / 128.0 * LOG256
    alpha = e_gt - jnp.floor(e_gt)
    ei = jnp.clip(e_gt.astype(jnp.int32), 0, 254)
    p0 = jnp.take_along_axis(pdf, ei[..., None], axis=-1)[..., 0]
    p1 = jnp.take_along_axis(pdf, (ei + 1)[..., None], axis=-1)[..., 0]
    interp = (1.0 - alpha) * p0 + alpha * p1
    ce = -jnp.log(jnp.clip(interp, 1e-7, 1.0))
    return ce + prob_comp + gamma * regularization


def metric_exc_sd(sig_out, tensor_preds):
    e_gt = tf_l2u(sig_out - tensor_preds)
    return (e_gt - 128.0) ** 2


def loss_matchlar(rc_true, rc_model):
    """LAR matching loss for the e2e RC head (lossfuncs.py:92-99)."""
    def lar(x):
        return jnp.log((1.01 + x) / (1.01 - x))
    return jnp.mean((lar(rc_model) - lar(rc_true)) ** 2, axis=-1)
