"""Fused autoregressive sample loop as a single Pallas TPU kernel.

This is the TPU answer to the reference's hand-SIMD'd per-sample loop
(lpcnet_synthesize_tail_impl, src/lpcnet.c:235-271 + sparse GEMV kernels in
src/vec_avx.h): instead of one stream stepping 160 tiny GEMVs through L1
cache, a batch tile of streams steps together with every weight matrix
resident in VMEM, so each of the 160 dependent steps is a handful of
well-shaped MXU matmuls:

* the three u-law embedding lookups become one [BT, 768] one-hot times
  [768, 3Na] matmul (gather-as-matmul -- data-dependent row gathers don't
  vectorize on TPU, one-hot contractions do);
* GRU-A's recurrent update is [BT, Na] x [Na, 3Na];
* the dual-FC bit-tree sampler gathers its per-stream row pair the same
  one-hot way from an augmented [256, 36] table (w0|w1|b0|b1|f0|f1);
* per-stream KISS99 RNG state advances in uint32 vector registers,
  bit-compatible with the C decoder's sampling thresholds.

The kernel processes the whole 10 ms frame (160 steps) per invocation, so
dispatch overhead is amortized 160x compared with the lax.scan path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.constants import LPC_ORDER, PREEMPHASIS
from ..models.lpcnet import LPCNetConfig, SampleState, _logit_table
from ..nn.quantized import SCALE_1 as _SCALE_Q
from ..nn.quantized import quantize_act_int8 as _quant_act
from ..utils.rng import Kiss99State

LOG256 = 5.5451774445
_SCALE = 255.0 / 32768.0
_SCALE_1 = 32768.0 / 255.0

_BT_ENV = __import__("os").environ.get("LPCNET_KERNEL_BT")
BT = int(_BT_ENV or "256")        # default tile; see _pick_bt


def _pick_bt(padded_batch: int) -> int:
    """Batch-tile selection, measured on v5e (BENCHMARKS.md): 512-stream
    tiles are ~4% faster once the batch fills them; 256 otherwise."""
    if _BT_ENV:
        return int(_BT_ENV)
    return 512 if padded_batch % 512 == 0 else 256

# CPU tests run the kernel in interpreter mode
_INTERPRET = bool(__import__("os").environ.get("LPCNET_PALLAS_INTERPRET"))

# Bench-only ablations (wrong numerics, perf ceilings): comma-set of
#   arec    skip GRU-A's off-diagonal recurrent matmul -- the upper bound of
#           any sparse-GRU-A win (the trained 8x4 block sparsity cannot beat
#           deleting the matmul outright)
#   emb     skip the one-hot embedding contraction
# Used by bench.py's ablation mode; never set in production/tests.
_ABLATE = set(filter(None, __import__("os").environ
                     .get("LPCNET_KERNEL_ABLATE", "").split(",")))

# Embedding-contraction variant: "v1" = composed [768, 3Na] one-hot matmul
# (bit-gated vs nn.quantized); "factored" = gather the shared 128-dim
# embedding first, input kernel second (fewer issued MXU ops, one extra
# dependent matmul, double quantization ~2x the emb rounding error).
_EMB = __import__("os").environ.get("LPCNET_EMB", "v1")


def kernel_weights(fused, cfg: LPCNetConfig, dtype=jnp.bfloat16,
                   quantized: bool = None):
    """Precompute the kernel-layout weight bundle from fused params.

    `dtype` selects the MXU operand type for the big matmuls (embedding
    table, GRU recurrents): bfloat16 (default, ~4x MXU throughput vs f32 on
    v5e; accumulation stays f32) or float32 for bit-closest parity runs.

    `quantized` selects the int8-MXU bundle (2x MXU rate and half the VMEM
    traffic on v5e): the GRU matrices use the reference's exact DOT_PROD
    integer numerics (src/vec.h:206-236 -- round(128*w) weights on
    floor(0.5+127*h) activations, int32 accumulation, GRU-A diagonal kept
    float as in the sparse format), and the embedding table (float in the
    reference) is int8 with per-column scales. Defaults to True when the
    fused params are already int8 (nn.quantized.quantize_fused), i.e.
    api.load_model(int8=True) serves through the int8 kernel.
    """
    from ..nn import quantized as Q
    was_q = Q.is_quantized(fused)
    if quantized is None:
        quantized = was_q
    if was_q:
        # restore a float-layout view for the shared/float pieces (exact:
        # blob int8 weights sit on the 1/128 grid)
        fq = fused
        fused = dict(fused)
        rec = (fq["gru_a_rec"]["recurrent_q8"].astype(jnp.float32) / 128.0
               + jnp.concatenate([jnp.diag(d) for d in jnp.split(
                   fq["gru_a_rec"]["recurrent_diag"], 3)], axis=1))
        fused["gru_a_rec"] = dict(fq["gru_a_rec"], recurrent=rec)
        fused["gru_b_in"] = fused.pop("gru_b_in_q8").astype(jnp.float32) / 128.0
        fused["gru_b_rec"] = dict(
            fq["gru_b_rec"],
            recurrent=fq["gru_b_rec"]["recurrent_q8"].astype(jnp.float32)
            / 128.0)
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    emb_cat = jnp.concatenate(
        [fused["embed_sig_a"], fused["embed_pred_a"], fused["embed_exc_a"]],
        axis=0)                                         # [768, 3Na]
    dk = fused["dual_fc"]["kernel"]                     # [nb, 256, 2]
    # column layout: one [nb, 512] matmul per step yields BOTH channels of
    # every node's pre-activation; bias/factor ride as [1, 512] rows
    dual_w = jnp.concatenate([dk[:, :, 0], dk[:, :, 1]], axis=1)  # [nb, 512]
    dual_bias = jnp.concatenate([fused["dual_fc"]["bias"][:, 0],
                                 fused["dual_fc"]["bias"][:, 1]])[None, :]
    dual_factor = jnp.concatenate([fused["dual_fc"]["factor"][:, 0],
                                   fused["dual_fc"]["factor"][:, 1]])[None, :]
    kw = {
        "a_bias1": fused["gru_a_rec"]["bias"][1][None, :].astype(jnp.float32),
        "b_rec": fused["gru_b_rec"]["recurrent"].astype(dtype),
        "b_bias1": fused["gru_b_rec"]["bias"][1][None, :].astype(jnp.float32),
        "dual_w": dual_w.astype(jnp.float32),
        "dual_bias": dual_bias.astype(jnp.float32),
        "dual_factor": dual_factor.astype(jnp.float32),
        "logit_table": jnp.asarray(_logit_table())[None, :],  # [1, 256]
    }
    if quantized:
        if was_q:
            a_off_q8 = fq["gru_a_rec"]["recurrent_q8"]
            a_diag = fq["gru_a_rec"]["recurrent_diag"]
            b_in_q8 = fq["gru_b_in_q8"]
        else:
            off, a_diag = Q.split_diag(fused["gru_a_rec"]["recurrent"])
            a_off_q8 = Q.quantize_weights_int8(off)
            b_in_q8 = Q.quantize_weights_int8(fused["gru_b_in"])
        # per-column scales for the (reference-float) fused embedding table
        emb_f32 = emb_cat.astype(jnp.float32)
        emb_scale = jnp.maximum(jnp.max(jnp.abs(emb_f32), axis=0), 1e-10) / 127.0
        emb_q8 = jnp.clip(jnp.round(emb_f32 / emb_scale), -127, 127
                          ).astype(jnp.int8)
        if was_q:
            b_rec_q8 = fq["gru_b_rec"]["recurrent_q8"]
        else:
            b_rec_q8 = Q.quantize_weights_int8(fused["gru_b_rec"]["recurrent"])
        kw.update(
            emb_q8=emb_q8, emb_scale=emb_scale[None, :],
            a_rec_q8=a_off_q8, a_diag=jnp.asarray(a_diag, jnp.float32)[None, :],
            b_in_q8=b_in_q8, b_rec_q8=b_rec_q8)
        del kw["b_rec"]
        if _EMB == "factored" and "embed_table" in fused:
            # Factored embedding operands (LPCNET_EMB=factored): gather the
            # shared 128-dim u-law embedding first (three [BT,256]x[256,128]
            # one-hot matmuls), then apply the GRU-A input kernel as ONE
            # [BT,384]x[384,3Na] matmul -- ~26% fewer issued MXU tile-ops
            # than the composed [BT,768]x[768,3Na] contraction, whose K is
            # 99.6% zeros.  Scales: e int8 per-column (s_e); s_e folds into
            # the kernel's rows before its own per-column quantization, so
            # the gathered int8 rows feed the second matmul directly.
            e = fused["embed_table"].astype(jnp.float32)          # [256,128]
            kain = fused["gru_a_in_kernel"].astype(jnp.float32)   # [384,3Na]
            s_e = jnp.maximum(jnp.max(jnp.abs(e), axis=0), 1e-10) / 127.0
            e_q8 = jnp.clip(jnp.round(e / s_e), -127, 127).astype(jnp.int8)
            ka_s = kain * jnp.tile(s_e, 3)[:, None]
            t = jnp.maximum(jnp.max(jnp.abs(ka_s), axis=0), 1e-10) / 127.0
            ka_q8 = jnp.clip(jnp.round(ka_s / t), -127, 127).astype(jnp.int8)
            kw.update(embf_q8=e_q8, embf_w_q8=ka_q8,
                      embf_scale=t[None, :].astype(jnp.float32))
    else:
        kw.update(
            emb_cat=emb_cat.astype(dtype),
            a_rec=fused["gru_a_rec"]["recurrent"].astype(dtype),
            b_in=fused["gru_b_in"].astype(dtype))
        kw.update(_merged_weights(kw, na, nb, dtype))
    return kw


def is_q8_bundle(kw) -> bool:
    return "emb_q8" in kw


def _merged_weights(kw, na, nb, dtype):
    """Issue-count optimization: fold the (one-hot embedding, recurrent)
    matmul pair of each GRU into ONE matmul over concatenated operands.

    The reset-after GRU sums input and recurrent contributions for the z/r
    gates but applies r only to the recurrent h-part, so the merged matrix
    has 4N output columns: [z | r | h_input-side | h_recurrent-side], with
    each operand's rows zeroed in the column block it does not feed.
    """
    def merge(w_in, w_rec, n):
        k_in, k_rec = w_in.shape[0], w_rec.shape[0]
        z = lambda r, c: jnp.zeros((r, c), dtype)
        top = jnp.concatenate([w_in[:, :2 * n], w_in[:, 2 * n:], z(k_in, n)], 1)
        bot = jnp.concatenate([w_rec[:, :2 * n], z(k_rec, n), w_rec[:, 2 * n:]], 1)
        return jnp.concatenate([top, bot], axis=0)      # [k_in+k_rec, 4n]

    return {
        "a_merged": merge(kw["emb_cat"], kw["a_rec"], na),
        "b_merged": merge(kw["b_in"], kw["b_rec"], nb),
    }


def _cond4(cond, bias1, n):
    """Per-frame conditioning remapped to the merged 4N column layout, with
    the recurrent bias folded in (saves two adds per sample step)."""
    z = jnp.zeros(cond.shape[:-1] + (n,), cond.dtype)
    c4 = jnp.concatenate([cond[..., :2 * n], cond[..., 2 * n:], z], axis=-1)
    b4 = jnp.concatenate([bias1[..., :2 * n],
                          jnp.zeros_like(bias1[..., :n]),
                          bias1[..., 2 * n:]], axis=-1)
    return c4 + b4


def _lin2ulaw(x):
    """Matches dsp.mulaw.lin2ulaw (exact log variant)."""
    s = jnp.where(x >= 0, 1.0, -1.0)
    logv = 0.69315 * jnp.log2(1.0 + _SCALE * jnp.abs(x))
    u = jnp.clip(128.0 + s * (128.0 * logv / LOG256), 0.0, 255.0)
    return jnp.floor(0.5 + u).astype(jnp.int32)


def _ulaw2lin(u):
    u = u.astype(jnp.float32) - 128.0
    s = jnp.where(u >= 0, 1.0, -1.0)
    return s * _SCALE_1 * (jnp.exp(jnp.abs(u) / 128.0 * LOG256) - 1.0)


def _kiss99(z, w, jsr, jcong):
    u16 = jnp.uint32(0xFFFF)
    znew = jnp.uint32(36969) * (z & u16) + (z >> 16)
    wnew = jnp.uint32(18000) * (w & u16) + (w >> 16)
    mwc = (znew << 16) + wnew
    shr3 = jsr ^ (jsr << 13)
    shr3 = shr3 ^ (shr3 >> 17)
    shr3 = shr3 ^ (shr3 << 5)
    cong = jnp.uint32(69069) * jcong + jnp.uint32(1234567)
    return (mwc ^ cong) + shr3, znew, wnew, shr3, cong


def _compiler_params():
    """Mosaic grid-semantics hint: batch tiles are independent, so
    `parallel` is legal and lets Mosaic skip cross-iteration ordering
    (measured +2% on q8 B=1024, BENCHMARKS.md; LPCNET_KERNEL_DIMSEM=
    arbitrary|none overrides for A/B)."""
    ds = __import__("os").environ.get("LPCNET_KERNEL_DIMSEM", "parallel")
    if not ds or ds == "none":
        return None
    return pltpu.CompilerParams(dimension_semantics=(ds,))


def _onehot(idx, n):
    """idx [BT, 1] int32 -> [BT, n] f32 one-hot."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return (lanes == idx).astype(jnp.float32)


# Weight-operand ref names per numeric variant, in kernel-argument order.
_WNAMES_F32 = ("emb_cat", "a_rec", "a_bias1", "b_in", "b_rec", "b_bias1",
               "dual_w", "dual_bias", "dual_factor", "logit_table")
_WNAMES_Q8 = ("emb_q8", "emb_scale", "a_rec_q8", "a_diag", "a_bias1",
              "b_in_q8", "b_rec_q8", "b_bias1",
              "dual_w", "dual_bias", "dual_factor", "logit_table")
_WNAMES_Q8_FACT = ("embf_q8", "embf_w_q8", "embf_scale", "a_rec_q8",
                   "a_diag", "a_bias1", "b_in_q8", "b_rec_q8", "b_bias1",
                   "dual_w", "dual_bias", "dual_factor", "logit_table")


def _q8_names(kw):
    return _WNAMES_Q8_FACT if "embf_q8" in kw else _WNAMES_Q8

def _gru_ab(q8, na, nb, W, conda, condb, sig_u, pred_u, exc_u, h_a0, h_b0):
    """One GRU-A + GRU-B step on a batch tile; the numeric core shared by
    every kernel variant.

    q8=False: bf16/f32 MXU operands. q8=True: int8 MXU operands -- exact
    DOT_PROD integer numerics for the GRU matrices (round(128*w) weights x
    floor(0.5+127*h) activations, int32 accumulation, float GRU-A diagonal,
    matching nn.quantized.gru_precomputed_step_q8) and a per-column-scaled
    int8 embedding table (float in the reference; ~0.4% per-entry error).
    """
    b = sig_u.shape[0]
    # single 768-lane one-hot with three hot positions (data-dependent row
    # gathers don't vectorize in Mosaic; one-hot contraction does). The hot
    # ranges are disjoint, so boolean OR avoids unsupported i8 vector adds.
    l768 = jax.lax.broadcasted_iota(jnp.int32, (b, 768), 1)
    if q8:
        if "emb" in _ABLATE:
            gate_a = conda
        elif "embf_q8" in W:
            # factored: gather the shared embedding's int8 rows via three
            # [BT,256] one-hot matmuls (dot output values ARE e_q8 rows, so
            # the int32->int8 narrowing is exact), then one [BT,384] matmul
            # with the scale-folded input kernel
            l256 = jax.lax.broadcasted_iota(jnp.int32, (b, 256), 1)
            g = jnp.concatenate(
                [jnp.dot((l256 == u).astype(jnp.int8), W["embf_q8"][:],
                         preferred_element_type=jnp.int32).astype(jnp.int8)
                 for u in (sig_u, pred_u, exc_u)], axis=1)      # [BT, 384]
            gate_a = conda + (jnp.dot(g, W["embf_w_q8"][:],
                                      preferred_element_type=jnp.int32)
                              .astype(jnp.float32) * W["embf_scale"][:])
        else:
            oh = ((l768 == sig_u) | (l768 == pred_u + 256)
                  | (l768 == exc_u + 512)).astype(jnp.int8)
            gate_a = conda + (jnp.dot(oh, W["emb_q8"][:],
                                      preferred_element_type=jnp.int32)
                              .astype(jnp.float32) * W["emb_scale"][:])
        if "arec" in _ABLATE:
            zrec = (W["a_diag"][:] * jnp.concatenate([h_a0] * 3, axis=1)
                    + W["a_bias1"][:])
        else:
            h_q = _quant_act(h_a0)
            zrec = (jnp.dot(h_q, W["a_rec_q8"][:],
                            preferred_element_type=jnp.int32)
                    .astype(jnp.float32) * _SCALE_Q
                    + W["a_diag"][:] * jnp.concatenate([h_a0] * 3, axis=1)
                    + W["a_bias1"][:])
    else:
        wdt = W["emb_cat"].dtype
        if "emb" in _ABLATE:
            gate_a = conda
        else:
            oh = ((l768 == sig_u).astype(wdt)
                  + (l768 == pred_u + 256).astype(wdt)
                  + (l768 == exc_u + 512).astype(wdt))
            gate_a = conda + jnp.dot(oh, W["emb_cat"][:],
                                     preferred_element_type=jnp.float32)
        if "arec" in _ABLATE:
            zrec = jnp.broadcast_to(W["a_bias1"][:], (b, 3 * na))
        else:
            zrec = jnp.dot(h_a0.astype(wdt), W["a_rec"][:],
                           preferred_element_type=jnp.float32) + W["a_bias1"][:]
    z = jax.nn.sigmoid(gate_a[:, :na] + zrec[:, :na])
    r = jax.nn.sigmoid(gate_a[:, na:2 * na] + zrec[:, na:2 * na])
    hc = jnp.tanh(gate_a[:, 2 * na:] + r * zrec[:, 2 * na:])
    h_a = z * h_a0 + (1.0 - z) * hc

    if q8:
        gate_b = condb + (jnp.dot(_quant_act(h_a), W["b_in_q8"][:],
                                  preferred_element_type=jnp.int32)
                          .astype(jnp.float32) * _SCALE_Q)
    else:
        wdt = W["emb_cat"].dtype
        gate_b = condb + jnp.dot(h_a.astype(wdt), W["b_in"][:],
                                 preferred_element_type=jnp.float32)
    if q8:
        # C's compute_gruB quantizes the dense recurrent too
        # (src/nnet.c:326-373 via sgemv_accum8x4)
        zrec_b = (jnp.dot(_quant_act(h_b0), W["b_rec_q8"][:],
                          preferred_element_type=jnp.int32)
                  .astype(jnp.float32) * _SCALE_Q + W["b_bias1"][:])
    else:
        zrec_b = jnp.dot(h_b0.astype(W["b_rec"].dtype), W["b_rec"][:],
                         preferred_element_type=jnp.float32) + W["b_bias1"][:]
    zb = jax.nn.sigmoid(gate_b[:, :nb] + zrec_b[:, :nb])
    rb = jax.nn.sigmoid(gate_b[:, nb:2 * nb] + zrec_b[:, nb:2 * nb])
    hcb = jnp.tanh(gate_b[:, 2 * nb:] + rb * zrec_b[:, 2 * nb:])
    h_b = zb * h_b0 + (1.0 - zb) * hcb
    return h_a, h_b


def _draw_bytes(rng_out, adv=None):
    """Two KISS99 draws per stream in uint32 vector registers; returns the 8
    per-bit threshold bytes. With `adv` (bool [BT, 1]), masked streams keep
    their RNG state (scan-path semantics: the RNG advances only on advanced
    steps, even when the sampled value is overridden)."""
    z0 = rng_out[:, 0:1]
    w0 = rng_out[:, 1:2]
    j0 = rng_out[:, 2:3]
    c0 = rng_out[:, 3:4]
    r1, z1, w1, j1, c1 = _kiss99(z0, w0, j0, c0)
    r2, z1, w1, j1, c1 = _kiss99(z1, w1, j1, c1)
    if adv is None:
        rng_out[:, 0:1] = z1
        rng_out[:, 1:2] = w1
        rng_out[:, 2:3] = j1
        rng_out[:, 3:4] = c1
    else:
        adv_u = adv.astype(jnp.uint32)
        keep = jnp.uint32(1) - adv_u
        rng_out[:, 0:1] = adv_u * z1 + keep * z0
        rng_out[:, 1:2] = adv_u * w1 + keep * w0
        rng_out[:, 2:3] = adv_u * j1 + keep * j0
        rng_out[:, 3:4] = adv_u * c1 + keep * c0
    return [(r1 >> (8 * k)) & jnp.uint32(0xFF) for k in range(4)] + \
           [(r2 >> (8 * k)) & jnp.uint32(0xFF) for k in range(4)]


_BITTREE = __import__("os").environ.get("LPCNET_BITTREE", "v1")


def _bit_tree(W, h_b, bytes_, exc_u):
    """8 sequential bit decisions over the dual-FC tree; all 256 node logits
    from one [BT, nb] x [nb, 512] matmul, lane-selects via masked VPU
    reduces (sample_mdense, src/nnet.c:163-214).

    v1: the node-logit and RNG-threshold selects are fused into ONE masked
    reduce per bit over a [BT, 512] payload of [logits | -thresholds]: the
    two hot lanes are disjoint (node < 256 <= 256+byte), so the reduce
    yields exactly logit - thr, and IEEE sign-exactness of subtraction makes
    `diff > 0` decide identically to the reference's `thr < logit`
    (halves the sequential VPU selects on the sampler's critical path).

    v2 (LPCNET_BITTREE=v2): all 8 threshold lookups hoist OUT of the
    sequential chain into one [BT, 8, 256] masked reduce (the bytes are all
    known before the descent), and each bit's node select reads only its
    STATIC subtree slice -- at bit b the candidate rows (1<<b)|val span
    exactly lanes [2^b, 2^{b+1}) of all_logits, so the masked reduce covers
    2^b lanes instead of 512 (255 total across the descent vs 4096).
    diff = logit - thr is the same two-term f32 sum as v1's two-hot reduce:
    bit decisions are bit-identical."""
    pre = jnp.dot(h_b, W["dual_w"][:],
                  preferred_element_type=jnp.float32) + W["dual_bias"][:]
    tpre = W["dual_factor"][:] * jnp.tanh(pre)       # [BT, 512]
    all_logits = tpre[:, :256] + tpre[:, 256:]       # [BT, 256]
    val = jnp.zeros_like(exc_u)
    if _BITTREE in ("v2", "v3"):
        bt = all_logits.shape[0]
        if _BITTREE == "v3":
            # one 3D masked reduce for all 8 lookups (bigger temp: [BT,8,256])
            b8 = jnp.concatenate([b.astype(jnp.int32) for b in bytes_],
                                 axis=1)             # [BT, 8]
            l256 = jax.lax.broadcasted_iota(jnp.int32, (bt, 8, 256), 2)
            table3 = jnp.broadcast_to(W["logit_table"][:][None, :, :],
                                      (bt, 8, 256))
            thr = jnp.sum(jnp.where(l256 == b8[:, :, None], table3, 0.0),
                          axis=2)                    # [BT, 8]
        else:
            # 8 independent 256-lane reduces, no cross-dependency: ILP-
            # schedulable, small reused temps
            l256 = jax.lax.broadcasted_iota(jnp.int32, (bt, 256), 1)
            table = jnp.broadcast_to(W["logit_table"][:], (bt, 256))
            thr = jnp.concatenate(
                [jnp.sum(jnp.where(l256 == b.astype(jnp.int32), table, 0.0),
                         axis=1, keepdims=True) for b in bytes_], axis=1)
        for b in range(8):
            width = 1 << b
            sub = all_logits[:, width:2 * width]     # [BT, 2^b]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (bt, width), 1)
            logit = jnp.sum(jnp.where(lanes == val, sub, 0.0),
                            axis=1, keepdims=True)
            bit = (logit - thr[:, b:b + 1] > 0).astype(jnp.int32)
            val = (val << 1) | bit
        return val
    payload = jnp.concatenate(
        [all_logits,
         jnp.broadcast_to(-W["logit_table"][:], all_logits.shape)], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, payload.shape, 1)
    for b in range(8):
        rows = (1 << b) | val
        sel = bytes_[b].astype(jnp.int32) + 256
        diff = jnp.sum(jnp.where((lanes == rows) | (lanes == sel),
                                 payload, 0.0), axis=1, keepdims=True)
        bit = (diff > 0).astype(jnp.int32)
        val = (val << 1) | bit
    return val


def _ar_kernel(n_samples, na, nb, q8, masked, sampled, names, *refs):
    """Unified fused AR kernel body: f32/bf16 or int8 MXU operands (q8),
    free-running or per-stream/per-sample masked + teacher-forced (masked),
    with or without the dual-FC sampler (sampled=False is masked-only --
    callers assert every advanced step is teacher-forced)."""
    nw = len(names)
    W = dict(zip(names, refs[:nw]))
    conda_ref, condb_ref, lpc_ref = refs[nw:nw + 3]
    i = nw + 3
    if masked:
        preload_ref, mode_ref = refs[i:i + 2]
        i += 2
    (ha_in, hb_in, sig_in, exc_in, de_in, rng_in,
     ha_out, hb_out, sig_out, exc_out, de_out, rng_out, pcm_out) = refs[i:]

    ha_out[:] = ha_in[:]
    hb_out[:] = hb_in[:]
    sig_out[:] = sig_in[:]
    exc_out[:] = exc_in[:]
    de_out[:] = de_in[:]
    rng_out[:] = rng_in[:]

    def step(target, m, _):
        if masked:
            adv = (m & 1) > 0                     # [BT, 1] bool
            tf = (m & 2) > 0
        last_sig = sig_out[:]                     # [BT, 16]
        lpc = lpc_ref[:]
        pred = -jnp.sum(last_sig * lpc, axis=1, keepdims=True)   # [BT, 1]
        sig_u = _lin2ulaw(last_sig[:, 0:1])
        pred_u = _lin2ulaw(pred)
        exc_u = exc_out[:]                        # [BT, 1] int32

        h_a0 = ha_out[:]
        h_b0 = hb_out[:]
        h_a, h_b = _gru_ab(q8, na, nb, W, conda_ref[:], condb_ref[:],
                           sig_u, pred_u, exc_u, h_a0, h_b0)
        if masked:
            ha_out[:] = jnp.where(adv, h_a, h_a0)
            hb_out[:] = jnp.where(adv, h_b, h_b0)
            bytes_ = _draw_bytes(rng_out, adv)
        else:
            ha_out[:] = h_a
            hb_out[:] = h_b
            bytes_ = _draw_bytes(rng_out)

        if sampled:
            val = _bit_tree(W, h_b, bytes_, exc_u)
        else:
            val = jnp.zeros_like(exc_u)

        de0 = de_out[:]
        if masked:
            pcm_tf = target - PREEMPHASIS * de0
            exc_tf = _lin2ulaw(pcm_tf - pred)
            val = jnp.where(tf, exc_tf, val)
            pcm = jnp.where(tf, pcm_tf, pred + _ulaw2lin(val))
            exc_out[:] = jnp.where(adv, val, exc_u)
            sig_out[:] = jnp.where(
                adv,
                jnp.concatenate([pcm, last_sig[:, :LPC_ORDER - 1]], axis=1),
                last_sig)
            out = pcm + PREEMPHASIS * de0
            de_out[:] = jnp.where(adv, out, de0)
            return jnp.where(
                adv, jnp.floor(0.5 + jnp.clip(out, -32767.0, 32767.0)), 0.0)
        pcm = pred + _ulaw2lin(val)
        exc_out[:] = val
        sig_out[:] = jnp.concatenate([pcm, last_sig[:, :LPC_ORDER - 1]],
                                     axis=1)
        out = pcm + PREEMPHASIS * de0
        de_out[:] = out
        out = jnp.clip(out, -32767.0, 32767.0)
        return jnp.floor(0.5 + out)               # [BT, 1]

    # Mosaic cannot store single dynamic lanes, so samples are produced in
    # groups of 8 and written as one [8, BT] sublane block per group (the
    # output is [n_samples, B], transposed back outside the kernel).
    def octave(o, _):
        if masked:
            pblk = preload_ref[pl.ds(pl.multiple_of(o * 8, 8), 8), :].T
            mblk = mode_ref[pl.ds(pl.multiple_of(o * 8, 8), 8), :].T
            cols = [step(pblk[:, j:j + 1], mblk[:, j:j + 1], None)
                    for j in range(8)]
        else:
            cols = [step(None, None, None) for _ in range(8)]
        block = jnp.concatenate(cols, axis=1)   # [BT, 8]
        pcm_out[pl.ds(pl.multiple_of(o * 8, 8), 8), :] = block.T
        return 0

    jax.lax.fori_loop(0, n_samples // 8, octave, 0)


def _sample_kernel_merged(n_samples, na, nb,
                          # inputs
                          amerged_ref, bmerged_ref,
                          dualw_ref, dualb_ref, dualf_ref, table_ref,
                          conda4_ref, condb4_ref, lpc_ref,
                          ha_in, hb_in, sig_in, exc_in, de_in, rng_in,
                          # outputs
                          ha_out, hb_out, sig_out, exc_out, de_out, rng_out,
                          pcm_out):
    """3-matmul step variant: each GRU's (one-hot/input, recurrent) matmul
    pair is fused into one MXU op over concatenated operands; the per-frame
    conditioning arrives pre-mapped to the 4N merged layout with the
    recurrent bias folded in (see _merged_weights/_cond4)."""
    ha_out[:] = ha_in[:]
    hb_out[:] = hb_in[:]
    sig_out[:] = sig_in[:]
    exc_out[:] = exc_in[:]
    de_out[:] = de_in[:]
    rng_out[:] = rng_in[:]

    def step(t, _):
        last_sig = sig_out[:]
        lpc = lpc_ref[:]
        pred = -jnp.sum(last_sig * lpc, axis=1, keepdims=True)
        sig_u = _lin2ulaw(last_sig[:, 0:1])
        pred_u = _lin2ulaw(pred)
        exc_u = exc_out[:]

        wdt = amerged_ref.dtype
        l768 = jax.lax.broadcasted_iota(jnp.int32, (sig_u.shape[0], 768), 1)
        oh = ((l768 == sig_u).astype(wdt)
              + (l768 == pred_u + 256).astype(wdt)
              + (l768 == exc_u + 512).astype(wdt))
        h_a = ha_out[:]
        xa = jnp.concatenate([oh, h_a.astype(wdt)], axis=1)   # [BT, 768+na]
        m = jnp.dot(xa, amerged_ref[:],
                    preferred_element_type=jnp.float32) + conda4_ref[:]
        z = jax.nn.sigmoid(m[:, :na])
        r = jax.nn.sigmoid(m[:, na:2 * na])
        hc = jnp.tanh(m[:, 2 * na:3 * na] + r * m[:, 3 * na:])
        h_a = z * h_a + (1.0 - z) * hc
        ha_out[:] = h_a

        h_b = hb_out[:]
        xb = jnp.concatenate([h_a.astype(wdt), h_b.astype(wdt)], axis=1)
        mb = jnp.dot(xb, bmerged_ref[:],
                     preferred_element_type=jnp.float32) + condb4_ref[:]
        zb = jax.nn.sigmoid(mb[:, :nb])
        rb = jax.nn.sigmoid(mb[:, nb:2 * nb])
        hcb = jnp.tanh(mb[:, 2 * nb:3 * nb] + rb * mb[:, 3 * nb:])
        h_b = zb * h_b + (1.0 - zb) * hcb
        hb_out[:] = h_b

        # --- bit-tree sampling (shared helpers with the unmerged kernel) ---
        bytes_ = _draw_bytes(rng_out)
        val = _bit_tree({"dual_w": dualw_ref, "dual_bias": dualb_ref,
                         "dual_factor": dualf_ref, "logit_table": table_ref},
                        h_b, bytes_, exc_u)

        pcm = pred + _ulaw2lin(val)
        exc_out[:] = val
        sig_out[:] = jnp.concatenate([pcm, last_sig[:, :LPC_ORDER - 1]], axis=1)
        out = pcm + PREEMPHASIS * de_out[:]
        de_out[:] = out
        out = jnp.clip(out, -32767.0, 32767.0)
        return jnp.floor(0.5 + out)

    def octave(o, _):
        cols = [step(o * 8 + j, None) for j in range(8)]
        block = jnp.concatenate(cols, axis=1)
        pcm_out[pl.ds(pl.multiple_of(o * 8, 8), 8), :] = block.T
        return 0

    jax.lax.fori_loop(0, n_samples // 8, octave, 0)




def _run_ar_kernel(kw, state, cond_a, cond_b, lpc, cfg, n_samples, bt,
                   sampled=True, preload_t=None, mode_t=None):
    """Shared pallas_call builder for the unified AR kernel (_ar_kernel):
    picks the weight-ref list by bundle type (f32/bf16 vs int8), appends the
    masked variant's per-sample preload/mode blocks when given, and wires
    the carried SampleState through input/output blocks."""
    q8 = is_q8_bundle(kw)
    masked = preload_t is not None
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    b = cond_a.shape[0]
    assert b % bt == 0, f"batch {b} must be a multiple of {bt}"
    assert n_samples % 8 == 0, "n_samples must be a multiple of 8"
    grid = (b // bt,)
    BT = bt

    rng = jnp.stack([state.rng.z, state.rng.w, state.rng.jsr, state.rng.jcong],
                    axis=1)                                # [B, 4] uint32
    exc = state.last_exc[:, None].astype(jnp.int32)        # [B, 1]
    de = state.deemph[:, None]

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def b_spec(cols):
        return pl.BlockSpec((BT, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t_spec = pl.BlockSpec((n_samples, BT), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    names = _q8_names(kw) if q8 else _WNAMES_F32
    kernel = functools.partial(_ar_kernel, n_samples, na, nb, q8, masked,
                               sampled, names)
    in_specs = ([w_spec(kw[n].shape) for n in names]
                + [b_spec(3 * na), b_spec(3 * nb), b_spec(LPC_ORDER)]
                + ([t_spec, t_spec] if masked else [])
                + [b_spec(na), b_spec(nb), b_spec(LPC_ORDER), b_spec(1),
                   b_spec(1), b_spec(4)])
    operands = ([kw[n] for n in names] + [cond_a, cond_b, lpc]
                + ([preload_t, mode_t] if masked else [])
                + [state.gru_a, state.gru_b, state.last_sig, exc, de, rng])
    out_shapes = (
        jax.ShapeDtypeStruct((b, na), jnp.float32),
        jax.ShapeDtypeStruct((b, nb), jnp.float32),
        jax.ShapeDtypeStruct((b, LPC_ORDER), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.uint32),
        jax.ShapeDtypeStruct((n_samples, b), jnp.float32),
    )
    out_specs = (
        b_spec(na), b_spec(nb), b_spec(LPC_ORDER), b_spec(1), b_spec(1),
        b_spec(4), t_spec,
    )

    ha, hb, sig, exc2, de2, rng2, pcm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(*operands)

    new_state = SampleState(
        gru_a=ha, gru_b=hb, last_sig=sig,
        last_exc=exc2[:, 0], deemph=de2[:, 0],
        rng=Kiss99State(rng2[:, 0], rng2[:, 1], rng2[:, 2], rng2[:, 3]),
    )
    return new_state, pcm.T


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_samples", "bt", "sampled"))
def synthesize_frame_masked_pallas(kw, state: SampleState, cond_a, cond_b,
                                   lpc, preload, preload_mask, advance_mask,
                                   cfg: LPCNetConfig, n_samples: int = 160,
                                   bt: int = 0, sampled: bool = True
                                   ) -> Tuple[SampleState, jnp.ndarray]:
    """Fused-kernel synthesize_frame_masked: per-stream, per-sample
    teacher-force + advance masks (see models.lpcnet.synthesize_frame_masked
    for the mask semantics). sampled=False elides the dual-FC sampler for
    calls whose advanced steps are all teacher-forced.
    """
    b = cond_a.shape[0]
    # the masked kernel carries extra VMEM blocks (preload/mode/pcm are all
    # [n_samples, BT]); the 256 tile is the safe/fast default, but an
    # explicit LPCNET_KERNEL_BT pin is honored (not silently clamped)
    bt = bt or (int(_BT_ENV) if _BT_ENV else min(_pick_bt(b), 256))
    mode = (jnp.asarray(advance_mask, bool).astype(jnp.int32)
            | (jnp.asarray(preload_mask, bool).astype(jnp.int32) << 1))
    preload_t = jnp.asarray(preload, jnp.float32).T      # [n, B]
    return _run_ar_kernel(kw, state, cond_a, cond_b, lpc, cfg, n_samples, bt,
                          sampled=sampled, preload_t=preload_t, mode_t=mode.T)


def synthesize_frame_masked_auto(kw, state, cond_a, cond_b, lpc, preload,
                                 preload_mask, advance_mask, cfg,
                                 sampled: bool = True):
    """Batch-padding wrapper for synthesize_frame_masked_pallas (streams
    padded up to a 256 multiple advance=False, so padding is inert)."""
    b = cond_a.shape[0]
    n = preload.shape[-1]
    pb = (b + 255) // 256 * 256
    if pb == b:
        return synthesize_frame_masked_pallas(
            kw, state, cond_a, cond_b, lpc, preload, preload_mask,
            advance_mask, cfg, n, sampled=sampled)

    def pad(x):
        widths = [(0, pb - b)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    st_p = jax.tree.map(pad, state)
    new_p, pcm = synthesize_frame_masked_pallas(
        kw, st_p, pad(cond_a), pad(cond_b), pad(lpc), pad(preload),
        pad(preload_mask), pad(advance_mask), cfg, n, sampled=sampled)
    unpad = lambda x: x[:b]
    return jax.tree.map(unpad, new_p), pcm[:b]


# ---------------------------------------------------------------------------
# Teacher-forced fast path
# ---------------------------------------------------------------------------
# In a fully teacher-forced segment every sample-rate quantity except the GRU
# states and the RNG is a closed-form function of the target audio: de_t is
# (target - P*de) + P*de (set here to target directly -- mathematically
# identical, one rounding), pcm_t = target_t - P*de_{t-1}, the signal history
# is a sliding window over [carried last_sig | pcm], pred_t is a 16-tap FIR
# of that window, and the three u-law embedding indices follow. So the
# sequential kernel only needs to carry h_a/h_b/rng: per step it builds the
# 3-hot from precomputed VMEM index sequences and runs the two GRU updates --
# no LPC filter, no u-law transcendentals, no per-sample pcm stores. This is
# the TPU answer to the reference PLC's queued-audio resync passes
# (src/lpcnet_plc.c:188-243), which dominate the batched mixed-loss PLC's
# frame budget (3x160-step drains per fused step).

# f32/q8 weight subsets actually used by the TF kernel (no sampler tables)
_WNAMES_TF_F32 = ("emb_cat", "a_rec", "a_bias1", "b_in", "b_rec", "b_bias1")
_WNAMES_TF_Q8 = ("emb_q8", "emb_scale", "a_rec_q8", "a_diag", "a_bias1",
                 "b_in_q8", "b_rec_q8", "b_bias1")
_WNAMES_TF_Q8_FACT = ("embf_q8", "embf_w_q8", "embf_scale", "a_rec_q8",
                      "a_diag", "a_bias1", "b_in_q8", "b_rec_q8", "b_bias1")


def _tf_names(kw, q8):
    if not q8:
        return _WNAMES_TF_F32
    return _WNAMES_TF_Q8_FACT if "embf_q8" in kw else _WNAMES_TF_Q8


def _tf_kernel(blk_samples, n_blocks, na, nb, q8, names, *refs):
    """GRU-only teacher-forced kernel: precomputed u-law index sequences in,
    (h_a, h_b, rng) out. `n_blocks` static conditioning blocks of
    `blk_samples` steps each (the PLC drain's per-iteration frame nets);
    streams advance on a per-(stream, block) step-count prefix (count=0
    freezes a stream for that block)."""
    nw = len(names)
    W = dict(zip(names, refs[:nw]))
    (conda_ref, condb_ref, count_ref, idx_ref,
     ha_in, hb_in, rng_in, ha_out, hb_out, rng_out) = refs[nw:]

    ha_out[:] = ha_in[:]
    hb_out[:] = hb_in[:]
    rng_out[:] = rng_in[:]

    for k in range(n_blocks):                            # static unroll
        conda_k = conda_ref[:, k * 3 * na:(k + 1) * 3 * na]
        condb_k = condb_ref[:, k * 3 * nb:(k + 1) * 3 * nb]
        count_k = count_ref[:, k:k + 1]                  # [BT, 1] int32

        def octave(oo, _, k=k, conda_k=conda_k, condb_k=condb_k,
                   count_k=count_k):
            o = k * (blk_samples // 8) + oo
            # ONE packed block read per octave (sig | pred<<9 | exc<<18):
            # a third of the sublane->lane relayout traffic of 3 blocks
            iblk = idx_ref[pl.ds(pl.multiple_of(o * 8, 8), 8), :].T
            for j in range(8):
                t = oo * 8 + j
                adv = t < count_k                        # [BT, 1] bool
                v = iblk[:, j:j + 1]
                h_a0 = ha_out[:]
                h_b0 = hb_out[:]
                h_a, h_b = _gru_ab(q8, na, nb, W, conda_k, condb_k,
                                   v & 511, (v >> 9) & 511, v >> 18,
                                   h_a0, h_b0)
                ha_out[:] = jnp.where(adv, h_a, h_a0)
                hb_out[:] = jnp.where(adv, h_b, h_b0)
                _draw_bytes(rng_out, adv)                # RNG advance only
            return 0

        jax.lax.fori_loop(0, blk_samples // 8, octave, 0)


def _tf_precompute(state: SampleState, lpc, targets, count):
    """Closed-form teacher-forced sequences + terminal signal state.

    Returns (sig_u, pred_u, exc_in [B, n] int32 index sequences;
    new_last_sig, new_last_exc, new_deemph terminal values at each stream's
    prefix length). All static-shaped vector math; the per-stream terminal
    selects are one-hot contractions, NOT gathers (TPU gathers serialize --
    the same lesson as the Viterbi rewrite, BENCHMARKS.md)."""
    targets = jnp.asarray(targets, jnp.float32)
    b, n = targets.shape
    count = jnp.asarray(count, jnp.int32)
    de_prev = jnp.concatenate([state.deemph[:, None], targets[:, :-1]],
                              axis=1)                    # [B, n]
    pcm = targets - PREEMPHASIS * de_prev
    ext = jnp.concatenate([state.last_sig[:, ::-1], pcm], axis=1)  # [B,16+n]
    pred = -sum(lpc[:, k:k + 1] * ext[:, LPC_ORDER - 1 - k:
                                      LPC_ORDER - 1 - k + n]
                for k in range(LPC_ORDER))
    sig_u = _lin2ulaw(ext[:, LPC_ORDER - 1:LPC_ORDER - 1 + n])
    pred_u = _lin2ulaw(pred)
    exc_tf = _lin2ulaw(pcm - pred)
    exc_in = jnp.concatenate(
        [state.last_exc[:, None].astype(jnp.int32), exc_tf[:, :-1]], axis=1)

    adv_any = count > 0
    oh_last = (jnp.arange(n)[None, :]
               == jnp.maximum(count - 1, 0)[:, None]).astype(jnp.float32)
    # terminal window ext[:, c:c+16] as 16 shifted one-hot row-dots
    win = jnp.stack([jnp.sum(oh_last * ext[:, k + 1:k + 1 + n], axis=1)
                     for k in range(LPC_ORDER)], axis=1)   # [B, 16]
    new_sig = jnp.where(adv_any[:, None], win[:, ::-1], state.last_sig)
    exc_sel = jnp.sum(oh_last * exc_tf.astype(jnp.float32), axis=1)
    new_exc = jnp.where(adv_any, exc_sel.astype(exc_tf.dtype),
                        state.last_exc)
    new_de = jnp.where(adv_any, jnp.sum(oh_last * targets, axis=1),
                       state.deemph)
    return sig_u, pred_u, exc_in, new_sig, new_exc, new_de


@functools.partial(jax.jit, static_argnames=("cfg", "blk_samples", "bt"))
def teacher_force_blocks_pallas(kw, state: SampleState, cond_a_blocks,
                                cond_b_blocks, lpc_blocks, targets, counts,
                                cfg: LPCNetConfig, blk_samples: int,
                                bt: int = 0) -> SampleState:
    """N conditioning blocks of `blk_samples` teacher-forced steps in ONE
    kernel call (the PLC drain: per-iteration frame-net conds, one fused
    sample-rate pass). Per (stream, block) prefix counts; emits no pcm.

    Args: cond_a_blocks [B, N, 3Na], cond_b_blocks [B, N, 3Nb],
    lpc_blocks [B, N, 16], targets [B, N*blk_samples], counts [B, N].
    The signal-state closed form chains block to block outside the kernel;
    the kernel carries only (h_a, h_b, rng)."""
    q8 = is_q8_bundle(kw)
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    b, n_blocks = counts.shape
    bt = bt or (int(_BT_ENV) if _BT_ENV else min(_pick_bt(b), 256))
    assert b % bt == 0, f"batch {b} must be a multiple of {bt}"
    assert blk_samples % 8 == 0
    counts = jnp.asarray(counts, jnp.int32)

    # closed-form signal precompute, chained across blocks
    sigs, preds, excs = [], [], []
    sig_state = state
    for k in range(n_blocks):
        tgt_k = targets[:, k * blk_samples:(k + 1) * blk_samples]
        s_u, p_u, e_in, n_sig, n_exc, n_de = _tf_precompute(
            sig_state, lpc_blocks[:, k], tgt_k, counts[:, k])
        sigs.append(s_u)
        preds.append(p_u)
        excs.append(e_in)
        sig_state = sig_state._replace(last_sig=n_sig, last_exc=n_exc,
                                       deemph=n_de)
    sig_u = jnp.concatenate(sigs, axis=1)
    pred_u = jnp.concatenate(preds, axis=1)
    exc_in = jnp.concatenate(excs, axis=1)
    packed = sig_u | (pred_u << 9) | (exc_in << 18)       # [B, n] int32
    rng = jnp.stack([state.rng.z, state.rng.w, state.rng.jsr,
                     state.rng.jcong], axis=1)            # [B, 4] uint32
    n_total = n_blocks * blk_samples

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def b_spec(cols):
        return pl.BlockSpec((bt, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t_spec = pl.BlockSpec((n_total, bt), lambda i: (0, i),
                          memory_space=pltpu.VMEM)

    names = _tf_names(kw, q8)
    kernel = functools.partial(_tf_kernel, blk_samples, n_blocks, na, nb, q8,
                               names)
    in_specs = ([w_spec(kw[n].shape) for n in names]
                + [b_spec(n_blocks * 3 * na), b_spec(n_blocks * 3 * nb),
                   b_spec(n_blocks), t_spec,
                   b_spec(na), b_spec(nb), b_spec(4)])
    operands = ([kw[n] for n in names]
                + [cond_a_blocks.reshape(b, -1), cond_b_blocks.reshape(b, -1),
                   counts, packed.T,
                   state.gru_a, state.gru_b, rng])
    out_shapes = (
        jax.ShapeDtypeStruct((b, na), jnp.float32),
        jax.ShapeDtypeStruct((b, nb), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.uint32),
    )
    out_specs = (b_spec(na), b_spec(nb), b_spec(4))

    ha, hb, rng2 = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(*operands)

    return SampleState(
        gru_a=ha, gru_b=hb, last_sig=sig_state.last_sig,
        last_exc=sig_state.last_exc, deemph=sig_state.deemph,
        rng=Kiss99State(rng2[:, 0], rng2[:, 1], rng2[:, 2], rng2[:, 3]),
    )


def teacher_force_prefix_pallas(kw, state: SampleState, cond_a, cond_b, lpc,
                                targets, count, cfg: LPCNetConfig,
                                n_samples: int, bt: int = 0) -> SampleState:
    """Run `count[i]` teacher-forced steps of stream i (count=0 freezes it)
    through the GRU-only TF kernel; emits no pcm (TF callers discard it).
    Equivalent to synthesize_frame_masked_pallas(sampled=False) with a
    prefix advance mask, modulo one fewer rounding in the deemph carry."""
    return teacher_force_blocks_pallas(
        kw, state, cond_a[:, None], cond_b[:, None], lpc[:, None], targets,
        jnp.asarray(count, jnp.int32)[:, None], cfg, n_samples, bt)


def teacher_force_blocks_auto(kw, state, cond_a_blocks, cond_b_blocks,
                              lpc_blocks, targets, counts, cfg
                              ) -> SampleState:
    """Batch-padding wrapper for teacher_force_blocks_pallas (padding
    streams get count=0, so they are inert)."""
    b, n_blocks = counts.shape
    n = targets.shape[-1] // n_blocks
    counts = jnp.asarray(counts, jnp.int32)
    pb = (b + 255) // 256 * 256
    if pb == b:
        return teacher_force_blocks_pallas(
            kw, state, cond_a_blocks, cond_b_blocks, lpc_blocks, targets,
            counts, cfg, n)

    def pad(x):
        widths = [(0, pb - b)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    st_p = jax.tree.map(pad, state)
    new_p = teacher_force_blocks_pallas(
        kw, st_p, pad(cond_a_blocks), pad(cond_b_blocks), pad(lpc_blocks),
        pad(targets), pad(counts), cfg, n)
    return jax.tree.map(lambda x: x[:b], new_p)


def teacher_force_prefix_auto(kw, state, cond_a, cond_b, lpc, targets,
                              count, cfg) -> SampleState:
    """Single-block teacher_force_blocks_auto."""
    return teacher_force_blocks_auto(
        kw, state, cond_a[:, None], cond_b[:, None], lpc[:, None], targets,
        jnp.asarray(count, jnp.int32)[:, None], cfg)


# default pending the on-chip A/B (flip after measuring on real hardware)
_MERGED = __import__("os").environ.get("LPCNET_KERNEL_MERGED", "0") != "0"


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "bt"))
def _synthesize_frame_pallas_merged(kw, state: SampleState, cond_a, cond_b,
                                    lpc, cfg: LPCNetConfig,
                                    n_samples: int = 160, bt: int = BT
                                    ) -> Tuple[SampleState, jnp.ndarray]:
    """Merged-matmul variant of synthesize_frame_pallas."""
    BT = bt
    na, nb = cfg.rnn_units1, cfg.rnn_units2
    b = cond_a.shape[0]
    assert b % BT == 0, f"batch {b} must be a multiple of {BT}"
    assert n_samples % 8 == 0, "n_samples must be a multiple of 8"
    grid = (b // BT,)

    conda4 = _cond4(cond_a, kw["a_bias1"][0], na)
    condb4 = _cond4(cond_b, kw["b_bias1"][0], nb)
    rng = jnp.stack([state.rng.z, state.rng.w, state.rng.jsr, state.rng.jcong],
                    axis=1)
    exc = state.last_exc[:, None].astype(jnp.int32)
    de = state.deemph[:, None]

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def b_spec(cols):
        return pl.BlockSpec((BT, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_sample_kernel_merged, n_samples, na, nb)
    out_shapes = (
        jax.ShapeDtypeStruct((b, na), jnp.float32),
        jax.ShapeDtypeStruct((b, nb), jnp.float32),
        jax.ShapeDtypeStruct((b, LPC_ORDER), jnp.float32),
        jax.ShapeDtypeStruct((b, 1), jnp.int32),
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, 4), jnp.uint32),
        jax.ShapeDtypeStruct((n_samples, b), jnp.float32),
    )
    pcm_spec = pl.BlockSpec((n_samples, BT), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_specs = (
        b_spec(na), b_spec(nb), b_spec(LPC_ORDER), b_spec(1), b_spec(1),
        b_spec(4), pcm_spec,
    )
    in_specs = [
        w_spec(kw["a_merged"].shape), w_spec(kw["b_merged"].shape),
        w_spec(kw["dual_w"].shape), w_spec(kw["dual_bias"].shape),
        w_spec(kw["dual_factor"].shape), w_spec(kw["logit_table"].shape),
        b_spec(4 * na), b_spec(4 * nb), b_spec(LPC_ORDER),
        b_spec(na), b_spec(nb), b_spec(LPC_ORDER), b_spec(1), b_spec(1),
        b_spec(4),
    ]

    ha, hb, sig, exc2, de2, rng2, pcm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(kw["a_merged"], kw["b_merged"], kw["dual_w"], kw["dual_bias"],
      kw["dual_factor"], kw["logit_table"],
      conda4, condb4, lpc, state.gru_a, state.gru_b, state.last_sig,
      exc, de, rng)

    new_state = SampleState(
        gru_a=ha, gru_b=hb, last_sig=sig,
        last_exc=exc2[:, 0], deemph=de2[:, 0],
        rng=Kiss99State(rng2[:, 0], rng2[:, 1], rng2[:, 2], rng2[:, 3]),
    )
    return new_state, pcm.T


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "bt"))
def synthesize_frame_pallas(kw, state: SampleState, cond_a, cond_b, lpc,
                            cfg: LPCNetConfig, n_samples: int = 160,
                            bt: int = BT
                            ) -> Tuple[SampleState, jnp.ndarray]:
    """Drop-in Pallas replacement for models.lpcnet.synthesize_frame
    (free-running path; teacher forcing uses the masked kernel or the scan
    path). Dispatches f32/bf16 vs int8 on the bundle type (kernel_weights).

    Args:
      kw: kernel_weights(fused, cfg) bundle.
      state: SampleState [B, ...]; B must be a multiple of bt (pad upstream).
    Returns (new_state, pcm [B, n_samples]).
    """
    return _run_ar_kernel(kw, state, cond_a, cond_b, lpc, cfg, n_samples, bt)


_BT_PROBED: dict = {}


def _bt_compiles(fn, kw, cfg, n_samples, bt) -> bool:
    """Eagerly probe-compile the kernel at batch tile `bt` via AOT lowering
    with abstract shapes. A try/except around the actual call cannot catch a
    Pallas compile failure when _synth_pallas runs inside an OUTER jit (the
    error surfaces at the outer compile, after tracing — see BENCHMARKS.md);
    lowering a standalone [bt]-batch instance works even mid-trace because
    shapes/dtypes are static. Result cached per (variant, bundle, samples)."""
    key = (fn.__name__, is_q8_bundle(kw), n_samples, bt,
           tuple(sorted(kw.keys())))
    if key in _BT_PROBED:
        return _BT_PROBED[key]
    try:
        f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
        sds = jax.ShapeDtypeStruct
        na, nb = cfg.rnn_units1, cfg.rnn_units2
        b = bt
        kw_abs = {k: sds(v.shape, v.dtype) for k, v in kw.items()}
        state_abs = SampleState(
            gru_a=sds((b, na), f32), gru_b=sds((b, nb), f32),
            last_sig=sds((b, LPC_ORDER), f32), last_exc=sds((b,), i32),
            deemph=sds((b,), f32),
            rng=Kiss99State(sds((b,), u32), sds((b,), u32),
                            sds((b,), u32), sds((b,), u32)))
        fn.lower(kw_abs, state_abs, sds((b, 3 * na), f32),
                 sds((b, 3 * nb), f32), sds((b, LPC_ORDER), f32),
                 cfg=cfg, n_samples=n_samples, bt=bt).compile()
        ok = True
    except Exception:
        ok = False
    _BT_PROBED[key] = ok
    return ok


def _synth_pallas(kw, state, cond_a, cond_b, lpc, cfg, n_samples, bt=None):
    """Kernel-variant dispatch: merged 3-matmul step or the default
    5-matmul step (LPCNET_KERNEL_MERGED=1 selects merged); batch tile
    auto-sized unless LPCNET_KERNEL_BT pins it.

    The 512 tile sits close to the compiler's scoped-VMEM ceiling and can
    fail to compile in some toolchain configurations; auto-selection
    probe-compiles it once (AOT, outer-jit-safe) and falls back to the
    always-safe 256 tile (pinned tiles via LPCNET_KERNEL_BT are not
    second-guessed)."""
    b = cond_a.shape[0]
    picked = bt or _pick_bt(b)
    # merged layout only exists for float bundles; q8 has its own fused path
    fn = (_synthesize_frame_pallas_merged
          if _MERGED and not is_q8_bundle(kw) else synthesize_frame_pallas)
    pinned = bool(bt or _BT_ENV)
    try:
        from jax._src.core import trace_state_clean
        tracing = not trace_state_clean()
    except Exception:
        tracing = True
    key = (fn.__name__, is_q8_bundle(kw), n_samples, picked,
           tuple(sorted(kw.keys())))
    if tracing:
        # inside an outer jit a try/except below could not catch a Pallas
        # compile failure; decide via the (cached) AOT probe instead
        if (picked != 256 and not pinned
                and not _bt_compiles(fn, kw, cfg, n_samples, picked)):
            picked = 256
        return fn(kw, state, cond_a, cond_b, lpc, cfg, n_samples, picked)
    if _BT_PROBED.get(key) is False and not pinned:
        picked = 256
    try:
        return fn(kw, state, cond_a, cond_b, lpc, cfg, n_samples, picked)
    except Exception:
        if picked == 256 or pinned:
            raise
        _BT_PROBED[key] = False
        return fn(kw, state, cond_a, cond_b, lpc, cfg, n_samples, 256)


def synthesize_frame_auto(kw, state: SampleState, cond_a, cond_b, lpc,
                          cfg: LPCNetConfig, n_samples: int = 160):
    """Batch-size-agnostic wrapper: pads the stream batch up to a tile
    multiple, runs the fused kernel, and slices the result back."""
    b = cond_a.shape[0]
    pb = (b + 255) // 256 * 256
    if pb == b:
        return _synth_pallas(kw, state, cond_a, cond_b, lpc, cfg, n_samples)

    def pad(x):
        widths = [(0, pb - b)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    st_p = jax.tree.map(pad, state)
    new_p, pcm = _synth_pallas(
        kw, st_p, pad(cond_a), pad(cond_b), pad(lpc), cfg, n_samples)
    unpad = lambda x: x[:b]
    return jax.tree.map(unpad, new_p), pcm[:b]
