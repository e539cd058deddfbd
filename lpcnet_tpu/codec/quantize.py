"""Quantizers for the 1.6 kb/s codec: m-best VQ beam, diff VQ, interpolation.

Bit-exactness notes: every decision here is an integer comparison on f32
distances, replicating the reference's scan orders and tie-breaking
(src/lpcnet_enc.c:53-241, :283-425):

* jax.lax.top_k and jnp.argmin/argmax break ties toward the lower index,
  which matches the C strict-< scans;
* the reference's survivor-merge keeps incumbents ahead on ties and
  processes stage-1 survivors in order, which equals a stable sort over
  candidates flattened in (survivor, rank) arrival order.

All functions are single-stream; the encoder vmaps over streams.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..dsp.constants import NB_BANDS

SURVIVORS = 5


def _dists(x, codebook, cb_sq=None):
    """Squared euclidean distances of x [..., d] to codebook rows [n, d].

    Matmul form (|x|^2 - 2 x.cb + |cb|^2): one MXU GEMM instead of
    materializing [..., n, d] difference tensors.
    """
    if cb_sq is None:
        cb_sq = jnp.sum(codebook * codebook, axis=-1)
    xsq = jnp.sum(x * x, axis=-1, keepdims=True)
    cross = jnp.matmul(x, codebook.T, precision=jax.lax.Precision.HIGHEST)
    return xsq - 2.0 * cross + cb_sq


def _top_m_small(d, m: int):
    """Smallest-m with first-index tie-breaking via iterative argmin
    (faster than lax.top_k for tiny m on TPU; identical ordering)."""
    vals, idxs = [], []
    lanes = jnp.arange(d.shape[-1])
    for _ in range(m):
        i = jnp.argmin(d, axis=-1)
        v = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        d = jnp.where(lanes == i[..., None], jnp.inf, d)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


def vq_mbest(codebook, x, m: int = SURVIVORS):
    """m best codewords, ascending distance (vq_quantize_mbest, :53-78)."""
    d = _dists(x, codebook)
    return _top_m_small(d, m)


def _beam_merge(flat_d, m: int = SURVIVORS):
    """Stable top-m over candidates flattened in arrival order."""
    order = jnp.argsort(flat_d, stable=True)
    return order[:m]


def quantize_3stage_mbest(x, cb1, cb2, cb3):
    """3-stage m-best cepstral VQ (quantize_3stage_mbest, :133-241).

    Args: x [17] (cepstral dims 1..17 of the endpoint frame).
    Returns (indices [3] int32, reconstruction [17]).
    """
    _, i1 = vq_mbest(cb1, x)                          # [S]
    r1 = x[None, :] - cb1[i1]                         # [S, 17]
    d2 = _dists(r1, cb2)                              # [S, 1024]
    d2_top, i2_top = _top_m_small(d2, SURVIVORS)      # [S, S]
    sel = _beam_merge(d2_top.reshape(-1))
    k2 = sel // SURVIVORS
    pair1 = i1[k2]
    pair2 = i2_top.reshape(-1)[sel]

    r2 = x[None, :] - cb1[pair1] - cb2[pair2]         # [S, 17]
    d3 = _dists(r2, cb3)
    d3_top, i3_top = _top_m_small(d3, SURVIVORS)
    sel3 = _beam_merge(d3_top.reshape(-1))
    k3 = sel3[0] // SURVIVORS
    b1 = pair1[k3]
    b2 = pair2[k3]
    b3 = i3_top.reshape(-1)[sel3[0]]
    recon = cb1[b1] + cb2[b2] + cb3[b3]
    return jnp.stack([b1, b2, b3]).astype(jnp.int32), recon


def _interp_preds(left, right):
    """The 4 interpolation predictors [4, 18] (src/lpcnet_enc.c:294-296)."""
    mean = 0.5 * (left + right)
    return jnp.stack([mean, mean, left, right])


def quantize_diff(x, left, right, codebook, bits: int = 12):
    """Signed multi-predictor diff VQ of the mid frame (quantize_diff, :283-318).

    Entry layout: low 2 bits of the index select the predictor; sign adds
    2^bits. Returns (entry int32 in [0, 2^(bits+1)), reconstruction [18]).
    """
    preds = _interp_preds(left, right)                # [4, 18]
    n = codebook.shape[0]
    # distances in grouped matmul form: entries with (i&3)==g share the
    # predictor, so d_i = |t_g|^2 -+ 2 t_g.cb_i + |cb_i|^2 with
    # t_g = x - preds[g]; one [4,18]x[18,n] GEMM covers every entry
    t = x[None, :] - preds                            # [4, 18]
    cb_sq = jnp.sum(codebook * codebook, axis=-1)     # [n]
    cross = jnp.matmul(t, codebook.T,
                       precision=jax.lax.Precision.HIGHEST)  # [4, n]
    tsq = jnp.sum(t * t, axis=-1)                     # [4]
    group = jnp.arange(n) & 3
    cross_g = jnp.take_along_axis(cross, group[None, :], axis=0)[0]
    tsq_g = tsq[group]
    d_pos = tsq_g - 2.0 * cross_g + cb_sq
    d_neg = tsq_g + 2.0 * cross_g + cb_sq
    d_all = jnp.concatenate([d_pos, d_neg])
    entry = jnp.argmin(d_all).astype(jnp.int32)
    idx = entry & (n - 1)
    sign = jnp.where(entry >= n, -1.0, 1.0)
    recon = preds[idx & 3] + sign * codebook[idx]
    return entry, recon


def interp_dists(x, left, right):
    """Distances of x to the 3 distinct predictors [mean, left, right]
    (interp_search, :320-340)."""
    preds = jnp.stack([0.5 * (left + right), left, right])
    return jnp.sum((x[None, :NB_BANDS] - preds[..., :NB_BANDS]) ** 2, axis=-1)


FORBIDDEN_INTERP = 7


def double_interp_search(f0, f2, mem, f1, f3):
    """Joint interpolation id for frames 0 and 2 (src/lpcnet_enc.c:379-400).

    Returns the *coded* id (0..7, with the forbidden combination skipped).
    """
    d0 = interp_dists(f0, mem, f1)
    d1 = interp_dists(f2, f1, f3)
    total = d0[:, None] + d1[None, :]                 # [3, 3] id = 3i+j
    flat = total.reshape(-1)
    flat = flat.at[FORBIDDEN_INTERP].set(jnp.inf)
    best = jnp.argmin(flat).astype(jnp.int32)
    return best - (best >= FORBIDDEN_INTERP).astype(jnp.int32)


def apply_double_interp(mem, f1, f3, coded_id):
    """Reconstruct frames 0 and 2 from the coded interpolation id
    (perform_double_interp, src/common.c:58-65). Returns (f0, f2) [18]."""
    best = coded_id + (coded_id >= FORBIDDEN_INTERP).astype(jnp.int32)
    id0 = best // 3
    id1 = best % 3
    p0 = jnp.stack([0.5 * (mem + f1), mem, f1])
    p2 = jnp.stack([0.5 * (f1 + f3), f1, f3])
    return p0[id0], p2[id1]


class PitchQuant(NamedTuple):
    main_pitch: jnp.ndarray   # int32 0..63
    modulation: jnp.ndarray   # int32 -3..3
    corr_id: jnp.ndarray      # int32 (masked to 2 bits at packing)
    voiced: jnp.ndarray       # bool
    period_feat: jnp.ndarray  # [4] quantized feature col 18
    corr_feat: jnp.ndarray    # scalar quantized (frame_corr - .5)


def quantize_pitch(periods, weights, frame_corr):
    """Pitch contour quantization (src/lpcnet_enc.c:645-697).

    Args:
      periods: [8] float half-frame Viterbi periods.
      weights: [8] normalized frame weights.
      frame_corr: scalar (already clamped >= 0 by the caller).
    """
    sub = jnp.arange(2.0, 10.0)
    w = weights
    sw = jnp.sum(w)
    sx = jnp.sum(w * sub)
    sxx = jnp.sum(w * sub * sub)
    sxy = jnp.sum(w * sub * periods)
    sy = jnp.sum(w * periods)
    best_a = (sw * sxy - sx * sy) / (sw * sxx - sx * sx)
    voiced = frame_corr >= 0.3
    mean_pitch = sy / sw
    max_a = mean_pitch / 32.0
    best_a = jnp.where(voiced, jnp.clip(best_a, -max_a, max_a), 0.0)
    corr_id = jnp.where(
        voiced,
        jnp.floor((frame_corr - 0.3) / 0.175),
        jnp.floor(frame_corr / 0.075),
    ).astype(jnp.int32)
    qcorr = jnp.where(voiced, 0.3875 + 0.175 * corr_id, 0.0375 + 0.075 * corr_id)
    best_b = (sy - best_a * sx) / sw
    center = best_b + 5.5 * best_a
    main_pitch = jnp.floor(0.5 + 21.0 * 1.442695041 * jnp.log(center / 32.0))
    main_pitch = jnp.clip(main_pitch, 0, 63).astype(jnp.int32)
    modulation = jnp.floor(0.5 + 16.0 * 7.0 * best_a / center)
    modulation = jnp.clip(modulation, -3, 3).astype(jnp.int32)

    subs = jnp.arange(4, dtype=jnp.float32)
    p = jnp.power(2.0, main_pitch.astype(jnp.float32) / 21.0) * 32.0
    p = p * (1.0 + modulation.astype(jnp.float32) / 16.0 / 7.0 * (2.0 * subs - 3.0))
    p = jnp.clip(p, 33.0, 255.0)
    return PitchQuant(
        main_pitch=main_pitch, modulation=modulation, corr_id=corr_id,
        voiced=voiced, period_feat=0.02 * (p - 100.0), corr_feat=qcorr - 0.5)


def quantize_c0(c0):
    """7-bit scalar on the DC cepstral coefficient (src/lpcnet_enc.c:704-706)."""
    c0_id = jnp.clip(jnp.floor(0.5 + c0 * 4.0), -64, 63).astype(jnp.int32)
    return c0_id, c0_id.astype(jnp.float32) / 4.0


def dequantize_pitch(main_pitch, modulation, corr_id, voiced):
    """Decoder side (src/lpcnet_dec.c:113-129). Returns (period_feat [4], corr_feat)."""
    qcorr = jnp.where(voiced, 0.3875 + 0.175 * corr_id,
                      0.0375 + 0.075 * corr_id)
    subs = jnp.arange(4, dtype=jnp.float32)
    p = jnp.power(2.0, main_pitch.astype(jnp.float32) / 21.0) * 32.0
    p = p * (1.0 + modulation.astype(jnp.float32) / 16.0 / 7.0 * (2.0 * subs - 3.0))
    p = jnp.clip(p, 33.0, 255.0)
    return 0.02 * (p - 100.0), qcorr - 0.5
