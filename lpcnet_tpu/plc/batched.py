"""Fully-batched PLC with per-stream loss patterns (causal + non-causal).

The host-side PLC (plc.py) mirrors the C state machine exactly but requires
every stream in a batch to share one loss pattern, because the control flow
(src/lpcnet_plc.c:188-337) is data-dependent on the loss flag. That is the
CPU way. The TPU way, implemented here: every stream steps through the same
fixed-shape jitted frame step, and masks select per-stream behavior --
worst-case compute in exchange for full batching, so a serving node can run
hundreds of independent streams, each with its own losses, in ONE device
dispatch per frame.

Structure: one interleaved program per frame over a single state -- the
conceal (lost) and update (good packet) paths' sub-ops are masked per
stream and corresponding sub-ops share device work (the masks are
disjoint), see _plc_frame_step_fused / _plc_frame_step_nc_fused. The
data-dependent pieces (the pcm-drain loop, blending after a loss, deferred
frame-net flushes) are unrolled to their bounded maxima with per-stream
enable masks (conceal's drain loop runs at most
ceil(plc_buf_size/FRAME_SIZE) = 3 iterations; the deferred feature buffer
holds at most 2*(k-1) = 4 frames). The two-path evaluate-both-and-merge
predecessors (_plc_frame_step, _plc_frame_step_nc) are kept as the
bit-exactness reference for tests.

Scope: the full reference option surface -- causal mode with or without
blending (LPCNET_PLC_CAUSAL / LPCNET_PLC_CODEC) with per-stream FEC queues
(fec_add/fec_clear), the non-causal mode, and the DC filter (remove_dc) in
both causal and non-causal modes (closed-form triangular-matmul
recurrences instead of the C's per-sample loops). Parity: 1-LSB against
the host plc.py when all streams share a pattern (test_plc_batched).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..codec import features as F
from ..dsp.burg import burg_cepstral_analysis
from ..dsp.constants import FRAME_SIZE, NB_BANDS, NB_FEATURES, TRAINING_OFFSET
from ..dsp.precision import F32_PRECISION
from ..models import lpcnet as M
from ..models import plc as PM
from .plc import ATT_TABLE, DC_CONST

_TO = TRAINING_OFFSET                       # 80
_N1 = FRAME_SIZE - TRAINING_OFFSET          # 80
MAX_DEFER = 4                               # 2*(conv_kernel-1)
MAX_DRAIN = 3                               # ceil(plc_buf_size / FRAME_SIZE)


class BatchedPLCState(NamedTuple):
    fstate: M.FrameState
    sstate: M.SampleState
    cond_a: jnp.ndarray
    cond_b: jnp.ndarray
    lpc: jnp.ndarray
    feat_ring: jnp.ndarray      # [B, MAX_DEFER, 36] deferred frame-net inputs
    feat_count: jnp.ndarray     # [B] int32
    enc: F.EncoderState
    plc_net: PM.PLCNetState
    plc_ring: PM.PLCNetState    # leaves [R, B, H]; ring of past net states
    features: jnp.ndarray       # [B, 20] current feature estimate
    pcm_buf: jnp.ndarray        # [B, plc_buf_size + 160]
    pcm_fill: jnp.ndarray       # [B] int32
    skip_analysis: jnp.ndarray  # [B] int32
    blend: jnp.ndarray          # [B] bool
    loss_count: jnp.ndarray     # [B] int32
    queued: jnp.ndarray         # [B] bool (non-causal deferred resync)
    queued_samples: jnp.ndarray  # [B, 160]
    fec_feats: jnp.ndarray      # [B, FEC_Q, 20] queued FEC features
    fec_len: jnp.ndarray        # [B] int32 entries in the queue
    fec_read: jnp.ndarray       # [B] int32 next entry to consume
    fec_keep: jnp.ndarray       # [B] int32 rewind floor
    fec_skip: jnp.ndarray       # [B] int32 pending unknown-feature skips
    dc_mem: jnp.ndarray         # [B] DC tracker (remove_dc mode)
    syn_dc: jnp.ndarray         # [B] synthesis-side DC tracker
    dc_buf: jnp.ndarray         # [B, TO] delayed DC offsets (non-causal _dc)


def _bwhere(mask, new, old):
    """Per-stream select over a [B, ...] pytree."""
    return jax.tree.map(
        lambda n, o: jnp.where(mask.reshape(mask.shape + (1,) * (n.ndim - 1)),
                               n, o), new, old)


def _pad36(f):
    return jnp.pad(f, ((0, 0), (0, 36 - f.shape[-1])))


class BatchedPLC:
    """Mixed-loss batched causal PLC.

    Call step(pcm [B, 160], lost [B]) per 10 ms frame; hold each loss flag
    for 2 frames to match the 20 ms packet cadence of the demo driver.
    """

    def __init__(self, fused, cfg: M.LPCNetConfig, plc_params, batch: int,
                 enable_blending: bool = True, non_causal: bool = False,
                 plc_cfg: Optional[PM.PLCConfig] = None,
                 use_kernel: Optional[bool] = None,
                 fused_step: bool = True, fec_q: int = 100,
                 remove_dc: bool = False):
        """use_kernel routes the sample-rate tails through the fused Pallas
        kernel (kernels.sample_loop) instead of the bit-exact lax.scan path:
        ~10x frame-step throughput at serving batch sizes, at the cost of
        bf16-matmul sampling divergence on a small fraction of samples
        (same tolerance class as the main synthesis kernel). Default: kernel
        for batches >= 256 on TPU, scan otherwise."""
        if non_causal and cfg.lookahead != 0:
            raise ValueError("non-causal PLC needs a lookahead-0 model")
        self.fused = fused
        self.cfg = cfg
        self.batch = batch
        self.enable_blending = enable_blending
        self.non_causal = non_causal
        self.plc_params = plc_params
        self.plc_cfg = plc_cfg or PM.PLCConfig()
        self.delay = cfg.lookahead
        self.plc_buf_size = self.delay * FRAME_SIZE + _TO
        self.fec_q = fec_q
        if use_kernel is None:
            use_kernel = (batch >= 256
                          and jax.default_backend() not in ("cpu",))
        self.use_kernel = use_kernel
        if use_kernel:
            from ..kernels.sample_loop import kernel_weights
            self.kw = kernel_weights(fused, cfg)
        else:
            self.kw = None
        self.state = self.init_state()
        delay, buf_size = self.delay, self.plc_buf_size
        if remove_dc and not fused_step:
            raise ValueError("batched remove_dc: fused step only")
        self.remove_dc = remove_dc
        self.fused_step = fused_step
        if fused_step:
            if non_causal:
                def step_fn(st, fw, pp, pcm, lost, cfg_, eb, dl, bs, kw=None,
                            _rd=remove_dc):
                    return _plc_frame_step_nc_fused(st, fw, pp, pcm, lost,
                                                    cfg_, eb, dl, bs, kw,
                                                    remove_dc=_rd)
            else:
                def step_fn(st, fw, pp, pcm, lost, cfg_, eb, dl, bs, kw=None,
                            _rd=remove_dc):
                    return _plc_frame_step_fused(st, fw, pp, pcm, lost, cfg_,
                                                 eb, dl, bs, kw, remove_dc=_rd)
        else:
            step_fn = _plc_frame_step_nc if non_causal else _plc_frame_step
        self._step_fn = step_fn
        self._step = jax.jit(
            lambda st, fw, pp, kw, pcm, lost: step_fn(
                st, fw, pp, pcm, lost, cfg, enable_blending, delay, buf_size,
                kw))

    def init_state(self) -> BatchedPLCState:
        b, cfg = self.batch, self.cfg
        ring = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.delay + 1,) + x.shape),
            PM.init_state(b, self.plc_cfg))
        return BatchedPLCState(
            fstate=M.init_frame_state(b, cfg),
            sstate=M.init_sample_state(b, cfg),
            cond_a=jnp.zeros((b, 3 * cfg.rnn_units1), jnp.float32),
            cond_b=jnp.zeros((b, 3 * cfg.rnn_units2), jnp.float32),
            lpc=jnp.zeros((b, 16), jnp.float32),
            feat_ring=jnp.zeros((b, MAX_DEFER, 36), jnp.float32),
            feat_count=jnp.zeros((b,), jnp.int32),
            enc=F.init_encoder_state(b),
            plc_net=PM.init_state(b, self.plc_cfg),
            plc_ring=ring,
            features=jnp.zeros((b, NB_FEATURES), jnp.float32),
            pcm_buf=jnp.zeros((b, self.plc_buf_size + FRAME_SIZE), jnp.float32),
            pcm_fill=jnp.full((b,), self.plc_buf_size, jnp.int32),
            skip_analysis=jnp.zeros((b,), jnp.int32),
            blend=jnp.zeros((b,), bool),
            loss_count=jnp.zeros((b,), jnp.int32),
            queued=jnp.zeros((b,), bool),
            queued_samples=jnp.zeros((b, FRAME_SIZE), jnp.float32),
            fec_feats=jnp.zeros((b, self.fec_q, NB_FEATURES), jnp.float32),
            fec_len=jnp.zeros((b,), jnp.int32),
            fec_read=jnp.zeros((b,), jnp.int32),
            fec_keep=jnp.zeros((b,), jnp.int32),
            fec_skip=jnp.zeros((b,), jnp.int32),
            dc_mem=jnp.zeros((b,), jnp.float32),
            syn_dc=jnp.zeros((b,), jnp.float32),
            dc_buf=jnp.zeros((b, _TO), jnp.float32),
        )

    def reset(self):
        self.state = self.init_state()

    def fec_add(self, features, have=None, unknown=None):
        """Queue one 10 ms FEC feature frame per stream (the batched
        lpcnet_plc_fec_add): features [B, >=20]; have [B] bool marks which
        streams actually received redundancy this slot. Streams with
        have=False count an unknown frame (fec_skip semantics, the C's
        NULL call) unless `unknown` narrows that set -- pass
        unknown=np.zeros(B, bool) to make non-have streams a no-op (pool
        serving, where absent streams should not consume a time slot).
        Causal modes only, like the reference."""
        if self.non_causal or not self.fused_step:
            raise ValueError("FEC queues: causal fused step only (the "
                             "reference's non-causal PLC has no FEC either)")
        b = self.batch
        feats = jnp.asarray(np.asarray(features, np.float32)[:, :NB_FEATURES])
        have = (jnp.ones((b,), bool) if have is None
                else jnp.asarray(np.asarray(have).astype(bool)))
        unknown = (~have if unknown is None
                   else jnp.asarray(np.asarray(unknown).astype(bool)))
        self._fec_add_jit = getattr(self, "_fec_add_jit", None) or \
            jax.jit(_fec_add_op)
        self.state = self._fec_add_jit(self.state, feats, have, unknown)

    def fec_clear(self):
        z = jnp.zeros((self.batch,), jnp.int32)
        self.state = self.state._replace(
            fec_len=z, fec_read=z, fec_keep=z, fec_skip=z)

    def run(self, pcm: np.ndarray, lost: np.ndarray, chunk: int = 25,
            device_out: bool = False):
        """Process many frames in one device dispatch per `chunk` frames.

        The per-frame step() syncs its output to the host every 10 ms frame,
        which through a remote-dispatch transport costs more than the
        compute; offline/bulk concealment should scan frames on-device.

        Args: pcm [B, T, 160], lost [B, T].
        Returns [B, T, 160] (numpy), or with device_out=True a list of
        per-chunk device arrays left on the device (for pipelines whose
        next stage is also on-device, and for throughput measurement
        without paying host-transfer time).
        """
        # jnp.asarray is a no-op for arrays already on the device, so callers
        # can device_put inputs once and chunk-slicing stays device-side
        pcm = jnp.asarray(pcm, jnp.float32)
        lost = jnp.asarray(lost).astype(bool)
        b, t = lost.shape
        outs = []
        for k0 in range(0, t, chunk):
            p = pcm[:, k0:k0 + chunk]
            lo = lost[:, k0:k0 + chunk]
            self.state, out = self._run_chunk(
                self.state, self.fused, self.plc_params, self.kw, p, lo)
            outs.append(out)
        if device_out:
            return outs
        return np.concatenate([np.asarray(o) for o in outs], axis=1)

    @functools.cached_property
    def _run_chunk(self):
        cfg, eb = self.cfg, self.enable_blending
        delay, buf_size = self.delay, self.plc_buf_size
        step_fn = self._step_fn

        @jax.jit
        def run_chunk(st, fused, plc_params, kw, pcm, lost):
            def body(s, x):
                p, lo = x
                return step_fn(s, fused, plc_params, p, lo, cfg, eb,
                               delay, buf_size, kw)
            st, out = jax.lax.scan(
                body, st, (jnp.moveaxis(pcm, 1, 0), jnp.moveaxis(lost, 1, 0)))
            return st, jnp.moveaxis(out, 0, 1)

        return run_chunk

    def step(self, pcm: np.ndarray, lost: np.ndarray) -> np.ndarray:
        """pcm [B, 160] (ignored where lost), lost [B] 0/1. Returns [B, 160]."""
        self.state, out = self._step(
            self.state, self.fused, self.plc_params, self.kw,
            jnp.asarray(np.asarray(pcm, np.float32)),
            jnp.asarray(np.asarray(lost).astype(bool)))
        return np.asarray(out)


# ---------------------------------------------------------------------------
# The jitted frame step
# ---------------------------------------------------------------------------

def _fnet_masked(fused, s: BatchedPLCState, feats36, active, cfg):
    if _abl("fnet"):
        eps = _consume(feats36)
        return s._replace(cond_a=s.cond_a + eps, cond_b=s.cond_b + eps,
                          lpc=s.lpc + eps)
    new_f, _, ca, cb, lpc = M.frame_network(fused, s.fstate, feats36, cfg)
    merged = _bwhere(active, (new_f, ca, cb, lpc),
                     (s.fstate, s.cond_a, s.cond_b, s.lpc))
    return s._replace(fstate=merged[0], cond_a=merged[1], cond_b=merged[2],
                      lpc=merged[3])


_FASTTF = __import__("os").environ.get("LPCNET_PLC_FASTTF", "1") != "0"
_FASTFNET = __import__("os").environ.get("LPCNET_PLC_FASTFNET", "1") != "0"

# In-graph ablation set for tools/profile_plc.py --ablate: a named component
# is replaced by a cheap stand-in that still CONSUMES its inputs (so nothing
# upstream dead-code-eliminates) and feeds a tiny data-dependent perturbation
# downstream (so nothing constant-folds). Serving never sets this.
_ABLATE: frozenset = frozenset()


def _abl(name: str) -> bool:
    return name in _ABLATE


def _consume(*xs):
    """A scalar that depends on every input (anti-DCE, ~zero cost)."""
    tot = 0.0
    for x in xs:
        tot = tot + jnp.sum(jax.tree.reduce(
            lambda a, l: a + jnp.mean(l.astype(jnp.float32)), x, 0.0))
    return tot * 1e-6


def _fnet_flush_masked(fused, s: BatchedPLCState, ring, count, cfg):
    """Batched deferred-frame-net flush: count[i] frame_network steps of
    stream i over ring[:, :count[i]] as one frame_network_flush call."""
    if _abl("fnet"):
        eps = _consume(ring, count)
        return s._replace(cond_a=s.cond_a + eps, cond_b=s.cond_b + eps,
                          lpc=s.lpc + eps)
    new_f, ca, cb, lpc = M.frame_network_flush(fused, s.fstate, ring, count,
                                               cfg)
    active = count > 0
    merged = _bwhere(active, (new_f, ca, cb, lpc),
                     (s.fstate, s.cond_a, s.cond_b, s.lpc))
    return s._replace(fstate=merged[0], cond_a=merged[1], cond_b=merged[2],
                      lpc=merged[3])


def _tail_masked(fused, s: BatchedPLCState, preload, preload_mask,
                 advance_mask, cfg, kw=None, sampled=True, live=None):
    """Sample-rate tail with conv-warmup gating (cf. LPCNetCore
    synthesize_tail): streams still in warmup neither advance nor emit.

    kw selects the fused Pallas kernel (kernels.sample_loop.kernel_weights
    bundle) instead of the bit-exact scan path; sampled=False (kernel only)
    elides the dual-FC sampler for segments whose advanced steps are all
    teacher-forced (drain/resync/queued updates) -- ~1.5x faster, identical
    results (the sampled value is overridden and the RNG advance is the
    same). `live` overrides the warmup gate (two-pass callers captured it
    at the original program point)."""
    if live is None:
        live = s.fstate.frame_count > cfg.lookahead
    adv = advance_mask & live[:, None]
    if _abl("tails"):
        eps = _consume(s.cond_a, s.cond_b, s.lpc, preload, adv)
        pcm = jnp.zeros(preload.shape, jnp.float32) + eps
        return s._replace(sstate=s.sstate._replace(
            gru_a=s.sstate.gru_a + eps)), pcm
    if kw is None:
        new_ss, pcm = M.synthesize_frame_masked(
            fused, s.sstate, s.cond_a, s.cond_b, s.lpc,
            preload, preload_mask & adv, adv)
    else:
        from ..kernels.sample_loop import synthesize_frame_masked_auto
        new_ss, pcm = synthesize_frame_masked_auto(
            kw, s.sstate, s.cond_a, s.cond_b, s.lpc,
            preload, preload_mask & adv, adv, cfg, sampled=sampled)
    return s._replace(sstate=new_ss), pcm


def _tf_prefix(fused, s: BatchedPLCState, ca, cb, lpc, targets, count, cfg,
               kw):
    """Prefix-count teacher-forced tail on explicit conditioning (pass 2 of
    the two-pass drain): the GRU-only fast TF kernel when the Pallas bundle
    is active, else the masked path. Warmup gating is already folded into
    `count` by the caller."""
    if _abl("tf"):
        eps = _consume(ca, cb, lpc, targets, count)
        return s._replace(sstate=s.sstate._replace(
            gru_a=s.sstate.gru_a + eps))
    if kw is not None and _FASTTF:
        from ..kernels.sample_loop import teacher_force_prefix_auto
        new_ss = teacher_force_prefix_auto(kw, s.sstate, ca, cb, lpc,
                                           targets, count, cfg)
        return s._replace(sstate=new_ss)
    adv = (jnp.arange(targets.shape[-1])[None, :] < count[:, None])
    s2 = s._replace(cond_a=ca, cond_b=cb, lpc=lpc)
    s2, _ = _tail_masked(fused, s2, targets, adv, adv, cfg, kw,
                         sampled=False, live=jnp.ones(count.shape, bool))
    return s._replace(sstate=s2.sstate)


def _fec_or_pred_masked(plc_params, s: BatchedPLCState, active, delay):
    """Per-stream get_fec_or_pred (src/lpcnet_plc.c:147-166): streams with a
    queued FEC frame consume it (PLC net updated with the -1-flagged FEC
    input, features taken from the queue); the rest predict. Returns
    (state, fec_hit mask). The queue-row read is a one-hot contraction, not
    a gather (hot loop)."""
    b = s.features.shape[0]
    q = s.fec_feats.shape[1]
    have = (s.fec_read != s.fec_len) & (s.fec_skip == 0)
    oh = (jnp.arange(q)[None] == s.fec_read[:, None]).astype(jnp.float32)
    fec_row = jnp.einsum("bq,bqf->bf", oh, s.fec_feats)
    inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    inp_f = inp.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(
        fec_row).at[:, -1].set(-1.0)
    inp = jnp.where(have[:, None], inp_f, inp)
    if _abl("plcnet"):
        eps = _consume(inp)
        new_net = jax.tree.map(lambda x: x + eps, s.plc_net)
        out = jnp.zeros((b, NB_FEATURES), jnp.float32) + eps
    else:
        new_net, out = PM.compute_plc_pred(plc_params, s.plc_net, inp)
    s = s._replace(plc_net=_bwhere(active, new_net, s.plc_net))
    feats = jnp.where(have[:, None], fec_row, out[:, :NB_FEATURES])
    s = s._replace(features=jnp.where(active[:, None], feats, s.features))
    read2 = jnp.where(have, s.fec_read + 1, s.fec_read)
    keep2 = jnp.where(
        have, jnp.maximum(jnp.maximum(s.fec_keep, read2 - delay - 1), 0),
        s.fec_keep)
    skip2 = jnp.where(~have & (s.fec_skip > 0), s.fec_skip - 1, s.fec_skip)
    s = s._replace(
        fec_read=jnp.where(active, read2, s.fec_read),
        fec_keep=jnp.where(active, keep2, s.fec_keep),
        fec_skip=jnp.where(active, skip2, s.fec_skip))
    return s, have & active


def _fec_add_op(s: BatchedPLCState, feats, have, unknown):
    """Append one FEC feature frame per stream (lpcnet_plc_fec_add,
    src/lpcnet_plc.c:111-132): `have` streams append, `unknown` streams
    count an unknown frame (fec_skip++, the C's features==NULL call),
    neither -> no-op. A full queue compacts away the rewind-protected
    prefix when possible, else drops the add."""
    q = s.fec_feats.shape[1]
    full = s.fec_len == q
    can_compact = have & full & (s.fec_keep > 0)
    drop = full & (s.fec_keep == 0) & have
    idx = jnp.minimum(jnp.arange(q)[None, :] + s.fec_keep[:, None], q - 1)
    shifted = jnp.take_along_axis(s.fec_feats, idx[..., None], axis=1)
    feats_q = jnp.where(can_compact[:, None, None], shifted, s.fec_feats)
    len2 = jnp.where(can_compact, s.fec_len - s.fec_keep, s.fec_len)
    read2 = jnp.where(can_compact, s.fec_read - s.fec_keep, s.fec_read)
    keep2 = jnp.where(can_compact, 0, s.fec_keep)
    add = have & ~drop
    slot = jnp.arange(q)[None, :] == len2[:, None]
    feats_q = jnp.where((add[:, None] & slot)[..., None],
                        feats[:, None, :], feats_q)
    return s._replace(
        fec_feats=feats_q,
        fec_len=jnp.where(add, len2 + 1, len2),
        fec_read=read2, fec_keep=keep2,
        fec_skip=jnp.where(unknown, s.fec_skip + 1, s.fec_skip))


def _plc_pred_masked(plc_params, s: BatchedPLCState, plc_in, active,
                     set_features=True):
    if _abl("plcnet"):
        eps = _consume(plc_in)
        new_net = jax.tree.map(lambda x: x + eps, s.plc_net)
        out = jnp.zeros(plc_in.shape[:1] + (NB_FEATURES,), jnp.float32) + eps
    else:
        new_net, out = PM.compute_plc_pred(plc_params, s.plc_net, plc_in)
    s = s._replace(plc_net=_bwhere(active, new_net, s.plc_net))
    if set_features:
        s = s._replace(features=jnp.where(active[:, None],
                                          out[:, :NB_FEATURES], s.features))
    return s


# Default OFF since round 4: the same-session flag matrix (N=5 medians,
# tools/bench_plc_matrix.py, artifacts/bench_plc_matrix_r4*.log) measured
# the chain kernel net-NEGATIVE next to compaction alone in both modes
# (causal 14.17 vs 15.00 Ms/s at cap=64; nc 15.65 vs 15.68), confirming
# the round-3 ablation hint. The kernel stays available for A/B.
_FASTCHAIN = __import__("os").environ.get("LPCNET_PLC_FASTCHAIN", "0") != "0"


def _chain_causal(plc_params, s: BatchedPLCState, L, bl, burg_feats, delay,
                  enable_blending):
    """Precompute + run the fused PLC-net chain for the causal step.

    The causal step's PLC-net calls -- the blend-restore prediction (bl
    streams), one get_fec_or_pred per drain iteration (lost streams with
    queued audio), and the lost-frame get_fec_or_pred -- have inputs that
    are all deterministic functions of the entry state: burg cepstra, and
    FEC queue rows under the pointer-advance replay of
    src/lpcnet_plc.c:147-166. Blend and lost streams are disjoint, so the
    restore prediction rides kernel step 0. Runs the whole chain as ONE
    Pallas call (kernels/plc_chain.py) and returns per-step outputs,
    running states, masks, and final FEC pointers for the frame-rate
    program to replay ring pushes / feature selects / pointer writes at
    the original program points.
    """
    from ..kernels.plc_chain import plc_chain_pallas, plc_chain_weights

    b = L.shape[0]
    k_steps = MAX_DRAIN + 1
    q = s.fec_feats.shape[1]
    read, keep, skp = s.fec_read, s.fec_keep, s.fec_skip
    lanes = jnp.arange(q)[None, :]
    inputs, masks, actives, haves, rows = [], [], [], [], []
    for k in range(k_steps):
        active = (L & (s.pcm_fill > k * FRAME_SIZE)) if k < MAX_DRAIN else L
        have = (read != s.fec_len) & (skp == 0)
        oh = (lanes == read[:, None]).astype(jnp.float32)
        row = jnp.einsum("bq,bqf->bf", oh, s.fec_feats)
        inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
        inp = inp.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(row)
        inp = inp.at[:, -1].set(-1.0)
        inp = jnp.where(have[:, None], inp, 0.0)
        mask = active
        if k == 0 and enable_blending:
            inp_a = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
            inp_a = inp_a.at[:, :2 * NB_BANDS].set(burg_feats)
            inp_a = inp_a.at[:, -1].set(1.0)
            inp = jnp.where(bl[:, None], inp_a, inp)
            mask = mask | bl
        inputs.append(inp)
        masks.append(mask)
        actives.append(active)
        haves.append(have)
        rows.append(row)
        am = active & have
        read2 = read + 1
        keep2 = jnp.maximum(jnp.maximum(keep, read2 - delay - 1), 0)
        read = jnp.where(am, read2, read)
        keep = jnp.where(am, keep2, keep)
        skp = jnp.where(active & ~have & (skp > 0), skp - 1, skp)

    cw = plc_chain_weights(plc_params)
    h1s, h2s, outs = plc_chain_pallas(
        cw, s.plc_net.gru1, s.plc_net.gru2,
        jnp.stack(inputs, axis=1), jnp.stack(masks, axis=1), k_steps)
    # the +0.1 correlation boost (models/plc.py compute_plc_pred)
    outs = outs.at[:, :, NB_FEATURES - 1].set(
        jnp.minimum(0.5, outs[:, :, NB_FEATURES - 1] + 0.1))
    return dict(h1s=h1s, h2s=h2s, outs=outs, actives=actives, haves=haves,
                rows=rows, read=read, keep=keep, skip=skp)


def _chain_feats(ch, k):
    """Step-k feature select: the FEC row when one was consumed, else the
    prediction (matches _fec_or_pred_masked)."""
    return jnp.where(ch["haves"][k][:, None], ch["rows"][k],
                     ch["outs"][:, k])


# Active-stream compaction for the causal step's sample-rate section: the
# TF drain + both sampled tails only advance lost/blend streams (~19% of a
# 256-stream pool at 10% loss), but the kernels pay full-batch MXU passes.
# "auto" compacts the section to a capacity-C sub-batch (one gather in, one
# scatter out) whenever the active count fits, falling back to the
# full-batch kernels otherwise (lax.cond). "0" disables; an integer pins C.
_COMPACT_ENV = __import__("os").environ.get("LPCNET_PLC_COMPACT", "auto")


def set_plc_flags(fasttf=None, fastfnet=None, fastchain=None, compact=None):
    """Override the env-derived fast-path flags at runtime.

    The flags are read at TRACE time (step builders consult the module
    globals), so setting them and constructing a fresh BatchedPLC gives
    per-instance behavior -- this is what makes same-session A/B matrices
    possible (tools/bench_plc_matrix.py): round-3 decisions were made on
    ~5% deltas across separate bench processes with ~10% run-to-run spread
    (BENCHMARKS.md round-3 close-out). Returns the previous values.
    """
    global _FASTTF, _FASTFNET, _FASTCHAIN, _COMPACT_ENV
    prev = (_FASTTF, _FASTFNET, _FASTCHAIN, _COMPACT_ENV)
    if fasttf is not None:
        _FASTTF = bool(fasttf)
    if fastfnet is not None:
        _FASTFNET = bool(fastfnet)
    if fastchain is not None:
        _FASTCHAIN = bool(fastchain)
    if compact is not None:
        _COMPACT_ENV = str(compact)
    return prev


def _compact_capacity(b: int) -> int:
    if _COMPACT_ENV in ("0", "off"):
        return 0
    if _COMPACT_ENV not in ("auto", ""):
        return int(_COMPACT_ENV)
    # b/4 rounded up to the int8 sublane tile: 64 at the B=256 reference
    # pool -- the measured-best capacity in the round-4 same-session flag
    # matrix (3.662x/3.829x RT/stream causal/nc vs 3.383x/3.688x for the
    # old 3b/8=96, artifacts/bench_plc_matrix_r4*.log). Still ~2.4 sigma
    # above the 19% expected active mass at 10% loss; overflow frames
    # fall back to the full-batch kernels via lax.cond (correct, slower).
    return (b // 4 + 31) // 32 * 32 if b >= 128 else 0


def _section_body(kw, cfg, sec, enable_blending, remove_dc, bt):
    """The causal step's contiguous sample-rate section on explicit
    per-stream inputs: TF-drain blocks, sampled head tail, blend cross-fade
    + sstate restore, sampled/TF second tail. Only touches sstate; inactive
    streams (neither lost nor blending) are frozen bit-exactly by the
    kernels' advance masks, which is what makes compaction sound."""
    from ..kernels.sample_loop import (synthesize_frame_masked_auto,
                                       synthesize_frame_masked_pallas,
                                       teacher_force_blocks_auto,
                                       teacher_force_blocks_pallas)

    # bt == 0: the batch-padding auto wrappers (full-batch dispatch, any b);
    # bt > 0: direct kernel calls on the compacted sub-batch (b == bt)
    if bt:
        def tf_blocks(kw, ss, ca, cb, lp, tg, cn, cfg):
            return teacher_force_blocks_pallas(kw, ss, ca, cb, lp, tg, cn,
                                               cfg, FRAME_SIZE, bt=bt)

        def synth(kw, ss, ca, cb, lp, pre, pm, adv, cfg, n):
            return synthesize_frame_masked_pallas(kw, ss, ca, cb, lp, pre,
                                                  pm, adv, cfg, n, bt=bt)
    else:
        def tf_blocks(kw, ss, ca, cb, lp, tg, cn, cfg):
            return teacher_force_blocks_auto(kw, ss, ca, cb, lp, tg, cn, cfg)

        def synth(kw, ss, ca, cb, lp, pre, pm, adv, cfg, n):
            return synthesize_frame_masked_auto(kw, ss, ca, cb, lp, pre, pm,
                                                adv, cfg)

    b = sec["L"].shape[0]
    L, bl = sec["L"], sec["bl"]
    if _abl("tf"):
        eps = _consume(sec["ca_blk"], sec["cb_blk"], sec["lpc_blk"],
                       sec["targets"], sec["counts"])
        ss = sec["sstate"]._replace(gru_a=sec["sstate"].gru_a + eps)
    else:
        ss = tf_blocks(kw, sec["sstate"], sec["ca_blk"], sec["cb_blk"],
                       sec["lpc_blk"], sec["targets"], sec["counts"], cfg)
    act = L | bl
    adv1 = act[:, None] & sec["live1"][:, None] & jnp.ones((b, _N1), bool)
    zp = jnp.zeros((b, _N1), jnp.float32)
    zm = jnp.zeros((b, _N1), bool)
    if _abl("tails"):
        eps = _consume(sec["ca1"], sec["cb1"], sec["lpc1"], adv1)
        ss = ss._replace(gru_a=ss.gru_a + eps)
        head = zp + eps
    else:
        ss, head = synth(kw, ss, sec["ca1"], sec["cb1"], sec["lpc1"], zp,
                         zm, adv1, cfg, _N1)
    pcm80 = sec["pcm80"]
    if enable_blending:
        w = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.arange(_N1) / _N1)
        k2d = head - sec["delta"][:, None] if remove_dc else head
        blended = jnp.floor(0.5 + w * pcm80 + (1 - w) * k2d)
        pcm80 = jnp.where(bl[:, None], blended, pcm80)
        ss = _bwhere(bl, sec["saved_ss"], ss)
    tf2 = bl[:, None] & jnp.ones((b, _TO), bool)
    adv2 = act[:, None] & sec["live2"][:, None] & jnp.ones((b, _TO), bool)
    if _abl("tails"):
        eps = _consume(sec["ca2"], sec["cb2"], sec["lpc2"], adv2, pcm80)
        ss = ss._replace(gru_a=ss.gru_a + eps)
        tail = jnp.zeros((b, _TO), jnp.float32) + eps
    else:
        ss, tail = synth(kw, ss, sec["ca2"], sec["cb2"], sec["lpc2"],
                         pcm80 * tf2, tf2 & adv2, adv2, cfg, _TO)
    return ss, head, tail, pcm80


def _run_sample_section(kw, cfg, sec, enable_blending, remove_dc):
    """Dispatch _section_body full-batch or compacted to the active
    streams. The gather pads every array with a sentinel row so overflow
    slots (idx == b) read zeros and scatter harmlessly into the dropped
    row; jnp.nonzero(size=C) keeps real indices unique."""
    b = sec["L"].shape[0]
    cap = _compact_capacity(b)
    if not cap or cap >= b:
        return _section_body(kw, cfg, sec, enable_blending, remove_dc, 0)
    mask = sec["L"] | sec["bl"]
    na = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.nonzero(mask, size=cap, fill_value=b)[0]

    def gather(x):
        xp = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        return jnp.take(xp, idx, axis=0)

    def scatter(full, comp):
        fp = jnp.concatenate([full, jnp.zeros_like(full[:1])], axis=0)
        return fp.at[idx].set(comp)[:b]

    def compact_branch(sec):
        csec = jax.tree.map(gather, sec)
        ss_c, head_c, tail_c, pcm80_c = _section_body(
            kw, cfg, csec, enable_blending, remove_dc, cap)
        new_ss = jax.tree.map(scatter, sec["sstate"], ss_c)
        head = scatter(jnp.zeros((b, _N1), jnp.float32), head_c)
        tail = scatter(jnp.zeros((b, _TO), jnp.float32), tail_c)
        pcm80 = scatter(sec["pcm80"], pcm80_c)
        return new_ss, head, tail, pcm80

    def full_branch(sec):
        return _section_body(kw, cfg, sec, enable_blending, remove_dc, 0)

    return jax.lax.cond(na <= cap, compact_branch, full_branch, sec)


def _compact_wrap(b, mask, cap):
    """(gather, scatter, n_active) for a capacity-`cap` compaction of
    `mask`'s streams: overflow slots read a zero sentinel row and scatter
    into the dropped row b (same contract as _run_sample_section)."""
    na = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.nonzero(mask, size=cap, fill_value=b)[0]

    def gather(x):
        xp = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
        return jnp.take(xp, idx, axis=0)

    def scatter(full, comp):
        fp = jnp.concatenate([full, jnp.zeros_like(full[:1])], axis=0)
        return fp.at[idx].set(comp)[:b]

    return gather, scatter, na


def _nc_queued_body(fused, cfg, kw, sec, bt):
    """_process_queued_update's device work (deferred resync TF,
    src/lpcnet_plc.c:277-281) on explicit per-stream inputs; bt > 0 pins
    the compacted kernel tile, bt == 0 runs full-batch."""
    from ..kernels.sample_loop import (teacher_force_prefix_auto,
                                       teacher_force_prefix_pallas)
    q = sec["q"]
    fst, sst = sec["fstate"], sec["sstate"]
    ca, cb, lp = sec["ca"], sec["cb"], sec["lpc"]
    if _abl("fnet"):
        eps = _consume(sec["features"])
        ca, cb, lp = ca + eps, cb + eps, lp + eps
    else:
        new_f, _, caf, cbf, lpf = M.frame_network(
            fused, fst, _pad36(sec["features"]), cfg)
        fst = _bwhere(q, new_f, fst)
        ca = jnp.where(q[:, None], caf, ca)
        cb = jnp.where(q[:, None], cbf, cb)
        lp = jnp.where(q[:, None], lpf, lp)
    live = fst.frame_count > cfg.lookahead
    n = sec["queued_samples"].shape[-1]
    count = jnp.where(q & live, n, 0)
    if _abl("tf"):
        eps = _consume(ca, cb, lp, sec["queued_samples"], count)
        sst = sst._replace(gru_a=sst.gru_a + eps)
    elif bt:
        sst = teacher_force_prefix_pallas(kw, sst, ca, cb, lp,
                                          sec["queued_samples"], count, cfg,
                                          n, bt=bt)
    else:
        sst = teacher_force_prefix_auto(kw, sst, ca, cb, lp,
                                        sec["queued_samples"], count, cfg)
    return dict(fstate=fst, sstate=sst, ca=ca, cb=cb, lpc=lp)


def _queued_update_fast(fused, s: BatchedPLCState, cfg, kw):
    """_process_queued_update, compacted to the queued streams (last
    frame's recoveries, a small fraction of a steady pool) when the kernel
    fast path is on; falls back full-batch past capacity."""
    b = s.features.shape[0]
    cap = _compact_capacity(b)
    if kw is None or not _FASTTF or not cap or cap >= b:
        return _process_queued_update(fused, s, cfg, kw)
    sec = dict(q=s.queued, fstate=s.fstate, sstate=s.sstate,
               features=s.features, ca=s.cond_a, cb=s.cond_b, lpc=s.lpc,
               queued_samples=s.queued_samples)
    ref = dict(fstate=s.fstate, sstate=s.sstate, ca=s.cond_a, cb=s.cond_b,
               lpc=s.lpc)
    gather, scatter, na = _compact_wrap(b, s.queued, cap)

    def compact_branch(sec):
        out_c = _nc_queued_body(fused, cfg, kw, jax.tree.map(gather, sec),
                                cap)
        return {k: jax.tree.map(scatter, ref[k], out_c[k]) for k in ref}

    def full_branch(sec):
        out = _nc_queued_body(fused, cfg, kw, sec, 0)
        return {k: out[k] for k in ref}

    out = jax.lax.cond(na <= cap, compact_branch, full_branch, sec)
    return s._replace(fstate=out["fstate"], sstate=out["sstate"],
                      cond_a=out["ca"], cond_b=out["cb"], lpc=out["lpc"],
                      queued=jnp.zeros_like(s.queued))


def _nc_section_body(fused, cfg, kw, sec, bt):
    """The non-causal step's L|rec sample-rate chain on explicit
    per-stream inputs: conceal head / recovery forward tail (sampled TO),
    recovery reverse conditioning + teacher-forced reverse synthesis, then
    conceal tail / recovery reverse tail (sampled 80). Streams outside
    L|rec are frozen bit-exactly by the advance masks (what makes
    compaction sound); recovery rows' post-section fstate/cond/sstate are
    restored by the caller, so only L rows' sstate and the two tails are
    load-bearing outputs."""
    from ..kernels.sample_loop import (synthesize_frame_masked_auto,
                                       synthesize_frame_masked_pallas,
                                       teacher_force_prefix_auto,
                                       teacher_force_prefix_pallas)
    b = sec["L"].shape[0]
    L, rec, first = sec["L"], sec["rec"], sec["first"]
    act = L | rec
    sst, fst = sec["sstate"], sec["fstate"]
    ca, cb, lp = sec["ca"], sec["cb"], sec["lpc"]
    advTO = act[:, None] & jnp.ones((b, _TO), bool)
    pmask = first[:, None] & advTO
    live1 = fst.frame_count > cfg.lookahead
    if _abl("tails"):
        eps = _consume(ca, cb, lp, sec["buf_head"], advTO)
        sst = sst._replace(gru_a=sst.gru_a + eps)
        t1 = jnp.zeros((b, _TO), jnp.float32) + eps
    elif bt:
        adv = advTO & live1[:, None]
        sst, t1 = synthesize_frame_masked_pallas(
            kw, sst, ca, cb, lp, sec["buf_head"], pmask & adv, adv, cfg,
            _TO, bt=bt)
    else:
        adv = advTO & live1[:, None]
        sst, t1 = synthesize_frame_masked_auto(
            kw, sst, ca, cb, lp, sec["buf_head"], pmask & adv, adv, cfg)
    # recovery: reverse-time synthesis from fresh sample state (rng kept)
    fresh = M.init_sample_state(b, cfg)._replace(rng=sst.rng)
    sst = _bwhere(rec, fresh, sst)
    if _abl("fnet"):
        eps = _consume(sec["features"])
        ca2, cb2, lp2 = ca + eps, cb + eps, lp + eps
    else:
        new_f, _, caf, cbf, lpf = M.frame_network(
            fused, fst, _pad36(sec["features"]), cfg)
        fst = _bwhere(rec, new_f, fst)
        ca2 = jnp.where(rec[:, None], caf, ca)
        cb2 = jnp.where(rec[:, None], cbf, cb)
        lp2 = jnp.where(rec[:, None], lpf, lp)
    live_r = fst.frame_count > cfg.lookahead
    count = jnp.where(rec & live_r, FRAME_SIZE, 0)
    if _abl("tf"):
        eps = _consume(ca2, cb2, lp2, sec["rev"], count)
        sst = sst._replace(gru_a=sst.gru_a + eps)
    elif bt:
        sst = teacher_force_prefix_pallas(kw, sst, ca2, cb2, lp2,
                                          sec["rev"], count, cfg,
                                          FRAME_SIZE, bt=bt)
    else:
        sst = teacher_force_prefix_auto(kw, sst, ca2, cb2, lp2, sec["rev"],
                                        count, cfg)
    adv80 = act[:, None] & jnp.ones((b, _N1), bool)
    live2 = fst.frame_count > cfg.lookahead
    if _abl("tails"):
        eps = _consume(ca2, cb2, lp2, adv80)
        sst = sst._replace(gru_a=sst.gru_a + eps)
        t2 = jnp.zeros((b, _N1), jnp.float32) + eps
    elif bt:
        adv = adv80 & live2[:, None]
        sst, t2 = synthesize_frame_masked_pallas(
            kw, sst, ca2, cb2, lp2, jnp.zeros((b, _N1)),
            jnp.zeros((b, _N1), bool), adv, cfg, _N1, bt=bt)
    else:
        adv = adv80 & live2[:, None]
        sst, t2 = synthesize_frame_masked_auto(
            kw, sst, ca2, cb2, lp2, jnp.zeros((b, _N1)),
            jnp.zeros((b, _N1), bool), adv, cfg)
    return dict(sstate=sst, fstate=fst, ca=ca2, cb=cb2, lpc=lp2, t1=t1,
                t2=t2)


def _run_nc_section(fused, cfg, kw, s: BatchedPLCState, L, rec, first, pcm):
    """Dispatch _nc_section_body full-batch or compacted to the L|rec
    streams (same sentinel-row contract as _run_sample_section). Returns
    (state', t1, t2)."""
    b = L.shape[0]
    sec = dict(L=L, rec=rec, first=first, sstate=s.sstate, fstate=s.fstate,
               features=s.features, ca=s.cond_a, cb=s.cond_b, lpc=s.lpc,
               buf_head=s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE],
               rev=pcm[:, ::-1])
    ref = dict(sstate=s.sstate, fstate=s.fstate, ca=s.cond_a, cb=s.cond_b,
               lpc=s.lpc)
    cap = _compact_capacity(b)
    if not cap or cap >= b:
        out = _nc_section_body(fused, cfg, kw, sec, 0)
    else:
        gather, scatter, na = _compact_wrap(b, L | rec, cap)

        def compact_branch(sec):
            out_c = _nc_section_body(fused, cfg, kw,
                                     jax.tree.map(gather, sec), cap)
            out = {k: jax.tree.map(scatter, ref[k], out_c[k]) for k in ref}
            out["t1"] = scatter(jnp.zeros((b, _TO), jnp.float32),
                                out_c["t1"])
            out["t2"] = scatter(jnp.zeros((b, _N1), jnp.float32),
                                out_c["t2"])
            return out

        def full_branch(sec):
            return _nc_section_body(fused, cfg, kw, sec, 0)

        out = jax.lax.cond(na <= cap, compact_branch, full_branch, sec)
    s = s._replace(sstate=out["sstate"], fstate=out["fstate"],
                   cond_a=out["ca"], cond_b=out["cb"], lpc=out["lpc"])
    return s, out["t1"], out["t2"]


def _push_plc_ring(s: BatchedPLCState, active):
    new_ring = jax.tree.map(
        lambda ring, cur: jnp.where(
            active.reshape((1,) + active.shape + (1,) * (cur.ndim - 1)),
            jnp.concatenate([cur[None], ring[:-1]], axis=0), ring),
        s.plc_ring, s.plc_net)
    return s._replace(plc_ring=new_ring)


def _push_feat_ring(s: BatchedPLCState, feats36, active):
    """Host semantics (LPCNetCore.frame_network_deferred): drop the oldest
    entry when full, then append."""
    full = s.feat_count >= MAX_DEFER
    ring = jnp.where(full[:, None, None],
                     jnp.concatenate([s.feat_ring[:, 1:],
                                      jnp.zeros_like(s.feat_ring[:, :1])], 1),
                     s.feat_ring)
    count = jnp.where(full, MAX_DEFER - 1, s.feat_count)
    slot = jax.nn.one_hot(count, MAX_DEFER, dtype=bool)
    ring = jnp.where((active[:, None] & slot)[..., None],
                     feats36[:, None, :], ring)
    count = jnp.where(active, count + 1, s.feat_count)
    return s._replace(feat_ring=ring, feat_count=count)


def _enc_step(s: BatchedPLCState, pcm):
    if _abl("enc"):
        eps = _consume(pcm)
        return s, jnp.zeros((pcm.shape[0], 36), jnp.float32) + eps
    new_enc, feats = F.compute_single_frame_features(s.enc, pcm)
    return s._replace(enc=new_enc), feats


def _shift_buf(buf):
    n = buf.shape[1] - FRAME_SIZE
    return jnp.concatenate(
        [buf[:, FRAME_SIZE:FRAME_SIZE + n], buf[:, n:]], axis=1)


def _conceal_path(fused, plc_params, s: BatchedPLCState, cfg, delay,
                  plc_buf_size, kw=None):
    """src/lpcnet_plc.c:293-337 with the drain loop unrolled+masked."""
    b = s.features.shape[0]
    ones = jnp.ones((b,), bool)
    # frame_network_flush
    for i in range(MAX_DEFER):
        s = _fnet_masked(fused, s, s.feat_ring[:, i], i < s.feat_count, cfg)
    s = s._replace(feat_count=jnp.zeros_like(s.feat_count))
    # drain: teacher-force queued good audio through the synth
    zeros_in = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    for _ in range(MAX_DRAIN):
        active = s.pcm_fill > 0
        count = jnp.minimum(s.pcm_fill, FRAME_SIZE)
        output = s.pcm_buf[:, :FRAME_SIZE]
        s = _push_plc_ring(s, active)
        s = _plc_pred_masked(plc_params, s, zeros_in, active)
        s = _fnet_masked(fused, s, _pad36(s.features), active, cfg)
        adv = active[:, None] & (jnp.arange(FRAME_SIZE)[None] < count[:, None])
        s, _ = _tail_masked(fused, s, output, adv, adv, cfg, kw, sampled=False)
        s = s._replace(
            pcm_buf=jnp.where(active[:, None], _shift_buf(s.pcm_buf), s.pcm_buf),
            pcm_fill=jnp.where(active, s.pcm_fill - count, s.pcm_fill),
            skip_analysis=jnp.where(active, s.skip_analysis + 1,
                                    s.skip_analysis))
    # synthesize the concealed frame
    s = _push_plc_ring(s, ones)
    allm = jnp.ones((b, _N1), bool)
    s, head = _tail_masked(fused, s, jnp.zeros((b, _N1)),
                           jnp.zeros((b, _N1), bool), allm, cfg, kw)
    s = _plc_pred_masked(plc_params, s, zeros_in, ones)
    lc = s.loss_count + 1            # incremented before attenuation
    att = jnp.where(lc >= 10, ATT_TABLE[9] - 2.0 * (lc - 9),
                    jnp.asarray(ATT_TABLE)[jnp.minimum(lc, 9)])
    s = s._replace(
        features=s.features.at[:, 0].set(
            jnp.maximum(-10.0, s.features[:, 0] + att)),
        loss_count=lc)
    s = _fnet_masked(fused, s, _pad36(s.features), ones, cfg)
    allm = jnp.ones((b, _TO), bool)
    s, tail = _tail_masked(fused, s, jnp.zeros((b, _TO)),
                           jnp.zeros((b, _TO), bool), allm, cfg, kw)
    pcm = jnp.concatenate([head, tail], axis=1)
    s, _ = _enc_step(s, pcm)
    s = s._replace(blend=jnp.ones_like(s.blend))
    return s, jnp.clip(pcm, -32768, 32767)


def _update_path(fused, plc_params, s: BatchedPLCState, pcm, cfg,
                 enable_blending, delay, plc_buf_size, kw=None):
    """src/lpcnet_plc.c:188-290 (causal update, no DC/FEC)."""
    b = pcm.shape[0]
    burg_feats = (jnp.zeros((pcm.shape[0], 2 * NB_BANDS)) + _consume(pcm)
                  if _abl("burg") else burg_cepstral_analysis(pcm))
    skip = s.skip_analysis > 0
    bl = skip & s.blend
    if enable_blending:
        # restore the pre-loss PLC net and predict across the gap
        s = s._replace(plc_net=_bwhere(
            bl, jax.tree.map(lambda x: x[delay], s.plc_ring), s.plc_net))
        inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
        inp = inp.at[:, :2 * NB_BANDS].set(burg_feats)
        inp = inp.at[:, -1].set(1.0)
        s = _plc_pred_masked(plc_params, s, inp, bl)
        for _ in range(delay):
            s = _push_feat_ring(s, _pad36(s.features), bl)
        saved = (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc)
        s = _fnet_masked(fused, s, _pad36(s.features), bl, cfg)
        adv = bl[:, None] & jnp.ones((b, _N1), bool)
        s, tmp = _tail_masked(fused, s, jnp.zeros((b, _N1)),
                              jnp.zeros((b, _N1), bool), adv, cfg, kw)
        w = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.arange(_N1) / _N1)
        blended = jnp.floor(0.5 + w * pcm[:, :_N1] + (1 - w) * tmp)
        pcm = pcm.at[:, :_N1].set(jnp.where(bl[:, None], blended, pcm[:, :_N1]))
        # rewind and teacher-force the blended audio back in
        restored = _bwhere(bl, saved,
                           (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc))
        s = s._replace(fstate=restored[0], sstate=restored[1],
                       cond_a=restored[2], cond_b=restored[3], lpc=restored[4])
        s = _fnet_masked(fused, s, _pad36(s.features), bl, cfg)
        s, _ = _tail_masked(fused, s, pcm[:, :_N1], adv, adv, cfg, kw,
                            sampled=False)
    else:
        # codec mode: rewind the PLC net one frame and clear the AR state
        if delay > 0:
            s = s._replace(plc_net=_bwhere(
                bl, jax.tree.map(lambda x: x[delay - 1], s.plc_ring),
                s.plc_net))
        fresh = M.init_sample_state(b, cfg)._replace(rng=s.sstate.rng)
        s = s._replace(sstate=_bwhere(bl, fresh, s.sstate))
    # blend streams restart the pcm queue from the unblended half-frame
    s = s._replace(
        pcm_buf=jnp.where(bl[:, None],
                          s.pcm_buf.at[:, :_TO].set(pcm[:, _N1:]), s.pcm_buf),
        pcm_fill=jnp.where(bl, _TO, s.pcm_fill))
    # non-blend skip streams queue this frame for later teacher forcing
    nbs = skip & ~s.blend
    queued = jax.vmap(
        lambda bufr, frame, off: jax.lax.dynamic_update_slice(bufr, frame, (off,))
    )(s.pcm_buf, pcm, s.pcm_fill)
    s = s._replace(
        pcm_buf=jnp.where(nbs[:, None], queued, s.pcm_buf),
        pcm_fill=jnp.where(nbs, s.pcm_fill + FRAME_SIZE, s.pcm_fill))
    s, enc_feats = _enc_step(s, pcm)
    inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    inp = inp.at[:, :2 * NB_BANDS].set(burg_feats)
    inp = inp.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(
        enc_feats[:, :NB_FEATURES])
    inp = inp.at[:, -1].set(1.0)
    s = _plc_pred_masked(plc_params, s, inp, ~s.blend)
    # steady streams run the (deferred) frame net and advance the queue;
    # skip streams defer too, but only in blending mode (the codec mode's
    # frame net is resynced from scratch after a loss instead)
    steady = ~skip
    s = _push_feat_ring(s, enc_feats,
                        jnp.ones_like(steady) if enable_blending else steady)
    buf_app = jax.vmap(
        lambda bufr, frame: jax.lax.dynamic_update_slice(
            bufr, frame, (plc_buf_size,)))(s.pcm_buf, pcm)
    s = s._replace(
        pcm_buf=jnp.where(steady[:, None], _shift_buf(buf_app), s.pcm_buf),
        skip_analysis=jnp.where(skip, s.skip_analysis - 1, s.skip_analysis),
        loss_count=jnp.zeros_like(s.loss_count),
        blend=jnp.zeros_like(s.blend))
    return s, jnp.clip(pcm, -32768, 32767)


_DC_POWS = np.power(1.0 - DC_CONST, np.arange(FRAME_SIZE + 1))
# M[i, j] = c*(1-c)^(i-1-j) for j < i: dc_i = (1-c)^i dc_0 + (pcm @ M.T)_i
_DC_MAT = np.tril(
    DC_CONST * np.power(
        1.0 - DC_CONST,
        np.maximum(np.arange(FRAME_SIZE)[:, None]
                   - np.arange(FRAME_SIZE)[None, :] - 1, 0)), -1
).astype(np.float32)
_DC_TAIL = (DC_CONST * np.power(1.0 - DC_CONST,
                                FRAME_SIZE - 1 - np.arange(FRAME_SIZE))
            ).astype(np.float32)


def _dc_path(dc0, pcm):
    """The C's per-sample DC tracker (lp[i] = floor(0.5+dc); dc += c*(pcm[i]
    - dc), src/lpcnet_plc.c:195-204) in closed form: the linear recurrence
    becomes one [B, 160] x [160, 160] lower-triangular matmul (TPU-idiomatic
    -- no sequential scalar loop). Returns (lp [B, 160], dc after 160)."""
    dc = (dc0[:, None] * jnp.asarray(_DC_POWS[:FRAME_SIZE], jnp.float32)[None]
          + jnp.matmul(pcm, jnp.asarray(_DC_MAT).T, precision=F32_PRECISION))
    lp = jnp.floor(0.5 + dc)
    dc_end = (dc0 * np.float32(_DC_POWS[FRAME_SIZE])
              + jnp.matmul(pcm, jnp.asarray(_DC_TAIL), precision=F32_PRECISION))
    return lp, dc_end


def _syn_dc_step(syn0, pcm):
    """syn_dc += c*(pcm[i]-syn_dc) over a frame, closed form."""
    return (syn0 * np.float32(_DC_POWS[FRAME_SIZE])
            + jnp.matmul(pcm, jnp.asarray(_DC_TAIL), precision=F32_PRECISION))


_DC_TAIL80 = (DC_CONST * np.power(1.0 - DC_CONST,
                                  _TO - 1 - np.arange(_TO))).astype(np.float32)


def _syn_dc_step80(syn0, pcm80):
    """The same recurrence over a half frame (the non-causal mode's
    TRAINING_OFFSET-length accumulations, src/lpcnet_plc.c:385-387,425)."""
    return (syn0 * np.float32(_DC_POWS[_TO])
            + jnp.matmul(pcm80, jnp.asarray(_DC_TAIL80),
                         precision=F32_PRECISION))


def _att_of(lc):
    """Energy attenuation for loss_count lc (gather-free ATT_TABLE lookup)."""
    idx = jnp.minimum(lc, 9)
    table = jnp.asarray(ATT_TABLE)
    tab_val = jnp.sum(
        jnp.where(jnp.arange(10)[None] == idx[:, None], table[None], 0.0),
        axis=1)
    return jnp.where(lc >= 10, ATT_TABLE[9] - 2.0 * (lc - 9), tab_val)


def _plc_frame_step_fused(state: BatchedPLCState, fused, plc_params, pcm,
                          lost, cfg, enable_blending, delay, plc_buf_size,
                          kw=None, remove_dc=False):
    """Causal PLC step as ONE interleaved program over a single state.

    _plc_frame_step evaluates the conceal and update paths on separate state
    copies and merges at the end, so every frame pays both paths' neural
    tails, frame nets, and feature extraction. Lost and good streams are
    disjoint, so the same per-stream masking that drives each path's
    internals can interleave BOTH paths over one state, and their
    corresponding sub-ops share device work:

      * conceal head (free-run, lost) + update tmp (free-run, blend)
        -> one 80-step sampled kernel call;
      * conceal tail (free-run, lost) + update resync (teacher-forced,
        blend) -> one mixed 80-step call;
      * the update path's pre-synthesis frame net folds into the last drain
        iteration's (disjoint masks, identical input expression), and its
        post-restore frame net folds into the conceal path's pre-tail one;
      * feature extraction runs ONCE on the per-stream-selected output.

    Bit-exact vs _plc_frame_step (same sub-ops, same per-stream order);
    kernel calls 7 -> 5, enc steps 2 -> 1, frame nets 10 -> 9, and the
    whole-state double-evaluate + merge disappears.
    """
    b = pcm.shape[0]
    s = state
    L = lost
    G = ~lost
    pcm = jnp.asarray(pcm, jnp.float32)

    # ---- DC removal on incoming audio (good streams; the _dc variants,
    # src/lpcnet_plc.c:183,195-204): internal processing runs DC-free,
    # the returned audio gets the tracked offset added back ----------------
    if remove_dc:
        delta = jnp.trunc(s.syn_dc)
        lp, dcm_end = _dc_path(s.dc_mem + s.syn_dc, pcm)
        pcm = jnp.where(G[:, None], pcm - lp, pcm)
        s = s._replace(dc_mem=jnp.where(G, dcm_end, s.dc_mem),
                       syn_dc=jnp.where(G, 0.0, s.syn_dc))

    # ---- update-path frame-level prep (good streams) ----------------------
    burg_feats = (jnp.zeros((pcm.shape[0], 2 * NB_BANDS)) + _consume(pcm)
                  if _abl("burg") else burg_cepstral_analysis(pcm))
    skip = s.skip_analysis > 0
    bl = G & skip & s.blend
    blend_old = s.blend                    # update's final pred masks on the
    #                                        pre-clear blend flag
    # ---- conceal: flush deferred frame nets (lost streams) -- one batched
    # T-step frame_network_flush call instead of MAX_DEFER masked ones ------
    if _FASTFNET:
        s = _fnet_flush_masked(
            fused, s, s.feat_ring,
            jnp.where(L, jnp.minimum(s.feat_count, MAX_DEFER), 0), cfg)
    else:
        for i in range(MAX_DEFER):
            s = _fnet_masked(fused, s, s.feat_ring[:, i],
                             L & (i < s.feat_count), cfg)
    s = s._replace(feat_count=jnp.where(L, 0, s.feat_count))

    # the fused PLC-net chain replaces the 5 sequential PLC-net calls with
    # one Pallas call when the kernel path is active (see _chain_causal)
    use_chain = kw is not None and _FASTCHAIN and not _abl("plcnet")
    ch = None
    if enable_blending:
        # update path: restore the pre-loss PLC net and predict the gap
        s = s._replace(plc_net=_bwhere(
            bl, jax.tree.map(lambda x: x[delay], s.plc_ring), s.plc_net))
        if use_chain:
            ch = _chain_causal(plc_params, s, L, bl, burg_feats, delay, True)
            s = s._replace(features=jnp.where(
                bl[:, None], ch["outs"][:, 0], s.features))
        else:
            inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
            inp = inp.at[:, :2 * NB_BANDS].set(burg_feats)
            inp = inp.at[:, -1].set(1.0)
            s = _plc_pred_masked(plc_params, s, inp, bl)
        for _ in range(delay):
            s = _push_feat_ring(s, _pad36(s.features), bl)
    else:
        if delay > 0:
            s = s._replace(plc_net=_bwhere(
                bl, jax.tree.map(lambda x: x[delay - 1], s.plc_ring),
                s.plc_net))
        # codec mode rewinds the FEC pointer with the frame net
        s = s._replace(fec_read=jnp.where(
            bl, jnp.maximum(s.fec_read - delay, s.fec_keep), s.fec_read))
        fresh = M.init_sample_state(b, cfg)._replace(rng=s.sstate.rng)
        s = s._replace(sstate=_bwhere(bl, fresh, s.sstate))
        if use_chain:
            # after the rewind: the pointer replay starts from these values
            ch = _chain_causal(plc_params, s, L, bl, burg_feats, delay,
                               False)

    # ---- conceal: drain queued audio (teacher-forced); the update path's
    # pre-tmp frame net rides the LAST iteration's (disjoint masks, same
    # input expression). Two passes: the frame-rate chain (PLC net, frame
    # nets, queue bookkeeping) does not depend on the sample-rate TF tails,
    # so pass 1 runs all frame-rate work and records per-iteration
    # conditioning, and pass 2 replays the TF tails -- on the GRU-only fast
    # TF kernel when available (the tails' pcm is discarded; only
    # sstate advances) ---------------------------------------------------
    saved = None
    saved_f = None
    drain = []
    for k in range(MAX_DRAIN):
        active = L & (s.pcm_fill > 0)
        count = jnp.minimum(s.pcm_fill, FRAME_SIZE)
        output = s.pcm_buf[:, :FRAME_SIZE]
        s = _push_plc_ring(s, active)
        if ch is not None:
            s = s._replace(
                features=jnp.where(active[:, None], _chain_feats(ch, k),
                                   s.features),
                plc_net=PM.PLCNetState(ch["h1s"][:, k], ch["h2s"][:, k]))
        else:
            s, _ = _fec_or_pred_masked(plc_params, s, active, delay)
        if k == MAX_DRAIN - 1 and enable_blending:
            saved_f = (s.fstate, s.cond_a, s.cond_b, s.lpc)
            fmask = active | bl
        else:
            fmask = active
        s = _fnet_masked(fused, s, _pad36(s.features), fmask, cfg)
        live = s.fstate.frame_count > cfg.lookahead
        drain.append((s.cond_a, s.cond_b, s.lpc, output,
                      jnp.where(active & live, count, 0)))
        s = s._replace(
            pcm_buf=jnp.where(active[:, None], _shift_buf(s.pcm_buf),
                              s.pcm_buf),
            pcm_fill=jnp.where(active, s.pcm_fill - count, s.pcm_fill),
            skip_analysis=jnp.where(active, s.skip_analysis + 1,
                                    s.skip_analysis))
    def _lost_featpred(s):
        # conceal: feature prediction + attenuation for the lost frame
        # (a queued FEC frame substitutes for the prediction and resets the
        # loss count, src/lpcnet_plc.c:307-316)
        if ch is not None:
            kf = MAX_DRAIN
            fec_hit = ch["haves"][kf] & L
            s = s._replace(
                features=jnp.where(L[:, None], _chain_feats(ch, kf),
                                   s.features),
                plc_net=PM.PLCNetState(ch["h1s"][:, kf], ch["h2s"][:, kf]),
                fec_read=ch["read"], fec_keep=ch["keep"],
                fec_skip=ch["skip"])
        else:
            s, fec_hit = _fec_or_pred_masked(plc_params, s, L, delay)
        lc = jnp.where(fec_hit, 0, s.loss_count + 1)
        att = _att_of(lc)
        return s._replace(
            features=jnp.where(L[:, None], s.features.at[:, 0].set(
                jnp.maximum(-10.0, s.features[:, 0] + att)),
                s.features),
            loss_count=jnp.where(L, lc, s.loss_count))

    blv = bl if enable_blending else jnp.zeros_like(bl)
    if kw is not None and _FASTTF:
        # ---- sample-rate section (pass 2 drain + both tails), with all
        # formerly-interleaved frame-rate work hoisted ahead of it so the
        # section can compact to the active streams (_run_sample_section).
        # Reordering is sound: the hoisted ops touch disjoint state (plc
        # net, features, fec pointers, fstate/cond) and none of them read
        # the section's outputs; the blend restore splits into its
        # frame-rate half here (fstate/cond, from the pass-1 capture) and
        # its sstate half inside the section after the tmp synthesis.
        s = _push_plc_ring(s, L)
        cond1 = (s.cond_a, s.cond_b, s.lpc)
        live1 = s.fstate.frame_count > cfg.lookahead
        saved_ss = s.sstate if enable_blending else None
        if enable_blending:
            s = s._replace(
                fstate=_bwhere(bl, saved_f[0], s.fstate),
                cond_a=jnp.where(bl[:, None], saved_f[1], s.cond_a),
                cond_b=jnp.where(bl[:, None], saved_f[2], s.cond_b),
                lpc=jnp.where(bl[:, None], saved_f[3], s.lpc))
        s = _lost_featpred(s)
        s = _fnet_masked(fused, s, _pad36(s.features), L | blv, cfg)
        sec = dict(
            sstate=s.sstate, saved_ss=saved_ss,
            ca_blk=jnp.stack([d[0] for d in drain], axis=1),
            cb_blk=jnp.stack([d[1] for d in drain], axis=1),
            lpc_blk=jnp.stack([d[2] for d in drain], axis=1),
            targets=jnp.concatenate([d[3] for d in drain], axis=1),
            counts=jnp.stack([d[4] for d in drain], axis=1),
            ca1=cond1[0], cb1=cond1[1], lpc1=cond1[2], live1=live1,
            ca2=s.cond_a, cb2=s.cond_b, lpc2=s.lpc,
            live2=s.fstate.frame_count > cfg.lookahead,
            pcm80=pcm[:, :_N1], delta=delta if remove_dc else None,
            L=L, bl=blv)
        new_ss, head, tail, pcm80 = _run_sample_section(
            kw, cfg, sec, enable_blending, remove_dc)
        s = s._replace(sstate=new_ss)
        pcm = pcm.at[:, :_N1].set(pcm80)
        pcm_c = jnp.concatenate([head, tail], axis=1)
    else:
        for k, (ca_k, cb_k, lpc_k, output, count) in enumerate(drain):
            if k == MAX_DRAIN - 1 and enable_blending:
                saved = (saved_f[0], s.sstate, saved_f[1], saved_f[2],
                         saved_f[3])
            s = _tf_prefix(fused, s, ca_k, cb_k, lpc_k, output, count, cfg,
                           kw)

        # ---- shared sampled call 1: conceal head (lost) | update tmp ------
        # (codec mode has no tmp/resync synthesis; only lost streams advance)
        s = _push_plc_ring(s, L)
        adv1 = (L | blv)[:, None] & jnp.ones((b, _N1), bool)
        s, k2 = _tail_masked(fused, s, jnp.zeros((b, _N1)),
                             jnp.zeros((b, _N1), bool), adv1, cfg, kw)
        head = k2                           # lost streams' first half-frame

        if enable_blending:
            # update path: cross-fade the model's continuation into real
            # audio (in remove_dc mode the model output carries the residual
            # synthesis DC, subtracted as the truncated delta,
            # src/lpcnet_plc.c:224-231)
            w = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.arange(_N1) / _N1)
            k2d = k2 - delta[:, None] if remove_dc else k2
            blended = jnp.floor(0.5 + w * pcm[:, :_N1] + (1 - w) * k2d)
            pcm = pcm.at[:, :_N1].set(jnp.where(bl[:, None], blended,
                                                pcm[:, :_N1]))
            restored = _bwhere(
                bl, saved, (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc))
            s = s._replace(fstate=restored[0], sstate=restored[1],
                           cond_a=restored[2], cond_b=restored[3],
                           lpc=restored[4])

        s = _lost_featpred(s)

        # ---- shared frame net: conceal pre-tail | update post-restore ----
        fmask2 = L | blv
        s = _fnet_masked(fused, s, _pad36(s.features), fmask2, cfg)

        # ---- shared call 2: conceal tail (free-run) | update resync (TF) --
        tf2 = blv[:, None] & jnp.ones((b, _TO), bool)
        adv2 = (L[:, None] & jnp.ones((b, _TO), bool)) | tf2
        s, tail = _tail_masked(fused, s, pcm[:, :_TO] * tf2, tf2, adv2, cfg,
                               kw, sampled=True)
        pcm_c = jnp.concatenate([head, tail], axis=1)

    # ---- pcm queue management ---------------------------------------------
    # blend streams restart the queue from the unblended half-frame
    s = s._replace(
        pcm_buf=jnp.where(bl[:, None],
                          s.pcm_buf.at[:, :_TO].set(pcm[:, _N1:]), s.pcm_buf),
        pcm_fill=jnp.where(bl, _TO, s.pcm_fill))
    # non-blend skip streams queue this frame for later teacher forcing
    nbs = G & skip & ~s.blend
    queued = jax.vmap(
        lambda bufr, frame, off: jax.lax.dynamic_update_slice(bufr, frame,
                                                              (off,))
    )(s.pcm_buf, pcm, s.pcm_fill)
    s = s._replace(
        pcm_buf=jnp.where(nbs[:, None], queued, s.pcm_buf),
        pcm_fill=jnp.where(nbs, s.pcm_fill + FRAME_SIZE, s.pcm_fill))

    # ---- ONE feature-extraction step on the merged output -----------------
    enc_in = jnp.where(L[:, None], pcm_c, pcm)
    s, enc_feats = _enc_step(s, enc_in)

    # update path: feed the PLC net with real features
    inp2 = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    inp2 = inp2.at[:, :2 * NB_BANDS].set(burg_feats)
    inp2 = inp2.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(
        enc_feats[:, :NB_FEATURES])
    inp2 = inp2.at[:, -1].set(1.0)
    nb_mask = G & ~blend_old
    s = _plc_pred_masked(plc_params, s, inp2, nb_mask)
    # good frames advance the FEC pointer past this packet's slot
    # (src/lpcnet_plc.c:232-239)
    adv_skip = nb_mask & (s.fec_skip > 0)
    adv_read = nb_mask & ~adv_skip & (s.fec_read < s.fec_len)
    read2 = jnp.where(adv_read, s.fec_read + 1, s.fec_read)
    s = s._replace(
        fec_read=read2,
        fec_keep=jnp.where(nb_mask, jnp.maximum(
            jnp.maximum(s.fec_keep, read2 - delay - 1), 0), s.fec_keep),
        fec_skip=jnp.where(adv_skip, s.fec_skip - 1, s.fec_skip))

    steady = G & ~skip
    s = _push_feat_ring(s, enc_feats,
                        G if enable_blending else steady)
    buf_app = jax.vmap(
        lambda bufr, frame: jax.lax.dynamic_update_slice(
            bufr, frame, (plc_buf_size,)))(s.pcm_buf, pcm)
    s = s._replace(
        pcm_buf=jnp.where(steady[:, None], _shift_buf(buf_app), s.pcm_buf),
        skip_analysis=jnp.where(G & skip, s.skip_analysis - 1,
                                s.skip_analysis),
        loss_count=jnp.where(G, 0, s.loss_count),
        blend=jnp.where(L, True, jnp.zeros_like(s.blend)))

    if remove_dc:
        # conceal tracks the synthesized signal's DC and re-offsets its
        # output; update re-adds the removed input DC (src/lpcnet_plc.c:
        # 263-266, 234-235)
        s = s._replace(syn_dc=jnp.where(
            L, _syn_dc_step(s.syn_dc, pcm_c), s.syn_dc))
        out = jnp.where(L[:, None],
                        pcm_c + jnp.floor(0.5 + s.dc_mem)[:, None], pcm + lp)
    else:
        out = jnp.where(L[:, None], pcm_c, pcm)
    return s, jnp.clip(out, -32768, 32767)


# ---------------------------------------------------------------------------
# Non-causal mode (src/lpcnet_plc.c:342-492, sans DC filter)
# ---------------------------------------------------------------------------

def _process_queued_update(fused, s: BatchedPLCState, cfg, kw=None):
    """Deferred resync queued by the previous recovery frame
    (src/lpcnet_plc.c:277-281): teacher-force the queued samples, masked by
    the per-stream queued flag."""
    q = s.queued
    s = _fnet_masked(fused, s, _pad36(s.features), q, cfg)
    live = s.fstate.frame_count > cfg.lookahead
    n = s.queued_samples.shape[-1]
    count = jnp.where(q & live, n, 0)
    s = _tf_prefix(fused, s, s.cond_a, s.cond_b, s.lpc, s.queued_samples,
                   count, cfg, kw)
    return s._replace(queued=jnp.zeros_like(q))


def _conceal_path_nc(fused, plc_params, s: BatchedPLCState, cfg, kw=None):
    """lpcnet_plc_conceal_non_causal (src/lpcnet_plc.c:452-492)."""
    b = s.features.shape[0]
    ones = jnp.ones((b,), bool)
    s = _process_queued_update(fused, s, cfg, kw)
    zeros_in = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    s = _plc_pred_masked(plc_params, s, zeros_in, ones)
    # non-causal attenuates with the PRE-increment loss count (:466 vs :494)
    lc = s.loss_count
    att = jnp.where(lc >= 10, ATT_TABLE[9] - 2.0 * (lc - 9),
                    jnp.asarray(ATT_TABLE)[jnp.minimum(lc, 9)])
    s = s._replace(features=s.features.at[:, 0].set(
        jnp.maximum(-10.0, s.features[:, 0] + att)))
    first = s.loss_count == 0
    buf_head = s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE]
    s = _fnet_masked(fused, s, _pad36(s.features), ones, cfg)
    adv = jnp.ones((b, _TO), bool)
    # first loss: teacher-force the buffered lookahead; later: free-run
    s, t1 = _tail_masked(fused, s, buf_head, first[:, None] & adv, adv, cfg,
                         kw)
    head = jnp.where(first[:, None], buf_head, t1)
    adv80 = jnp.ones((b, _N1), bool)
    s, tail = _tail_masked(fused, s, jnp.zeros((b, _N1)),
                           jnp.zeros((b, _N1), bool), adv80, cfg, kw)
    pcm = jnp.concatenate([head, tail], axis=1)
    # continued loss: refresh the buffer head and re-run feature analysis
    s = s._replace(pcm_buf=jnp.where(
        first[:, None], s.pcm_buf,
        s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(t1)))
    new_enc, _ = F.compute_single_frame_features(s.enc, s.pcm_buf[:, :FRAME_SIZE])
    s = s._replace(enc=_bwhere(~first, new_enc, s.enc))
    s = s._replace(
        pcm_buf=s.pcm_buf.at[:, :FRAME_SIZE - _TO].set(pcm[:, _TO:]),
        loss_count=s.loss_count + 1)
    return s, jnp.clip(pcm, -32768, 32767)


def _update_path_nc(fused, plc_params, s: BatchedPLCState, pcm, cfg, kw=None):
    """lpcnet_plc_update_non_causal (src/lpcnet_plc.c:349-450), sans DC."""
    b = pcm.shape[0]
    s = _process_queued_update(fused, s, cfg, kw)
    pcm_save = pcm
    burg_feats = (jnp.zeros((pcm.shape[0], 2 * NB_BANDS)) + _consume(pcm)
                  if _abl("burg") else burg_cepstral_analysis(pcm))
    rec = s.loss_count > 0          # first good frame after a loss
    # --- recovery: predict across the gap, reverse-blend into the buffer ---
    inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    inp = inp.at[:, :2 * NB_BANDS].set(burg_feats)
    inp = inp.at[:, -1].set(1.0)
    s = _plc_pred_masked(plc_params, s, inp, rec)
    saved = (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc)
    s = _fnet_masked(fused, s, _pad36(s.features), rec, cfg)
    advTO = rec[:, None] & jnp.ones((b, _TO), bool)
    s, fwd = _tail_masked(fused, s, jnp.zeros((b, _TO)),
                          jnp.zeros((b, _TO), bool), advTO, cfg, kw)
    s = s._replace(pcm_buf=jnp.where(
        rec[:, None],
        s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(fwd), s.pcm_buf))
    # reverse-time synthesis from the incoming audio back toward the gap
    fresh = M.init_sample_state(b, cfg)._replace(rng=s.sstate.rng)
    s = s._replace(sstate=_bwhere(rec, fresh, s.sstate))
    rev = pcm[:, ::-1]
    adv160 = rec[:, None] & jnp.ones((b, FRAME_SIZE), bool)
    s = _fnet_masked(fused, s, _pad36(s.features), rec, cfg)
    s, _ = _tail_masked(fused, s, rev, adv160, adv160, cfg, kw, sampled=False)
    s, rev_tail = _tail_masked(fused, s, jnp.zeros((b, _TO)),
                               jnp.zeros((b, _TO), bool), advTO, cfg, kw)
    w = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.arange(_TO) / _TO)
    # buf[F-1-i] = w[i]*buf[F-1-i] + (1-w[i])*rev_tail[i]
    head = s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE]
    blended = jnp.floor(0.5 + w[::-1] * head + (1 - w[::-1]) * rev_tail[:, ::-1])
    s = s._replace(pcm_buf=jnp.where(
        rec[:, None],
        s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(blended), s.pcm_buf))
    restored = _bwhere(rec, saved,
                       (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc))
    s = s._replace(fstate=restored[0], sstate=restored[1], cond_a=restored[2],
                   cond_b=restored[3], lpc=restored[4])
    qs = jnp.concatenate([s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE],
                          pcm[:, :FRAME_SIZE - _TO]], axis=1)
    s = s._replace(
        queued=jnp.where(rec, True, s.queued),
        queued_samples=jnp.where(rec[:, None], qs, s.queued_samples))
    new_enc, _ = F.compute_single_frame_features(s.enc, s.pcm_buf[:, :FRAME_SIZE])
    s = s._replace(enc=_bwhere(rec, new_enc, s.enc))
    # --- common: analyze the incoming frame ---
    s, enc_feats = _enc_step(s, pcm)
    good = ~rec
    inp2 = inp.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(
        enc_feats[:, :NB_FEATURES])
    s = _plc_pred_masked(plc_params, s, inp2, good)
    s = _fnet_masked(fused, s, enc_feats, good, cfg)
    buf_head = s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE]
    advTO_g = good[:, None] & jnp.ones((b, _TO), bool)
    s, _ = _tail_masked(fused, s, buf_head, advTO_g, advTO_g, cfg, kw,
                        sampled=False)
    adv80_g = good[:, None] & jnp.ones((b, _N1), bool)
    s, _ = _tail_masked(fused, s, pcm[:, :_N1], adv80_g, adv80_g, cfg, kw,
                        sampled=False)
    out = jnp.concatenate([s.pcm_buf[:, _TO:FRAME_SIZE], pcm[:, :_TO]], axis=1)
    s = s._replace(
        pcm_buf=s.pcm_buf.at[:, :FRAME_SIZE].set(pcm_save),
        loss_count=jnp.zeros_like(s.loss_count))
    return s, jnp.clip(out, -32768, 32767)


def _plc_frame_step_nc_fused(state: BatchedPLCState, fused, plc_params, pcm,
                             lost, cfg, enable_blending, delay, plc_buf_size,
                             kw=None, remove_dc=False):
    """Non-causal PLC step as ONE interleaved program over a single state
    (the non-causal twin of _plc_frame_step_fused; same argument as there:
    lost/good masks are disjoint, so both paths' sub-ops interleave over one
    state and the shared ones run once).

    Per-stream sub-op order and RNG lockstep match the two-path
    _plc_frame_step_nc exactly; shared device work: the queued-update resync
    runs once instead of twice, the conceal TO-tail and the recovery
    forward-tail share one sampled kernel call, the conceal 80-tail and the
    recovery reverse-tail share another, and the buffer re-analysis (conceal
    continued-loss + recovery) collapses to one enc call. Kernel calls
    9 -> 5, enc steps 3 -> 2, frame nets 6 -> 4, plc preds 3 -> 2, and the
    whole-state double-evaluate + merge disappears.

    remove_dc adds the non-causal _dc variant (src/lpcnet_plc.c:383-393,
    404-426, 437-441): internal processing runs DC-free; on recovery the
    tracker rewinds and re-runs with the synthesized forward tail folded in
    (the two per-sample loops become the closed-form triangular-matmul
    recurrences _dc_path/_syn_dc_step*); the half-frame output delay re-adds
    offsets through the dc_buf ring.
    """
    b = pcm.shape[0]
    s = state
    L = lost
    G = ~lost
    pcm = jnp.asarray(pcm, jnp.float32)
    pcm_in = pcm

    # ---- shared: drain the deferred resync queued by a previous recovery --
    s = _queued_update_fast(fused, s, cfg, kw)

    # ---- DC removal pass 1 on incoming audio (good streams,
    # src/lpcnet_plc.c:404-412): pending synthesis DC folds into the tracker
    # first; delta carries the truncated pre-fold residue for the blend ----
    if remove_dc:
        delta = jnp.trunc(s.syn_dc)
        dc_out = jnp.floor(0.5 + s.dc_mem)      # conceal's output offset
        mem_bak = s.dc_mem + s.syn_dc
        lp, dcm1 = _dc_path(mem_bak, pcm)
        pcm = jnp.where(G[:, None], pcm - lp, pcm)
        s = s._replace(dc_mem=jnp.where(G, dcm1, s.dc_mem),
                       syn_dc=jnp.where(G, 0.0, s.syn_dc))
    pcm_save = pcm

    burg_feats = (jnp.zeros((pcm.shape[0], 2 * NB_BANDS)) + _consume(pcm)
                  if _abl("burg") else burg_cepstral_analysis(pcm))
    rec = G & (s.loss_count > 0)       # first good frame after a loss
    gd = G & ~rec
    first = L & (s.loss_count == 0)    # first lost frame

    # ---- shared plc_pred: conceal (zeros input) | recovery (burg input) ---
    inp = jnp.zeros((b, PM.PLC_INPUT_SIZE), jnp.float32)
    inp = inp.at[:, :2 * NB_BANDS].set(burg_feats)
    inp = inp.at[:, -1].set(1.0)
    inp_sel = jnp.where(L[:, None], jnp.zeros_like(inp), inp)
    s = _plc_pred_masked(plc_params, s, inp_sel, L | rec)

    # conceal: energy attenuation with the PRE-increment loss count
    # (src/lpcnet_plc.c:466 vs :494)
    att = _att_of(s.loss_count)
    s = s._replace(features=jnp.where(
        L[:, None],
        s.features.at[:, 0].set(jnp.maximum(-10.0, s.features[:, 0] + att)),
        s.features))

    saved = (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc)

    # ---- shared fnet + call 1 (TO): conceal head | recovery forward tail --
    s = _fnet_masked(fused, s, _pad36(s.features), L | rec, cfg)
    buf_head = s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE]
    # the whole L|rec sample-rate chain (tail1 -> recovery reverse TF ->
    # tail2) compacts to the active streams when the kernel fast path is on
    # (remove_dc interleaves full-row DC passes between the calls; it keeps
    # the original program)
    nc_fast = kw is not None and _FASTTF and not remove_dc
    if nc_fast:
        s, t1, t2 = _run_nc_section(fused, cfg, kw, s, L, rec, first, pcm)
        head = jnp.where(first[:, None], buf_head, t1)
        s = s._replace(pcm_buf=jnp.where(
            (rec | (L & ~first))[:, None],
            s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(t1),
            s.pcm_buf))
    else:
        advTO = (L | rec)[:, None] & jnp.ones((b, _TO), bool)
        s, t1 = _tail_masked(fused, s, buf_head, first[:, None] & advTO,
                             advTO, cfg, kw)
        head = jnp.where(first[:, None], buf_head, t1)
        # recovery stores its forward tail in the buffer head; continued-
        # loss conceal refreshes the head with its own continuation
        s = s._replace(pcm_buf=jnp.where(
            (rec | (L & ~first))[:, None],
            s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(t1),
            s.pcm_buf))

        # ---- DC removal pass 2 (recovery streams, src/lpcnet_plc.c:414-
        # 426): rewind the tracker, fold in the forward tail's synthesis
        # DC, re-remove
        if remove_dc:
            syn_t1 = _syn_dc_step80(jnp.zeros_like(s.syn_dc), t1)
            delta = jnp.where(rec, jnp.trunc(delta + syn_t1), delta)
            lp2, dcm2 = _dc_path(mem_bak + syn_t1, pcm_in)
            pcm = jnp.where(rec[:, None], pcm_in - lp2, pcm)
            lp = jnp.where(rec[:, None], lp2, lp)
            s = s._replace(dc_mem=jnp.where(rec, dcm2, s.dc_mem))
            pcm_save = jnp.where(rec[:, None], pcm, pcm_save)

        # recovery: reverse-time synthesis from the incoming audio
        fresh = M.init_sample_state(b, cfg)._replace(rng=s.sstate.rng)
        s = s._replace(sstate=_bwhere(rec, fresh, s.sstate))
        s = _fnet_masked(fused, s, _pad36(s.features), rec, cfg)
        rev = pcm[:, ::-1]
        live_r = s.fstate.frame_count > cfg.lookahead
        s = _tf_prefix(fused, s, s.cond_a, s.cond_b, s.lpc, rev,
                       jnp.where(rec & live_r, FRAME_SIZE, 0), cfg, kw)

        # ---- shared call 2 (80): conceal tail | recovery reverse tail ----
        adv80 = (L | rec)[:, None] & jnp.ones((b, _N1), bool)
        s, t2 = _tail_masked(fused, s, jnp.zeros((b, _N1)),
                             jnp.zeros((b, _N1), bool), adv80, cfg, kw)
    pcm_c = jnp.concatenate([head, t2], axis=1)

    # recovery: reverse-blend into the buffered forward tail, then restore
    # (in remove_dc mode the reverse synthesis carries the residual DC,
    # re-offset by the truncated delta, src/lpcnet_plc.c:437-441)
    w = 0.5 - 0.5 * jnp.cos(jnp.pi * jnp.arange(_TO) / _TO)
    fwd_head = s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE]
    t2_rev = t2[:, ::-1] + delta[:, None] if remove_dc else t2[:, ::-1]
    blended = jnp.floor(0.5 + w[::-1] * fwd_head + (1 - w[::-1]) * t2_rev)
    s = s._replace(pcm_buf=jnp.where(
        rec[:, None],
        s.pcm_buf.at[:, FRAME_SIZE - _TO:FRAME_SIZE].set(blended),
        s.pcm_buf))
    restored = _bwhere(rec, saved,
                       (s.fstate, s.sstate, s.cond_a, s.cond_b, s.lpc))
    s = s._replace(fstate=restored[0], sstate=restored[1], cond_a=restored[2],
                   cond_b=restored[3], lpc=restored[4])
    qs = jnp.concatenate([s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE],
                          pcm[:, :FRAME_SIZE - _TO]], axis=1)
    s = s._replace(
        queued=jnp.where(rec, True, s.queued),
        queued_samples=jnp.where(rec[:, None], qs, s.queued_samples))

    # ---- shared buffer re-analysis: continued-loss conceal | recovery -----
    new_enc, _ = F.compute_single_frame_features(
        s.enc, s.pcm_buf[:, :FRAME_SIZE])
    s = s._replace(enc=_bwhere(rec | (L & ~first), new_enc, s.enc))

    # ---- good-frame analysis + steady-state resync ------------------------
    s, enc_feats = _enc_step_masked(s, pcm, G)
    inp2 = inp.at[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES].set(
        enc_feats[:, :NB_FEATURES])
    s = _plc_pred_masked(plc_params, s, inp2, gd)
    s = _fnet_masked(fused, s, enc_feats, gd, cfg)
    tf_target = jnp.concatenate(
        [s.pcm_buf[:, FRAME_SIZE - _TO:FRAME_SIZE], pcm[:, :_N1]], axis=1)
    live_g = s.fstate.frame_count > cfg.lookahead
    s = _tf_prefix(fused, s, s.cond_a, s.cond_b, s.lpc, tf_target,
                   jnp.where(gd & live_g, FRAME_SIZE, 0), cfg, kw)

    # ---- outputs + buffer/count bookkeeping -------------------------------
    out_u = jnp.concatenate([s.pcm_buf[:, _TO:FRAME_SIZE], pcm[:, :_TO]],
                            axis=1)
    new_buf = jnp.where(
        L[:, None],
        s.pcm_buf.at[:, :FRAME_SIZE - _TO].set(pcm_c[:, _TO:]),
        s.pcm_buf.at[:, :FRAME_SIZE].set(pcm_save))
    s = s._replace(
        pcm_buf=new_buf,
        loss_count=jnp.where(L, s.loss_count + 1,
                             jnp.zeros_like(s.loss_count)))
    if remove_dc:
        # conceal tracks the synthesized signal's DC (tail only on the first
        # loss -- the head was buffered lookahead, src/lpcnet_plc.c:384-390);
        # the half-frame output delay re-adds offsets via the dc_buf ring
        syn_c = jnp.where(first, _syn_dc_step80(s.syn_dc, t2),
                          _syn_dc_step(s.syn_dc, pcm_c))
        s = s._replace(syn_dc=jnp.where(L, syn_c, s.syn_dc))
        out_c = (pcm_c.at[:, :_TO].add(s.dc_buf)
                 .at[:, _TO:].add(dc_out[:, None]))
        out_u = (out_u.at[:, :_TO].add(s.dc_buf)
                 .at[:, _TO:].add(lp[:, :_N1]))
        s = s._replace(dc_buf=jnp.where(
            L[:, None], jnp.broadcast_to(dc_out[:, None], (b, _TO)),
            lp[:, FRAME_SIZE - _TO:]))
        out = jnp.where(L[:, None], out_c, out_u)
    else:
        out = jnp.where(L[:, None], pcm_c, out_u)
    return s, jnp.clip(out, -32768, 32767)


def _enc_step_masked(s: BatchedPLCState, pcm, active):
    """Encoder feature step with per-stream state masking."""
    new_enc, feats = F.compute_single_frame_features(s.enc, pcm)
    return s._replace(enc=_bwhere(active, new_enc, s.enc)), feats


def _plc_frame_step_nc(state: BatchedPLCState, fused, plc_params, pcm, lost,
                       cfg, enable_blending, delay, plc_buf_size, kw=None):
    s_c, out_c = _conceal_path_nc(fused, plc_params, state, cfg, kw)
    s_u, out_u = _update_path_nc(fused, plc_params, state, pcm, cfg, kw)
    ring = jax.tree.map(
        lambda c, u: jnp.where(lost[None, :, None], c, u),
        s_c.plc_ring, s_u.plc_ring)
    d_c, d_u = s_c._asdict(), s_u._asdict()
    s = BatchedPLCState(**{
        k: ring if k == "plc_ring" else _bwhere(lost, d_c[k], d_u[k])
        for k in d_c})
    return s, jnp.where(lost[:, None], out_c, out_u)


def _plc_frame_step(state: BatchedPLCState, fused, plc_params, pcm, lost,
                    cfg, enable_blending, delay, plc_buf_size, kw=None):
    s_c, out_c = _conceal_path(fused, plc_params, state, cfg, delay,
                               plc_buf_size, kw)
    s_u, out_u = _update_path(fused, plc_params, state, pcm, cfg,
                              enable_blending, delay, plc_buf_size, kw)
    # ring leaves are [R, B, H] (select on axis 1); everything else [B, ...]
    ring = jax.tree.map(
        lambda c, u: jnp.where(lost[None, :, None], c, u),
        s_c.plc_ring, s_u.plc_ring)
    d_c, d_u = s_c._asdict(), s_u._asdict()
    s = BatchedPLCState(**{
        k: ring if k == "plc_ring" else _bwhere(lost, d_c[k], d_u[k])
        for k in d_c})
    return s, jnp.where(lost[:, None], out_c, out_u)
