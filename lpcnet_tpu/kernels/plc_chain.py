"""Fused PLC-net chain kernel.

The batched PLC frame step runs up to 5 sequential PLC feature-prediction
network calls (src/lpcnet_plc.c:135-166: dense(57->128,tanh) -> GRU(256)
-> GRU(256) -> dense(256->20)): the blend restore prediction, one
get_fec_or_pred per drain iteration, and the lost-frame prediction. Each
is ~16 tiny HLO ops whose per-op launch cost dominates at serving batches
(~0.10 ms/call at B=256, BENCHMARKS.md). Their INPUTS are all precomputable
before any of them runs (burg cepstra, FEC queue rows via deterministic
pointer replay, flag lanes), and blend streams and lost streams are
disjoint, so the whole chain collapses into ONE Pallas kernel: weights
resident in VMEM, K steps statically unrolled, per-(stream, step) advance
masks, per-step output and post-step state sequences written out for the
frame-rate program to replay ring pushes and feature selects.

Numerics: f32 MXU matmuls (same operand order as models.plc
compute_plc_pred with HIGHEST precision); the +0.1 correlation boost stays
with the caller (it applies to predictions only, not FEC consumption).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.constants import NB_FEATURES
from ..models.plc import PLC_INPUT_SIZE

_INTERPRET = bool(__import__("os").environ.get("LPCNET_PALLAS_INTERPRET"))


def _interpret() -> bool:
    # follow sample_loop's flag too: the batched PLC step mixes this kernel
    # with the sample-loop kernels, so toggling one module (as the older
    # tests do) must switch the whole step to interpret mode
    from . import sample_loop
    return _INTERPRET or sample_loop._INTERPRET

_IN_PAD = 64      # 57 -> 64 input lanes
_OUT_PAD = 128    # 20 -> 128 output lanes

_CWNAMES = ("d1_w", "d1_b", "g1_in", "g1_rec", "g1_b0", "g1_b1",
            "g2_in", "g2_rec", "g2_b0", "g2_b1", "out_w", "out_b")


def plc_chain_weights(plc_params):
    """Pack models.plc params into the kernel operand bundle (f32)."""
    d1 = plc_params["plc_dense1"]
    g1 = plc_params["plc_gru1"]
    g2 = plc_params["plc_gru2"]
    out = plc_params["plc_out"]
    d1_w = jnp.zeros((_IN_PAD, d1["kernel"].shape[1]), jnp.float32
                     ).at[:PLC_INPUT_SIZE].set(d1["kernel"])
    out_w = jnp.zeros((out["kernel"].shape[0], _OUT_PAD), jnp.float32
                      ).at[:, :NB_FEATURES].set(out["kernel"])
    out_b = jnp.zeros((_OUT_PAD,), jnp.float32
                      ).at[:NB_FEATURES].set(out["bias"])
    return {
        "d1_w": d1_w, "d1_b": d1["bias"][None, :],
        "g1_in": g1["kernel"], "g1_rec": g1["recurrent"],
        "g1_b0": g1["bias"][0][None, :], "g1_b1": g1["bias"][1][None, :],
        "g2_in": g2["kernel"], "g2_rec": g2["recurrent"],
        "g2_b0": g2["bias"][0][None, :], "g2_b1": g2["bias"][1][None, :],
        "out_w": out_w, "out_b": out_b[None, :],
    }


_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    # models.plc runs HIGHEST precision (f32-exact C numerics); default
    # MXU passes truncate f32 operands to bf16 and diverge at ~1e-2.
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _gru(h, x_gates, rec, b1, n):
    zrec = _dot(h, rec[:]) + b1[:]
    z = jax.nn.sigmoid(x_gates[:, :n] + zrec[:, :n])
    r = jax.nn.sigmoid(x_gates[:, n:2 * n] + zrec[:, n:2 * n])
    hc = jnp.tanh(x_gates[:, 2 * n:] + r * zrec[:, 2 * n:])
    return z * h + (1.0 - z) * hc


def _chain_kernel(k_steps, n1, n2, *refs):
    W = dict(zip(_CWNAMES, refs[:len(_CWNAMES)]))
    (inp_ref, mask_ref, h1_in, h2_in,
     h1_seq, h2_seq, out_seq) = refs[len(_CWNAMES):]

    h1 = h1_in[:]
    h2 = h2_in[:]
    for k in range(k_steps):
        x = inp_ref[:, k * _IN_PAD:(k + 1) * _IN_PAD]
        d = jnp.tanh(_dot(x, W["d1_w"][:]) + W["d1_b"][:])
        g1 = _dot(d, W["g1_in"][:]) + W["g1_b0"][:]
        h1n = _gru(h1, g1, W["g1_rec"], W["g1_b1"], n1)
        g2 = _dot(h1n, W["g2_in"][:]) + W["g2_b0"][:]
        h2n = _gru(h2, g2, W["g2_rec"], W["g2_b1"], n2)
        out = _dot(h2n, W["out_w"][:]) + W["out_b"][:]
        m = mask_ref[:, k:k + 1] > 0
        h1 = jnp.where(m, h1n, h1)
        h2 = jnp.where(m, h2n, h2)
        h1_seq[:, k * n1:(k + 1) * n1] = h1
        h2_seq[:, k * n2:(k + 1) * n2] = h2
        out_seq[:, k * _OUT_PAD:(k + 1) * _OUT_PAD] = out


@functools.partial(jax.jit, static_argnames=("k_steps", "bt"))
def plc_chain_pallas(cw, h1, h2, inputs, masks, k_steps: int, bt: int = 0):
    """Run k_steps masked PLC-net steps in one kernel call.

    Args: cw from plc_chain_weights; h1 [B, 256], h2 [B, 256] initial
    states (post blend-restore); inputs [B, K, 57]; masks [B, K] bool
    (False freezes the stream for that step; the step's raw output is
    still written so callers can select per stream).

    Returns (h1_seq [B, K, 256], h2_seq [B, K, 256], outs [B, K, 20]):
    running post-step states and per-step dense outputs.
    """
    b = h1.shape[0]
    n1, n2 = h1.shape[1], h2.shape[1]
    bt = bt or min(b, 256)
    assert b % bt == 0, f"batch {b} must be a multiple of {bt}"
    inp = jnp.zeros((b, k_steps, _IN_PAD), jnp.float32
                    ).at[:, :, :PLC_INPUT_SIZE].set(
                        jnp.asarray(inputs, jnp.float32))
    inp = inp.reshape(b, k_steps * _IN_PAD)
    masks = jnp.asarray(masks, jnp.int32)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def b_spec(cols):
        return pl.BlockSpec((bt, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_chain_kernel, k_steps, n1, n2)
    in_specs = ([w_spec(cw[n].shape) for n in _CWNAMES]
                + [b_spec(k_steps * _IN_PAD), b_spec(k_steps),
                   b_spec(n1), b_spec(n2)])
    out_shapes = (
        jax.ShapeDtypeStruct((b, k_steps * n1), jnp.float32),
        jax.ShapeDtypeStruct((b, k_steps * n2), jnp.float32),
        jax.ShapeDtypeStruct((b, k_steps * _OUT_PAD), jnp.float32),
    )
    out_specs = (b_spec(k_steps * n1), b_spec(k_steps * n2),
                 b_spec(k_steps * _OUT_PAD))

    h1_seq, h2_seq, outs = pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(*[cw[n] for n in _CWNAMES] + [inp, masks, h1, h2])

    return (h1_seq.reshape(b, k_steps, n1), h2_seq.reshape(b, k_steps, n2),
            outs.reshape(b, k_steps, _OUT_PAD)[:, :, :NB_FEATURES])
