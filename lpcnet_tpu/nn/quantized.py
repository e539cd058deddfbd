"""Int8 quantized inference ops (the reference's DOT_PROD mode).

The C runtime's quantized GEMV (src/vec.h:206-236, sgemv_accum8x4 with
DOT_PROD) computes

    out = bias + (W_q @ x_q) / (128 * 127)

with W_q = round(128*w) int8 and x_q = floor(0.5 + 127*x) int8 (the SU-bias
AVX2 variant shifts x by +127 into u8 and corrects with a precomputed
`subias`; the integer result is identical, src/vec_avx.h:40-41,
training_tf2/dump_lpcnet.py:131-133). On TPU the natural shape is an int8
MXU matmul accumulating in int32 -- exact integer arithmetic, so this path
matches the C DOT_PROD results *more* tightly than the C's own float
accumulation does.

Applies to the two quantized matrices of the sample-rate network: GRU-A's
recurrent kernel and GRU-B's input kernel (the blob's int8 arrays); all
other layers are float in the reference too.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .layers import activate

SCALE_1 = 1.0 / (128.0 * 127.0)


def quantize_weights_int8(w) -> jnp.ndarray:
    """round(128*w) -> int8 (exact for weights already on the 1/128 grid,
    which quantize-finetuned checkpoints and blob imports are)."""
    return jnp.clip(jnp.round(jnp.asarray(w) * 128.0), -128, 127).astype(jnp.int8)


def quantize_act_int8(x) -> jnp.ndarray:
    """floor(0.5 + 127*x), the C's round-half-up (src/vec.h:243)."""
    return jnp.clip(jnp.floor(0.5 + 127.0 * x), -128, 127).astype(jnp.int8)


def qmatmul(x_q, w_q) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul, rescaled to float (SCALE_1)."""
    acc = jnp.matmul(x_q, w_q, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * SCALE_1


def gru_precomputed_step_q8(params: Dict[str, Any], h, gate_in,
                            activation: str = "tanh"):
    """Quantized twin of layers.gru_precomputed_step: the recurrent matmul
    runs int8 x int8 on quantized h (compute_sparse_gru with DOT_PROD,
    src/nnet.c:410-448). The diagonal stays float, exactly as the C keeps it
    outside the int8 blocks (src/nnet.c:419-424, dump_lpcnet.py:88-93)."""
    n = h.shape[-1]
    h_q = quantize_act_int8(h)
    zrec = (qmatmul(h_q, params["recurrent_q8"])
            + params["recurrent_diag"] * jnp.tile(h, 3)
            + params["bias"][1])
    z = activate(gate_in[..., :n] + zrec[..., :n], "sigmoid")
    r = activate(gate_in[..., n:2 * n] + zrec[..., n:2 * n], "sigmoid")
    hcand = activate(gate_in[..., 2 * n:] + r * zrec[..., 2 * n:], activation)
    return z * h + (1.0 - z) * hcand


def gru_precomputed_step_q8_dense(params: Dict[str, Any], h, gate_in,
                                  activation: str = "tanh"):
    """Dense-recurrent quantized GRU step (GRU-B): the C's compute_gruB runs
    the FULL recurrent matrix through sgemv_accum8x4 (src/nnet.c:326-373,
    no diagonal extraction -- that's the sparse GRU-A format only)."""
    n = h.shape[-1]
    zrec = qmatmul(quantize_act_int8(h), params["recurrent_q8"]) \
        + params["bias"][1]
    z = activate(gate_in[..., :n] + zrec[..., :n], "sigmoid")
    r = activate(gate_in[..., n:2 * n] + zrec[..., n:2 * n], "sigmoid")
    hcand = activate(gate_in[..., 2 * n:] + r * zrec[..., 2 * n:], activation)
    return z * h + (1.0 - z) * hcand


def split_diag(recurrent) -> tuple:
    """[N, 3N] recurrent kernel -> (off-diagonal part, per-gate diagonal
    [3N] float)."""
    recurrent = jnp.asarray(recurrent)
    n = recurrent.shape[0]
    eye = jnp.eye(n, dtype=recurrent.dtype)
    diags = [jnp.diagonal(recurrent[:, k * n:(k + 1) * n]) for k in range(3)]
    off = jnp.concatenate(
        [recurrent[:, k * n:(k + 1) * n] * (1 - eye) for k in range(3)],
        axis=1)
    return off, jnp.concatenate(diags)


def quantize_fused(fused: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a fused inference param dict to the int8 inference form:
    GRU-A's off-diagonal recurrent and GRU-B's input kernel become int8
    (halving their footprint); the GRU-A diagonal stays float, as in the
    reference's sparse format. Everything else is shared."""
    fused = dict(fused)
    off, diag = split_diag(fused["gru_a_rec"]["recurrent"])
    fused["gru_a_rec"] = dict(
        fused["gru_a_rec"],
        recurrent_q8=quantize_weights_int8(off),
        recurrent_diag=diag.astype(jnp.float32))
    del fused["gru_a_rec"]["recurrent"]
    fused["gru_b_in_q8"] = quantize_weights_int8(fused.pop("gru_b_in"))
    fused["gru_b_rec"] = dict(
        fused["gru_b_rec"],
        recurrent_q8=quantize_weights_int8(fused["gru_b_rec"]["recurrent"]))
    del fused["gru_b_rec"]["recurrent"]
    return fused


def is_quantized(fused: Dict[str, Any]) -> bool:
    return "gru_b_in_q8" in fused
