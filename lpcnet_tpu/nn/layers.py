"""Functional NN layers with pytree parameters.

One implementation serves training and inference (the reference splits these
across Keras layers, training_tf2/*.py, and a hand-rolled C runtime,
src/nnet.c). Parameter layouts follow Keras conventions so that weights map
1:1 onto the reference's export format (training_tf2/dump_lpcnet.py):

* dense:  {"kernel": [in, out], "bias": [out]}
* conv1d: {"kernel": [k, in, out], "bias": [out]}
* embedding: {"table": [vocab, dim]}
* gru (reset_after/CuDNN):
    {"kernel": [in, 3N], "recurrent": [N, 3N], "bias": [2, 3N]}
  gate order z, r, h; bias[0] is the input bias, bias[1] the recurrent bias.
* mdense (DualFC): {"kernel": [in, out, channels], "bias": [out, channels],
    "factor": [out, channels]}  (training_tf2/mdense.py:24-72)

``precision`` arguments accept jax.lax.Precision; inference defaults to
HIGHEST to match float32 C numerics, training may pass DEFAULT for bf16 MXU.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

HIGHEST = jax.lax.Precision.HIGHEST

# --------------------------------------------------------------------------
# Activation implementations
#
# "exact": jnp.tanh / sigmoid -- the production TPU path.
# "cref":  the reference C's scalar table approximations (src/vec.h:82-104,
#          tansig_table.h) -- test-only, used by the C-vs-JAX neural parity
#          gate so that free-running synthesis takes bit-identical sampling
#          decisions (the bit-tree thresholds compare logits whose only
#          cross-implementation error is then float association, ~1e-6).
# --------------------------------------------------------------------------

_ACT_IMPL = "exact"
_TANSIG_TABLE = None


def _tansig_table():
    # tansig_table.h is generated as printf("%f", tanh(.04*i)): the C
    # literals are tanh values rounded to 6 decimals, so recompute them
    # rather than copying the header.
    global _TANSIG_TABLE
    if _TANSIG_TABLE is None:
        import numpy as np
        t = np.round(np.tanh(0.04 * np.arange(201, dtype=np.float64)), 6)
        _TANSIG_TABLE = jnp.asarray(t.astype(np.float32))
    return _TANSIG_TABLE


def set_cref_tansig_table(tab):
    """Override the recomputed table with the exact values from the compiled
    reference (3 of 201 entries differ by ~1e-6 from the recomputation due
    to the reference generator's float rounding; the parity-gate fixtures
    ship the authoritative table)."""
    global _TANSIG_TABLE
    import numpy as np
    assert len(tab) == 201
    _TANSIG_TABLE = jnp.asarray(np.asarray(tab, np.float32))


def tanh_cref(x):
    """tanh_approx (src/vec.h:82-99): 201-entry table + 2nd-order correction."""
    x = jnp.asarray(x, jnp.float32)
    sign = jnp.where(x < 0, -1.0, 1.0).astype(jnp.float32)
    ax = jnp.abs(x)
    i = jnp.floor(0.5 + 25.0 * ax).astype(jnp.int32)
    i = jnp.clip(i, 0, 200)
    ax = ax - 0.04 * i.astype(jnp.float32)
    y = jnp.take(_tansig_table(), i)
    dy = 1.0 - y * y
    y = y + ax * dy * (1.0 - y * ax)
    return sign * y


def sigmoid_cref(x):
    """sigmoid_approx (src/vec.h:101-104)."""
    return 0.5 + 0.5 * tanh_cref(0.5 * jnp.asarray(x, jnp.float32))


def set_activation_impl(name: str):
    """Switch tanh/sigmoid between 'exact' and 'cref' (test-only global)."""
    global _ACT_IMPL
    assert name in ("exact", "cref"), name
    _ACT_IMPL = name


class activation_impl:
    """Context manager: with activation_impl('cref'): ..."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        global _ACT_IMPL
        self.prev = _ACT_IMPL
        set_activation_impl(self.name)

    def __exit__(self, *exc):
        set_activation_impl(self.prev)


def _tanh(x):
    return tanh_cref(x) if _ACT_IMPL == "cref" else jnp.tanh(x)


def _sigmoid(x):
    return sigmoid_cref(x) if _ACT_IMPL == "cref" else jax.nn.sigmoid(x)


def activate(x, activation: str):
    if activation == "linear":
        return x
    if activation == "tanh":
        return _tanh(x)
    if activation == "sigmoid":
        return _sigmoid(x)
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "swish":
        return x * jax.nn.sigmoid(x)
    if activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise ValueError(f"unknown activation {activation}")


def dense(params: Params, x, activation: str = "linear", precision=HIGHEST):
    y = jnp.matmul(x, params["kernel"], precision=precision) + params["bias"]
    return activate(y, activation)


def embedding(params: Params, idx):
    """Table lookup as a one-hot contraction: data-dependent row gathers
    don't vectorize on TPU (each lookup serializes), while a [..., n] @
    [n, d] one-hot matmul is exact (single unit product per row) and rides
    the MXU. Tables here are small (<=256 x 128), so the extra FLOPs are
    noise next to the gather latency they replace."""
    table = params["table"]
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return jnp.matmul(oh, table, precision=HIGHEST)


def conv1d_seq(params: Params, x, activation: str = "tanh", padding: str = "valid",
               precision=HIGHEST):
    """Sequence conv1d over [..., T, in] -> [..., T', out].

    'valid' matches the training graph (training_tf2/lpcnet.py:243-245);
    'causal' left-pads k-1 zeros, matching the streaming C ring buffer
    started from zero state (src/nnet.c:452-470).
    """
    kernel = params["kernel"]  # [k, in, out]
    k = kernel.shape[0]
    if padding == "causal":
        pad = [(0, 0)] * (x.ndim - 2) + [(k - 1, 0), (0, 0)]
        x = jnp.pad(x, pad)
        padding = "valid"
    lead = x.shape[:-2]
    xf = x.reshape((-1,) + x.shape[-2:])
    y = jax.lax.conv_general_dilated(
        xf, kernel, window_strides=(1,), padding=padding.upper(),
        dimension_numbers=("NWC", "WIO", "NWC"), precision=precision,
    ) + params["bias"]
    y = y.reshape(lead + y.shape[1:])
    return activate(y, activation)


def conv1d_stream(params: Params, x, mem, activation: str = "tanh", precision=HIGHEST):
    """Single-step streaming conv1d.

    Args:
      x: [..., in] current frame input.
      mem: [..., k-1, in] previous inputs (the C ring buffer, src/nnet.c:460-469).
    Returns: (y [..., out], new_mem)
    """
    kernel = params["kernel"]
    k, cin, cout = kernel.shape
    window = jnp.concatenate([mem, x[..., None, :]], axis=-2)  # [..., k, in]
    flat_w = kernel.reshape(k * cin, cout)
    y = jnp.matmul(window.reshape(window.shape[:-2] + (k * cin,)), flat_w,
                   precision=precision) + params["bias"]
    new_mem = window[..., 1:, :]
    return activate(y, activation), new_mem


def gru_step(params: Params, h, x, activation: str = "tanh", precision=HIGHEST):
    """One reset-after GRU step (CuDNN semantics, gate order z,r,h).

    Matches the reference's compute_gru2 (src/nnet.c:281-322).
    Args: h [..., N] state, x [..., in] input. Returns new state.
    """
    n = h.shape[-1]
    zin = jnp.matmul(x, params["kernel"], precision=precision) + params["bias"][0]
    zrec = jnp.matmul(h, params["recurrent"], precision=precision) + params["bias"][1]
    z = _sigmoid(zin[..., :n] + zrec[..., :n])
    r = _sigmoid(zin[..., n:2 * n] + zrec[..., n:2 * n])
    hcand = activate(zin[..., 2 * n:] + r * zrec[..., 2 * n:], activation)
    return z * h + (1.0 - z) * hcand


def gru_precomputed_step(params: Params, h, gate_in, activation: str = "tanh",
                         precision=HIGHEST):
    """GRU step whose input contribution (x@kernel + bias[0]) is precomputed.

    This is the shape the sample-rate network wants: the per-sample input is
    a sum of embedding lookups and a per-frame conditioning vector
    (src/nnet.c:484-491 + src/lpcnet.c:146-167), so ``gate_in`` [..., 3N]
    arrives ready-made and only the recurrent matmul happens here.
    """
    n = h.shape[-1]
    zrec = jnp.matmul(h, params["recurrent"], precision=precision) + params["bias"][1]
    z = _sigmoid(gate_in[..., :n] + zrec[..., :n])
    r = _sigmoid(gate_in[..., n:2 * n] + zrec[..., n:2 * n])
    hcand = activate(gate_in[..., 2 * n:] + r * zrec[..., 2 * n:], activation)
    return z * h + (1.0 - z) * hcand


def gru_seq(params: Params, x, h0=None, activation: str = "tanh", precision=HIGHEST):
    """GRU over a sequence [..., T, in] -> ([..., T, N], h_T).

    The input matmul for the whole sequence is hoisted out of the scan (one
    big MXU-friendly GEMM); only the recurrent part runs sequentially.
    """
    n = params["recurrent"].shape[0]
    gate_in = jnp.matmul(x, params["kernel"], precision=precision) + params["bias"][0]
    if h0 is None:
        h0 = jnp.zeros(x.shape[:-2] + (n,), x.dtype)

    def step(h, g):
        h2 = gru_precomputed_step(params, h, g, activation, precision)
        return h2, h2

    gmoved = jnp.moveaxis(gate_in, -2, 0)
    hT, hs = jax.lax.scan(step, h0, gmoved)
    return jnp.moveaxis(hs, 0, -2), hT


def mdense(params: Params, x, activation: str = "sigmoid", precision=HIGHEST):
    """DualFC: two dense channels, tanh, per-channel factor, sum, activation.

    Matches training_tf2/mdense.py:64-72 and compute_mdense (src/nnet.c:137-161).
    """
    y = jnp.einsum("...i,ioc->...oc", x, params["kernel"], precision=precision)
    y = _tanh(y + params["bias"])
    y = jnp.sum(y * params["factor"], axis=-1)
    return activate(y, activation)


def mdense_logits_pair(params: Params, x, rows, precision=HIGHEST):
    """Dual-FC logit for selected output rows only (bit-tree sampling).

    Args:
      x: [..., in] input.
      rows: [...] int32 output row per batch element.
    Returns: [...] scalar logit  factor0*tanh(w0.x+b0) + factor1*tanh(w1.x+b1)
    (src/nnet.c:186-211).
    """
    w = jnp.take(params["kernel"].transpose(1, 0, 2), rows, axis=0)  # [..., in, 2]
    b = jnp.take(params["bias"], rows, axis=0)                      # [..., 2]
    f = jnp.take(params["factor"], rows, axis=0)
    s = jnp.einsum("...i,...ic->...c", x, w, precision=precision) + b
    return jnp.sum(f * _tanh(s), axis=-1)
