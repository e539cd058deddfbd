"""Pallas GRU-sequence kernel with a custom VJP, for the training graph.

The reference trains LPCNet with CuDNNGRU (training_tf2/lpcnet.py:32,
286-294): the whole 2400-step sample-rate recurrence runs as one fused GPU
kernel, forward and backward.  The JAX `lax.scan` equivalent compiles to a
2400-iteration XLA while-loop whose body is one tiny [B, N] x [N, 3N]
matmul plus gate math -- per-iteration *latency*, not FLOPs, binds the step
rate (BENCHMARKS.md training section).  This module is the TPU answer: the
recurrence runs inside a single Pallas kernel with the recurrent weights
pinned in VMEM, grid-stepping over (batch tiles, time blocks), so each of
the T dependent steps costs one VMEM-resident MXU matmul instead of an XLA
loop iteration.

Semantics match nn.layers.gru_precomputed_step (reset-after GRU, the
CuDNNGRU/compute_gru3 flavor, src/nnet.c:375-408):

    zrec = h . Wr + br                      # br = bias[1]
    z    = sigmoid(g_z + zrec_z)            # g = precomputed x.Wk + bias[0]
    r    = sigmoid(g_r + zrec_r)
    hcand= tanh(g_h + r * zrec_h)
    h'   = z*h + (1-z)*hcand

The input GEMM (x @ kernel + bias[0]) stays in XLA where it is one large
MXU-friendly contraction over [B*T]; only the sequential recurrence enters
the kernel.  Matmuls run at DEFAULT (bf16-operand) precision to match the
training graph's `precision=jax.lax.Precision.DEFAULT`.

The backward pass is a reverse-time kernel that recomputes the gates from
the saved hidden-state sequence (one extra recurrent matmul -- cheaper than
storing [B, T, 3N] gate activations) and accumulates dWr / dbr in VMEM
scratch across the whole grid, emitting dgate_in for XLA to backprop
through the input GEMM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("LPCNET_PALLAS_INTERPRET"))

# time-block length: VMEM budget is dominated by the [BT, TBLK, 3N] gate
# block (f32); 8 keeps the fwd+bwd resident sets < 12 MB at B=128, N=384.
_TBLK = int(os.environ.get("LPCNET_TRAIN_GRU_TBLK", "8"))


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _bf16_dot(a, b):
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _gates(g, zrec, h, n):
    z = _sigmoid(g[:, :n] + zrec[:, :n])
    r = _sigmoid(g[:, n:2 * n] + zrec[:, n:2 * n])
    hcand = jnp.tanh(g[:, 2 * n:] + r * zrec[:, 2 * n:])
    return z, r, hcand, z * h + (1.0 - z) * hcand


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(tblk, n, wr_ref, br_ref, g_ref, h0_ref, hs_ref, ht_ref,
                h_scr):
    it = pl.program_id(1)

    @pl.when(it == 0)
    def _():
        h_scr[:] = h0_ref[:]

    def step(t, _):
        h = h_scr[:]
        zrec = _bf16_dot(h, wr_ref[:]) + br_ref[:]
        g = g_ref[:, t, :].astype(jnp.float32)
        _, _, _, h2 = _gates(g, zrec, h, n)
        h_scr[:] = h2
        hs_ref[:, t, :] = h2
        return 0

    jax.lax.fori_loop(0, tblk, step, 0)

    @pl.when(it == pl.num_programs(1) - 1)
    def _():
        ht_ref[:] = h_scr[:]


def _rec_forward(wr, br, gate_in, h0, tblk):
    b, t, n3 = gate_in.shape
    n = h0.shape[-1]
    assert n3 == 3 * n and t % tblk == 0
    bt = b if b <= 256 else 128
    assert b % bt == 0
    grid = (b // bt, t // tblk)
    wr_bf = wr.astype(jnp.bfloat16)

    hs, ht = pl.pallas_call(
        functools.partial(_fwd_kernel, tblk, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tblk, n3), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, tblk, n), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bt, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(wr_bf, br.reshape(1, n3), gate_in, h0)
    return hs, ht


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(tblk, n, wr_ref, wrt_ref, br_ref, g_ref, hp_ref, dhs_ref,
                dht_ref, dg_ref, dh0_ref, dwr_ref, dbr_ref,
                dh_scr, dwr_scr, dbr_scr):
    ib, it = pl.program_id(0), pl.program_id(1)
    last_t = pl.num_programs(1) - 1

    @pl.when(it == 0)
    def _():
        dh_scr[:] = dht_ref[:]

    @pl.when((it == 0) & (ib == 0))
    def _():
        dwr_scr[:] = jnp.zeros_like(dwr_scr)
        dbr_scr[:] = jnp.zeros_like(dbr_scr)

    def step(k, _):
        t = tblk - 1 - k
        hprev = hp_ref[:, t, :]
        g = g_ref[:, t, :].astype(jnp.float32)
        zrec = _bf16_dot(hprev, wr_ref[:]) + br_ref[:]
        z, r, hcand, _ = _gates(g, zrec, hprev, n)

        d = dh_scr[:] + dhs_ref[:, t, :]
        dz = d * (hprev - hcand)
        dpre_h = d * (1.0 - z) * (1.0 - hcand * hcand)
        dr = dpre_h * zrec[:, 2 * n:]
        dpre_z = dz * z * (1.0 - z)
        dpre_r = dr * r * (1.0 - r)
        dg = jnp.concatenate([dpre_z, dpre_r, dpre_h], axis=-1)
        dzrec = jnp.concatenate([dpre_z, dpre_r, dpre_h * r], axis=-1)

        dg_ref[:, t, :] = dg
        dh_scr[:] = d * z + _bf16_dot(dzrec, wrt_ref[:])
        # dWr += hprev^T . dzrec  (contract the batch dim)
        dwr_scr[:] += jax.lax.dot_general(
            hprev.astype(jnp.bfloat16), dzrec.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbr_scr[0:1, :] += jnp.sum(dzrec, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, tblk, step, 0)

    @pl.when(it == last_t)
    def _():
        dh0_ref[:] = dh_scr[:]

    @pl.when((it == last_t) & (ib == pl.num_programs(0) - 1))
    def _():
        dwr_ref[:] = dwr_scr[:]
        dbr_ref[:] = dbr_scr[:]


def _rec_backward(wr, br, gate_in, h0, hs, dhs, dht, tblk):
    b, t, n3 = gate_in.shape
    n = h0.shape[-1]
    bt = b if b <= 256 else 128
    grid = (b // bt, t // tblk)
    nT = t // tblk
    hprev = jnp.concatenate([h0[:, None, :], hs[:, :-1, :]], axis=1)
    wr_bf = wr.astype(jnp.bfloat16)
    wrt_bf = wr.T.astype(jnp.bfloat16)

    def rev(ib, it):
        return (ib, nT - 1 - it, 0)

    dg, dh0, dwr, dbr = pl.pallas_call(
        functools.partial(_bwd_kernel, tblk, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n3, n), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tblk, n3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tblk, n), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, tblk, n), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bt, tblk, n3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, n), lambda ib, it: (ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n3), lambda ib, it: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, n3), jnp.float32),
            jax.ShapeDtypeStruct((b, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n3), jnp.float32),
            jax.ShapeDtypeStruct((8, n3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, n), jnp.float32),
            pltpu.VMEM((n, n3), jnp.float32),
            pltpu.VMEM((8, n3), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(wr_bf, wrt_bf, br.reshape(1, n3), gate_in, hprev, dhs, dht)
    return dg, dh0, dwr, dbr.sum(axis=0)


# ---------------------------------------------------------------------------
# custom-VJP recurrence + public layer entry point
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gru_recurrence(wr, br, gate_in, h0):
    """Sequential reset-after GRU recurrence over precomputed gate inputs.

    Args: wr [N, 3N], br [3N] (= bias[1]), gate_in [B, T, 3N]
    (= x @ kernel + bias[0]), h0 [B, N].  Returns (hs [B, T, N], hT).
    """
    hs, ht = _rec_forward(wr, br, gate_in, h0, _TBLK)
    return hs, ht


def _vjp_fwd(wr, br, gate_in, h0):
    hs, ht = _rec_forward(wr, br, gate_in, h0, _TBLK)
    return (hs, ht), (wr, br, gate_in, h0, hs)


def _vjp_bwd(res, cts):
    wr, br, gate_in, h0, hs = res
    dhs, dht = cts
    dg, dh0, dwr, dbr = _rec_backward(wr, br, gate_in, h0, hs, dhs, dht,
                                      _TBLK)
    return dwr, dbr, dg, dh0


gru_recurrence.defvjp(_vjp_fwd, _vjp_bwd)


def _pad_gates(x, n, npad):
    """[..., 3n] -> [..., 3*npad], each gate group zero-padded separately."""
    g = x.reshape(x.shape[:-1] + (3, n))
    g = jnp.pad(g, [(0, 0)] * (g.ndim - 1) + [(0, npad - n)])
    return g.reshape(x.shape[:-1] + (3 * npad,))


def gru_seq_pallas(params, x, h0=None, precision=None):
    """Drop-in for nn.layers.gru_seq (tanh activation) on the kernel path.

    Small units (GRU-B's 16) are zero-padded to the 128-lane tile: padded
    recurrent rows/cols and padded h0 stay exactly zero through the gate
    math, so real outputs are untouched.
    """
    del precision  # kernel always runs DEFAULT (bf16-operand) matmuls
    n = params["recurrent"].shape[0]
    # explicit bf16 operands (not Precision.DEFAULT, which is full f32 on
    # CPU) so the numerics are platform-independent and testable
    gate_in = _bf16_dot(x, params["kernel"]) + params["bias"][0]
    if h0 is None:
        h0 = jnp.zeros(x.shape[:-2] + (n,), jnp.float32)
    npad = max(n, int(os.environ.get("LPCNET_TRAIN_GRU_MINPAD", "128")))
    if npad != n:
        gate_in = _pad_gates(gate_in, n, npad)
        wr = jnp.pad(params["recurrent"], [(0, npad - n), (0, 0)])
        wr = _pad_gates(wr, n, npad)
        br = _pad_gates(params["bias"][1], n, npad)
        h0p = jnp.pad(h0, [(0, 0), (0, npad - n)])
        hs, ht = gru_recurrence(wr, br, gate_in, h0p)
        return hs[..., :n], ht[..., :n]
    return gru_recurrence(params["recurrent"], params["bias"][1],
                          gate_in, h0)
