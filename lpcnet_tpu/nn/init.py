"""Parameter initializers (Keras-equivalent defaults + LPCNet specials)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def glorot_uniform(key, shape, in_axis=-2, out_axis=-1):
    fan_in = shape[in_axis] if len(shape) > 1 else shape[0]
    fan_out = shape[out_axis] if len(shape) > 1 else shape[0]
    if len(shape) == 3 and in_axis == -2:  # conv [k, in, out]
        fan_in = shape[0] * shape[1]
        fan_out = shape[0] * shape[2]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def orthogonal(key, shape):
    if len(shape) == 2 and shape[1] % shape[0] == 0:
        # GRU recurrent [N, 3N]: orthogonal per gate block (Keras behavior)
        n, m = shape
        blocks = []
        for i in range(m // n):
            key, sub = jax.random.split(key)
            blocks.append(jax.nn.initializers.orthogonal()(sub, (n, n)))
        return jnp.concatenate(blocks, axis=1)
    return jax.nn.initializers.orthogonal()(key, shape)


def uniform_embedding(key, shape, scale=0.05):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def pcm_init(key, shape, gain=0.1):
    """LPCNet signal-embedding init: uniform noise + linear ramp per row.

    Replicates PCMInit (training_tf2/lpcnet.py:191-208): rows get a value
    proportional to their index so the embedding starts as a (noisy) linear
    map of the u-law code.
    """
    num_rows, num_cols = shape
    a = jax.random.uniform(key, shape, jnp.float32, -1.7321, 1.7321)
    ramp = math.sqrt(12) * (jnp.arange(num_rows, dtype=jnp.float32)
                            - 0.5 * num_rows + 0.5) / num_rows
    return gain * (a + ramp[:, None])


def dense_params(key, n_in, n_out):
    return {"kernel": glorot_uniform(key, (n_in, n_out)),
            "bias": jnp.zeros((n_out,), jnp.float32)}


def conv1d_params(key, k, n_in, n_out):
    return {"kernel": glorot_uniform(key, (k, n_in, n_out)),
            "bias": jnp.zeros((n_out,), jnp.float32)}


def gru_params(key, n_in, n_units):
    k1, k2 = jax.random.split(key)
    return {"kernel": glorot_uniform(k1, (n_in, 3 * n_units)),
            "recurrent": orthogonal(k2, (n_units, 3 * n_units)),
            "bias": jnp.zeros((2, 3 * n_units), jnp.float32)}


def embedding_params(key, vocab, dim, kind="uniform", gain=0.1):
    if kind == "pcm":
        return {"table": pcm_init(key, (vocab, dim), gain)}
    return {"table": uniform_embedding(key, (vocab, dim))}


def mdense_params(key, n_in, n_out, channels=2):
    k1 = key
    return {"kernel": glorot_uniform(k1, (n_in, n_out, channels), in_axis=0, out_axis=1),
            "bias": jnp.zeros((n_out, channels), jnp.float32),
            "factor": jnp.ones((n_out, channels), jnp.float32)}
