"""KISS99 counter RNG, vectorized over streams.

The reference drives excitation sampling with a KISS99 PRNG seeded from the
string "LPCNet" (src/kiss99.c:32-81, src/lpcnet.c:176-181). We reimplement
it with uint32 JAX ops so that (a) single-stream synthesis is bit-identical
to the C decoder's random sequence and (b) each stream in a batch carries
its own tiny state and the whole batch steps in parallel on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Kiss99State(NamedTuple):
    z: jnp.ndarray
    w: jnp.ndarray
    jsr: jnp.ndarray
    jcong: jnp.ndarray


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


def kiss99_step(state: Kiss99State):
    """One draw; returns (value uint32, new_state). Shapes broadcast."""
    z, w, jsr, jcong = state
    znew = _u32(36969) * (z & _u32(0xFFFF)) + (z >> 16)
    wnew = _u32(18000) * (w & _u32(0xFFFF)) + (w >> 16)
    mwc = (znew << 16) + wnew
    shr3 = jsr ^ (jsr << 13)
    shr3 = shr3 ^ (shr3 >> 17)
    shr3 = shr3 ^ (shr3 << 5)
    cong = _u32(69069) * jcong + _u32(1234567)
    out = (mwc ^ cong) + shr3
    return out, Kiss99State(znew, wnew, shr3, cong)


def kiss99_srand(data: bytes = b"LPCNet", n_streams: int | None = None) -> Kiss99State:
    """Seed exactly like the C kiss99_srand (src/kiss99.c:32-57).

    With n_streams, stream k is additionally perturbed by k (stream 0 stays
    bit-identical to the C decoder).
    """
    z, w, jsr, jcong = np.uint32(362436069), np.uint32(521288629), np.uint32(123456789), np.uint32(380116160)

    def rand_np(z, w, jsr, jcong):
        znew = np.uint32((36969 * int(z & 0xFFFF) + (int(z) >> 16)) & 0xFFFFFFFF)
        wnew = np.uint32((18000 * int(w & 0xFFFF) + (int(w) >> 16)) & 0xFFFFFFFF)
        jsr = np.uint32(int(jsr) ^ ((int(jsr) << 13) & 0xFFFFFFFF))
        jsr = np.uint32(int(jsr) ^ (int(jsr) >> 17))
        jsr = np.uint32(int(jsr) ^ ((int(jsr) << 5) & 0xFFFFFFFF))
        jcong = np.uint32((69069 * int(jcong) + 1234567) & 0xFFFFFFFF)
        return znew, wnew, jsr, jcong

    i = 3
    while i < len(data):
        z = np.uint32(z ^ data[i - 3])
        w = np.uint32(w ^ data[i - 2])
        jsr = np.uint32(jsr ^ data[i - 1])
        jcong = np.uint32(jcong ^ data[i])
        z, w, jsr, jcong = rand_np(z, w, jsr, jcong)
        i += 4
    if i - 3 < len(data):
        z = np.uint32(z ^ data[i - 3])
    if i - 2 < len(data):
        w = np.uint32(w ^ data[i - 2])
    if i - 1 < len(data):
        jsr = np.uint32(jsr ^ data[i - 1])
    if z in (0, 0x9068FFFF):
        z = np.uint32(z + 1)
    if w in (0, 0x464FFFFF):
        w = np.uint32(w + 1)
    if jsr == 0:
        jsr = np.uint32(jsr + 1)

    if n_streams is None:
        mk = lambda v: jnp.asarray(v, jnp.uint32)
        return Kiss99State(mk(z), mk(w), mk(jsr), mk(jcong))
    ks = np.arange(n_streams, dtype=np.uint32)
    st = Kiss99State(
        jnp.asarray(np.uint32(z) ^ (ks * np.uint32(2654435761))),
        jnp.asarray(np.full(n_streams, w, np.uint32)),
        jnp.asarray(np.uint32(jsr) ^ (ks * np.uint32(40503))),
        jnp.asarray(np.full(n_streams, jcong, np.uint32)),
    )
    # stream 0 keeps the exact C seed; make sure perturbation kept states legal
    return st
