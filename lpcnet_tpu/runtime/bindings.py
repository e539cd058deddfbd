"""ctypes bindings for the native host runtime.

The library is built by tools/build_native.sh; if it is absent, an attempt
is made to build it on first use (g++ is part of the toolchain), and every
entry point has a NumPy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "native", "liblpcnet_runtime.so")
_SRC = os.path.join(_HERE, "native", "lpcnet_runtime.cc")

_lib: Optional[ctypes.CDLL] = None


def _build():
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                   check=True, capture_output=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            _build()
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64 = ctypes.c_int64
    u64 = ctypes.c_uint64
    ptr = ctypes.POINTER
    lib.lin2ulaw_batch.argtypes = [ptr(ctypes.c_float), ptr(ctypes.c_int32), i64]
    lib.ulaw2lin_batch.argtypes = [ptr(ctypes.c_int32), ptr(ctypes.c_float), i64]
    lib.pack_packets.argtypes = [ptr(ctypes.c_int32), ptr(ctypes.c_uint8), i64]
    lib.unpack_packets.argtypes = [ptr(ctypes.c_uint8), ptr(ctypes.c_int32), i64]
    lib.biquad.argtypes = [ptr(ctypes.c_float)] * 5 + [i64]
    lib.write_audio_frames.argtypes = [
        ptr(ctypes.c_float), ptr(ctypes.c_float), ptr(ctypes.c_int32),
        ptr(ctypes.c_float), ptr(ctypes.c_int32), ptr(ctypes.c_int16), i64]
    lib.compute_noise_frames.argtypes = [ptr(ctypes.c_int32), ptr(ctypes.c_float),
                                         i64, u64]
    lib.gather_frames.argtypes = [ptr(ctypes.c_float), ptr(ctypes.c_int64),
                                  ptr(ctypes.c_int32), ptr(ctypes.c_float), i64, i64]
    lib.scatter_frames.argtypes = [ptr(ctypes.c_float), ptr(ctypes.c_int32),
                                   ptr(ctypes.c_int16), ptr(ctypes.c_int64), i64, i64]
    lib.dred_encode_latents.argtypes = [
        ptr(ctypes.c_int32), ptr(ctypes.c_uint16), ptr(ctypes.c_uint16), i64,
        ptr(ctypes.c_uint8), i64]
    lib.dred_encode_latents.restype = i64
    lib.dred_decode_latents.argtypes = [
        ptr(ctypes.c_uint8), i64, ptr(ctypes.c_uint16), ptr(ctypes.c_uint16),
        i64, ptr(ctypes.c_int32)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _cp(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class _Runtime:
    """Facade: native when available, NumPy fallback otherwise."""

    def biquad(self, x: np.ndarray, b, a, mem: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        b = np.ascontiguousarray(b, np.float32)
        a = np.ascontiguousarray(a, np.float32)
        y = np.empty_like(x)
        lib = _load()
        if lib is not None:
            lib.biquad(_cp(y, ctypes.c_float), _cp(mem, ctypes.c_float),
                       _cp(x, ctypes.c_float), _cp(b, ctypes.c_float),
                       _cp(a, ctypes.c_float), len(x))
            return y
        for i in range(len(x)):
            xi = x[i]
            yi = x[i] + mem[0]
            mem[0] = mem[1] + (b[0] * float(xi) - a[0] * float(yi))
            mem[1] = b[1] * float(xi) - a[1] * float(yi)
            y[i] = yi
        return y

    def write_audio_frames(self, pcm: np.ndarray, lpc: np.ndarray,
                           noise: np.ndarray, sig_mem: np.ndarray,
                           exc_mem: np.ndarray) -> np.ndarray:
        n_frames = len(pcm) // 160
        pcm = np.ascontiguousarray(pcm, np.float32)
        lpc = np.ascontiguousarray(lpc, np.float32)
        noise = np.ascontiguousarray(noise, np.int32)
        out = np.empty(n_frames * 160 * 2, np.int16)
        lib = _load()
        if lib is not None:
            lib.write_audio_frames(
                _cp(pcm, ctypes.c_float), _cp(lpc, ctypes.c_float),
                _cp(noise, ctypes.c_int32), _cp(sig_mem, ctypes.c_float),
                _cp(exc_mem, ctypes.c_int32), _cp(out, ctypes.c_int16), n_frames)
            return out
        # numpy fallback (slow python loop; used only without a compiler)
        from ..dsp import mulaw as MU
        import jax.numpy as jnp
        for k in range(n_frames):
            L = lpc[k * 16:(k + 1) * 16] if lpc.ndim == 1 else lpc[k]
            for i in range(160):
                p = -float(np.dot(L, sig_mem))
                target = pcm[k * 160 + i]
                e = int(MU.lin2ulaw_approx(jnp.float32(target - p)))
                out[2 * (k * 160 + i)] = np.clip(round(sig_mem[0]), -32767, 32767)
                out[2 * (k * 160 + i) + 1] = np.clip(round(target), -32767, 32767)
                e = int(np.clip(e + noise[k * 160 + i], 0, 255))
                sig_mem[1:] = sig_mem[:-1]
                sig_mem[0] = p + float(MU.ulaw2lin(e))
                exc_mem[0] = e
        return out

    def compute_noise_frames(self, noise_std: np.ndarray, seed: int) -> np.ndarray:
        n_frames = len(noise_std)
        noise_std = np.ascontiguousarray(noise_std, np.float32)
        out = np.empty(n_frames * 160, np.int32)
        lib = _load()
        if lib is not None:
            lib.compute_noise_frames(_cp(out, ctypes.c_int32),
                                     _cp(noise_std, ctypes.c_float),
                                     n_frames, seed)
            return out
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        u1 = rng.rand(n_frames, 160) + 1e-9
        u2 = rng.rand(n_frames, 160) + 1e-9
        v = noise_std[:, None] * .707 * (np.log(u1) - np.log(u2))
        return np.floor(.5 + v).astype(np.int32).reshape(-1)

    def pack_packets(self, fields: np.ndarray) -> np.ndarray:
        """fields [N, 9] int32 (wire order) -> [N, 8] uint8."""
        fields = np.ascontiguousarray(fields, np.int32)
        n = fields.shape[0]
        out = np.empty((n, 8), np.uint8)
        lib = _load()
        if lib is not None:
            lib.pack_packets(_cp(fields, ctypes.c_int32), _cp(out, ctypes.c_uint8), n)
            return out
        from ..codec import packet as P
        names = [f[0] for f in P.FIELDS]
        return P.pack_fields({nm: fields[:, i] for i, nm in enumerate(names)})

    def dred_encode_latents(self, zq: np.ndarray, p0_q15: np.ndarray,
                            r_q15: np.ndarray) -> Optional[bytes]:
        """Range-code one payload's latent symbols; None -> use Python path."""
        lib = _load()
        if lib is None:
            return None
        zq = np.ascontiguousarray(zq, np.int32).reshape(-1)
        p0 = np.ascontiguousarray(p0_q15, np.uint16).reshape(-1)
        r = np.ascontiguousarray(r_q15, np.uint16).reshape(-1)
        cap = 64 + 490 * zq.size       # worst case ~15 bits/flag, 257 flags
        out = np.empty(cap, np.uint8)
        n = lib.dred_encode_latents(_cp(zq, ctypes.c_int32),
                                    _cp(p0, ctypes.c_uint16),
                                    _cp(r, ctypes.c_uint16), zq.size,
                                    _cp(out, ctypes.c_uint8), cap)
        if n < 0:
            return None
        return out[:n].tobytes()

    def dred_decode_latents(self, data: bytes, p0_q15: np.ndarray,
                            r_q15: np.ndarray) -> Optional[np.ndarray]:
        lib = _load()
        if lib is None:
            return None
        p0 = np.ascontiguousarray(p0_q15, np.uint16).reshape(-1)
        r = np.ascontiguousarray(r_q15, np.uint16).reshape(-1)
        buf = np.frombuffer(data, np.uint8).copy()
        if buf.size == 0:
            buf = np.zeros(1, np.uint8)
        out = np.empty(p0.size, np.int32)
        lib.dred_decode_latents(_cp(buf, ctypes.c_uint8), len(data),
                                _cp(p0, ctypes.c_uint16),
                                _cp(r, ctypes.c_uint16), p0.size,
                                _cp(out, ctypes.c_int32))
        return out.reshape(np.asarray(p0_q15).shape)

    def unpack_packets(self, packets: np.ndarray) -> np.ndarray:
        packets = np.ascontiguousarray(packets, np.uint8).reshape(-1, 8)
        n = packets.shape[0]
        out = np.empty((n, 9), np.int32)
        lib = _load()
        if lib is not None:
            lib.unpack_packets(_cp(packets, ctypes.c_uint8), _cp(out, ctypes.c_int32), n)
            return out
        from ..codec import packet as P
        d = P.unpack_fields(packets)
        return np.stack([d[f[0]] for f in P.FIELDS], axis=1).astype(np.int32)


runtime = _Runtime()
