#!/usr/bin/env python3
"""Produce a weights_blob.bin with the REFERENCE's writer and prove it is
byte-identical to lpcnet_tpu.weights.blob.write_blob output.

The real xiph pretrained blob is unobtainable offline (download_model.sh
needs network), so this follows VERDICT.md #7's fallback: code-generate
WeightArray data files (nnet_data.c / plc_data.c, the format
training_tf2/dump_lpcnet.py emits) from the deterministic fixture model
weights, compile the reference's src/write_lpcnet_weights.c:47-78 against
them in place, run it, and compare the resulting blob byte-for-byte with
our writer's output for the same arrays in the same order.

Byte-identity makes "load a reference-produced blob" equivalent to loading
our own export, so the test gate (tests/test_weights_blob.py) pins the
reference-written blob's SHA-256 (recorded in tests/fixtures/refblob.npz)
against a fresh write_blob() -- any drift in either writer breaks it.

Two blobs are produced: float arrays (vocoder+PLC, like the reference's
combined blob minus DRED) and the quantized vocoder export (exercises
WEIGHT_TYPE_int sparse indices + WEIGHT_TYPE_qweight payloads).
"""

import hashlib
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("REF", "/root/reference")
BUILD = os.path.join(HERE, "build")
FIXDIR = os.path.abspath(os.path.join(HERE, "..", "..", "tests", "fixtures"))

sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..")))

_CTYPES = {
    np.dtype(np.float32): ("float", "WEIGHT_TYPE_float"),
    np.dtype(np.int32): ("int", "WEIGHT_TYPE_int"),
    np.dtype(np.int8): ("signed char", "WEIGHT_TYPE_qweight"),
}


def _literal(v, dtype):
    if dtype == np.dtype(np.float32):
        # hex float literal: exact round-trip of the float32 value
        return float(v).hex() + "f"
    return str(int(v))


def emit_arrays(path, list_name, arrays):
    """Write a C file defining `const WeightArray <list_name>[]` plus data."""
    with open(path, "w") as f:
        f.write('#include "nnet.h"\n\n')
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            ctype, _ = _CTYPES[arr.dtype]
            f.write(f"static const {ctype} {name}_data[{arr.size}] = {{\n")
            flat = arr.reshape(-1)
            for i in range(0, arr.size, 8):
                vals = ", ".join(_literal(v, arr.dtype) for v in flat[i:i + 8])
                f.write(f"  {vals},\n")
            f.write("};\n\n")
        f.write(f"const WeightArray {list_name}[] = {{\n")
        for name, arr in arrays.items():
            _, wt = _CTYPES[np.ascontiguousarray(arr).dtype]
            nbytes = np.ascontiguousarray(arr).nbytes
            f.write(f'  {{"{name}", {wt}, {nbytes}, {name}_data}},\n')
        f.write("  {0, 0, 0, 0}\n};\n")


def build_and_run(tag, lists):
    """lists: {list_name: arrays or None}; returns the blob bytes."""
    wdir = os.path.join(BUILD, f"wblob_{tag}")
    os.makedirs(wdir, exist_ok=True)
    files = {
        "nnet_data.c": "lpcnet_arrays",
        "plc_data.c": "lpcnet_plc_arrays",
        "dred_rdovae_enc_data.c": "rdovae_enc_arrays",
        "dred_rdovae_dec_data.c": "rdovae_dec_arrays",
    }
    for fname, lname in files.items():
        arrays = lists.get(lname)
        if arrays:
            emit_arrays(os.path.join(wdir, fname), lname, arrays)
        else:
            with open(os.path.join(wdir, fname), "w") as f:
                f.write('#include "nnet.h"\n'
                        f"const WeightArray {lname}[] = {{ {{0, 0, 0, 0}} }};\n")
    exe = os.path.join(wdir, "write_weights")
    subprocess.run(
        ["cc", "-O0", "-fcommon", "-I", wdir, "-I", f"{REF}/src",
         "-I", f"{REF}/include", "-o", exe,
         f"{REF}/src/write_lpcnet_weights.c", "-lm"], check=True)
    subprocess.run([exe], cwd=wdir, check=True)
    with open(os.path.join(wdir, "weights_blob.bin"), "rb") as f:
        return f.read()


def main():
    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from lpcnet_tpu.models import lpcnet as M
    from lpcnet_tpu.models import plc as PM
    from lpcnet_tpu.weights import aux_arrays as AUX
    from lpcnet_tpu.weights import blob as B
    from lpcnet_tpu.weights import lpcnet_arrays as LA

    cfg = M.LPCNetConfig()
    params = M.init_params(jax.random.PRNGKey(1234), cfg)
    plc_params = PM.init_params(jax.random.PRNGKey(5678))
    voc = LA.arrays_from_params(params, cfg, quantize=False)
    plc = AUX.plc_arrays_from_params(plc_params, quantize=False)
    qvoc = LA.arrays_from_params(params, cfg, quantize=True)

    out = {}
    print("building float (vocoder+PLC) blob with the reference writer...")
    ref_blob = build_and_run(
        "float", {"lpcnet_arrays": voc, "lpcnet_plc_arrays": plc})
    ours = B.write_blob({**voc, **plc})
    assert ref_blob == ours, (
        f"reference-written blob differs from write_blob output "
        f"({len(ref_blob)} vs {len(ours)} bytes)")
    print(f"  byte-identical ({len(ref_blob)} bytes)")
    out["float_sha"] = np.frombuffer(
        hashlib.sha256(ref_blob).digest(), np.uint8)

    print("building quantized vocoder blob with the reference writer...")
    ref_qblob = build_and_run("q", {"lpcnet_arrays": qvoc})
    ours_q = B.write_blob(qvoc)
    assert ref_qblob == ours_q, "quantized blob differs"
    print(f"  byte-identical ({len(ref_qblob)} bytes)")
    out["q_sha"] = np.frombuffer(hashlib.sha256(ref_qblob).digest(), np.uint8)

    path = os.path.join(FIXDIR, "refblob.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
