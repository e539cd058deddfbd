""".fec byte-format gate against the REFERENCE C reader.

Writes a .fec file with lpcnet_tpu.dred.fec_file.write_fec_packets and reads
it back through the reference's get_fec_frame/get_fec_rate
(training_tf2/fec_packets.c:33-102) compiled in place — closing the
round-2 gap where the format was only self-roundtripped.
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

from lpcnet_tpu.dred.fec_file import write_fec_packets

REF = "/root/reference"
HERE = os.path.dirname(__file__)
HARNESS = os.path.join(HERE, "..", "tools", "cref", "build", "harness_fec")


def _ensure_harness():
    if os.path.exists(HARNESS):
        return HARNESS
    src = os.path.join(HERE, "..", "tools", "cref", "harness_fec.c")
    ref_c = os.path.join(REF, "training_tf2", "fec_packets.c")
    if not (os.path.exists(ref_c) and shutil.which("cc")):
        pytest.skip("reference tree or C compiler unavailable")
    os.makedirs(os.path.dirname(HARNESS), exist_ok=True)
    subprocess.run(
        ["cc", "-O2", "-I" + os.path.join(REF, "training_tf2"),
         "-o", HARNESS, src, ref_c], check=True)
    return HARNESS


def test_c_reader_reads_our_fec_bytes(tmp_path):
    harness = _ensure_harness()
    rng = np.random.default_rng(7)
    num_packets, subframes, nf = 5, 2, 20
    packets = [rng.standard_normal((subframes, nf)).astype(np.float32)
               for _ in range(num_packets)]
    rates = [64, 32, 0, 128, 96]
    path = str(tmp_path / "test.fec")
    write_fec_packets(path, packets, rates)

    out = subprocess.run(
        [harness, path, str(num_packets), str(subframes), str(nf)],
        check=True, capture_output=True).stdout
    off = 0
    for p in range(num_packets):
        (rate,) = struct.unpack_from("<i", out, off)
        off += 4
        assert rate == rates[p], f"packet {p} rate mismatch"
        frames = np.frombuffer(out, dtype=np.float32,
                               count=subframes * nf, offset=off)
        off += subframes * nf * 4
        frames = frames.reshape(subframes, nf)
        # C reader returns file order = time-flipped: subframe_index s
        # is our packet's subframe (subframes-1-s).
        np.testing.assert_array_equal(frames, packets[p][::-1],
                                      err_msg=f"packet {p} payload mismatch")
    assert off == len(out)
