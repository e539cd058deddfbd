"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.  This gate has to pass
on a machine where the TPU tunnel is DOWN even though the image exports
`JAX_PLATFORMS=axon` + `PYTHONPATH=/root/.axon_site`, so we force (not
setdefault) the CPU platform and strip the axon plugin's site dir from the
import path before jax ever loads -- otherwise pytest collection hangs
trying to reach the unreachable relay.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon sitecustomize registers its PJRT plugin at INTERPRETER START
# (before this file runs) and pins jax's platform config; when the relay
# is WEDGED (accepts connections, never answers -- observed 2026-08-21)
# any axon backend init blocks forever, even though these tests only use
# CPU. Popping the pool-discovery env vars makes a stray init FAIL FAST
# instead of hanging, and the jax.config.update("jax_platforms") below
# overrides the registration-time pin.
for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
           "AXON_LOOPBACK_RELAY", "AXON_POOL_SVC_OVERRIDE"):
    os.environ.pop(_v, None)
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
# drop any axon plugin modules sitecustomize may have pre-imported
for _m in [m for m in sys.modules if "axon" in m]:
    del sys.modules[_m]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Belt and suspenders: pin the default device to the host CPU backend
# explicitly; multi-chip tests grab jax.devices("cpu") (8 virtual devices
# via the XLA flag above).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def load_fixture(name):
    path = os.path.join(FIXDIR, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing (run tools/cref/build.sh + gen_fixtures.py)")
    return np.load(path)


@pytest.fixture(scope="session")
def codec_fixture():
    return load_fixture("codec.npz")


@pytest.fixture(scope="session")
def ulaw_fixture():
    return load_fixture("ulaw.npz")


@pytest.fixture(scope="session")
def transforms_fixture():
    return load_fixture("transforms.npz")


@pytest.fixture(scope="session")
def bands_fixture():
    return load_fixture("bands.npz")


@pytest.fixture(scope="session")
def burg_fixture():
    return load_fixture("burg.npz")


@pytest.fixture(scope="session")
def codebooks_fixture():
    return load_fixture("codebooks.npz")
