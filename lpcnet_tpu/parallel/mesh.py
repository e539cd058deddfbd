"""Device mesh + sharding helpers.

LPCNet-class models are tiny (<=384-unit GRUs): the right parallelism is
pure data/stream parallelism -- batch sharded over all chips, parameters
replicated, gradients psum'd over ICI by XLA. (The reference's only
distributed strategy is the equivalent MultiWorkerMirroredStrategy,
training_tf2/train_lpcnet.py:133-135; tensor/pipeline/expert parallelism
have nothing to shard here and are intentionally N/A.)

For multi-host TPU pods, call jax.distributed.initialize() before
make_mesh(); the mesh then spans all hosts and DCN handles the cross-slice
reduction automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/stream) axis over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree with the leading axis sharded over devices."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host startup: initialize the JAX distributed runtime so the
    mesh spans all hosts of a TPU pod slice (gradients then reduce over ICI
    within a slice and DCN across slices automatically).

    No-op when running single-process. Call before make_mesh().
    """
    import jax
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:  # already initialized or single-process
        if "already" not in str(e).lower():
            raise
