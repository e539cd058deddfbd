"""Full-state training checkpoints (params + optimizer + step) via Orbax.

The reference only checkpoints weights (Keras .h5 per epoch,
training_tf2/train_lpcnet.py:185; torch .pth with model_args,
torch/rdovae/train_rdovae.py:265-270). For production TPU training we also
need exact resume: optimizer moments and step counter, saved atomically.

States are stored as flat leaf dicts ("leaf_00042" -> array) so arbitrary
pytree containers (NamedTuples, optax states) round-trip; the caller's
template state supplies the tree structure on restore.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _flatten(state: Any):
    leaves = jax.tree.leaves(jax.device_get(state))
    return {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}


def save_train_state(path: str, state: Any) -> None:
    """Atomically save any pytree (e.g. a TrainState) to `path` (a dir)."""
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), _flatten(state),
                                  force=True)


def restore_train_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_train_state; `like` gives the
    structure (e.g. a freshly initialized state of the same config)."""
    import orbax.checkpoint as ocp
    flat = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    leaves = [flat[k] for k in sorted(flat.keys())]
    treedef = jax.tree.structure(like)
    assert treedef.num_leaves == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, expected {treedef.num_leaves}")
    return jax.tree.unflatten(treedef, leaves)


def latest_checkpoint(directory: str, prefix: str = "step_") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    candidates = [d for d in os.listdir(directory) if d.startswith(prefix)]
    if not candidates:
        return None
    best = max(candidates, key=lambda d: int(d[len(prefix):]))
    return os.path.join(directory, best)
