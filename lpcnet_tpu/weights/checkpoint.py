"""Simple native checkpoint format: flattened pytree -> .npz (+ config json).

Training uses orbax-compatible pytrees; this module is the lightweight
interchange used by the CLI and tests. Keys are '/'-joined paths.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from ..models.lpcnet import LPCNetConfig


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(val)
    return root


def save_checkpoint(path: str, params: Any, cfg: LPCNetConfig | None = None) -> None:
    flat = flatten_tree(params)
    meta = json.dumps(dataclasses.asdict(cfg)) if cfg is not None else "{}"
    np.savez(path, __config__=np.frombuffer(meta.encode(), np.uint8), **flat)


def load_checkpoint(path: str):
    d = np.load(path)
    cfg_raw = d["__config__"].tobytes().decode() if "__config__" in d else "{}"
    cfg_dict = json.loads(cfg_raw)
    cfg = LPCNetConfig(**cfg_dict) if cfg_dict else LPCNetConfig()
    flat = {k: d[k] for k in d.files if k != "__config__"}
    return unflatten_tree(flat), cfg
