"""Checkpointing: full training state, dependency-light, resumable.

The reference pickles the entire ``nn.Module`` (trainer.py:205-211
``torch.save(model)``) with no optimizer state and no resume path.  Here a
checkpoint is a ``.npz`` of the flattened state pytree (params + optimizer
state + step + best-val) plus a JSON sidecar with the model config, so:

* inference/eval can rebuild the model from the sidecar alone;
* training can resume exactly (optimizer moments included);
* no pickle, no framework version coupling.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "restore_into"]

_META_SUFFIX = ".json"


def _flatten(tree) -> list[np.ndarray]:
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def save_checkpoint(path: str | Path, state_tree: Any,
                    meta: dict | None = None) -> Path:
    """Save a pytree + JSON metadata. ``path`` should end in ``.npz``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = _flatten(state_tree)
    np.savez(path, *leaves)
    meta = dict(meta or {})
    meta["num_leaves"] = len(leaves)
    with open(path.with_suffix(_META_SUFFIX), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def load_checkpoint(path: str | Path) -> tuple[list[np.ndarray], dict]:
    """Load raw leaves + metadata."""
    path = Path(path)
    with np.load(path) as z:
        leaves = [z[f"arr_{i}"] for i in range(len(z.files))]
    meta_path = path.with_suffix(_META_SUFFIX)
    meta = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return leaves, meta


def restore_into(template: Any, leaves: list[np.ndarray]) -> Any:
    """Rebuild a pytree with ``template``'s structure from saved leaves."""
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template expects "
            f"{treedef.num_leaves}")
    t_leaves = jax.tree_util.tree_leaves(template)
    cast = []
    for tl, l in zip(t_leaves, leaves):
        arr = np.asarray(l)
        if hasattr(tl, "shape") and tuple(tl.shape) != tuple(arr.shape):
            raise ValueError(
                f"checkpoint leaf shape {arr.shape} != expected {tl.shape}")
        cast.append(arr.astype(tl.dtype) if hasattr(tl, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, cast)
