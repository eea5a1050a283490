"""Checkpoint save/restore for params and train state.

The reference has no training, so its "checkpointing" is quantized model
snapshots in dated CDN dirs (reference: README.md:1270, SURVEY.md §5);
the TPU build adds real train-state checkpointing via Orbax plus a
safetensors exporter so trained weights round-trip through the same
import path users load published checkpoints with.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str | Path, state: Any) -> None:
    """Save a pytree (params or TrainState) with Orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str | Path, target: Any) -> Any:
    """Restore into the structure/shapes of ``target``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def export_safetensors(path: str | Path, params: Any) -> None:
    """Flatten a param pytree to safetensors with /-joined key paths."""
    from safetensors.numpy import save_file

    flat = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(k.key) if hasattr(k, "key") else str(getattr(k, "name", k))
            for k in key_path
        )
        # np.asarray on a device array can be a zero-copy view with the
        # accelerator's TRANSPOSED layout (non-C-contiguous strides);
        # safetensors then serializes the raw buffer bytes as if C-order
        # and silently permutes values.  Force C-order.  (Found on the
        # TPU backend: 5/35 Base leaves — embed, fc2, convs — came back
        # F-strided and round-tripped corrupted.)
        flat[name] = np.ascontiguousarray(np.asarray(leaf))
    save_file(flat, str(path))


def import_safetensors(path: str | Path, target: Any) -> Any:
    """Load a safetensors file saved by ``export_safetensors`` back into
    the structure of ``target``."""
    from safetensors.numpy import load_file

    flat = load_file(str(path))
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(target)[0]
    treedef = jax.tree_util.tree_structure(target)
    new_leaves = []
    for key_path, leaf in leaves_with_paths:
        name = "/".join(
            str(k.key) if hasattr(k, "key") else str(getattr(k, "name", k))
            for k in key_path
        )
        if name not in flat:
            raise KeyError(f"Checkpoint missing tensor {name!r}")
        arr = flat[name]
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"Shape mismatch for {name}: {arr.shape} vs {leaf.shape}")
        new_leaves.append(jax.numpy.asarray(arr, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
