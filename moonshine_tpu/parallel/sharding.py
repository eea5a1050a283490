"""Parameter and activation sharding rules (GSPMD via pjit).

Tensor parallelism follows the Megatron pattern mapped onto named axes:
attention q/k/v and MLP up-projections split their *output* features over
``model`` (each shard computes a head subset), o-proj and down-projections
split their *input* features (XLA inserts the psum on the residual add).
Embedding shards over the vocab so the tied logits matmul is also
model-parallel.  Everything else (norms, conv frontend) is replicated —
it is a rounding error of the footprint.

With ``model=1`` every rule degrades to full replication, so the same
code path runs single-chip, DP-only, and DP x TP unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def _param_pspec(path: tuple[str, ...]) -> P:
    keys = set(path)
    last = path[-1]
    # Stacked layer params carry a leading layer axis -> prepend None.
    stacked = "layers" in keys

    def spec(*axes):
        return P(*((None,) + axes if stacked else axes))

    if "embed" in keys:
        return P(MODEL_AXIS, None)  # vocab-sharded, never stacked
    in_attn = any(k in keys for k in ("attn", "self_attn", "cross_attn"))
    if in_attn:
        if any(k in keys for k in ("q", "k", "v")):
            return spec(None, MODEL_AXIS) if last == "w" else spec(MODEL_AXIS)
        if "o" in keys:
            return spec(MODEL_AXIS, None) if last == "w" else spec(None)
    if "mlp" in keys:
        if "fc1" in keys:
            return spec(None, MODEL_AXIS) if last == "w" else spec(MODEL_AXIS)
        if "fc2" in keys:
            return spec(MODEL_AXIS, None) if last == "w" else spec(None)
    # Norms, conv frontend, everything else: replicated.
    return P()


def _path_names(path) -> tuple[str, ...]:
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            names.append(p.name)
        else:
            names.append(str(p))
    return tuple(names)


def param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _param_pspec(_path_names(path)), params
    )


def param_shardings(mesh: Mesh, params: Any) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec), param_pspecs(params))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree onto the mesh per the TP rules."""
    return jax.device_put(params, param_shardings(mesh, params))


def batch_pspec(rank: int) -> P:
    return P(DATA_AXIS, *([None] * (rank - 1)))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_pspec(x.ndim))), batch
    )
