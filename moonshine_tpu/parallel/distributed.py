"""Multi-host initialization and cross-host utilities.

The reference is single-process (reference: SURVEY.md §2.7); this module
is the pod-slice layer: ``jax.distributed`` bring-up, global mesh
spanning hosts (DP over DCN/ICI, TP inside a host's ICI domain), per-host
batch assembly into globally-sharded arrays, and collective metric
reduction.  Single-process runs degrade to no-ops so the same entry
points serve laptops, one chip, and N hosts.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up jax.distributed when running multi-process.

    No-ops in single-process runs.  Arguments default from the standard
    env vars (JAX_COORDINATOR_ADDRESS etc.) or cluster auto-detection.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(model: int = 1) -> Mesh:
    """(data, model) mesh over every device in the job, model axis packed
    within a host so TP collectives stay on ICI."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    return Mesh(devices.reshape(n // model, model), (DATA_AXIS, MODEL_AXIS))


def host_local_batch_to_global(mesh: Mesh, batch: Any) -> Any:
    """Assemble per-host batch shards into one globally-sharded array tree.

    Each process passes its local shard (leading axis = local batch); the
    result is a jax.Array sharded over the data axis across all hosts.
    """
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    if jax.process_count() == 1:
        from .sharding import shard_batch

        return shard_batch(mesh, batch)
    return jax.tree.map(put, batch)


def all_reduce_metrics(metrics: dict[str, Any]) -> dict[str, float]:
    """Sum scalar metrics across processes (WER error counts, audio
    seconds...).  Single-process: plain floats out."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = jnp.asarray([float(metrics[k]) for k in keys])
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return {k: float(summed[i]) for i, k in enumerate(keys)}
