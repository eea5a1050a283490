"""Device mesh construction for pod-slice execution.

The reference is a single-process on-device stack with no distributed
execution (reference: SURVEY.md §2.7); this layer is new, TPU-native
design: a named ``jax.sharding.Mesh`` with a ``data`` axis (utterance
batches, DP) and a ``model`` axis (tensor parallelism over ICI for models
that exceed one chip).  XLA inserts the collectives from sharding
annotations; nothing here issues explicit communication.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model) mesh.

    ``data=None`` consumes all remaining devices on the data axis.  The
    model axis is laid out innermost so tensor-parallel collectives ride
    neighboring ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))
