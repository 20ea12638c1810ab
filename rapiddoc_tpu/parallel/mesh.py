"""Device mesh and data-parallel sharding.

Pages/crops are embarrassingly parallel, so inference scales as pure data
parallelism over ICI: a 1-D "data" mesh, batches sharded on dim 0, weights
replicated. (The reference has no inter-device story at all — its unit of
parallelism is a process pool; see SURVEY.md §2.11.)
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def device_count() -> int:
    return jax.device_count()


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
