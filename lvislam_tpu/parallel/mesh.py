"""Device-mesh construction for multi-chip scaling.

The reference has no multi-device story (single Jetson, SURVEY.md §2.7);
scaling here is TPU-native: a `jax.sharding.Mesh` with two logical axes —

- ``batch``: independent replay sequences / ensemble runs (data parallel);
- ``map``:   spatial sharding of the global map for the kNN/assembly ops
             (the tensor-parallel analogue for a SLAM workload; collectives
             ride ICI).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, map_parallel: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % map_parallel == 0, (n, map_parallel)
    arr = np.array(devices).reshape(n // map_parallel, map_parallel)
    return Mesh(arr, axis_names=("batch", "map"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("batch"))


def map_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "map"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
