"""Device mesh + sharding helpers (TPU-native replacement for the
reference's NCCL DDP stack, SURVEY.md §2.6).

The reference's distributed inventory is: DDP gradient allreduce, sync-BN
statistics allreduce, sampler sharding, eval gather. Here that maps onto one
``jax.sharding.Mesh`` with a ``data`` axis:

- gradient psum / sync-BN pmean: compiled into the shard_map'd train step;
- sampler sharding: the host feed emits per-process slices, placed with
  ``shard_batch``;
- eval gather: ``jax.experimental.multihost_utils.process_allgather``.

A second optional ``model`` axis is reserved for sharding the image backbone
(the only parameter-heavy module) when scaling beyond pure DP.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """Pure data-parallel 1-axis mesh over all (local+remote) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), axis_names=("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded over the data axis."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
