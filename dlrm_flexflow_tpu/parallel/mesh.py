"""Device mesh construction + multi-host entry.

TPU-native analog of the reference's machine view (FFConfig workersPerNode/
numNodes + Legion proc tables, include/config.h:104-111, mapper proc tables
src/mapper/mapper.cc:49-117) and of control replication (top-level task per
node, mapper.cc:267-281): on TPU every host runs this same program
(multi-controller SPMD via jax.distributed) and devices are arranged in a
jax.sharding.Mesh whose axes the ShardingPlan refers to by name.

Axis conventions used across the framework:
  "data"  — batch / hybrid axis (dense DP + table-parallel embeddings)
  "model" — optional second axis for tensor/column parallelism
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over all (or given) devices. shape=None => 1D mesh over
    every device on the "data" axis (the reference's default all-GPU data
    parallelism, mapper.cc:118-143)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axis_names = tuple(axis_names[:1])
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} wants {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host entry (reference analog: control replication + GASNet;
    flexflow_top.py:185). Call once per host before building meshes."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for an ndim-rank array."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
