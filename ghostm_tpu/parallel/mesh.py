"""Mesh setup (SURVEY.md §5.8 "Distributed communication backend").

The reference is single-process/single-GPU with no comms stack; distribution
is new, TPU-native surface: one Mesh with axes ("data", "db") — query batches
ride "data" (data parallel), index shards ride "db" (the tensor-parallel
analogue: DB sharding). XLA lowers the merge collectives onto ICI within a
slice and DCN across hosts; multi-host bootstrap is jax.distributed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DB_AXIS = "db"


def make_mesh(
    data: int, db: int, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * db
    if len(devices) < need:
        raise ValueError(
            f"mesh ({data}x{db}) needs {need} devices, have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(data, db)
    return Mesh(grid, (DATA_AXIS, DB_AXIS))


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap; no-op for single-process runs."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def query_sharding(mesh: Mesh) -> NamedSharding:
    """Query frames: sharded along data, replicated along db."""
    return NamedSharding(mesh, P(DATA_AXIS))


def index_sharding(mesh: Mesh) -> NamedSharding:
    """Stacked index arrays (leading shard axis): sharded along db."""
    return NamedSharding(mesh, P(DB_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
