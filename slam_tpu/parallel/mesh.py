"""Device-mesh construction helpers.

The reference is single-process (SURVEY §2: no MPI/NCCL, only a std::async
thread fan-out).  The TPU build's communication backend is
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives; these helpers
centralise mesh creation so every distributed entry point (solver, bench,
dryrun) builds meshes the same way.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


EDGE_AXIS = "edges"   # data-parallel axis over graph edges
BLOCK_AXIS = "blocks" # map-block axis for the partitioned Schur solver


def make_edge_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over the edge data-parallel axis."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (EDGE_AXIS,))


def make_block_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over graph partitions (map blocks)."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (BLOCK_AXIS,))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
