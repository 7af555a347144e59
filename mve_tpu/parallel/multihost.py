"""Multi-host runtime helpers (SURVEY §5 distributed backend equivalents).

The reference has no distributed story; scale-out is running apps
per-view on shared storage. Here multi-host runs use jax.distributed:
every host calls initialize() (driven by env/cluster detection), then

- view-parallel stages (features, matching pairs, MVS reference views,
  depth-map fusion) partition their work lists by process index and
  write to shared storage exactly like the reference's restartable
  per-view artifacts;
- the tightly-coupled stage (bundle adjustment) builds a global mesh
  over all hosts' devices and shards observations, with psums riding
  ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Sequence


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op if single-process or already up)."""
    import jax

    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ.get("JAX_COORDINATOR"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", 0)))


def my_shard(items: Sequence, process_id: int | None = None,
             num_processes: int | None = None):
    """Partition a work list (view ids, pair ids) across processes —
    the distributed analog of the reference's OpenMP dynamic loops."""
    import jax

    pid = process_id if process_id is not None else jax.process_index()
    n = num_processes if num_processes is not None else jax.process_count()
    return [item for i, item in enumerate(items) if i % n == pid]


def global_mesh(axis_name: str = "data"):
    """1D mesh over ALL processes' devices for the BA collective stage."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))
