"""Mesh / sharding helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, arr, axis_name: str = "data"):
    """Place an array sharded along its leading axis."""
    spec = P(axis_name, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0, value=0):
    n = arr.shape[axis]
    target = (n + multiple - 1) // multiple * multiple
    if target == n:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    return np.pad(arr, widths, constant_values=value)
