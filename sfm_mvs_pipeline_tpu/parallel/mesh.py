"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data mesh over available devices (ICI on a real slice)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def shard_leading(mesh: Mesh):
    """NamedSharding that splits the leading axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, m: int, fill=0) -> np.ndarray:
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, widths, constant_values=fill)
