"""Device mesh helpers.

The reference has NO distributed machinery (single-threaded node loop,
SURVEY.md §2.3); the TPU-native scaling story is jax.sharding over a
Mesh with XLA-inserted collectives riding ICI. These helpers build the
meshes the rest of the package annotates against.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """1-D (default) or N-D mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n_devices, (shape, n_devices)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


def make_dp_tp_mesh(n_devices: int, tp: int) -> Mesh:
    """2-D (data, model) mesh: DP outer so TP collectives ride the
    fastest ICI links within a replica."""
    assert n_devices % tp == 0
    return make_mesh(n_devices, axes=("data", "model"),
                     shape=(n_devices // tp, tp))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data", ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
