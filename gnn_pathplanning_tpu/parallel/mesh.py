"""Device-mesh utilities for multi-chip execution.

The reference has no distributed runtime at all (SURVEY §2.3) — single GPU,
filesystem IPC. Here scaling is first-class: a `jax.sharding.Mesh` over the
chips, `NamedSharding` annotations on batch ("data") and agent ("agents")
axes, and XLA-inserted collectives over ICI. Works identically on a real
slice and on the virtual CPU mesh used in tests
(``--xla_force_host_platform_device_count``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None,
              axes: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Mesh over the first ``n_devices`` devices with the given axis names.
    ``shape`` defaults to putting all devices on the first axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    grid = np.array(devs[:n]).reshape(shape)
    return Mesh(grid, axes)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Shard a batch pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)
