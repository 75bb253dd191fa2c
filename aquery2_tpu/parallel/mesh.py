"""Mesh construction and column sharding helpers."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"mesh wants {n_devices} devices but only {len(devs)} "
                "exist (for CPU tests set XLA_FLAGS="
                "--xla_force_host_platform_device_count=N before jax "
                "initializes)")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_1d(mesh: Mesh, x: jax.Array, axis: str = "shards") -> jax.Array:
    """Place a (padded) column with its leading dim split over the mesh.
    The capacity must be divisible by the mesh size (bucket sizes are
    powers of two, so any power-of-two mesh divides them)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(x, sharding)


def replicated(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))
