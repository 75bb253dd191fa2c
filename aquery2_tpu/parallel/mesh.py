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
    powers of two, so any power-of-two mesh divides them).

    Multi-process (multi-host) meshes: `device_put` cannot target
    non-addressable devices, so the global array is assembled from the
    process-local copy via `make_array_from_callback` (every process
    holds the same host data under the SPMD contract,
    parallel/multihost.py); an already-correctly-placed global array
    passes through untouched."""
    sharding = NamedSharding(mesh, P(axis))
    return _put(x, sharding)


def replicated(mesh: Mesh, x: jax.Array) -> jax.Array:
    return _put(x, NamedSharding(mesh, P()))


def _put(x, sharding: NamedSharding) -> jax.Array:
    if jax.process_count() > 1:
        if isinstance(x, jax.Array) and x.sharding == sharding:
            return x
        host = np.asarray(x)
        return jax.make_array_from_callback(host.shape, sharding,
                                            lambda idx: host[idx])
    return jax.device_put(x, sharding)
