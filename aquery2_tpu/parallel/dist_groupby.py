"""Distributed group-by: shard-local partials + psum over ICI.

Design (BASELINE.json north star; scaling-book recipe): each chip holds a
row shard. For a dense (perfect-hash) key domain D, every chip scatter-
adds its rows into a local D-slot accumulator, then one `psum` over the
mesh combines accumulators — communication is O(D) per aggregate,
independent of row count, and rides ICI. This is the distributed
equivalent of the reference's shared-memory hash table (hasher.h) with
zero row movement.

For domains too large for replication, the radix-shuffle path in
dist_join.py applies (shuffle rows by key hash, then local group-by);
round-1 exposes the dense path, which covers the h2o benchmark keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def dist_grouped_sums(mesh: Mesh, axis: str, codes: jax.Array,
                      vals: list[jax.Array], n_per_shard: jax.Array,
                      domain: int):
    """codes/vals sharded by rows over `axis`; n_per_shard: [ndev] row
    counts per shard (replicated). Returns (counts[D], sums_i[D]...) —
    replicated dense accumulators.

    Padding rows must carry code == domain (overflow slot)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), *([P(axis)] * len(vals)), P()),
        out_specs=(P(), *([P()] * len(vals))),
    )
    def step(c, *rest):
        *vs, counts_all = rest
        local_counts = jnp.zeros((domain + 1,), jnp.int64).at[c].add(1)
        outs = []
        for v in vs:
            acc = jnp.zeros((domain + 1,), v.dtype).at[c].add(v)
            outs.append(jax.lax.psum(acc[:domain], axis))
        return (jax.lax.psum(local_counts[:domain], axis), *outs)

    return step(codes, *vals, n_per_shard)


def local_dense_sum(codes: jax.Array, vals: jax.Array, domain: int) -> jax.Array:
    """Single-chip building block (also used by the bench)."""
    return jnp.zeros((domain + 1,), vals.dtype).at[codes].add(vals)[:domain]
