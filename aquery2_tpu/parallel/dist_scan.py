"""Sharded ordered scans: per-shard scan + carry exchange over ICI.

The reference's ordered/windowed kernels are single-node sequential loops
(aggregations.h). When an ASSUMING-ordered column is sharded by contiguous
row ranges, running aggregates need each shard's scan seeded with the
combined carry of all earlier shards (SURVEY.md §5 "long-context"
analogue): local scan → all_gather of shard totals → exclusive-prefix
carry → local fixup. Communication is O(ndev) scalars per scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _carried(local_scan, total, axis, combine):
    ndev = jax.lax.axis_size(axis)
    totals = jax.lax.all_gather(total, axis)          # [ndev]
    i = jax.lax.axis_index(axis)
    mask = jnp.arange(ndev) < i
    if combine == "add":
        carry = jnp.sum(jnp.where(mask, totals, jnp.zeros((), totals.dtype)))
        return local_scan + carry
    if combine == "min":
        big = (jnp.inf if totals.dtype.kind == "f"
               else jnp.iinfo(totals.dtype).max)
        carry = jnp.min(jnp.where(mask, totals, jnp.asarray(big, totals.dtype)))
        return jnp.minimum(local_scan, carry)
    if combine == "max":
        small = (-jnp.inf if totals.dtype.kind == "f"
                 else jnp.iinfo(totals.dtype).min)
        carry = jnp.max(jnp.where(mask, totals, jnp.asarray(small, totals.dtype)))
        return jnp.maximum(local_scan, carry)
    raise ValueError(combine)


def dist_sums(mesh: Mesh, axis: str, x: jax.Array) -> jax.Array:
    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def step(xs):
        local = jnp.cumsum(xs)
        return _carried(local, local[-1], axis, "add")

    return step(x)


def dist_mins(mesh: Mesh, axis: str, x: jax.Array) -> jax.Array:
    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def step(xs):
        local = jax.lax.cummin(xs)
        return _carried(local, local[-1], axis, "min")

    return step(x)


def dist_maxs(mesh: Mesh, axis: str, x: jax.Array) -> jax.Array:
    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def step(xs):
        local = jax.lax.cummax(xs)
        return _carried(local, local[-1], axis, "max")

    return step(x)
