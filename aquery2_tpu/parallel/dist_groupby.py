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


def dist_grouped_sums_shuffle(mesh: Mesh, axis: str, codes: jax.Array,
                              vals: list[jax.Array], valid: jax.Array,
                              bucket_cap: int, gcap: int):
    """Shuffle-based distributed group-by — the multi-chip form of the
    packed-sort tier (engine/fused_groupby._run_sort_packed) for domains
    too large to replicate dense accumulators:

      1. each shard radix-partitions its rows by hash(code) mod ndev and
         exchanges fixed-capacity buckets over ICI (`all_to_all`)
      2. equal codes now colocate: each shard runs the single-chip
         sorted group reduction (ops/reduce.sorted_group_reduce)

    Communication is one all_to_all of the rows — O(n/ndev) per chip —
    after which groups never need a second exchange (contrast with the
    dense psum path whose traffic is O(domain)).

    codes: int32 packed group codes (row-sharded); vals: int lanes
    (row-sharded); valid: row validity. Returns per-shard results
    stacked along the axis: (codes_g [ndev·gcap], counts [ndev·gcap],
    sums_i [ndev·gcap]..., ng [ndev], dropped [ndev]) — slots ≥ ng[d] in
    shard d's block are garbage. ``dropped[d]`` counts shard d's rows
    that exceeded ``bucket_cap`` for some destination and were NOT
    exchanged (key skew): callers must check ``dropped.sum() == 0`` and
    ``ng <= gcap`` or retry with larger caps (see
    ``dist_grouped_sums_shuffle_safe``). gcap should default to
    ndev*bucket_cap — the post-exchange per-shard row bound."""
    from aquery2_tpu.ops import reduce as R

    ndev = mesh.shape[axis]
    sentinel = jnp.iinfo(jnp.int32).max

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), *([P(axis)] * len(vals)), P(axis)),
        out_specs=(P(axis), P(axis), *([P(axis)] * len(vals)), P(axis),
                   P(axis)),
    )
    def step(c, *rest):
        *vs, vld = rest
        cb, pays_b, okb, ndrop = _pack_buckets_multi(c, list(vs), vld, ndev,
                                                     bucket_cap)
        c_r = jax.lax.all_to_all(cb, axis, 0, 0, tiled=False).reshape(-1)
        ok_r = jax.lax.all_to_all(okb, axis, 0, 0, tiled=False).reshape(-1)
        vs_r = [jax.lax.all_to_all(pb, axis, 0, 0, tiled=False).reshape(-1)
                for pb in pays_b]

        code = jnp.where(ok_r, c_r, sentinel)
        lanes = {f"s{i}": jnp.where(ok_r, v, jnp.zeros((), v.dtype))
                 for i, v in enumerate(vs_r)}
        sorted_res = jax.lax.sort([code, *lanes.values()], num_keys=1,
                                  is_stable=False)
        sc = sorted_res[0]
        add_s = dict(zip(lanes, sorted_res[1:]))
        dif = sc[1:] != sc[:-1]
        starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
        valid_s = sc < sentinel
        last = jnp.concatenate([dif, jnp.ones((1,), jnp.bool_)]) & valid_s
        add_s["__counts__"] = valid_s
        outs, ends_idx, ng = R.sorted_group_reduce(
            starts, last, add_s, {}, {}, {}, gcap,
            counts_from_ends="__counts__", extract={"__code": sc})
        codes_g = outs["__code"]
        return (codes_g, outs["__counts__"].astype(jnp.int32),
                *[outs[f"s{i}"] for i in range(len(vs_r))],
                ng.reshape(1), ndrop.reshape(1))

    return step(codes, *vals, valid)


def dist_grouped_sums_shuffle_safe(mesh: Mesh, axis: str, codes: jax.Array,
                                   vals: list[jax.Array], valid: jax.Array,
                                   bucket_cap: int, max_retries: int = 4):
    """Skew-robust wrapper: run the shuffle group-by, detect bucket
    overflow / group-capacity truncation on device, and retry with
    doubled caps until the exchange is lossless (or raise).

    A heavy-hitter key that routes >bucket_cap rows of one shard to one
    destination overflows the fixed all_to_all buckets; doubling
    bucket_cap (and gcap = ndev*bucket_cap with it) converges in
    O(log skew) rounds. Each retry recompiles once per new cap —
    amortized across repeated queries by the jit cache."""
    cap = int(bucket_cap)
    for _ in range(max_retries + 1):
        gcap = mesh.shape[axis] * cap
        out = dist_grouped_sums_shuffle(mesh, axis, codes, vals, valid,
                                        cap, gcap)
        *res, ng, dropped = out
        if int(jnp.sum(dropped)) == 0 and int(jnp.max(ng)) <= gcap:
            return (*res, ng)
        cap *= 2
    raise RuntimeError(
        f"dist_grouped_sums_shuffle: bucket overflow persists at cap={cap}")


def _pack_buckets_multi(key: jax.Array, payloads: list[jax.Array],
                        valid: jax.Array, ndev: int, cap: int):
    """dist_join._pack_buckets generalized to several payload lanes
    (one argsort shared by all of them)."""
    from aquery2_tpu.ops import hashing

    dest = (hashing.hash64(key.astype(jnp.int64))
            % jnp.uint64(ndev)).astype(jnp.int32)
    dest = jnp.where(valid, dest, ndev)
    order = jnp.argsort(dest, stable=True)
    d_sorted = dest[order]
    idx = jnp.arange(dest.shape[0], dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             d_sorted[1:] != d_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(first, idx, 0))
    within = idx - run_start
    ok = (d_sorted < ndev) & (within < cap)
    slot = (jnp.clip(d_sorted, 0, ndev - 1) * cap
            + jnp.clip(within, 0, cap - 1))
    slot = jnp.where(ok, slot, ndev * cap)

    def scatter(x):
        xs = x[order]
        return (jnp.zeros((ndev * cap + 1,), x.dtype).at[slot].set(xs)
                [:-1].reshape(ndev, cap))

    keys_b = scatter(key)
    pays_b = [scatter(p) for p in payloads]
    okf = (jnp.zeros((ndev * cap + 1,), jnp.bool_).at[slot].set(ok)
           [:-1].reshape(ndev, cap))
    ndrop = jnp.sum(((d_sorted < ndev) & ~ok).astype(jnp.int32))
    return keys_b, pays_b, okf, ndrop
