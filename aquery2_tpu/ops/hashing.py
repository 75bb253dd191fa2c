"""Key packing and hashing for group-by / join.

TPU-native counterpart of the reference's two-tier hashing design
(server/hasher.h): a *perfect* direct-addressed path when the packed key
domain is small enough (PerfectHashTable, hasher.h:209-322, keyed on
per-column min/bit-width stats from ColRef::populate_stats), and a generic
path otherwise. Here the generic path is sort-based (see engine/groupby) —
a comparison sort is collision-free, deterministic, and maps onto XLA's
on-device sort, where a linear-probing table would serialize on the VPU.

`hash64` (splitmix64 finalizer) is still provided for distributed radix
partitioning (shard = hash(key) % nshards, see parallel/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_pack(keys: list[tuple[jax.Array, int, int]]) -> tuple[jax.Array, int, list[int]]:
    """Pack int key columns into dense codes.

    keys: [(array, min, max)] per key column. Returns (codes int64 array,
    domain, strides) with code = Σ (k_i - min_i) * stride_i, domain =
    Π range_i. Caller checks domain against config.PERFECT_HASH_MAX_DOMAIN.
    """
    ranges = [mx - mn + 1 for _, mn, mx in keys]
    strides: list[int] = []
    s = 1
    for r in reversed(ranges):
        strides.append(s)
        s *= r
    strides.reverse()
    domain = s
    code = None
    for (k, mn, _), st in zip(keys, strides):
        part = (k.astype(jnp.int64) - mn) * st
        code = part if code is None else code + part
    return code, domain, strides


def dense_unpack(codes: jax.Array, keys_meta: list[tuple[int, int]], strides: list[int]) -> list[jax.Array]:
    """Inverse of dense_pack: recover per-column key values from codes.
    keys_meta: [(min, max)] per column."""
    out = []
    for (mn, mx), st in zip(keys_meta, strides):
        r = mx - mn + 1
        out.append(((codes // st) % r + mn))
    return out


_SPLIT_C1 = jnp.uint64(0xBF58476D1CE4E5B9)
_SPLIT_C2 = jnp.uint64(0x94D049BB133111EB)
_GOLDEN = jnp.uint64(0x9E3779B97F4A7C15)


def hash64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer — good avalanche for radix partitioning."""
    z = x.astype(jnp.uint64) + _GOLDEN
    z = (z ^ (z >> 30)) * _SPLIT_C1
    z = (z ^ (z >> 27)) * _SPLIT_C2
    return z ^ (z >> 31)


def bits64(x: jax.Array) -> jax.Array:
    """Lossless int64 bit view of any lane for hashing (floats bitcast;
    -0.0 is the caller's job to canonicalize if +0.0 must collide)."""
    if x.dtype.kind == "f":
        if x.dtype == jnp.float64:
            return jax.lax.bitcast_convert_type(x, jnp.int64)
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.float32), jnp.int32).astype(jnp.int64)
    if x.dtype == jnp.bool_:
        return x.astype(jnp.int64)
    return x.astype(jnp.int64)


def combine_hashes(hs: list[jax.Array]) -> jax.Array:
    """Order-dependent combination of per-column hashes (reference hasher
    combines via FNV-style folding, hasher.h:66-95)."""
    acc = hs[0]
    for h in hs[1:]:
        acc = hash64(acc ^ (h + _GOLDEN + (acc << jnp.uint64(6)) + (acc >> jnp.uint64(2))))
    return acc
