"""Ragged (CSR) helpers: variable-count expansion on device.

The core primitive behind join multiplicity expansion and VectorColumn
reordering: given per-bucket counts, enumerate (bucket, within) pairs for
a fixed output capacity. The reference does these with nested C++ loops
emitting into growing vectors (engine/ast.py join codegen :874-1090); on
TPU we do a two-pass size-then-gather with searchsorted (SURVEY.md §7
"Hard parts" / dynamic shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand(counts: jax.Array, total_cap: int, total: jax.Array | int):
    """Enumerate CSR items.

    counts: int array [C] (padding buckets must have count 0).
    Returns (bucket_idx, within_idx, valid) of shape [total_cap]:
    item k belongs to bucket bucket_idx[k] with offset within_idx[k].
    """
    c = counts.astype(jnp.int64)
    ends = jnp.cumsum(c)                       # exclusive end per bucket
    starts = ends - c
    k = jnp.arange(total_cap, dtype=jnp.int64)
    # bucket index: last bucket whose start <= k  (searchsorted right - 1)
    b = jnp.searchsorted(starts, k, side="right") - 1
    b = jnp.clip(b, 0, counts.shape[0] - 1).astype(jnp.int32)
    within = k - starts[b]
    valid = k < jnp.asarray(total, jnp.int64)
    return b, within.astype(jnp.int32), valid


def lengths_from_offsets(offsets: jax.Array) -> jax.Array:
    return offsets[1:] - offsets[:-1]


def take(values: jax.Array, offsets: jax.Array, perm: jax.Array,
         nrows: int, total_cap: int, total: jax.Array | int):
    """Reorder a ragged column by a row permutation.

    Returns (new_values[total_cap], new_offsets[len(perm)+1]).
    """
    lens = lengths_from_offsets(offsets)
    new_lens = lens[perm]
    idx = jnp.arange(new_lens.shape[0])
    new_lens = jnp.where(idx < nrows, new_lens, 0)
    b, within, valid = expand(new_lens, total_cap, total)
    src = offsets[perm[b]] + within
    src = jnp.clip(src, 0, values.shape[0] - 1)
    out = jnp.where(valid, values[src], jnp.zeros((), values.dtype))
    new_off = jnp.concatenate([jnp.zeros((1,), jnp.int64), jnp.cumsum(new_lens)])
    return out, new_off
