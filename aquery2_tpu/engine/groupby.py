"""Grouping strategies.

TPU-native counterpart of the reference's hash-table group-by
(server/hasher.h): strategy is chosen from per-column min/max stats, like
``HashTableFactory::get`` picks PerfectHashTable vs the generic ankerl set
(hasher.h:327-357):

* **dense** (perfect hash): when the packed key domain Π(max-min+1) fits
  config.PERFECT_HASH_MAX_DOMAIN, codes are direct-addressed — presence
  scatter + prefix-sum ranking, no sort, no collisions. This covers every
  single-key h2o query (dict-encoded strings and small ints are dense by
  construction).
* **sort**: rows are sorted by the key tuple (collision-free, deterministic
  — a VPU-friendly alternative to linear probing); segment boundaries give
  group ids.

Both produce a ``Grouping``: per-row group ids (in a canonical group order
— ascending packed key / lexicographic), group count, and lazily a
row-permutation that clusters rows by group while preserving input order
within each group (needed for per-group windowed aggregates).

The group-id assignment runs as one jitted program per (strategy, shapes)
via the persistent cache.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu.ops import hashing, segment
from aquery2_tpu.ops.sort import sort_perm


@dataclass
class Grouping:
    """Result of grouping rows by a key tuple."""
    num_groups: int                     # host int
    seg_ids: jax.Array                  # (cap,) int32; padding rows → num_groups
    key_values: list[jax.Array]         # per key column, one value per group [G]
    n: int                              # logical row count
    capacity: int
    # lazily computed sorted-layout fields:
    _order: jax.Array | None = None     # permutation clustering rows by group
    _sorted_seg: jax.Array | None = None
    _pos: jax.Array | None = None
    _flags: jax.Array | None = None
    _offsets: np.ndarray | None = None  # group start offsets in sorted layout [G+1]

    @property
    def order(self) -> jax.Array:
        self._materialize_sorted()
        return self._order

    @property
    def sorted_seg(self) -> jax.Array:
        self._materialize_sorted()
        return self._sorted_seg

    @property
    def pos(self) -> jax.Array:
        self._materialize_sorted()
        return self._pos

    @property
    def flags(self) -> jax.Array:
        self._materialize_sorted()
        return self._flags

    @property
    def offsets(self) -> np.ndarray:
        """Group start offsets in the sorted layout, host array [G+1]."""
        if self._offsets is None:
            self._materialize_sorted()
            counts = np.asarray(
                jax.ops.segment_sum(
                    jnp.ones((self.capacity,), jnp.int64),
                    self.sorted_seg,
                    num_segments=self.num_groups + 1,
                )
            )[: self.num_groups]
            off = np.zeros(self.num_groups + 1, dtype=np.int64)
            np.cumsum(counts, out=off[1:])
            self._offsets = off
        return self._offsets

    def _materialize_sorted(self) -> None:
        if self._order is not None:
            return
        order, sseg, pos, flags = _sorted_layout(self.seg_ids, self.n)
        self._order = order
        self._sorted_seg = sseg
        self._pos = pos
        self._flags = flags


@partial(jax.jit, static_argnames=("n",))
def _sorted_layout(seg_ids: jax.Array, n: int):
    """Stable sort rows by group id; compute per-row positions/flags."""
    order = sort_perm([(seg_ids, True)], n)
    sseg = seg_ids[order]
    flags = segment.flags_from_segment_ids(sseg)
    pos = segment.pos_from_flags(flags)
    return order, sseg, pos, flags


@partial(jax.jit, static_argnames=("domain",))
def _dense_group_kernel(codes: jax.Array, domain: int, n: int):
    """Direct-addressed grouping: presence scatter + rank prefix sum."""
    idx = jnp.arange(codes.shape[0], dtype=jnp.int32)
    valid = idx < n
    safe_codes = jnp.where(valid, codes, domain)  # overflow slot
    presence = jnp.zeros((domain + 1,), jnp.bool_).at[safe_codes].set(True)
    presence = presence.at[domain].set(False)
    rank = jnp.cumsum(presence.astype(jnp.int32)) - 1     # code → group id
    num_groups = jnp.sum(presence.astype(jnp.int32))
    seg = jnp.where(valid, rank[jnp.clip(safe_codes, 0, domain)], num_groups)
    # unique codes in ascending order, compacted to the front
    from aquery2_tpu.ops.reduce import compact_indices
    unique_codes = compact_indices(
        presence[:domain], domain, fill=domain).astype(jnp.int64)
    return seg.astype(jnp.int32), num_groups, unique_codes


@partial(jax.jit, static_argnames=("nkeys",))
def _sort_group_kernel(keys: tuple[jax.Array, ...], n: int, nkeys: int):
    """Sort-based grouping: lexicographic sort, boundary detection."""
    perm = sort_perm([(k, True) for k in keys], n)
    sorted_keys = [k[perm] for k in keys]
    idx = jnp.arange(perm.shape[0], dtype=jnp.int32)
    valid = idx < n
    diff = jnp.zeros(perm.shape[0], dtype=jnp.bool_)
    for k in sorted_keys:
        prev = jnp.concatenate([k[:1], k[:-1]])
        diff = diff | (k != prev)
    diff = diff.at[0].set(True)
    diff = diff & valid
    gid_sorted = jnp.cumsum(diff.astype(jnp.int32)) - 1
    num_groups = jnp.sum(diff.astype(jnp.int32))
    gid_sorted = jnp.where(valid, gid_sorted, num_groups)
    # scatter group ids back to original row order
    seg = jnp.zeros_like(gid_sorted).at[perm].set(gid_sorted)
    # representative (first) key values per group, in group-id order
    from aquery2_tpu.ops.reduce import compact_indices
    starts = compact_indices(diff, perm.shape[0], fill=perm.shape[0] - 1)
    reps = [k[starts] for k in sorted_keys]
    return seg.astype(jnp.int32), num_groups, reps


def group_by(key_cols: list, n: int) -> Grouping:
    """Group rows by a list of key Columns (device arrays + stats).

    key_cols: list of (array, sqltype, stats_fn) triples — see caller in
    engine/eval.py; here we take plain objects with .data/.stats().
    """
    arrays = [c.data for c in key_cols]
    capacity = int(arrays[0].shape[0])

    # try dense (perfect-hash) packing from column stats
    stats = []
    dense_ok = True
    domain = 1
    for c in key_cols:
        if c.data.dtype.kind not in ("i", "u", "b"):
            dense_ok = False
            break
        mn, mx = c.stats()
        stats.append((mn, mx))
        domain *= (mx - mn + 1)
        if domain > config.PERFECT_HASH_MAX_DOMAIN:
            dense_ok = False
            break

    if dense_ok and n > 0:
        codes, domain, strides = hashing.dense_pack(
            [(a, mn, mx) for a, (mn, mx) in zip(arrays, stats)]
        )
        seg, num_groups, unique_codes = _dense_group_kernel(codes, domain, n)
        g = int(num_groups)
        uc = unique_codes[:config.bucket_size(max(g, 1))]
        key_vals = hashing.dense_unpack(uc, stats, strides)
        key_vals = [
            kv.astype(a.dtype)[: config.bucket_size(max(g, 1))]
            for kv, a in zip(key_vals, arrays)
        ]
        return Grouping(num_groups=g, seg_ids=seg, key_values=key_vals,
                        n=n, capacity=capacity)

    # sort-based fallback (large domains, floats, compound keys)
    seg, num_groups, reps = _sort_group_kernel(tuple(arrays), n, len(arrays))
    g = int(num_groups)
    cap_g = config.bucket_size(max(g, 1))
    key_vals = [r[:cap_g] for r in reps]
    return Grouping(num_groups=g, seg_ids=seg, key_values=key_vals,
                    n=n, capacity=capacity)
