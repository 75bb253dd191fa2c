"""Multi-key sort on device.

The reference sorts by materializing an index vector with a comparator
over a column tuple (negative index = DESC via tuple negation,
server/table.h:447-465). TPU-native: `jax.lax.sort` over multiple operands
with ``num_keys`` (XLA's on-device bitonic/merge sort), with DESC handled
by order-reversing key transforms — for signed ints ``~x`` (bitwise not)
is a total order reversal with no overflow, for floats ``-x``.

Padding rows must sort last regardless of direction: callers pass the
logical length `n` and we overwrite padding keys with the maximum sentinel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _desc_transform(x: jax.Array) -> jax.Array:
    if x.dtype.kind == "f":
        return -x
    if x.dtype.kind in ("i", "u"):
        return ~x
    if x.dtype == jnp.bool_:
        return ~x
    raise TypeError(f"cannot sort dtype {x.dtype} descending")


def _pad_last(x: jax.Array, n) -> jax.Array:
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    if x.dtype.kind == "f":
        big = jnp.asarray(jnp.inf, x.dtype)
    elif x.dtype == jnp.bool_:
        big = jnp.asarray(True)
    else:
        big = jnp.asarray(jnp.iinfo(x.dtype).max, x.dtype)
    return jnp.where(idx < n, x, big)


def sort_perm(keys: list[tuple[jax.Array, bool]], n) -> jax.Array:
    """Stable lexicographic sort permutation.

    keys: [(key_array, ascending), ...] in priority order; padded rows sort
    last. Returns the permutation (int32 indices)."""
    ops = []
    for k, asc in keys:
        k2 = k if asc else _desc_transform(k)
        ops.append(_pad_last(k2, n))
    iota = jnp.arange(ops[0].shape[0], dtype=jnp.int32)
    res = jax.lax.sort([*ops, iota], num_keys=len(ops), is_stable=True)
    return res[-1]
