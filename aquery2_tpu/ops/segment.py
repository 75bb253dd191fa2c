"""Segment bookkeeping for grouped/ordered computation.

After a group-by, rows are ordered by group id; a *segment* is one group's
contiguous run. Every ordered kernel in ops.scan takes a ``pos`` array
(position of each row within its segment) so the same code path serves both
whole-column windows (pos = arange) and per-group windows (AQuery evaluates
windowed functions per group, reference engine/ast.py:620-794).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flat_pos(capacity: int) -> jax.Array:
    """Positions for the un-grouped case: 0..cap-1."""
    return jnp.arange(capacity, dtype=jnp.int32)


def flags_from_segment_ids(seg_ids: jax.Array) -> jax.Array:
    """True at each segment start. seg_ids must be non-decreasing."""
    prev = jnp.concatenate([seg_ids[:1] - 1, seg_ids[:-1]])
    return seg_ids != prev


def pos_from_flags(flags: jax.Array) -> jax.Array:
    """Position within segment from start flags, O(n) via cummax."""
    idx = jnp.arange(flags.shape[0], dtype=jnp.int32)
    starts = jnp.where(flags, idx, 0)
    seg_start = jax.lax.cummax(starts)
    return idx - seg_start


def seg_start_index(flags: jax.Array) -> jax.Array:
    idx = jnp.arange(flags.shape[0], dtype=jnp.int32)
    return jax.lax.cummax(jnp.where(flags, idx, 0))


def last_flags(flags: jax.Array) -> jax.Array:
    """True at each segment end (the row before the next start, plus the
    final row)."""
    nxt = jnp.concatenate([flags[1:], jnp.ones((1,), dtype=bool)])
    return nxt
