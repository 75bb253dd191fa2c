"""Filter = mask + stable compaction.

The reference filters by generating fused C++ scan loops over an index
vector (common/scan.py:51-55; generated snippets build `ColView` indexed
views, table.h:262-343). On TPU, data-dependent output sizes are the core
impedance mismatch (SURVEY.md §7 "Hard parts"): we keep fixed-capacity
padded buffers and compact via a stable argsort on the negated mask —
selected rows first, original order preserved — then slice down to the
result's shape bucket on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_indices(mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(perm, count): perm is a permutation putting mask==True rows first in
    stable order; count = number of selected rows (device scalar)."""
    # argsort of (False<True inverted) — stable, so relative order kept
    perm = jnp.argsort(~mask, stable=True)
    cnt = jnp.sum(mask, dtype=jnp.int32)
    return perm, cnt


def apply_perm(x: jax.Array, perm: jax.Array) -> jax.Array:
    return x[perm]
