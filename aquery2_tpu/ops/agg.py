"""Scalar aggregates and segment reductions.

Counterpart of the reference's scalar aggregate loops (server/
aggregations.h:10-125 `sum/avg/max/min/count`, :333-430 `var/stddev/corr`,
:487-497 `first/last`) as masked XLA reductions, plus the segment-reduction
primitives the group-by engine builds on.

All full-column aggregates take (x, n): a padded device array and the
logical row count; padding rows are masked with the reduction identity.

Type promotion mirrors the reference: SUM of ints accumulates int64
(GetLongType), AVG is float64 (common/types.py:211-235).

Reference quirk preserved under config.strict_reference_semantics:
`var` divides by (n+1) — aggregations.h:333-348 computes
(ssq - s²/(n+1))/(n+1); `vars`' last element (Welford) divides by n. We
mirror both so results match the reference bit-for-bit on its tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aquery2_tpu import config
from aquery2_tpu.ops.scan import _fp_dtype, _long_dtype


def _mask(x: jax.Array, n, ident) -> jax.Array:
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    return jnp.where(idx < n, x, jnp.asarray(ident, dtype=x.dtype))


def _ident_min(dt):
    dt = jnp.dtype(dt)
    return jnp.inf if dt.kind == "f" else jnp.iinfo(dt).max


def _ident_max(dt):
    dt = jnp.dtype(dt)
    return -jnp.inf if dt.kind == "f" else jnp.iinfo(dt).min


def sum_(x: jax.Array, n) -> jax.Array:
    return jnp.sum(_mask(x, n, 0).astype(_long_dtype(x.dtype)))


def avg(x: jax.Array, n) -> jax.Array:
    return sum_(x, n) / jnp.asarray(n, dtype=_fp_dtype(x.dtype))


def min_(x: jax.Array, n) -> jax.Array:
    return jnp.min(_mask(x, n, _ident_min(x.dtype)))


def max_(x: jax.Array, n) -> jax.Array:
    return jnp.max(_mask(x, n, _ident_max(x.dtype)))


def count(x: jax.Array, n) -> jax.Array:
    return jnp.asarray(n, dtype=jnp.int64)


def first(x: jax.Array, n) -> jax.Array:
    return x[0]


def last(x: jax.Array, n) -> jax.Array:
    return x[jnp.maximum(jnp.asarray(n, dtype=jnp.int32) - 1, 0)]


def var(x: jax.Array, n) -> jax.Array:
    fp = _fp_dtype(x.dtype)
    xl = _mask(x, n, 0).astype(_long_dtype(x.dtype))
    s = jnp.sum(xl).astype(fp)
    ssq = jnp.sum(xl * xl).astype(fp)
    denom = jnp.asarray(n, fp) + (1 if config.strict_reference_semantics else 0)
    return (ssq - s * s / denom) / denom


def stddev(x: jax.Array, n) -> jax.Array:
    return jnp.sqrt(var(x, n))


def corr(x: jax.Array, y: jax.Array, n) -> jax.Array:
    """Pearson correlation via raw moments (reference corr,
    aggregations.h:383-407: integer inputs accumulate exactly in int64)."""
    fp = jnp.float64
    xl = _mask(x, n, 0).astype(_long_dtype(x.dtype))
    yl = _mask(y, n, 0).astype(_long_dtype(y.dtype))
    sx = jnp.sum(xl).astype(fp)
    sy = jnp.sum(yl).astype(fp)
    sxy = jnp.sum((xl * yl).astype(fp))
    sx2 = jnp.sum((xl * xl).astype(fp))
    sy2 = jnp.sum((yl * yl).astype(fp))
    nn = jnp.asarray(n, fp)
    num = nn * sxy - sx * sy
    den = jnp.sqrt((nn * sx2 - sx * sx) * (nn * sy2 - sy * sy))
    return num / den


def median(x: jax.Array, n) -> jax.Array:
    """Median via device sort; even n averages the two middles."""
    fp = _fp_dtype(x.dtype)
    big = _ident_min(x.dtype)  # +inf so padding sorts last
    s = jnp.sort(_mask(x, n, big))
    n32 = jnp.asarray(n, jnp.int32)
    lo = s[jnp.maximum((n32 - 1) // 2, 0)].astype(fp)
    hi = s[jnp.maximum(n32 // 2, 0)].astype(fp)
    return (lo + hi) * 0.5


# name → (fn, arity) used by the expression compiler
SCALAR_AGGS = {
    "sum": (sum_, 1),
    "avg": (avg, 1),
    "mean": (avg, 1),
    "min": (min_, 1),
    "max": (max_, 1),
    "count": (count, 1),
    "first": (first, 1),
    "last": (last, 1),
    "var": (var, 1),
    "stddev": (stddev, 1),
    "corr": (corr, 2),
    "median": (median, 1),
}


# --- segment reductions (building blocks for group-by) --------------------

def segment_reduce(kind: str, x: jax.Array, seg_ids: jax.Array, num_segments: int) -> jax.Array:
    """Reduce x into num_segments buckets by seg_ids (int32, padding rows
    must carry seg_id == num_segments, i.e. an overflow bucket that gets
    sliced off). XLA lowers these to scatter-reduce."""
    ns = num_segments + 1  # overflow slot for padding
    if kind == "sum":
        out = jax.ops.segment_sum(x.astype(_long_dtype(x.dtype)), seg_ids, num_segments=ns)
    elif kind == "min":
        out = jax.ops.segment_min(x, seg_ids, num_segments=ns)
    elif kind == "max":
        out = jax.ops.segment_max(x, seg_ids, num_segments=ns)
    elif kind == "count":
        out = jax.ops.segment_sum(jnp.ones_like(x, dtype=jnp.int64), seg_ids, num_segments=ns)
    else:
        raise ValueError(f"unknown segment reduction: {kind}")
    return out[:num_segments]
