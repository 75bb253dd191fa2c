"""SQL window-function kernels (OVER clauses) in the sorted domain.

The reference parses full OVER clauses (aquery_parser/windows.py:89-96)
and delegates execution to MonetDB. Here the whole window computation is
TPU-native: the caller sorts rows by (partition keys, order keys) once —
stable lexsort — and every frame aggregate below is a composition of
segmented scans (ops/scan.py) plus constant-offset gathers, so one jitted
program computes the result for all partitions at once. No per-partition
loop exists anywhere: a table with 10 M rows and 1 M partitions costs the
same O(n log n) passes as one big partition.

Conventions (all arrays are the *sorted* domain, length = padded cap):
  flags : bool, True at each partition start (flags[0] True; the padding
          tail forms its own partition so kernels never need n)
  pos   : row position within its partition (scan._pos_from_flags)
  x     : argument values with NULL rows replaced by the op's identity
  ind   : 1 where the row is non-null (0 for padding/null rows)
Frame bounds are static Python ints (traced once per frame shape):
  lo / hi : row offsets relative to the current row (lo <= 0 <= hi for
          the slide-based min/max path); None = unbounded on that side.
Results for padding rows are unspecified; callers scatter back only real
rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aquery2_tpu.ops.scan import (
    _fp_dtype,
    _long_dtype,
    _pos_from_flags,
    _slide_extreme,
    seg_cummax,
    seg_cummin,
    seg_cumsum,
)

__all__ = [
    "positions", "is_last_from_flags", "first_index", "last_index",
    "frame_bounds", "frame_sum_count", "frame_moments", "frame_extreme",
]


def positions(flags: jax.Array) -> jax.Array:
    return _pos_from_flags(flags)


def is_last_from_flags(flags: jax.Array) -> jax.Array:
    """True at each partition's final row."""
    return jnp.concatenate([flags[1:], jnp.ones((1,), dtype=bool)])


def _bcast_first(v: jax.Array, flags: jax.Array) -> jax.Array:
    """Broadcast v at each segment start to the whole segment (v >= 0)."""
    return seg_cummax(jnp.where(flags, v, -1), flags)


def first_index(flags: jax.Array) -> jax.Array:
    """Index of each row's segment start."""
    idx = jnp.arange(flags.shape[0], dtype=jnp.int32)
    return _bcast_first(idx, flags)


def last_index(flags: jax.Array) -> jax.Array:
    """Index of each row's segment end (reverse-domain broadcast)."""
    n = flags.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    rflags = jnp.flip(is_last_from_flags(flags))
    return jnp.flip(_bcast_first(jnp.flip(idx), rflags))


def frame_bounds(flags: jax.Array, lo: int | None, hi: int | None,
                 lo_idx: jax.Array | None = None,
                 hi_idx: jax.Array | None = None):
    """Per-row inclusive frame [lo_i, hi_i] clamped to the partition,
    plus an ``empty`` mask for frames that fall entirely outside it.

    lo_idx/hi_idx override the offset arithmetic with explicit row
    indices (used for RANGE peer bounds)."""
    n = flags.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = idx - positions(flags)
    last = last_index(flags)
    if lo_idx is not None:
        lo_r = lo_idx
    else:
        lo_r = start if lo is None else idx + lo
    if hi_idx is not None:
        hi_r = hi_idx
    else:
        hi_r = last if hi is None else idx + hi
    empty = (lo_r > hi_r) | (hi_r < start) | (lo_r > last)
    lo_i = jnp.clip(lo_r, start, last)
    hi_i = jnp.clip(hi_r, start, last)
    return lo_i, hi_i, empty


def frame_sum_count(x: jax.Array, ind: jax.Array, flags: jax.Array,
                    lo_i: jax.Array, hi_i: jax.Array):
    """(sum, count) over [lo_i, hi_i] via segment-local prefix sums:
    S[hi] - S[lo] + x[lo]. Both bounds must lie within the row's
    partition (frame_bounds guarantees it)."""
    xl = x.astype(_long_dtype(x.dtype))
    S = seg_cumsum(xl, flags)
    C = seg_cumsum(ind.astype(jnp.int64), flags)
    s = S[hi_i] - S[lo_i] + xl[lo_i]
    c = C[hi_i] - C[lo_i] + ind[lo_i].astype(jnp.int64)
    return s, c


def frame_moments(x: jax.Array, ind: jax.Array, flags: jax.Array,
                  lo_i: jax.Array, hi_i: jax.Array):
    """(sum, sumsq, count) in float for avg/var/stddev over a frame,
    null-aware (x must be zeroed at nulls, ind 0 there)."""
    fp = _fp_dtype(x.dtype)
    xf = x.astype(fp)
    S = seg_cumsum(xf, flags)
    Q = seg_cumsum(xf * xf, flags)
    C = seg_cumsum(ind.astype(fp), flags)
    s = S[hi_i] - S[lo_i] + xf[lo_i]
    q = Q[hi_i] - Q[lo_i] + xf[lo_i] * xf[lo_i]
    c = C[hi_i] - C[lo_i] + ind[lo_i].astype(fp)
    return s, q, c


def frame_extreme(x: jax.Array, flags: jax.Array, pos: jax.Array,
                  lo: int | None, hi: int | None, op,
                  lo_i: jax.Array, hi_i: jax.Array) -> jax.Array:
    """min/max over the frame. Three regimes, all scan-based:

    * lo unbounded  → running extreme gathered at hi_i
    * hi unbounded  → reverse running extreme gathered at lo_i
    * both bounded with lo <= 0 <= hi → forward slide (w = -lo+1,
      covers [i+lo, i]) combined with a reverse-domain slide
      (w = hi+1, covers [i, i+hi]); overlap at i is harmless for
      idempotent ops. Frames not containing the current row are the
      caller's job to reject (they need a different decomposition).

    x must carry the op's identity at null/padding rows."""
    if lo is None:
        run = seg_cummin(x, flags) if op is jnp.minimum else \
            seg_cummax(x, flags)
        return run[hi_i]
    if hi is None:
        rflags = jnp.flip(is_last_from_flags(flags))
        rx = jnp.flip(x)
        rrun = seg_cummin(rx, rflags) if op is jnp.minimum else \
            seg_cummax(rx, rflags)
        return jnp.flip(rrun)[lo_i]
    if not (lo <= 0 <= hi):
        raise ValueError("bounded min/max frame must contain the current row")
    fwd = _slide_extreme(-lo + 1, x, pos, op)
    if hi == 0:
        return fwd
    rflags = jnp.flip(is_last_from_flags(flags))
    rpos = _pos_from_flags(rflags)
    bwd = jnp.flip(_slide_extreme(hi + 1, jnp.flip(x), rpos, op))
    return op(fwd, bwd)
