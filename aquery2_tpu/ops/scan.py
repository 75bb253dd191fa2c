"""Running and windowed (moving) aggregates as parallel scans.

TPU-native re-formulation of the reference's sequential window kernels
(server/aggregations.h): every `for i { ret[i] = f(ret[i-1], arr[i]) }`
loop becomes a data-parallel primitive —

* running sums/avgs/mins/maxs  → cumsum / cummax / segmented
  associative_scan  (reference sums/avgs/mins/maxs :89-125, 203-236)
* windowed sumw/avgw           → cumsum difference  (reference :238-281)
* windowed minw/maxw           → sparse-table doubling: log2(w) shift+min
  passes replace the reference's monotonic deque (:127-167), which is
  inherently sequential and impossible on a vector unit
* vars/varw/stddev*            → scans of x and x² (the reference's Welford
  recurrences :283-381 are mathematically population variance; we compute
  the same quantity from moment scans). NOTE reference `varw` reads
  arr[i-w-1] out of bounds at i==w (aggregations.h:311) — we implement the
  exact trailing-w window instead.
* ratios/deltas/prev/next      → shifted gathers (:169-201, 439-485)

Segmented execution: all kernels take ``pos`` — each row's position within
its segment (group) — and compute per-segment results, so GROUP BY windowed
expressions (engine/ast.py:620-794) use the same kernels as whole-column
ones with pos = arange.

Conventions: inputs are padded device arrays; outputs for padding rows are
unspecified. First-element semantics follow the reference exactly:
sums[0]=x0, avgs[0]=x0, deltas[0]=0, prev[0]=x0, next[last]=x[last],
ratios[0]=x0/x0, vars[0]=0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from aquery2_tpu import types as T


# --- dtype helpers --------------------------------------------------------

def _long_dtype(dt) -> jnp.dtype:
    dt = jnp.dtype(dt)
    if dt.kind == "b":
        return jnp.dtype(jnp.int64)
    if dt.kind == "i":
        return jnp.dtype(jnp.int64)
    if dt.kind == "u":
        return jnp.dtype(jnp.uint64)
    if dt.kind == "f":
        return jnp.dtype(jnp.float64)
    return dt


def _fp_dtype(dt) -> jnp.dtype:
    dt = jnp.dtype(dt)
    if dt == jnp.float32:
        return jnp.dtype(jnp.float64)  # reference promotes through GetLongType→double
    if dt.kind == "f":
        return dt
    return jnp.dtype(jnp.float64)


# --- shifted gather helpers ----------------------------------------------

def _shift_right(x: jax.Array, s: int | jax.Array) -> jax.Array:
    """x[i-s], garbage in first s slots (callers mask with pos >= s)."""
    return jnp.roll(x, s, axis=0)


# --- segmented primitive scans -------------------------------------------

def _pos_from_flags(flags: jax.Array) -> jax.Array:
    idx = jnp.arange(flags.shape[0], dtype=jnp.int32)
    return idx - jax.lax.cummax(jnp.where(flags, idx, 0))


def seg_scan(x: jax.Array, flags: jax.Array | None, op) -> jax.Array:
    """Generic inclusive segmented scan with combine ``op``.

    Hillis-Steele distance-masked doubling: log2(n) passes of
    roll+combine+select, gated on the within-segment position so
    combines never cross a segment boundary. A tuple-carrying
    `lax.associative_scan` lowers to unaligned interleave ops that are
    catastrophically slow on TPU (>400 s at 16M rows; this form runs in
    tens of ms). Valid for any associative op."""
    if flags is None:
        return jax.lax.associative_scan(op, x)
    pos = _pos_from_flags(flags)
    n = x.shape[0]
    s = 1
    while s < n:
        x = jnp.where(pos >= s, op(x, _shift_right(x, s)), x)
        s <<= 1
    return x


def _pallas_scan_ok(x: jax.Array) -> bool:
    """Route to the one-pass Pallas block scan (ops/pallas_kernels.py):
    TPU backend, Pallas-tileable capacity, big enough that one HBM pass
    beats XLA's log2(n) doubling (measured 10× at 16M rows on v5e)."""
    from aquery2_tpu import config

    if not config.use_pallas:
        return False
    if x.ndim != 1 or x.shape[0] % 8192 != 0 or x.shape[0] < (1 << 16):
        return False
    return jax.default_backend() == "tpu"


def seg_cumsum(x: jax.Array, flags: jax.Array | None) -> jax.Array:
    if _pallas_scan_ok(x):
        from aquery2_tpu.ops import pallas_kernels as PK

        if x.dtype in (jnp.int32, jnp.float32):
            return PK.seg_scan_multi(flags, (x,), ("add",))[0]
        if x.dtype == jnp.int64:
            hi, lo = PK.split_i64_limbs(x)
            return PK.join_i64_limbs(*PK.seg_cumsum_i64(flags, hi, lo))
    if flags is None:
        return jnp.cumsum(x)
    return seg_scan(x, flags, jnp.add)


def seg_cummin(x: jax.Array, flags: jax.Array | None) -> jax.Array:
    if _pallas_scan_ok(x) and x.dtype in (jnp.int32, jnp.float32):
        from aquery2_tpu.ops import pallas_kernels as PK

        return PK.seg_scan_multi(flags, (x,), ("min",))[0]
    if flags is None:
        return jax.lax.cummin(x)
    return seg_scan(x, flags, jnp.minimum)


def seg_cummax(x: jax.Array, flags: jax.Array | None) -> jax.Array:
    if _pallas_scan_ok(x) and x.dtype in (jnp.int32, jnp.float32):
        from aquery2_tpu.ops import pallas_kernels as PK

        return PK.seg_scan_multi(flags, (x,), ("max",))[0]
    if flags is None:
        return jax.lax.cummax(x)
    return seg_scan(x, flags, jnp.maximum)


# --- running aggregates (reference `sums/avgs/mins/maxs/vars/stddevs`) ----

def sums(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return seg_cumsum(x.astype(_long_dtype(x.dtype)), flags)


def avgs(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    c = seg_cumsum(x.astype(_long_dtype(x.dtype)), flags)
    return c / (pos + 1).astype(_fp_dtype(x.dtype))


def mins(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return seg_cummin(x, flags)


def maxs(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return seg_cummax(x, flags)


def vars_(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    """Running population variance (reference vars, Welford /(i+1))."""
    fp = _fp_dtype(x.dtype)
    xf = x.astype(fp)
    cnt = (pos + 1).astype(fp)
    s = seg_cumsum(xf, flags)
    ssq = seg_cumsum(xf * xf, flags)
    mean = s / cnt
    v = ssq / cnt - mean * mean
    return jnp.maximum(v, 0)


def stddevs(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return jnp.sqrt(vars_(x, pos, flags))


def ratios(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return ratiow(1, x, pos, flags)


def deltas(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    p = _shift_right(x, 1)
    return jnp.where(pos > 0, x - p, jnp.zeros_like(x))


def prev(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    p = _shift_right(x, 1)
    return jnp.where(pos > 0, p, x)


def next_(x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    """Reference `aggnext`: shift left; last element of each segment keeps
    its own value (aggregations.h:471-485)."""
    nshift = jnp.roll(x, -1, axis=0)
    if flags is None:
        is_last = jnp.zeros(x.shape[0], dtype=bool).at[-1].set(True)
    else:
        is_last = jnp.concatenate([flags[1:], jnp.ones((1,), dtype=bool)])
    return jnp.where(is_last, x, nshift)


# --- windowed aggregates (reference `sumw/avgw/minw/maxw/varw/ratiow`) ----

def sumw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    """Trailing-w sum; partial windows at segment starts (reference
    sumw warm-up is the running sum, aggregations.h:238-252)."""
    xl = x.astype(_long_dtype(x.dtype))
    c = seg_cumsum(xl, flags)
    # constant trailing distance: roll, never gather (a random gather
    # costs as much as an entire sort on TPU; a static roll is a copy)
    behind = _shift_right(c, w)
    return jnp.where(pos >= w, c - behind, c)


def avgw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    s = sumw(w, x, pos, flags)
    cnt = jnp.minimum(pos + 1, w).astype(_fp_dtype(x.dtype))
    return s / cnt


def _slide_extreme(w: int, x: jax.Array, pos: jax.Array, op) -> jax.Array:
    """Sliding min/max over the trailing w elements of each segment via
    sparse-table doubling: O(log w) masked shift+combine passes."""
    if w <= 1:
        return x
    g = x
    covered = 1
    while covered < w:
        s = min(covered, w - covered)
        shifted = _shift_right(g, s)
        g = jnp.where(pos >= s, op(g, shifted), g)
        covered += s
    return g


def minw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return _slide_extreme(w, x, pos, jnp.minimum)


def maxw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return _slide_extreme(w, x, pos, jnp.maximum)


def varw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    """Trailing-w population variance; warm-up = running variance, matching
    the reference's intent (its post-warm-up recurrence reads arr[-1],
    aggregations.h:311 — we compute the exact window instead)."""
    fp = _fp_dtype(x.dtype)
    xf = x.astype(fp)
    c = seg_cumsum(xf, flags)
    csq = seg_cumsum(xf * xf, flags)
    s = jnp.where(pos >= w, c - _shift_right(c, w), c)
    ssq = jnp.where(pos >= w, csq - _shift_right(csq, w), csq)
    cnt = jnp.minimum(pos + 1, w).astype(fp)
    mean = s / cnt
    return jnp.maximum(ssq / cnt - mean * mean, 0)


def stddevw(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    return jnp.sqrt(varw(w, x, pos, flags))


def ratiow(w: int, x: jax.Array, pos: jax.Array, flags: jax.Array | None) -> jax.Array:
    """ret[i] = x[i] / x[i-w]; for pos<w divide by the segment's first
    element (reference ratiow, aggregations.h:169-188)."""
    fp = _fp_dtype(x.dtype)
    xf = x.astype(fp)
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    start = idx - pos
    behind_idx = jnp.where(pos >= w, idx - w, start)
    return xf / xf[jnp.clip(behind_idx, 0, x.shape[0] - 1)]


# --- dispatch table used by the expression compiler -----------------------

RUNNING = {
    "sums": sums, "avgs": avgs, "mins": mins, "maxs": maxs,
    "vars": vars_, "stddevs": stddevs, "ratios": ratios,
    "deltas": deltas, "prev": prev, "next": next_, "aggnext": next_,
}

WINDOWED = {
    "sums": sumw, "avgs": avgw, "mins": minw, "maxs": maxw,
    "vars": varw, "stddevs": stddevw, "ratios": ratiow,
    "sumw": sumw, "avgw": avgw, "minw": minw, "maxw": maxw,
    "varw": varw, "stddevw": stddevw, "ratiow": ratiow,
}


def result_type(name: str, t: T.SQLType) -> T.SQLType:
    """Static result type of a running/windowed op on element type t."""
    if name in ("sums", "sumw"):
        return T.long_type(t)
    if name in ("avgs", "avgw", "vars", "varw", "stddevs", "stddevw",
                "ratios", "ratiow"):
        return T.fp_type(T.long_type(t))
    return t
