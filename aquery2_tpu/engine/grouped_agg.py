"""Per-group scalar aggregates over the sorted-by-group row layout.

The reference evaluates aggregates per group inside generated C++ loops
over per-group index vectors (engine/ast.py groupby_c :620-794, calling
server/aggregations.h kernels). Here each aggregate is one or two XLA
segment reductions (scatter-reduce) over the whole column — no per-group
loop exists; group count enters only as the (bucketed) output size.

`subvec`-masked arguments (Value.mask) are honored by substituting the
reduction identity on masked-out rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.ops.scan import _fp_dtype, _long_dtype
from aquery2_tpu.ops.sort import sort_perm


def _seg_reduce(kind: str, x, seg, gcap: int):
    if kind == "sum":
        out = jax.ops.segment_sum(x, seg, num_segments=gcap + 1)
    elif kind == "min":
        out = jax.ops.segment_min(x, seg, num_segments=gcap + 1)
    elif kind == "max":
        out = jax.ops.segment_max(x, seg, num_segments=gcap + 1)
    else:
        raise ValueError(kind)
    return out[:gcap]


def _masked(x, mask, ident):
    if mask is None:
        return x
    return jnp.where(mask, x, jnp.asarray(ident, x.dtype))


def _ident_min(dt):
    dt = jnp.dtype(dt)
    return jnp.inf if dt.kind == "f" else jnp.iinfo(dt).max


def _ident_max(dt):
    dt = jnp.dtype(dt)
    return -jnp.inf if dt.kind == "f" else jnp.iinfo(dt).min


def compute(ctx, name: str, args: list):
    """ctx: engine.eval.EvalContext; args: list of row-kind Values."""
    from aquery2_tpu.engine.eval import Value

    gcap = ctx.gcap
    # padding rows carry seg == G; clamp into the overflow slot gcap
    seg = jnp.minimum(ctx.seg, gcap).astype(jnp.int32)

    v = args[0]
    x = v.data
    mask = v.mask
    t = v.sqltype

    if name == "count":
        ones = jnp.ones(x.shape[0], jnp.int64)
        if mask is not None:
            ones = jnp.where(mask, ones, 0)
        # padding rows excluded: their seg==gcap overflow slot
        return Value("group", _seg_reduce("sum", ones, seg, gcap), T.LongT)

    if name == "sum":
        xs = _masked(x, mask, 0).astype(_long_dtype(x.dtype))
        return Value("group", _seg_reduce("sum", xs, seg, gcap), T.long_type(t))

    if name in ("avg", "mean"):
        xs = _masked(x, mask, 0).astype(_long_dtype(x.dtype))
        s = _seg_reduce("sum", xs, seg, gcap)
        cnt = _count(ctx, seg, gcap, mask)
        fp = _fp_dtype(x.dtype)
        return Value("group", s.astype(fp) / jnp.maximum(cnt, 1).astype(fp),
                     T.fp_type(T.long_type(t)))

    if name == "min":
        xs = _masked(x, mask, _ident_min(x.dtype))
        return Value("group", _seg_reduce("min", xs, seg, gcap), t, v.dictionary)

    if name == "max":
        xs = _masked(x, mask, _ident_max(x.dtype))
        return Value("group", _seg_reduce("max", xs, seg, gcap), t, v.dictionary)

    if name == "first":
        idx = jnp.clip(ctx.group_starts, 0, x.shape[0] - 1).astype(jnp.int32)
        return Value("group", x[idx], t, v.dictionary)

    if name == "last":
        idx = jnp.clip(ctx.group_ends - 1, 0, x.shape[0] - 1).astype(jnp.int32)
        return Value("group", x[idx], t, v.dictionary)

    if name in ("var", "stddev"):
        fp = jnp.float64
        xs = _masked(x, mask, 0).astype(_long_dtype(x.dtype))
        s = _seg_reduce("sum", xs, seg, gcap).astype(fp)
        ssq = _seg_reduce("sum", xs * xs, seg, gcap).astype(fp)
        cnt = _count(ctx, seg, gcap, mask).astype(fp)
        denom = cnt + (1.0 if config.strict_reference_semantics else 0.0)
        denom = jnp.maximum(denom, 1.0)
        out = (ssq - s * s / denom) / denom
        if name == "stddev":
            out = jnp.sqrt(jnp.maximum(out, 0))
        return Value("group", out, T.DoubleT)

    if name == "corr":
        y = args[1]
        fp = jnp.float64
        xs = _masked(x, mask, 0).astype(_long_dtype(x.dtype))
        ys = _masked(y.data, y.mask, 0).astype(_long_dtype(y.data.dtype))
        sx = _seg_reduce("sum", xs, seg, gcap).astype(fp)
        sy = _seg_reduce("sum", ys, seg, gcap).astype(fp)
        sxy = _seg_reduce("sum", (xs * ys).astype(fp), seg, gcap)
        sx2 = _seg_reduce("sum", (xs * xs).astype(fp), seg, gcap)
        sy2 = _seg_reduce("sum", (ys * ys).astype(fp), seg, gcap)
        nn = _count(ctx, seg, gcap, mask).astype(fp)
        num = nn * sxy - sx * sy
        den = jnp.sqrt((nn * sx2 - sx * sx) * (nn * sy2 - sy * sy))
        return Value("group", num / den, T.DoubleT)

    if name == "median":
        # per-group device sort, pick middles via group offsets
        fp = _fp_dtype(x.dtype)
        perm = sort_perm([(seg, True), (x, True)], ctx.ws.n)
        xs = x[perm]
        lens = ctx.group_lens
        lo_idx = ctx.group_starts + jnp.maximum((lens - 1) // 2, 0)
        hi_idx = ctx.group_starts + jnp.maximum(lens // 2, 0)
        lo = xs[jnp.clip(lo_idx, 0, xs.shape[0] - 1).astype(jnp.int32)].astype(fp)
        hi = xs[jnp.clip(hi_idx, 0, xs.shape[0] - 1).astype(jnp.int32)].astype(fp)
        return Value("group", (lo + hi) * 0.5, T.fp_type(t))

    if name == "distinct_count":
        raise NotImplementedError

    raise ValueError(f"unknown aggregate {name}")


def _count(ctx, seg, gcap, mask):
    ones = jnp.ones(seg.shape[0], jnp.int64)
    if mask is not None:
        ones = jnp.where(mask, ones, 0)
        return _seg_reduce("sum", ones, seg, gcap)
    if mask is None and ctx.grouping is not None:
        return ctx.group_lens
    return _seg_reduce("sum", ones, seg, gcap)
