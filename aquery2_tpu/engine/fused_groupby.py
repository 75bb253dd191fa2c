"""Fused group-by aggregation: one XLA program per query shape.

This is the TPU-native analogue of the reference's *compiled query
execution* (README.md:5-18): where AQuery2 code-generates and clang-
compiles a C++ snippet per query (build.py `build_dll`, engine/ast.py
groupby_c :620-794), we trace the whole grouped-aggregation pipeline —
row-expression evaluation, WHERE masking, key coding, reduction, group
compaction, HAVING, key decode — into ONE jitted program per query ×
shape bucket, with a single host sync (the group-count pull).

Strategy tiers, chosen from measured v5e costs (ops/reduce.py):

  dense    — tiny key domains (≤ config.ONEHOT_MATMUL_MAX_GROUPS):
             dense perfect-hash coding + exact bf16 one-hot matmul
             reduction on the MXU.
  packed   — keys bit-pack into int32 words from column stats
             (reference PerfectHashTable, hasher.h:209-322): sort on
             the word tuple carrying all reduction lanes as payload,
             then cumsum + boundary extraction. Median rides the sort
             as a secondary key.
  multikey — computed keys (GROUP BY x+y) or >30-bit ranges:
             lexicographic sort on the evaluated keys, same reduction.

WHERE folds into the coding step (filtered rows carry sentinel codes
that sort behind every group); HAVING evaluates over the dense group
aggregates in-program; ORDER BY/LIMIT apply to the small result table.

Supported shape (falls back to the general executor otherwise):
  SELECT key..., f(agg(rowexpr)...) FROM t [WHERE rowpred]
  GROUP BY keyexprs... [HAVING aggpred] [ORDER BY outputcols] —
  aggs: sum/avg/min/max/count/corr/var/stddev/median; row exprs and
  post-agg exprs: arithmetic/comparisons/math calls.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, StringDict, Table
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_SIMPLE_AGGS = {"sum", "avg", "mean", "min", "max", "count", "corr",
                "var", "stddev", "median"}
_MATH = {"sqrt": jnp.sqrt, "pow": jnp.power, "abs": jnp.abs,
         "exp": jnp.exp, "log": jnp.log, "floor": jnp.floor,
         "ceil": jnp.ceil, "round": jnp.round}


class Unsupported(Exception):
    pass


# --------------------------------------------------------------------- #
# plan extraction: can this SELECT run on the fused path?
# --------------------------------------------------------------------- #

def _check_row_expr(e: A.Expr, cols: CaseInsensitiveDict) -> None:
    if isinstance(e, A.Literal):
        if e.is_string:
            raise Unsupported("string literal in row expr")
        return
    if isinstance(e, A.ColumnRef):
        if e.name not in cols:
            raise Unsupported(f"unknown column {e.name}")
        c = cols[e.name]
        if getattr(c, "is_vector", False) or c.sqltype.is_string:
            raise Unsupported("vector/string column in fused row expr")
        return
    if isinstance(e, A.BinOp) and e.op in ("+", "-", "*", "/", "%", "=",
                                           "<>", "<", ">", "<=", ">=",
                                           "and", "or"):
        _check_row_expr(e.left, cols)
        _check_row_expr(e.right, cols)
        return
    if isinstance(e, A.UnaryOp) and e.op in ("-", "not"):
        _check_row_expr(e.operand, cols)
        return
    if isinstance(e, A.Call) and e.func in _MATH:
        for a in e.args:
            _check_row_expr(a, cols)
        return
    if isinstance(e, A.CaseWhen):
        # CASE rides the fused grammar when an ELSE is present (no-ELSE
        # unmatched rows are NULL — 3-valued outputs stay on the general
        # path, which carries null masks)
        if e.default is None:
            raise Unsupported("CASE without ELSE (NULL branch)")
        for cond, val in e.whens:
            _check_row_expr(cond, cols)
            _check_row_expr(val, cols)
        _check_row_expr(e.default, cols)
        return
    raise Unsupported(f"row expr {e}")


def _collect_aggs(e: A.Expr, cols, out: list[A.Call]) -> None:
    """Validate a post-agg expression; collect aggregate leaves."""
    if isinstance(e, A.Literal):
        return
    if isinstance(e, A.Call):
        if e.func in _SIMPLE_AGGS:
            if e.distinct:
                raise Unsupported("DISTINCT agg")
            for a in e.args:
                if isinstance(a, A.Star):
                    continue
                _check_row_expr(a, cols)
            out.append(e)
            return
        if e.func == "count" and (not e.args or isinstance(e.args[0], A.Star)):
            out.append(e)
            return
        if e.func in _MATH:
            for a in e.args:
                _collect_aggs(a, cols, out)
            return
        raise Unsupported(f"call {e.func}")
    if isinstance(e, A.BinOp):
        # only operators _post_agg_eval can trace; anything else (LIKE,
        # IN, …) must fall back to the general executor at plan time
        if e.op not in ("+", "-", "*", "/", "%", "=", "<>", "<", ">",
                        "<=", ">=", "and", "or"):
            raise Unsupported(f"post-agg op {e.op}")
        _collect_aggs(e.left, cols, out)
        _collect_aggs(e.right, cols, out)
        return
    if isinstance(e, A.UnaryOp):
        if e.op not in ("-", "not"):
            raise Unsupported(f"post-agg unary {e.op}")
        _collect_aggs(e.operand, cols, out)
        return
    raise Unsupported(f"post-agg expr {e}")


def plan(sel: A.Select, table: Table):
    """Raise Unsupported, or return the fused plan dict."""
    if (not sel.group_by or sel.assumptions or sel.distinct
            or sel.unions):
        raise Unsupported("clause mix")
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        raise Unsupported("joins")
    cols = table.columns

    keys: list[A.Expr] = []
    expr_keys = False
    for g in sel.group_by:
        if isinstance(g, A.ColumnRef) and g.name in cols:
            c = cols[g.name]
            if getattr(c, "is_vector", False):
                raise Unsupported("vector key")
            if not (c.sqltype.kind in ("int", "bool") or c.sqltype.is_string
                    or c.sqltype.is_temporal):
                raise Unsupported("non-integer key")
            keys.append(g)
            continue
        # computed group keys (GROUP BY x+y, GROUP BY ts/86400, …): no
        # column stats to pack with, but the multi-key sort tier orders
        # arbitrary evaluated keys just the same
        _check_row_expr(g, cols)
        keys.append(g)
        expr_keys = True

    if sel.where is not None:
        _check_row_expr(sel.where, cols)

    projections = []
    aggs: list[A.Call] = []
    keyset = {k.name.lower() for k in keys if isinstance(k, A.ColumnRef)}
    for p in sel.projections:
        e = p.expr
        if isinstance(e, A.Star):
            raise Unsupported("star")
        if isinstance(e, A.ColumnRef):
            if e.name.lower() not in keyset:
                raise Unsupported("bare non-key column")
            projections.append(("key", e, p.alias))
            continue
        if any(e == k for k in keys):      # projected computed key
            projections.append(("key", e, p.alias))
            continue
        before = len(aggs)
        _collect_aggs(e, cols, aggs)
        if len(aggs) == before:
            raise Unsupported("projection without aggregate")
        projections.append(("agg", e, p.alias))

    # HAVING is just one more post-aggregate expression: its aggregates
    # join the shared reduction, the boolean filters the grouped result
    if sel.having is not None:
        _collect_aggs(sel.having, cols, aggs)
    # median rides the packed sort as a secondary sort key — so only ONE
    # distinct median argument fits in a single sorted layout
    medians = {repr(a.args) for a in aggs if a.func == "median"}
    if len(medians) > 1:
        raise Unsupported("multiple distinct median args")

    # ORDER BY applies to the (much smaller) grouped result — allowed when
    # every order key IS an output column (alias or identical expression)
    order_by: list[tuple[int, bool]] = []
    for item in (sel.order_by or []):
        e = item.expr
        target = None
        for i, pr in enumerate(sel.projections):
            if not isinstance(pr.expr, A.Star) and pr.expr == e:
                target = i
                break
            if (isinstance(e, A.ColumnRef) and e.table is None and pr.alias
                    and pr.alias.lower() == e.name.lower()):
                target = i
                break
        if target is None:
            raise Unsupported("order key is not an output column")
        order_by.append((target, item.ascending))

    return {"keys": keys, "projections": projections, "aggs": aggs,
            "where": sel.where, "limit": sel.limit, "having": sel.having,
            "has_median": bool(medians), "order_by": order_by,
            "expr_keys": expr_keys,
            "into_table": sel.into_table, "into_outfile": sel.into_outfile,
            "outfile_sep": sel.outfile_sep}


# --------------------------------------------------------------------- #
# tracing
# --------------------------------------------------------------------- #

def _row_eval(e: A.Expr, env: dict[str, jax.Array]):
    if isinstance(e, A.Literal):
        return e.value
    if isinstance(e, A.ColumnRef):
        return env[e.name.lower()]
    if isinstance(e, A.BinOp):
        a = _row_eval(e.left, env)
        b = _row_eval(e.right, env)
        if e.op == "+":
            return jnp.add(a, b)
        if e.op == "-":
            return jnp.subtract(a, b)
        if e.op == "*":
            return jnp.multiply(a, b)
        if e.op == "/":
            return jnp.true_divide(a, b)
        if e.op == "%":
            return jnp.mod(a, b)
        if e.op == "=":
            return jnp.equal(a, b)
        if e.op == "<>":
            return jnp.not_equal(a, b)
        if e.op == "<":
            return jnp.less(a, b)
        if e.op == ">":
            return jnp.greater(a, b)
        if e.op == "<=":
            return jnp.less_equal(a, b)
        if e.op == ">=":
            return jnp.greater_equal(a, b)
        if e.op == "and":
            return jnp.logical_and(a, b)
        if e.op == "or":
            return jnp.logical_or(a, b)
    if isinstance(e, A.UnaryOp):
        v = _row_eval(e.operand, env)
        return jnp.negative(v) if e.op == "-" else jnp.logical_not(v)
    if isinstance(e, A.Call) and e.func in _MATH:
        args = [_row_eval(a, env) for a in e.args]
        if e.func == "pow":
            base = args[0]
            if hasattr(base, "dtype") and base.dtype.kind != "f":
                base = base.astype(jnp.float64)
            return jnp.power(base, args[1])
        a0 = args[0]
        if hasattr(a0, "dtype") and a0.dtype.kind != "f":
            a0 = a0.astype(jnp.float64)
        return _MATH[e.func](a0, *args[1:])
    if isinstance(e, A.CaseWhen) and e.default is not None:
        # where-chain from last WHEN backwards: earlier WHENs win, as
        # in the general path's reversed fold (eval.py _case)
        res = _row_eval(e.default, env)
        for cond, val in reversed(e.whens):
            c = _row_eval(cond, env)
            if hasattr(c, "dtype") and c.dtype != jnp.bool_:
                c = c != 0
            res = jnp.where(c, _row_eval(val, env), res)
        return res
    raise Unsupported(f"trace {e}")


def _agg_fingerprint(call: A.Call) -> str:
    return repr(call)


def _needed_scatters(aggs: list[A.Call]) -> dict[str, tuple]:
    """agg fingerprint → (kind, row exprs). Dedupes identical aggregates."""
    out: dict[str, tuple] = {}
    for call in aggs:
        fp = _agg_fingerprint(call)
        if fp not in out:
            out[fp] = (call.func, call.args)
    return out


def _reconstruct_split(A, B, P1):
    return (A.astype(jnp.float64) * (2.0 ** -P1)
            + B.astype(jnp.float64) * (2.0 ** -(P1 + 24)))


def _gathered_sum(gathered, tag):
    """Read back a float sum in f64 whichever representation was used."""
    if tag + "#A" in gathered:
        return _reconstruct_split(gathered[tag + "#A"], gathered[tag + "#B"], 14)
    return gathered[tag]


def _make_stage1(key_names, key_mins, key_ranges, scatters, where,
                 acc_int_dtype, sum_dtype_for, bounds=None):
    """Build the rows→dense-accumulators traced function. bounds:
    lane_bounds stats (shrinks the MXU tier's digit lanes)."""

    strides = []
    s = 1
    for r in reversed(key_ranges):
        strides.append(s)
        s *= r
    strides.reverse()
    domain = s
    code_dtype = jnp.int32 if domain < 2**31 - 1 else jnp.int64

    def stage1(n, *arrays_and_names):
        # arrays passed in fixed order with names closed over; trailing
        # arrays are validity masks of the nullable agg-arg columns
        ncols = len(stage1.col_order)
        env = dict(zip(stage1.col_order, arrays_and_names[:ncols]))
        env_null = {nm: ~v for nm, v in zip(stage1.null_order,
                                            arrays_and_names[ncols:])}
        null_fn = make_null_fn(env_null) if env_null else None
        cap = arrays_and_names[0].shape[0]
        idx = jnp.arange(cap, dtype=jnp.int32)
        valid = idx < n
        if where is not None:
            w = _row_eval(where, env)
            if w.dtype != jnp.bool_:
                w = w != 0
            valid = valid & w
        code = None
        for kn, mn, st in zip(key_names, key_mins, strides):
            part = (env[kn].astype(code_dtype) - code_dtype(mn)) * code_dtype(st)
            code = part if code is None else code + part
        code = jnp.where(valid, code, domain).astype(jnp.int32)

        outs = _scatter_aggs(env, valid, code, domain, scatters,
                             null_fn=null_fn, bounds=bounds)
        present = outs["__counts__"][:domain] > 0
        num_groups = jnp.sum(present, dtype=jnp.int32)
        return outs, num_groups

    return stage1, domain, strides


def _build_lanes(env, valid, scatters, eval_fn=None, null_fn=None):
    """Evaluate every row expression into per-row reduction lanes.

    Returns (add_lanes int64, min_lanes, max_lanes, f64_lanes), each a
    tag → [n] array dict, masked so invalid rows are identities. Lane
    arrays stay 1-D throughout — never stacked into [n, K] (a minor dim
    of K gets tile-padded to 128 on TPU: 64× HBM blowup at 16M rows).

    null_fn: optional callable(arg exprs) → per-row NULL mask (True =
    some referenced column is NULL) or None. SQL aggregates skip NULL
    inputs: each lane masks with validity AND non-null, and any agg
    whose rows can be null gets an extra ``:cnt`` lane (its non-null
    count) consumed by avg/var/corr/count(col) in _post_agg_eval.
    Reference: MonetDB nil semantics, common/types.py:359-364."""

    def rows(e):
        return eval_fn(e) if eval_fn is not None else _row_eval(e, env)

    vmask = valid
    add: dict[str, jax.Array] = {"__counts__": vmask}
    mins: dict[str, jax.Array] = {}
    maxs: dict[str, jax.Array] = {}
    f64s: dict[str, jax.Array] = {}

    def add_float(tag: str, vv: jax.Array) -> None:
        """Exact f32 sums as two integer-valued f32 limbs (recombined in
        f64 by _reconstruct_split). The limbs stay f32 — int64 lanes are
        poison on TPU (emulated arithmetic, 16× slower scatters)."""
        if vv.dtype == jnp.float32:
            P1 = 14
            a = jnp.round(vv * jnp.float32(2.0 ** P1))
            r = vv - a * jnp.float32(2.0 ** -P1)
            b = jnp.round(r * jnp.float32(2.0 ** (P1 + 24)))
            add[tag + "#A"] = a
            add[tag + "#B"] = b
        else:
            # f64 columns: slow f64 scatter (rare; exactness over speed)
            f64s[tag] = vv.astype(jnp.float64)

    def widen_sq(v):
        """Square that cannot overflow: int32 inputs widen to int64."""
        if v.dtype.itemsize <= 4:
            return v.astype(jnp.int64)
        return v

    for fp, (kind, args) in scatters.items():
        if kind == "median":
            continue            # median rides the sort as a secondary key
        nmask = null_fn(args) if null_fn is not None else None
        vm = vmask if nmask is None else (vmask & ~nmask)
        if nmask is not None:
            add[fp + ":cnt"] = vm     # per-agg non-null count
        if kind == "count":
            continue            # count(*) rides validity; count(col) :cnt
        if kind == "corr":
            x = rows(args[0])
            y = rows(args[1])
            if x.dtype.kind in "ib" and y.dtype.kind in "ib":
                xi = jnp.where(vm, x, jnp.zeros((), x.dtype))
                yi = jnp.where(vm, y, jnp.zeros((), y.dtype))
                xw, yw = widen_sq(xi), widen_sq(yi)
                for tag, arr in (("sx", xi), ("sy", yi), ("sxy", xw * yw),
                                 ("sx2", xw * xw), ("sy2", yw * yw)):
                    add[fp + ":" + tag] = arr
            else:
                xf = jnp.where(vm, x, 0).astype(jnp.float32)
                yf = jnp.where(vm, y, 0).astype(jnp.float32)
                for tag, arr in (("sx", xf), ("sy", yf), ("sxy", xf * yf),
                                 ("sx2", xf * xf), ("sy2", yf * yf)):
                    add_float(fp + ":" + tag, arr)
            continue
        v = rows(args[0])
        if kind in ("sum", "avg", "mean"):
            if v.dtype.kind == "f":
                vv = jnp.where(vm, v, jnp.zeros((), v.dtype))
                add_float(fp + ":sum",
                          vv.astype(jnp.float32) if v.dtype == jnp.float32 else vv)
            else:
                add[fp + ":sum"] = jnp.where(vm, v, jnp.zeros((), v.dtype))
        if kind in ("var", "stddev"):
            if v.dtype.kind in "ib":
                vv = jnp.where(vm, v, jnp.zeros((), v.dtype))
                add[fp + ":sum"] = vv
                vw = widen_sq(vv)
                add[fp + ":ssq"] = vw * vw
            else:
                vv = jnp.where(vm, v, jnp.zeros((), v.dtype)).astype(jnp.float32)
                add_float(fp + ":sum", vv)
                add_float(fp + ":ssq", vv * vv)
        if kind == "min":
            big = _sentinel_max(v.dtype)
            mins[fp + ":min"] = jnp.where(vm, v, jnp.asarray(big, v.dtype))
        if kind == "max":
            small = _sentinel_min(v.dtype)
            maxs[fp + ":max"] = jnp.where(vm, v, jnp.asarray(small, v.dtype))
    return add, mins, maxs, f64s


def _scatter_aggs(env, valid, code, domain, scatters,
                  eval_fn=None, lanes=None, null_fn=None,
                  bounds=None) -> dict[str, jax.Array]:
    """Reduce every needed aggregate into (domain+1,) dense accumulators
    via ops.reduce.segment_reduce (one-hot MXU matmul for small domains,
    per-lane 1-D scatters otherwise).

    code: per-row slot (invalid rows must carry `domain`). lanes: pre-
    built/permuted lane dicts (the sort strategy carries lanes through
    lax.sort instead of gathering). bounds: lane_bounds stats (shrinks
    MXU digit lanes)."""
    from aquery2_tpu.ops import reduce as R

    if lanes is None:
        lanes = _build_lanes(env, valid, scatters, eval_fn=eval_fn,
                             null_fn=null_fn)
    add, mins, maxs, f64s = lanes
    outs = R.segment_reduce(code, add, mins, maxs, f64s, domain,
                            bounds=bounds)
    outs["__counts__"] = outs["__counts__"].astype(jnp.int32)
    return outs


def _post_agg_eval(e: A.Expr, dense: dict[str, jax.Array], counts, keyvals):
    """Evaluate the projection over dense [gcap] gathered aggregates."""
    if isinstance(e, A.Literal):
        return e.value
    if isinstance(e, A.Call):
        fp = _agg_fingerprint(e)
        kind = e.func
        # per-agg non-null count (present iff the agg's args are nullable)
        acnt = dense.get(fp + ":cnt", counts)
        if kind == "count":
            return acnt.astype(jnp.int64)
        if kind in ("sum",):
            return _gathered_sum(dense, fp + ":sum")
        if kind in ("avg", "mean"):
            s = _gathered_sum(dense, fp + ":sum")
            return s.astype(jnp.float64) / jnp.maximum(acnt, 1)
        if kind == "min":
            return dense[fp + ":min"]
        if kind == "max":
            return dense[fp + ":max"]
        if kind == "median":
            return dense[fp + ":median"]
        if kind in ("var", "stddev"):
            s = _gathered_sum(dense, fp + ":sum").astype(jnp.float64)
            ssq = _gathered_sum(dense, fp + ":ssq").astype(jnp.float64)
            nn = acnt.astype(jnp.float64)
            denom = nn + (1.0 if config.strict_reference_semantics else 0.0)
            v = (ssq - s * s / jnp.maximum(denom, 1.0)) / jnp.maximum(denom, 1.0)
            return jnp.sqrt(jnp.maximum(v, 0.0)) if kind == "stddev" else v
        if kind == "corr":
            sx = _gathered_sum(dense, fp + ":sx").astype(jnp.float64)
            sy = _gathered_sum(dense, fp + ":sy").astype(jnp.float64)
            sxy = _gathered_sum(dense, fp + ":sxy").astype(jnp.float64)
            sx2 = _gathered_sum(dense, fp + ":sx2").astype(jnp.float64)
            sy2 = _gathered_sum(dense, fp + ":sy2").astype(jnp.float64)
            nn = acnt.astype(jnp.float64)
            num = nn * sxy - sx * sy
            den = jnp.sqrt((nn * sx2 - sx * sx) * (nn * sy2 - sy * sy))
            return num / den
        if kind in _MATH:
            args = [_post_agg_eval(a, dense, counts, keyvals) for a in e.args]
            if kind == "pow":
                b = args[0]
                if hasattr(b, "dtype") and b.dtype.kind != "f":
                    b = b.astype(jnp.float64)
                return jnp.power(b, args[1])
            a0 = args[0]
            if hasattr(a0, "dtype") and a0.dtype.kind != "f":
                a0 = a0.astype(jnp.float64)
            return _MATH[kind](a0, *args[1:])
    if isinstance(e, A.BinOp):
        a = _post_agg_eval(e.left, dense, counts, keyvals)
        b = _post_agg_eval(e.right, dense, counts, keyvals)
        return {
            "+": jnp.add, "-": jnp.subtract, "*": jnp.multiply,
            "/": jnp.true_divide, "%": jnp.mod,
            "=": jnp.equal, "<>": jnp.not_equal,
            "<": jnp.less, ">": jnp.greater,
            "<=": jnp.less_equal, ">=": jnp.greater_equal,
            "and": jnp.logical_and, "or": jnp.logical_or,
        }[e.op](a, b)
    if isinstance(e, A.UnaryOp):
        v = _post_agg_eval(e.operand, dense, counts, keyvals)
        return jnp.logical_not(v) if e.op == "not" else jnp.negative(v)
    raise Unsupported(f"post {e}")


# --------------------------------------------------------------------- #
# execution + cache
# --------------------------------------------------------------------- #

_cache: dict[tuple, Any] = {}


def choose_strategy(p, cols):
    """Strategy tiers from key stats (ops/reduce.py has the measured cost
    model):
      dense    — tiny domains: dense accumulators (one-hot MXU matmul)
      packed   — keys pack into one-or-more int32 words: single sort +
                 cumsum/boundary reduction (scatters are ~16× the cost
                 of a sort for 64-bit lanes)
      multikey — unpackable keys (huge ranges / floats / computed):
                 lexicographic multi-operand sort, same reduction
    Returns (strategy, key_mins, key_ranges, domain) or None (median
    without a packable layout: the general path computes it)."""
    key_mins, key_ranges = [], []
    domain = 1
    packable = not p["expr_keys"]      # computed keys have no stats
    if packable:
        for k in p["keys"]:
            c = cols[k.name]
            if c.data.dtype.kind not in "iub":
                packable = False
                break
            mn, mx = c.stats()
            key_mins.append(int(mn))
            key_ranges.append(int(mx) - int(mn) + 1)
            domain *= key_ranges[-1]
    if p["has_median"]:
        if not packable or _plan_words(key_ranges) is None:
            return None
        strategy = "packed"       # median needs the sorted layout
    elif packable and domain <= config.ONEHOT_MATMUL_MAX_GROUPS:
        strategy = "dense"
    elif packable:
        strategy = "packed"       # bit-packed words; falls back to
    else:                         # multikey inside if a key needs >30 bits
        strategy = "multikey"
    return strategy, key_mins, key_ranges, domain


def referenced_columns(sel: A.Select, p) -> list[str]:
    """Sorted lower-cased names of every column the query touches."""
    referenced: set[str] = set()

    def walk(e):
        if isinstance(e, A.ColumnRef):
            referenced.add(e.name.lower())
        elif isinstance(e, A.BinOp):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, A.UnaryOp):
            walk(e.operand)
        elif isinstance(e, A.Call):
            for a in e.args:
                if not isinstance(a, A.Star):
                    walk(a)
        elif isinstance(e, A.CaseWhen):
            for cond, val in e.whens:
                walk(cond)
                walk(val)
            if e.default is not None:
                walk(e.default)

    for k in p["keys"]:
        walk(k)
    for _, expr, _ in p["projections"]:
        walk(expr)
    if p["where"] is not None:
        walk(p["where"])
    if p.get("having") is not None:
        walk(p.get("having"))
    for an, _asc in p.get("assume", ()):        # ordered plans
        referenced.add(an)
    return sorted(referenced)


def _refs(e: A.Expr) -> set[str]:
    """Lower-cased column names referenced by an expression."""
    out: set[str] = set()

    def walk(x):
        if isinstance(x, A.ColumnRef):
            out.add(x.name.lower())
        elif isinstance(x, A.BinOp):
            walk(x.left)
            walk(x.right)
        elif isinstance(x, A.UnaryOp):
            walk(x.operand)
        elif isinstance(x, A.Call):
            for a in x.args:
                if not isinstance(a, A.Star):
                    walk(a)
        elif isinstance(x, A.CaseWhen):
            for cond, val in x.whens:
                walk(cond)
                walk(val)
            if x.default is not None:
                walk(x.default)

    walk(e)
    return out


def _contains_logical(e: A.Expr) -> bool:
    if isinstance(e, A.BinOp):
        return (e.op in ("and", "or") or _contains_logical(e.left)
                or _contains_logical(e.right))
    if isinstance(e, A.UnaryOp):
        return e.op == "not" or _contains_logical(e.operand)
    if isinstance(e, A.Call):
        return any(_contains_logical(a) for a in e.args
                   if not isinstance(a, A.Star))
    return False


def nullable_gate(p, cols, col_order):
    """(nullable column names, bail reason | None) for the fused tiers.

    Handled in-program: nullable AGGREGATE-ARGUMENT columns — each agg
    lane masks its own rows (SQL skips NULL inputs; _build_lanes
    null_fn) with a per-agg non-null count for avg/var/corr/count(col).
    Must bail to the general executor: nullable group keys (the one-
    NULL-group needs sentinel key coding + output masks), nullable
    WHERE columns (Kleene 3-valued logic, engine/eval.py), nullable
    median args (the sorted middle must skip nulls), and and/or inside
    an agg arg over nullable columns (Kleene again)."""
    nullable = {nm for nm in col_order
                if nm in cols and getattr(cols[nm], "valid", None) is not None}
    if not nullable:
        return nullable, None
    for k in p["keys"]:
        if _refs(k) & nullable:
            return nullable, "nullable group key"
    if p["where"] is not None and _refs(p["where"]) & nullable:
        return nullable, "nullable WHERE column"
    for _fp, (kind, args) in _needed_scatters(p["aggs"]).items():
        argrefs = set()
        for a in args:
            if isinstance(a, A.Star):
                continue
            argrefs |= _refs(a)
        if not (argrefs & nullable):
            continue
        if kind == "median":
            return nullable, "nullable median argument"
        if any(_contains_logical(a) for a in args
               if not isinstance(a, A.Star)):
            return nullable, "Kleene logic inside nullable agg argument"
    return nullable, None


def narrow_sum_tags(scatters, cols, cap: int) -> frozenset:
    """Tags of integer sum lanes whose worst-case total fits int32
    (column-stats bound × row capacity < 2^31): ops.reduce reduces them
    with ONE plain int32 cumsum instead of the 64-bit limb-pair
    machinery — one extraction lane instead of two (h2o q3/q5 carry
    sum(v1)/sum(v2) this way)."""
    out = set()
    for fp, (kind, args) in scatters.items():
        if kind not in ("sum", "avg", "mean"):
            continue
        a = args[0] if args else None
        if not isinstance(a, A.ColumnRef) or a.name not in cols:
            continue
        c = cols[a.name]
        if getattr(c, "is_vector", False) or c.data.dtype.kind not in "iub":
            continue
        mn, mx = c.stats()
        bound = max(abs(int(mn)), abs(int(mx)), 1)
        if bound * cap < 2**31 - 1:
            out.add(fp + ":sum")
    return frozenset(out)


def _expr_bound(e, cols) -> int | None:
    """Conservative max |value| of a row expression from column stats,
    or None when unanalyzable. Float column stats are int-truncated
    (table.py stats) — widen by 1 to cover the fraction."""
    if isinstance(e, A.ColumnRef):
        c = cols.get(e.name) if hasattr(cols, "get") else None
        if c is None or getattr(c, "is_vector", False):
            return None
        if c.data.dtype.kind not in "iubf":
            return None
        mn, mx = c.stats()
        b = max(abs(int(mn)), abs(int(mx)))
        return b + 1 if c.data.dtype.kind == "f" else b
    if isinstance(e, A.Literal) and isinstance(e.value, (int, float)):
        import math
        return int(math.ceil(abs(e.value)))
    if isinstance(e, A.UnaryOp) and e.op == "-":
        return _expr_bound(e.operand, cols)
    if isinstance(e, A.BinOp) and e.op in ("+", "-", "*"):
        bl = _expr_bound(e.left, cols)
        br = _expr_bound(e.right, cols)
        if bl is None or br is None:
            return None
        return bl * br if e.op == "*" else bl + br
    return None


def lane_bounds(scatters, cols) -> dict[str, int]:
    """tag → max |value| for the additive lanes _build_lanes emits,
    from column stats (mirrors its tag naming). ops.reduce._mxu_reduce
    uses these to shrink digit-lane counts: q1's sum(v1), v1 ∈ [1,5],
    needs 1 base-128 digit, not the worst-case 5 (VERDICT r3 weak #5 —
    the dense tier's scan step is payload-width-bound)."""
    out: dict[str, int] = {}

    def put_float(tag: str, b: int) -> None:
        # add_float: coarse limb #A = round(v · 2^14)
        out[tag + "#A"] = b * (1 << 14) + 1

    for fp, (kind, args) in scatters.items():
        if kind in ("median", "count"):
            continue
        if kind == "corr":
            bx = _expr_bound(args[0], cols)
            by = _expr_bound(args[1], cols)
            if bx is None or by is None:
                continue
            x_int = _arg_is_int(args[0], cols)
            y_int = _arg_is_int(args[1], cols)
            if x_int and y_int:
                out[fp + ":sx"] = bx
                out[fp + ":sy"] = by
                out[fp + ":sxy"] = bx * by
                out[fp + ":sx2"] = bx * bx
                out[fp + ":sy2"] = by * by
            else:
                put_float(fp + ":sx", bx)
                put_float(fp + ":sy", by)
                put_float(fp + ":sxy", bx * by)
                put_float(fp + ":sx2", bx * bx)
                put_float(fp + ":sy2", by * by)
            continue
        b = _expr_bound(args[0], cols) if args else None
        if b is None:
            continue
        is_int = _arg_is_int(args[0], cols)
        if kind in ("sum", "avg", "mean"):
            if is_int:
                out[fp + ":sum"] = b
            else:
                put_float(fp + ":sum", b)
        if kind in ("var", "stddev"):
            if is_int:
                out[fp + ":sum"] = b
                out[fp + ":ssq"] = b * b
            else:
                put_float(fp + ":sum", b)
                put_float(fp + ":ssq", b * b)
    return out


def _arg_is_int(e, cols) -> bool:
    """Whether _build_lanes treats this agg argument as an integer lane
    (matches its v.dtype.kind checks via the referenced columns)."""
    for nm in _refs(e):
        c = cols.get(nm) if hasattr(cols, "get") else None
        if c is not None and c.data.dtype.kind == "f":
            return False
    if isinstance(e, A.Literal) and isinstance(e.value, float):
        return False
    return True


def sentinel_code_null_keys(p, table):
    """Nullable GROUP BY key columns → sentinel-coded substitute table
    (VERDICT r3 missing #4). SQL groups all NULL keys together, distinct
    from every real value: code NULL as (non-null max)+1 in a shallow
    table copy so every fused/distributed tier's key packing works
    unchanged, and remember the sentinel so _finish can restore the
    NULL mask on the output key column (the general path's
    _null_key_sentinel, executor.py, moved in front of the fast tiers).

    Returns (table', {key_name: sentinel}) or None when substitution
    does not apply (no nullable keys, non-int keys, sentinel overflow,
    or the key column is ALSO referenced outside the key position —
    WHERE/aggregate reads need real 3-valued logic, not a sentinel)."""
    cols = table.columns
    key_names = [k.name.lower() for k in p["keys"]
                 if isinstance(k, A.ColumnRef)]
    if len(key_names) != len(p["keys"]):
        return None
    nullable_keys = [kn for kn in key_names
                     if kn in cols
                     and getattr(cols[kn], "valid", None) is not None]
    if not nullable_keys:
        return None
    # the key column must not feed anything except the key itself
    other_refs: set[str] = set()
    for kindp, expr, _ in p["projections"]:
        if kindp != "key":
            other_refs |= _refs(expr)
    if p["where"] is not None:
        other_refs |= _refs(p["where"])
    if p.get("having") is not None:
        other_refs |= _refs(p["having"])
    for an, _asc in p.get("assume", ()):
        other_refs.add(an)
    if other_refs & set(nullable_keys):
        return None

    sents: dict[str, int] = {}
    new_cols = []
    for c in table.columns.values():
        nm = c.name.lower()
        if nm not in nullable_keys:
            new_cols.append(c)
            continue
        if c.data.dtype.kind not in "iu":
            return None
        mn, mx = c.stats()
        if mn > mx:            # all-NULL column: stats are sentinels
            mn, mx = 0, 0
        sent = int(mx) + 1
        if sent > jnp.iinfo(c.data.dtype).max:
            return None
        coded = jnp.where(c.valid, c.data,
                          jnp.asarray(sent, c.data.dtype))
        nc = Column(c.name, c.sqltype, coded, nrows=c.nrows,
                    dictionary=c.dictionary)
        nc._stats = (int(mn), sent)
        new_cols.append(nc)
        sents[nm] = sent
    t2 = Table.__new__(Table)
    t2.name = table.name
    t2.columns = CaseInsensitiveDict()
    t2.sorted_by = table.sorted_by
    for c in new_cols:
        t2.columns[c.name] = c
    if getattr(table, "shard_valid", None) is not None:
        t2.shard_valid = table.shard_valid
    return t2, sents


def make_null_fn(env_null):
    """null_fn for _build_lanes: arg exprs → OR of referenced columns'
    NULL masks (arithmetic/comparison over NULL is NULL), or None."""
    def nf(args):
        m = None
        for a in args:
            if isinstance(a, A.Star):
                continue
            for nm in _refs(a):
                mask = env_null.get(nm)
                if mask is not None:
                    m = mask if m is None else (m | mask)
        return m
    return nf


def run(session, sel: A.Select, table: Table) -> Table | None:
    """Try the fused path; returns the result Table or None."""
    try:
        p = plan(sel, table)
    except Unsupported:
        return None

    n = table.nrows
    if n == 0:
        return None

    # nullable GROUP BY keys: sentinel-code into a substitute table so
    # every tier below sees plain non-null keys (_finish restores the
    # NULL-group mask from p["key_sentinels"])
    sub = sentinel_code_null_keys(p, table)
    if sub is not None:
        table, p["key_sentinels"] = sub
    cols = table.columns

    # Key stats → packed-code domain → strategy choice (shared with the
    # distributed executor, engine/dist_query.py)
    chosen = choose_strategy(p, cols)
    if chosen is None:
        return None               # general path computes median
    strategy, key_mins, key_ranges, domain = chosen

    scatters = _needed_scatters(p["aggs"])
    key_names = [k.name.lower() for k in p["keys"]
                 if isinstance(k, A.ColumnRef)]

    # only the columns the query actually references; nullable agg-arg
    # columns ride in-program (validity masks as extra lane inputs),
    # nullable keys/WHERE bail to the 3-valued general executor
    col_order = referenced_columns(sel, p)
    nullable, bail = nullable_gate(p, cols, col_order)
    if bail:
        return None
    null_order = sorted(nullable)
    arrays = ([cols[name].data for name in col_order]
              + [cols[nm].valid for nm in null_order])

    # stats-driven digit bounds for the MXU tier: fingerprint on the
    # DERIVED digit counts (stable across appends until a lane actually
    # needs another digit — avoids recompiling on every stats change)
    lbounds = lane_bounds(scatters, cols)
    from aquery2_tpu.ops.reduce import _digits_for_bound, bound_bucket
    bounds_fp = tuple(sorted((t, _digits_for_bound(b), bound_bucket(b))
                             for t, b in lbounds.items()))

    fingerprint = (
        strategy,
        repr(sel.group_by), repr([pr[1] for pr in p["projections"]]),
        repr(p["where"]), repr(p["having"]),
        tuple(key_mins), tuple(key_ranges), tuple(null_order),
        bounds_fp,
        tuple((a.shape[0], str(a.dtype)) for a in arrays),
    )
    if strategy == "multikey":
        return _run_sort(session, sel, table, p, col_order, arrays,
                         fingerprint, n, null_order)
    if strategy == "packed":
        return _run_sort_packed(session, sel, table, p, col_order, arrays,
                                fingerprint, n, key_mins, key_ranges,
                                null_order)
    entry = _cache.get(fingerprint)
    if entry is None:
        def sum_dtype_for(dt):
            dt = jnp.dtype(dt)
            if dt.kind == "f":
                return jnp.dtype(jnp.float64)
            return jnp.dtype(jnp.int64)

        stage1, dom, strides = _make_stage1(
            key_names, key_mins, key_ranges, scatters, p["where"],
            jnp.int64, sum_dtype_for, bounds=lbounds)
        stage1.col_order = col_order
        stage1.null_order = null_order
        gcap = config.bucket_size(dom)
        key_dtypes = [cols[kn].data.dtype for kn in key_names]

        # ONE jitted program per query×shape: rows → compacted group
        # columns (domain-bucket sized) + group count. The only
        # device→host sync per query is the num_groups pull at the end
        # (tunnel scalar pulls cost ~30 ms; never pay more than one).
        def fused(nn, *arrs):
            outs, num_groups = stage1(nn, *arrs)
            counts_all = outs["__counts__"]
            present = counts_all[:dom] > 0
            from aquery2_tpu.ops.reduce import compact_indices
            ucodes = compact_indices(present, gcap, fill=dom)
            safe = jnp.minimum(ucodes, dom)
            gathered = {fp_tag: arr[safe] for fp_tag, arr in outs.items()}
            counts = counts_all[safe]
            results = []
            for kindp, expr, alias in p["projections"]:
                if kindp == "key":
                    ki = key_names.index(expr.name.lower())
                    kv = ((ucodes.astype(jnp.int64) // strides[ki])
                          % key_ranges[ki] + key_mins[ki])
                    results.append(kv.astype(key_dtypes[ki]))
                else:
                    results.append(_post_agg_eval(expr, gathered, counts, None))
            if p["having"] is not None:
                results.append(_post_agg_eval(p["having"], gathered,
                                              counts, None))
            return results, num_groups

        fused_jit = jax.jit(fused)
        entry = (fused_jit, dom, gcap)
        _cache[fingerprint] = entry

    fused_jit, dom, gcap = entry
    results, num_groups = fused_jit(n, *arrays)
    g = int(num_groups)          # the single sync
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < gcap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return _finish(session, p, cols, results, g, having=hv)


# --------------------------------------------------------------------- #
# sort strategy (compound keys with huge domains, e.g. h2o q10)
# --------------------------------------------------------------------- #

def _sentinel_max(dt):
    dt = jnp.dtype(dt)
    if dt.kind == "f":
        return jnp.inf
    if dt == jnp.bool_:
        return True
    return jnp.iinfo(dt).max


def _sentinel_min(dt):
    dt = jnp.dtype(dt)
    if dt.kind == "f":
        return -jnp.inf
    if dt == jnp.bool_:
        return False
    return jnp.iinfo(dt).min


def _key_index(keys, expr) -> int:
    """Index of a projected key expression in the GROUP BY list —
    by name for column refs, by AST equality for computed keys."""
    for i, k in enumerate(keys):
        if k == expr:
            return i
        if (isinstance(k, A.ColumnRef) and isinstance(expr, A.ColumnRef)
                and k.name.lower() == expr.name.lower()):
            return i
    raise Unsupported(f"projection {expr} is not a group key")


def _split_sorted_payload(sorted_res, noff, tag_groups):
    """Unpack lax.sort results back into the lane dicts."""
    it = iter(sorted_res[noff:])
    return tuple({t: next(it) for t in tags} for tags in tag_groups)


def _lane_payload(lanes):
    """Fixed-order payload list + tag groups for a lax.sort carry."""
    add, mins, maxs, f64s = lanes
    tag_groups = (list(add), list(mins), list(maxs), list(f64s))
    payload = ([add[t] for t in tag_groups[0]]
               + [mins[t] for t in tag_groups[1]]
               + [maxs[t] for t in tag_groups[2]]
               + [f64s[t] for t in tag_groups[3]])
    return payload, tag_groups


def _finish(session, p, cols, results, g, having=None):
    """Materialize the output Table from per-projection padded arrays;
    `having` is an optional [≥g] boolean group mask."""
    from aquery2_tpu.engine.executor import (_derive_name, _limit_table,
                                             _take_table)

    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    used: dict[str, int] = {}
    sents = p.get("key_sentinels") or {}
    for (kindp, expr, alias), arr in zip(p["projections"], results):
        name = alias or _derive_name(expr)
        lk = name.lower()
        if lk in used:
            used[lk] += 1
            name = f"{name}_{used[lk]}"
        else:
            used[lk] = 0
        if kindp == "key" and isinstance(expr, A.ColumnRef):
            src = cols[expr.name]
            valid = None
            sent = sents.get(expr.name.lower())
            if sent is not None:        # restore the NULL-group key
                valid = arr != jnp.asarray(sent, arr.dtype)
                arr = jnp.where(valid, arr, jnp.zeros((), arr.dtype))
            out.columns[name] = Column(name, src.sqltype, arr, nrows=g,
                                       dictionary=src.dictionary,
                                       valid=valid)
        else:
            st = (T.from_np_dtype(np.dtype(arr.dtype))
                  if arr.dtype != jnp.bool_ else T.BoolT)
            out.columns[name] = Column(name, st, arr, nrows=g)

    if having is not None and g:
        keep = np.nonzero(np.asarray(having[:g]).astype(bool))[0]
        out = _take_table(out, keep)

    if p.get("order_by") and out.nrows:
        from aquery2_tpu.engine.executor import _sort_key_of
        from aquery2_tpu.ops.sort import sort_perm

        gn = out.nrows
        names = out.column_names()
        skeys = [(jnp.asarray(_sort_key_of(out.columns[names[pi]], gn)), asc)
                 for pi, asc in p["order_by"]]
        perm = np.asarray(sort_perm(skeys, gn))[:gn]
        out = _take_table(out, perm)

    if p["limit"] is not None:
        out = _limit_table(out, p["limit"])
    if p["into_table"]:
        out.name = p["into_table"]
        session.catalog.create(out, replace=True)
    if p["into_outfile"]:
        from aquery2_tpu.storage.result import Result

        Result(out).to_csv(session.resolve_path(p["into_outfile"]),
                           sep=p["outfile_sep"], header=False)
    return out


_WORD_BITS = 30          # data bits per packed int32 word (bit 30 = sentinel)


def _plan_words(key_ranges):
    """Assign each key a (word, shift, bits) bit-field, declared order,
    most-significant first, never straddling a word — so lexicographic
    order of the word tuple == lexicographic order of the keys.
    Returns (fields, nwords) or None if some key needs > 30 bits."""
    bits = [max(1, (r - 1).bit_length()) for r in key_ranges]
    if any(b > _WORD_BITS for b in bits):
        return None
    words: list[list[int]] = [[]]
    for ki, b in enumerate(bits):
        if sum(bits[i] for i in words[-1]) + b > _WORD_BITS:
            words.append([])
        words[-1].append(ki)
    fields = {}
    for wi, kis in enumerate(words):
        used = sum(bits[ki] for ki in kis)
        shift = used
        for ki in kis:
            shift -= bits[ki]
            fields[ki] = (wi, shift, bits[ki])
    return fields, len(words)


def _collect_carriers(scatters, env):
    """Raw scatter-argument row values to ride a sort as payload.

    Reduction lanes (limb splits for exact f32 sums, int64 squares/
    products for var/corr, identity masking) are built AFTER the sort
    from these carried values: the sort payload stays as narrow as the
    source data — at 2^27-row capacity every extra 32-bit lane costs
    ~1 GB of sort traffic, and the pre-refactor form (2 f32 limb lanes
    per f32 sum, int64 product lanes for corr) OOM'd h2o q10 at 1e8
    rows on a 16 GB chip."""
    keys: list[str] = []
    rows = []
    seen: set[str] = set()
    for _fp, (kind, cargs) in scatters.items():
        if kind in ("count", "median"):
            continue
        for a in cargs:
            if isinstance(a, A.Star):
                continue
            ck = repr(a)
            if ck not in seen:
                seen.add(ck)
                keys.append(ck)
                rows.append(_row_eval(a, env))
    return keys, rows


def _plan_carrier_pack(scatters, cols, null_order):
    """Static bit-pack plan for sort-payload carriers.

    Every extra 32-bit payload operand costs ~1.55 ns/row of sort time
    (measured v5e, ops/reduce.py) — at 1e8 rows that is ~155 ms. Plain
    int-column carriers with stats-bounded ranges, and the 1-bit null
    masks, pack losslessly into shared ≤30-bit words (h2o q5: v1 3 bits
    + v2 4 bits → ONE payload word instead of two). Returns a list of
    words, each a list of (carrier_key, source, mn, bits, shift,
    dtype_str) with source = column name or None for the "\\0null:nm"
    mask lanes; only words holding ≥2 members are emitted (packing a
    lone carrier is a wash)."""
    if isinstance(scatters, list):          # pre-enumerated candidates
        fields = scatters
    else:
        fields = _carrier_fields(scatters, cols, null_order)
    # greedy first-fit into ≤30-bit words, largest fields first
    fields.sort(key=lambda f: -f[3])
    words: list[list] = []
    used: list[int] = []
    for f in fields:
        for wi, u in enumerate(used):
            if u + f[3] <= 30:
                words[wi].append(f)
                used[wi] += f[3]
                break
        else:
            words.append([f])
            used.append(f[3])
    plan = []
    for w in words:
        if len(w) < 2:
            continue
        shift = 0
        members = []
        for ck, src, mn, bits, dt in w:
            members.append((ck, src, mn, bits, shift, dt))
            shift += bits
        plan.append(members)
    return plan


def _plan_extract_words(fields, nkeys):
    """Re-pack the key bit-fields into the fewest 32-bit EXTRACTION
    words. Sort-key words spend ≤30 bits (bit 30 is the validity
    sentinel) and fields never straddle them, so h2o q10's 64 key bits
    occupy three words — but extraction lanes at group ends only carry
    VALID rows, so the full 32 bits are usable: 64 bits re-pack into
    two lanes, saving one full-size payload lane (~155 ms at 1e8 rows).
    Returns (efields: ki → (ewi, eshift, bits), n_ewords) or None when
    no lane is saved."""
    bits = [fields[ki][2] for ki in range(nkeys)]
    order = sorted(range(nkeys), key=lambda k: -bits[k])
    used: list[int] = []
    efields: dict[int, tuple[int, int, int]] = {}
    for ki in order:
        for wi, u in enumerate(used):
            if u + bits[ki] <= 32:
                efields[ki] = (wi, u, bits[ki])
                used[wi] += bits[ki]
                break
        else:
            efields[ki] = (len(used), 0, bits[ki])
            used.append(bits[ki])
    nwords = 1 + max(fields[ki][0] for ki in range(nkeys))
    if len(used) >= nwords:
        return None
    return efields, len(used)


def _carrier_fields(scatters, cols, null_order):
    """Candidate (carrier_key, src, mn, bits, dtype) tuples for bit-level
    placement: plain int-column scatter args with stats-bounded ranges
    plus the 1-bit null masks. Shared by the key-word embed plan and the
    payload pack plan."""
    fields = []
    seen: set[str] = set()
    for _fp, (kind, cargs) in scatters.items():
        if kind in ("count", "median"):
            continue
        for a in cargs:
            if isinstance(a, A.Star) or not isinstance(a, A.ColumnRef):
                continue
            ck = repr(a)
            if ck in seen:
                continue
            seen.add(ck)
            c = cols.get(a.name)
            if c is None or c.data.dtype.kind not in "iub":
                continue
            if c.data.dtype == jnp.bool_:
                mn, bits = 0, 1
            else:
                mn, mx = (int(x) for x in c.stats())
                bits = max(1, (mx - mn).bit_length())
            if bits > 24:
                continue
            fields.append((ck, a.name.lower(), mn, bits,
                           str(c.data.dtype)))
    for nm in null_order:
        fields.append(("\0null:" + nm, None, 0, 1, "bool"))
    return fields


def _plan_embed_carriers(fields, nwords, nkeys, cands):
    """Place carrier bit-fields into the sort-key words' SPARE low bits
    (key fields shift up to make room) — each embedded carrier deletes
    a whole payload operand from the sort (~155 ms at 1e8 rows; h2o q3
    drops from 3 sort operands to 2). Carrier bits sit BELOW every key
    field, so word order still groups equal keys contiguously; boundary
    detection masks them off (>> cbits). Disabled under median (the
    median argument must be the first varying subkey within a group).
    Returns (embeds: list of (ck, src, mn, bits, wi, eshift, dtype),
    cbits: per-word embedded-bit totals)."""
    used = [0] * nwords
    for ki in range(nkeys):
        wi, shift, b = fields[ki]
        used[wi] = max(used[wi], shift + b)
    cbits = [0] * nwords
    embeds = []
    for ck, src, mn, bits, dt in sorted(cands, key=lambda f: -f[3]):
        for wi in range(nwords):
            if used[wi] + cbits[wi] + bits <= _WORD_BITS:
                embeds.append((ck, src, mn, bits, wi, cbits[wi], dt))
                cbits[wi] += bits
                break
    return embeds, cbits


def _run_sort_packed(session, sel, table, p, col_order, arrays, fingerprint,
                     n, key_mins, key_ranges, null_order=()):
    """Packed-code sort group-by: one jitted program —

        pack keys into bit-fields of one-or-more int32 words (perfect-
        hash packing from column stats, reference hasher.h:209-322) →
        sort on the word tuple carrying reduction lanes as payload →
        cumsum + boundary-gather segment reduction → keys decoded by
        shift/mask per group. Everything stays int32: int64 arithmetic
        is emulated on TPU (a 64-bit divide is ~50 native ops/element).

    This is the workhorse tier: a sort costs ~3-6 ns/row on v5e while a
    64-bit scatter costs ~130 — so sort once, never scatter row data.
    Group order is word-ascending (= key-lexicographic)."""
    from aquery2_tpu.ops import reduce as R

    cols = table.columns
    key_names = [k.name.lower() for k in p["keys"]]
    scatters = _needed_scatters(p["aggs"])
    cap = int(arrays[0].shape[0])
    narrow = narrow_sum_tags(scatters, cols, cap)

    plan_w = _plan_words(key_ranges)
    if plan_w is None:
        # a single key wider than 30 bits: arithmetic int64 packing would
        # need emulated div/mod decode; the multi-key sort handles it
        pack_plan = _plan_carrier_pack(scatters, cols, null_order)
        return _run_sort(session, sel, table, p, col_order, arrays,
                         fingerprint + (tuple(sorted(narrow)),
                                        repr(pack_plan)), n, null_order)
    fields, nwords = plan_w
    # key-word spare-bit embeds first (delete a whole operand each),
    # then pack what remains into shared payload words
    cands = _carrier_fields(scatters, cols, null_order)
    if p["has_median"]:
        embeds, cbits = [], [0] * nwords
    else:
        embeds, cbits = _plan_embed_carriers(fields, nwords,
                                             len(key_names), cands)
    embedded_keys = {e[0] for e in embeds}
    pack_plan = _plan_carrier_pack(
        [c for c in cands if c[0] not in embedded_keys], cols, null_order)
    fingerprint = fingerprint + (tuple(sorted(narrow)), repr(pack_plan),
                                 repr(embeds))
    if any(cbits):
        # shift every key field above its word's embedded carrier bits
        fields = {ki: (wi, shift + cbits[wi], b)
                  for ki, (wi, shift, b) in fields.items()}
    eplan = _plan_extract_words(fields, len(key_names))
    domain = 1
    for r in key_ranges:
        domain *= r
    gcap = config.bucket_size(min(domain, cap))
    key_dtypes = [cols[kn].data.dtype for kn in key_names]
    sentinel = jnp.int32(1 << _WORD_BITS)

    entry = _cache.get(fingerprint)
    if entry is None:
        def fused_ps(nn, *arrs):
            env = dict(zip(col_order, arrs))
            env_null = {nm: ~v for nm, v in
                        zip(null_order, arrs[len(col_order):])}
            idx = jnp.arange(cap, dtype=jnp.int32)
            valid = idx < nn
            if p["where"] is not None:
                w = _row_eval(p["where"], env)
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            wvals = [jnp.zeros((cap,), jnp.int32) for _ in range(nwords)]
            for ki, kn in enumerate(key_names):
                wi, shift, _b = fields[ki]
                kv = (env[kn] - jnp.asarray(key_mins[ki], env[kn].dtype))
                wvals[wi] = wvals[wi] | (kv.astype(jnp.int32) << shift)
            # carriers embedded in the key words' spare LOW bits (below
            # every key field — grouping order is unaffected; boundary
            # detection shifts them off)
            for ck_e, src_e, mn_e, bits_e, wi_e, esh_e, dt_e in embeds:
                rv = (env_null[ck_e[len("\0null:"):]] if src_e is None
                      else env[src_e])
                if rv.dtype == jnp.bool_:
                    off = rv.astype(jnp.int32)
                else:
                    off = (rv - jnp.asarray(mn_e, rv.dtype)
                           ).astype(jnp.int32)
                off = off & ((1 << bits_e) - 1)
                wvals[wi_e] = wvals[wi_e] | (off << esh_e)
            wvals = [jnp.where(valid, wv, sentinel) for wv in wvals]

            # median argument becomes a SECONDARY sort key: within each
            # group the sorted run is value-ascending, so the middles sit
            # at computable offsets (reference sorts per group instead —
            # the "x4" note that made it disable h2o q6)
            med_fps = [fp for fp, (kind, _) in scatters.items()
                       if kind == "median"]
            med_keys = []
            if med_fps:
                med_keys = [_row_eval(scatters[med_fps[0]][1][0], env)]

            carrier_keys, carrier_rows = _collect_carriers(scatters, env)
            # null masks of nullable agg-arg columns ride the sort too
            for nm in null_order:
                carrier_keys.append("\0null:" + nm)
                carrier_rows.append(env_null[nm])
            # bit-pack small-ranged carriers into shared payload words
            # (one fewer sort operand ≈ 155 ms at 1e8 rows); embedded
            # carriers already ride the key words
            packed_members = {m[0] for w in pack_plan for m in w} \
                | embedded_keys
            if packed_members:
                rows_by_key = dict(zip(carrier_keys, carrier_rows))
                carrier_keys = [k for k in carrier_keys
                                if k not in packed_members]
                carrier_rows = [rows_by_key[k] for k in carrier_keys]
                for wi_p, members in enumerate(pack_plan):
                    wv = jnp.zeros((cap,), jnp.int32)
                    for ck, src, mn, bits_p, shift, _dt in members:
                        rv = rows_by_key[ck]
                        # subtract mn in the SOURCE dtype (an int64
                        # column's mn can exceed int32 even when its
                        # range packs into a few bits)
                        if rv.dtype == jnp.bool_:
                            off = rv.astype(jnp.int32)
                        else:
                            off = (rv - jnp.asarray(mn, rv.dtype)
                                   ).astype(jnp.int32)
                        # mask to the field width: pad rows beyond
                        # nrows and NULL sentinels carry out-of-stats
                        # garbage that must not bleed into neighboring
                        # fields (the null-mask bit rides this word)
                        off = off & ((1 << bits_p) - 1)
                        wv = wv | (off << shift)
                    carrier_keys.append(f"\0pack{wi_p}")
                    carrier_rows.append(wv)
            nk = nwords + len(med_keys)
            sorted_res = jax.lax.sort([*wvals, *med_keys, *carrier_rows],
                                      num_keys=nk, is_stable=False)
            scw = sorted_res[:nwords]
            med_sorted = sorted_res[nwords:nk]
            carriers_s = dict(zip(carrier_keys, sorted_res[nk:]))
            for wi_p, members in enumerate(pack_plan):
                pw = carriers_s.pop(f"\0pack{wi_p}")
                for ck, src, mn, bits, shift, dt in members:
                    uv = (pw >> shift) & ((1 << bits) - 1)
                    if dt == "bool":
                        carriers_s[ck] = uv != 0
                    else:
                        odt = jnp.dtype(dt)
                        carriers_s[ck] = (uv.astype(odt)
                                          + jnp.asarray(mn, odt))
            for ck_e, _src, mn_e, bits_e, wi_e, esh_e, dt_e in embeds:
                uv = (scw[wi_e] >> esh_e) & ((1 << bits_e) - 1)
                if dt_e == "bool":
                    carriers_s[ck_e] = uv != 0
                else:
                    odt = jnp.dtype(dt_e)
                    carriers_s[ck_e] = (uv.astype(odt)
                                        + jnp.asarray(mn_e, odt))
            null_fn = (make_null_fn({nm: carriers_s["\0null:" + nm]
                                     for nm in null_order})
                       if null_order else None)

            dif = jnp.zeros((cap - 1,), jnp.bool_)
            for wi_d, sw in enumerate(scw):
                # mask off embedded carrier bits: rows of one group
                # share keys but differ in carriers (the sentinel word
                # 2^30 still shifts to a value above every key)
                swk = (sw >> cbits[wi_d]) if cbits[wi_d] else sw
                dif = dif | (swk[1:] != swk[:-1])
            starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
            valid_s = scw[0] < sentinel
            last = jnp.concatenate([dif, jnp.ones((1,), jnp.bool_)]) & valid_s

            add_s, mins_s, maxs_s, f64s_s = _build_lanes(
                {}, valid_s, scatters,
                eval_fn=lambda e: carriers_s[repr(e)], null_fn=null_fn)
            add_s.pop("__counts__")         # counts come from boundary idx
            if eplan is not None:
                # re-pack key fields into fewer (full-32-bit) extraction
                # lanes — elementwise on the sorted words, saves whole
                # payload lanes in the carrying compaction sort
                efields, newords = eplan
                ewords = [jnp.zeros((cap,), jnp.int32)
                          for _ in range(newords)]
                for ki in range(len(key_names)):
                    wi, shift, b = fields[ki]
                    ewi, eshift, _b = efields[ki]
                    v = (scw[wi] >> shift) & ((1 << b) - 1)
                    ewords[ewi] = ewords[ewi] | (v << eshift)
                extract = {f"__eword{k}": ewords[k] for k in range(newords)}
            else:
                extract = {f"__word{wi}": scw[wi] for wi in range(nwords)}
            outs, ends_idx, ng = R.sorted_group_reduce(
                starts, last, add_s, mins_s, maxs_s, f64s_s, gcap,
                counts_from_ends="__counts__",
                extract=extract,
                narrow_tags=narrow)
            counts = outs["__counts__"]
            if med_fps:
                sv = med_sorted[0]
                starts_g = ends_idx - (counts - 1)
                lo_i = jnp.clip(starts_g + (counts - 1) // 2, 0, cap - 1)
                hi_i = jnp.clip(starts_g + counts // 2, 0, cap - 1)
                outs[med_fps[0] + ":median"] = (
                    sv[lo_i].astype(jnp.float64)
                    + sv[hi_i].astype(jnp.float64)) * 0.5
            results = []
            for kindp, expr, alias in p["projections"]:
                if kindp == "key":
                    ki = key_names.index(expr.name.lower())
                    if eplan is not None:
                        ewi, eshift, b = eplan[0][ki]
                        word = outs[f"__eword{ewi}"]
                        shift = eshift
                    else:
                        wi, shift, b = fields[ki]
                        word = outs[f"__word{wi}"]
                    kdt = key_dtypes[ki]
                    kv = ((word >> shift) & ((1 << b) - 1)
                          ).astype(kdt) + jnp.asarray(key_mins[ki], kdt)
                    results.append(kv)
                else:
                    results.append(_post_agg_eval(expr, outs, counts, None))
            if p["having"] is not None:
                results.append(_post_agg_eval(p["having"], outs,
                                              counts, None))
            return results, ng

        entry = jax.jit(fused_ps)
        _cache[fingerprint] = entry

    results, num_groups = entry(n, *arrays)
    g = int(num_groups)
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < gcap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return _finish(session, p, cols, results, g, having=hv)


def _run_sort(session, sel, table, p, col_order, arrays, fingerprint, n,
              null_order=()):
    """Multi-key sort group-by (fallback for unpackable keys: float/huge
    ranges): lexicographic multi-operand sort carrying reduction lanes →
    boundary flags from all key columns → cumsum + boundary-gather
    reduction; representative keys gathered at group end rows.

    Group order is key-lexicographic ascending. This is the generic tier
    of the reference's two-tier hash design (hasher.h AQHashTable)
    expressed as an on-device sort (collision-free, deterministic, maps
    to XLA's sort HLO)."""
    from aquery2_tpu.ops import reduce as R

    cols = table.columns
    keys = p["keys"]
    scatters = _needed_scatters(p["aggs"])
    cap = int(arrays[0].shape[0])
    narrow = narrow_sum_tags(scatters, cols, cap)
    fingerprint = fingerprint + (tuple(sorted(narrow)),)

    entry = _cache.get(fingerprint)
    if entry is None:
        def fused_sort(nn, *arrs):
            env = dict(zip(col_order, arrs))
            env_null = {nm: ~v for nm, v in
                        zip(null_order, arrs[len(col_order):])}
            idx = jnp.arange(cap, dtype=jnp.int32)
            valid = idx < nn
            if p["where"] is not None:
                w = _row_eval(p["where"], env)
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            # validity rides as the MOST SIGNIFICANT sort key (invalid
            # rows sort strictly after every valid group), so a valid
            # group whose key happens to equal the dtype max can never
            # interleave with invalid rows — no sentinel key values
            invalid = ~valid
            ops = [_row_eval(ke, env) for ke in keys]
            # raw scatter args ride the sort as extra operands — a random
            # gather costs as much as the whole sort on TPU (~9 ns/row);
            # reduction lanes are built post-sort (_collect_carriers)
            carrier_keys, carrier_rows = _collect_carriers(scatters, env)
            for nm in null_order:           # null masks ride the sort too
                carrier_keys.append("\0null:" + nm)
                carrier_rows.append(env_null[nm])
            sorted_res = jax.lax.sort(
                [invalid, *ops, *carrier_rows], num_keys=1 + len(ops),
                is_stable=False)
            valid_s = ~sorted_res[0]
            sorted_keys = sorted_res[1:1 + len(ops)]
            carriers_s = dict(zip(carrier_keys, sorted_res[1 + len(ops):]))
            null_fn = (make_null_fn({nm: carriers_s["\0null:" + nm]
                                     for nm in null_order})
                       if null_order else None)
            add_s, mins_s, maxs_s, f64s_s = _build_lanes(
                {}, valid_s, scatters,
                eval_fn=lambda e: carriers_s[repr(e)], null_fn=null_fn)

            dif = sorted_res[0][1:] != sorted_res[0][:-1]
            for sk in sorted_keys:
                dif = dif | (sk[1:] != sk[:-1])
            starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
            last = jnp.concatenate([dif, jnp.ones((1,), jnp.bool_)]) & valid_s
            outs, ends_idx, ng = R.sorted_group_reduce(
                starts, last, add_s, mins_s, maxs_s, f64s_s, cap,
                extract={f"__key{ki}": sorted_keys[ki]
                         for ki in range(len(keys))},
                narrow_tags=narrow)
            counts = outs["__counts__"]
            results = []
            for kindp, expr, alias in p["projections"]:
                if kindp == "key":
                    ki = _key_index(keys, expr)
                    results.append(outs[f"__key{ki}"])
                else:
                    results.append(_post_agg_eval(expr, outs, counts, None))
            if p["having"] is not None:
                results.append(_post_agg_eval(p["having"], outs,
                                              counts, None))
            return results, ng

        entry = jax.jit(fused_sort)
        _cache[fingerprint] = entry

    results, num_groups = entry(n, *arrays)
    g = int(num_groups)
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < cap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return _finish(session, p, cols, results, g, having=hv)
