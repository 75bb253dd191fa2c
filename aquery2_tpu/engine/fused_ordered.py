"""Fused ordered/windowed grouped queries: one XLA program.

Covers the AQuery time-series signature the reference executes via its
C++ post-processing stage (engine/ast.py groupby_c :620-794 + the
window kernels of aggregations.h):

    SELECT key..., wexpr..., agg(wexpr)...
    FROM t [ASSUMING ASC/DESC cols] [WHERE rowpred]
    [GROUP BY keys]

e.g. trades q7  `SELECT sym, avgs(5, price) ... ASSUMING ASC time GROUP BY sym`
     trades q10 `SELECT sym, MAX(stddevs(3, price)) ... GROUP BY sym`
     h2o q8     `SELECT id6, subvec(v3, 0, 2) ... GROUP BY id6`

Pipeline, traced once per query×shape (single device dispatch):

  1. validity (+ WHERE) mask
  2. ONE multi-key sort: [invalid, group keys..., assumption cols...,
     iota?] — group-major, assumption-ordered within groups. Key and
     assume columns are NOT re-carried as payload (they reconstruct
     from their sorted key operands), and the iota tiebreak drops when
     every referenced column is a key/assume column — h2o q8 sorts 3
     operands where round 2 sorted 6
  3. boundary flags → dense group ids + per-row positions
  4. windowed/running expressions via ops.scan segmented kernels
  5. aggregates via the shared sorted reduction, group outputs sized to
     the key-domain bound from column stats (not the row count)
  6. outputs: per-group scalars [gout] and ragged row values (sorted
     layout) + per-group counts — host assembles VectorColumns after the
     single num_groups sync
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.engine import fused_groupby as fg
from aquery2_tpu.ops import scan, segment
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, Table, VectorColumn
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_WINDOW_NAMES = set(scan.RUNNING) | set(scan.WINDOWED) | {"subvec"}

_cache: dict[tuple, Any] = {}


class Unsupported(fg.Unsupported):
    pass


# --------------------------------------------------------------------- #
# planning
# --------------------------------------------------------------------- #

def _is_window_call(e: A.Expr) -> bool:
    return isinstance(e, A.Call) and e.func in _WINDOW_NAMES


def _contains_window(e: A.Expr) -> bool:
    if _is_window_call(e):
        return True
    if isinstance(e, A.BinOp):
        return _contains_window(e.left) or _contains_window(e.right)
    if isinstance(e, A.UnaryOp):
        return _contains_window(e.operand)
    if isinstance(e, A.Call):
        return any(_contains_window(a) for a in e.args
                   if not isinstance(a, A.Star))
    return False


def _check_ordered_row_expr(e: A.Expr, cols) -> None:
    """Row expr possibly containing windowed calls."""
    if isinstance(e, A.Call) and e.func in _WINDOW_NAMES:
        args = list(e.args)
        if e.func == "subvec":
            if len(args) != 3:
                raise Unsupported("subvec arity")
            _check_ordered_row_expr(args[0], cols)
            for a in args[1:]:
                if not isinstance(a, A.Literal):
                    raise Unsupported("subvec bounds must be literals")
            return
        if len(args) == 2:
            if not isinstance(args[0], A.Literal):
                raise Unsupported("window size must be a literal")
            args = args[1:]
        for a in args:
            _check_ordered_row_expr(a, cols)
        return
    if isinstance(e, A.Call) and e.func in fg._MATH:
        for a in e.args:
            _check_ordered_row_expr(a, cols)
        return
    if isinstance(e, A.BinOp):
        _check_ordered_row_expr(e.left, cols)
        _check_ordered_row_expr(e.right, cols)
        return
    if isinstance(e, A.UnaryOp):
        _check_ordered_row_expr(e.operand, cols)
        return
    fg._check_row_expr(e, cols)


def plan(sel: A.Select, table: Table):
    if (sel.having or sel.distinct or sel.unions or sel.order_by
            or sel.limit is not None):
        raise Unsupported("clause mix")
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        raise Unsupported("joins")
    if not sel.group_by:
        raise Unsupported("ungrouped ordered queries use the general path")
    cols = table.columns

    any_window = False
    keys: list[A.ColumnRef] = []
    for g in sel.group_by:
        if not isinstance(g, A.ColumnRef) or g.name not in cols:
            raise Unsupported("non-column group key")
        c = cols[g.name]
        if getattr(c, "is_vector", False):
            raise Unsupported("vector key")
        if not (c.sqltype.kind in ("int", "bool") or c.sqltype.is_string
                or c.sqltype.is_temporal):
            raise Unsupported("non-integer key")
        keys.append(g)

    assume: list[tuple[str, bool]] = []
    for a in sel.assumptions:
        if a.col.name not in cols:
            raise Unsupported("unknown assumption column")
        c = cols[a.col.name]
        if getattr(c, "is_vector", False) or c.sqltype.is_string:
            raise Unsupported("string/vector assumption column")
        assume.append((a.col.name.lower(), a.ascending))

    if sel.where is not None:
        fg._check_row_expr(sel.where, cols)

    projections = []   # (kind, expr, alias): 'key' | 'row' | 'agg'
    aggs: list[A.Call] = []
    keyset = {k.name.lower() for k in keys}
    for p in sel.projections:
        e = p.expr
        if isinstance(e, A.Star):
            raise Unsupported("star")
        if isinstance(e, A.ColumnRef):
            if e.name.lower() not in keyset:
                raise Unsupported("bare non-key column (general path handles)")
            projections.append(("key", e, p.alias))
            continue
        if _contains_window(e) and not _agg_on_top(e):
            _check_ordered_row_expr(e, cols)
            any_window = True
            projections.append(("row", e, p.alias))
            continue
        # aggregate (possibly over windowed rows)
        before = len(aggs)
        _collect_ordered_aggs(e, cols, aggs)
        if len(aggs) == before:
            raise Unsupported("projection without aggregate")
        if any(_contains_window(a) for call in aggs[before:]
               for a in call.args if not isinstance(a, A.Star)):
            any_window = True
        projections.append(("agg", e, p.alias))
    if not any_window and not assume:
        raise Unsupported("no ordered features — plain fused path handles")
    return {"keys": keys, "assume": assume, "projections": projections,
            "aggs": aggs, "where": sel.where,
            "into_table": sel.into_table, "into_outfile": sel.into_outfile,
            "outfile_sep": sel.outfile_sep}


def _agg_on_top(e: A.Expr) -> bool:
    return isinstance(e, A.Call) and e.func in fg._SIMPLE_AGGS


def _collect_ordered_aggs(e: A.Expr, cols, out: list[A.Call]) -> None:
    if isinstance(e, A.Literal):
        return
    if isinstance(e, A.Call):
        if e.func in fg._SIMPLE_AGGS:
            if e.func == "median":
                raise Unsupported("median needs the packed-sort layout")
            for a in e.args:
                if not isinstance(a, A.Star):
                    _check_ordered_row_expr(a, cols)
            out.append(e)
            return
        if e.func == "count" and (not e.args or isinstance(e.args[0], A.Star)):
            out.append(e)
            return
        if e.func in fg._MATH:
            for a in e.args:
                _collect_ordered_aggs(a, cols, out)
            return
        raise Unsupported(f"call {e.func}")
    if isinstance(e, A.BinOp):
        _collect_ordered_aggs(e.left, cols, out)
        _collect_ordered_aggs(e.right, cols, out)
        return
    if isinstance(e, A.UnaryOp):
        _collect_ordered_aggs(e.operand, cols, out)
        return
    raise Unsupported(f"post-agg expr {e}")


# --------------------------------------------------------------------- #
# ordered row evaluation (sorted layout)
# --------------------------------------------------------------------- #

def _ordered_row_eval(e: A.Expr, env_sorted, pos, flags):
    """Evaluate a row expr over the group-sorted layout; windowed calls
    use per-group positions/flags (ops/scan segmented kernels)."""
    if isinstance(e, A.Call) and e.func in _WINDOW_NAMES:
        if e.func == "subvec":
            raise Unsupported("subvec handled at projection level")
        args = list(e.args)
        w = None
        name = e.func
        if name in ("sumw", "avgw", "minw", "maxw", "varw", "stddevw", "ratiow"):
            name = {"sumw": "sums", "avgw": "avgs", "minw": "mins",
                    "maxw": "maxs", "varw": "vars", "stddevw": "stddevs",
                    "ratiow": "ratios"}[name]
            w = int(args[0].value)
            args = args[1:]
        elif len(args) == 2 and name in scan.WINDOWED:
            w = int(args[0].value)
            args = args[1:]
        v = _ordered_row_eval(args[0], env_sorted, pos, flags)
        if w is None:
            return scan.RUNNING[name](v, pos, flags)
        return scan.WINDOWED[name](w, v, pos, flags)
    if isinstance(e, A.ColumnRef):
        return env_sorted[e.name.lower()]
    if isinstance(e, A.Literal):
        return e.value
    if isinstance(e, A.BinOp) or isinstance(e, A.UnaryOp) \
            or (isinstance(e, A.Call) and e.func in fg._MATH):
        # reuse the arithmetic of fg._row_eval with windowed leaves
        # resolved first: rebuild via recursion
        if isinstance(e, A.BinOp):
            a = _ordered_row_eval(e.left, env_sorted, pos, flags)
            b = _ordered_row_eval(e.right, env_sorted, pos, flags)
            return _apply_binop(e.op, a, b)
        if isinstance(e, A.UnaryOp):
            v = _ordered_row_eval(e.operand, env_sorted, pos, flags)
            return jnp.negative(v) if e.op == "-" else jnp.logical_not(v)
        args = [_ordered_row_eval(a, env_sorted, pos, flags) for a in e.args]
        a0 = args[0]
        if hasattr(a0, "dtype") and a0.dtype.kind != "f":
            a0 = a0.astype(jnp.float64)
        if e.func == "pow":
            return jnp.power(a0, args[1])
        return fg._MATH[e.func](a0, *args[1:])
    raise Unsupported(f"ordered eval {e}")


def _apply_binop(op, a, b):
    return {
        "+": jnp.add, "-": jnp.subtract, "*": jnp.multiply,
        "/": jnp.true_divide, "%": jnp.mod,
        "=": jnp.equal, "<>": jnp.not_equal, "<": jnp.less,
        ">": jnp.greater, "<=": jnp.less_equal, ">=": jnp.greater_equal,
        "and": jnp.logical_and, "or": jnp.logical_or,
    }[op](a, b)


# --------------------------------------------------------------------- #
# execution
# --------------------------------------------------------------------- #

def run(session, sel: A.Select, table: Table) -> Table | None:
    try:
        p = plan(sel, table)
    except fg.Unsupported:
        return None

    cols = table.columns
    n = table.nrows
    if n == 0:
        return None

    key_names = [k.name.lower() for k in p["keys"]]
    referenced: set[str] = set(key_names)
    referenced.update(nm for nm, _ in p["assume"])

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

    for _, expr, _ in p["projections"]:
        walk(expr)
    if p["where"] is not None:
        walk(p["where"])
    col_order = sorted(referenced)
    if table.has_nulls(col_order):
        return None          # nullable columns: null-aware general path
    arrays = [cols[nm].data for nm in col_order]
    cap = int(arrays[0].shape[0])
    scatters = fg._needed_scatters(p["aggs"])

    # group capacity from key-domain stats: per-group outputs and the
    # boundary extraction size to the true group-count bound, NOT the
    # row count — at 1e8 rows / 1e7 groups (h2o q8) extraction gathers
    # sized cap instead of domain cost ~3 s of the 4.9 s query
    domain = 1
    for kn in key_names:
        c = cols[kn]
        if c.data.dtype.kind in "iub" and domain < cap:
            mn, mx = c.stats()
            domain *= max(int(mx) - int(mn) + 1, 1)
        else:
            domain = cap
            break
    gout = config.bucket_size(min(domain, cap))

    # Sort-operand budget (the whole query is ONE sort + scans, so every
    # operand is ~0.5-1.3 ns/row of HBM traffic at 1e8 rows):
    #  * validity rides as the MOST SIGNIFICANT key (1 bool op) instead
    #    of sentinel-masking every key/assume column — and doubles as
    #    the valid_s payload.
    #  * key and assume columns are RECONSTRUCTED from their sorted key
    #    operands (asc: identity; desc int: ~x; desc float: -x) instead
    #    of riding again as payload.
    #  * the iota tiebreak key (AQuery's insertion-order-within-equal-
    #    keys semantics, reference engine/ast.py:312) is DROPPED when
    #    every referenced column is itself a key/assume column: rows
    #    that tie are then entirely identical, so any order yields the
    #    same sequences. h2o q8 goes from 6 sort operands to 3.
    assume_names = [an for an, _ in p["assume"]]
    reconstructible = set(key_names) | set(assume_names)
    carried = [nm for nm in col_order if nm not in reconstructible]
    need_idx = bool(carried)
    narrow = fg.narrow_sum_tags(scatters, cols, cap)
    fingerprint = ("ordered", repr(sel.group_by), repr(p["assume"]),
                   repr([pr[1] for pr in p["projections"]]),
                   repr(p["where"]), gout, tuple(sorted(narrow)),
                   tuple((a.shape[0], str(a.dtype)) for a in arrays))
    entry = _cache.get(fingerprint)
    if entry is None:
        def fused(nn, *arrs):
            env = dict(zip(col_order, arrs))
            idx = jnp.arange(cap, dtype=jnp.int32)
            valid = idx < nn
            if p["where"] is not None:
                w = fg._row_eval(p["where"], env)
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            invalid = ~valid
            ops = [invalid]
            for kn in key_names:
                ops.append(env[kn])
            desc_tf = {}
            for an, asc in p["assume"]:
                a = env[an]
                if not asc:
                    a = ~a if a.dtype.kind in "iu" else -a
                    desc_tf[an] = a.dtype.kind
                ops.append(a)
            if need_idx:
                ops.append(idx)
            res = jax.lax.sort(
                [*ops, *[env[nm] for nm in carried]],
                num_keys=len(ops), is_stable=False)
            valid_s = ~res[0]
            sorted_keys = res[1: 1 + len(key_names)]
            env_sorted = dict(zip(carried, res[len(ops):]))
            for ki, kn in enumerate(key_names):
                env_sorted.setdefault(kn, sorted_keys[ki])
            for ai, (an, asc) in enumerate(p["assume"]):
                s = res[1 + len(key_names) + ai]
                if an in env_sorted:
                    continue
                if not asc:
                    s = ~s if desc_tf[an] in "iu" else -s
                env_sorted[an] = s
            diff = res[0][1:] != res[0][:-1]        # validity boundary
            for sk in sorted_keys:
                diff = diff | (sk[1:] != sk[:-1])
            diff = jnp.concatenate([jnp.ones((1,), jnp.bool_), diff])
            flags = diff & valid_s
            gid_raw = jnp.cumsum(flags.astype(jnp.int32)) - 1
            ng = jnp.sum(flags, dtype=jnp.int32)
            gid = jnp.where(valid_s, gid_raw, cap).astype(jnp.int32)
            pos = segment.pos_from_flags(flags)

            def eval_sorted(e):
                return _ordered_row_eval(e, env_sorted, pos, flags)

            # aggregates over (possibly windowed) sorted rows; group
            # boundaries from the key-diff flags (invalid rows carry
            # sentinel keys, so the last valid group still closes)
            last = jnp.concatenate(
                [diff[1:], jnp.ones((1,), jnp.bool_)]) & valid_s
            outs, ends_idx, _ng2 = _sorted_reduce(
                eval_sorted, valid_s, diff, last, gout, scatters,
                extract={f"__key{ki}": sorted_keys[ki]
                         for ki in range(len(key_names))},
                narrow_tags=narrow)
            counts = outs["__counts__"]

            # ragged layouts: everything group-sized stays on device; the
            # ONLY device→host pull of the whole query is the `scalars`
            # vector below (each scalar sync over the tunnel costs a
            # full RTT — q8 spent ~0.3 s on them before this batching)
            has_ragged = any(kindp == "row"
                             for kindp, _, _ in p["projections"])
            offs_all = None
            counts_ok = None
            if has_ragged:
                # int32 cumsum: int64 arithmetic is emulated on TPU (a
                # 16M-row int64 cumsum measured ~134 ms vs ~10 ms int32);
                # counts ≤ n < 2^31 always fits. Slots ≥ ng hold garbage
                # — zero them so the running offsets stay flat.
                slot_ok = jnp.arange(gout, dtype=jnp.int32) < ng
                counts_ok = jnp.where(slot_ok, counts.astype(jnp.int32), 0)
                offs_all = jnp.concatenate([
                    jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_ok)])

            results = []  # flat arrays; static tags live in out_tags
            scalars = [ng, offs_all[-1] if offs_all is not None else ng]
            for kindp, expr, alias in p["projections"]:
                if kindp == "key":
                    ki = key_names.index(expr.name.lower())
                    results.append(outs[f"__key{ki}"])
                elif kindp == "row":
                    if _is_window_call(expr) and expr.func == "subvec":
                        base = eval_sorted(expr.args[0])
                        a = int(expr.args[1].value)
                        b = int(expr.args[2].value)
                        # per-group kept count is CLOSED FORM — rows kept
                        # in group i are positions [a, b) of its count:
                        # no mask cumsum, no boundary gather
                        kc = (jnp.minimum(counts_ok, b)
                              - jnp.minimum(counts_ok, a))
                        kept = jnp.concatenate([
                            jnp.zeros((1,), jnp.int32), jnp.cumsum(kc)])
                        # compact kept rows by ONE unstable sort on a
                        # unique int32 key carrying the values as payload
                        # (argsort + 16M random gather measured ~360 ms;
                        # this sort ~80 ms)
                        mask = valid_s & (pos >= a) & (pos < b)
                        ckey = jnp.where(mask, idx, idx + jnp.int32(cap))
                        comp = jax.lax.sort([ckey, base], num_keys=1,
                                            is_stable=False)
                        results.append(comp[1])
                        results.append(kept)
                        scalars.append(kept[-1])
                    else:
                        results.append(eval_sorted(expr))
                else:
                    results.append(fg._post_agg_eval(expr, outs, counts, None))
            return results, offs_all, jnp.stack(
                [jnp.asarray(s, jnp.int64) for s in scalars])

        entry = jax.jit(fused)
        _cache[fingerprint] = entry

    # static tags, mirroring the traced output order
    out_tags: list[str] = []
    for kindp, expr, alias in p["projections"]:
        if kindp == "row":
            if _is_window_call(expr) and expr.func == "subvec":
                out_tags.append("ragged_masked")
            else:
                out_tags.append("ragged")
        else:
            out_tags.append("group")

    flat, offs_all, scalars = entry(n, *arrays)
    s = np.asarray(scalars)                    # the ONE host sync
    g, total = int(s[0]), int(s[1])
    kept_totals = [int(x) for x in s[2:]]
    gcap = config.bucket_size(max(g, 1))

    # re-associate flat arrays with tags ('ragged_masked' consumed two)
    results = []
    it = iter(flat)
    for tag in out_tags:
        if tag == "ragged_masked":
            results.append((tag, next(it), next(it)))
        else:
            results.append((tag, next(it)))

    offsets = offs_all[: g + 1] if offs_all is not None else None

    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    used: dict[str, int] = {}
    ki_kept = 0
    from aquery2_tpu.engine.executor import _derive_name

    for (kindp, expr, alias), rv in zip(p["projections"], results):
        name = alias or _derive_name(expr)
        lk = name.lower()
        if lk in used:
            used[lk] += 1
            name = f"{name}_{used[lk]}"
        else:
            used[lk] = 0
        tag = rv[0]
        if tag == "group":
            arr = rv[1][:gcap]
            if kindp == "key":
                src = cols[expr.name]
                out.columns[name] = Column(name, src.sqltype, arr, nrows=g,
                                           dictionary=src.dictionary)
            else:
                st = (T.from_np_dtype(np.dtype(arr.dtype))
                      if arr.dtype != jnp.bool_ else T.BoolT)
                out.columns[name] = Column(name, st, arr, nrows=g)
        elif tag == "ragged":
            vals = rv[1]
            st = T.from_np_dtype(np.dtype(vals.dtype))
            out.columns[name] = VectorColumn(
                name, T.VectorT(st), vals[: max(total, 1)], offsets,
                nrows=g, total=total)
        else:  # ragged_masked (subvec): pre-compacted in-program
            vals_c, kept = rv[1], rv[2]
            m = kept_totals[ki_kept]
            ki_kept += 1
            st = T.from_np_dtype(np.dtype(vals_c.dtype))
            out.columns[name] = VectorColumn(
                name, T.VectorT(st), vals_c[: max(m, 1)], kept[: g + 1],
                nrows=g, total=m)

    if p["into_table"]:
        out.name = p["into_table"]
        session.catalog.create(out, replace=True)
    if p["into_outfile"]:
        from aquery2_tpu.storage.result import Result

        Result(out).to_csv(session.resolve_path(p["into_outfile"]),
                           sep=p["outfile_sep"], header=False)
    return out


def _sorted_reduce(eval_sorted, valid_s, starts, last, cap, scatters,
                   extract=None, narrow_tags=frozenset(), null_fn=None):
    """Group reduction over rows already sorted by group key, with a
    custom row evaluator (windowed leaves resolved by eval_sorted).
    Cumsum/boundary-extraction based — no per-group scatters
    (ops/reduce.py has the measured cost model). null_fn (sorted-layout
    NULL masks of nullable agg-arg columns) adds per-agg non-null :cnt
    lanes — the distributed ordered tier rides nullable agg args."""
    from aquery2_tpu.ops import reduce as R

    add, mins, maxs, f64s = fg._build_lanes({}, valid_s, scatters,
                                            eval_fn=eval_sorted,
                                            null_fn=null_fn)
    return R.sorted_group_reduce(starts, last, add, mins, maxs, f64s, cap,
                                 counts_from_ends="__counts__",
                                 extract=extract, narrow_tags=narrow_tags)
