"""Fused ungrouped scan: SELECT … WHERE … ORDER BY … LIMIT in ONE program.

The general executor pipeline pays a host sync per stage (filter count
pull, per-column materialization, host ORDER BY — executor.py), which
over a tunneled chip puts a multiple-RTT floor under every query. Here
the whole non-grouped pipeline — row-expression evaluation, WHERE
masking, compaction, ORDER BY — traces into one jitted program per
query × shape with exactly ONE device→host sync (the row-count pull):

  1. evaluate WHERE + projections over the padded columns
  2. one unstable sort on [~valid, order keys…, iota] carrying every
     projection as payload (compaction and ordering in the same pass;
     the iota tiebreak reproduces the stable general-path order)
  3. slice to the count bucket on host after the single scalar pull

String columns ride as dictionary codes (ORDER BY via rank LUT gather,
equality against literals via host-side code lookup folded into the
AST). Falls back to the general executor (returns None) for vector
columns, nulls, windowed calls, subqueries, LIKE, and anything else
outside the fused expression grammar.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.engine import fused_groupby as fg
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, StringDict, Table
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_cache: dict[tuple, Any] = {}


class _Bail(Exception):
    pass


def _rewrite_string_literals(e: A.Expr, cols) -> A.Expr:
    """str-column = 'lit' → code comparison (host dictionary lookup)."""
    if isinstance(e, A.BinOp):
        if e.op in ("=", "<>"):
            l, r = e.left, e.right
            for a, b in ((l, r), (r, l)):
                if (isinstance(a, A.ColumnRef) and a.name in cols
                        and cols[a.name].sqltype.is_string
                        and isinstance(b, A.Literal) and b.is_string):
                    d = cols[a.name].dictionary
                    code = d.lookup(b.value) if d is not None else -1
                    return A.BinOp(e.op, A.ColumnRef(a.name, a.table),
                                   A.Literal(code))
        return A.BinOp(e.op, _rewrite_string_literals(e.left, cols),
                       _rewrite_string_literals(e.right, cols))
    if isinstance(e, A.UnaryOp):
        return A.UnaryOp(e.op, _rewrite_string_literals(e.operand, cols))
    if isinstance(e, A.Call):
        return A.Call(e.func, tuple(
            a if isinstance(a, A.Star) else _rewrite_string_literals(a, cols)
            for a in e.args), e.distinct)
    if isinstance(e, A.CaseWhen):
        return A.CaseWhen(
            tuple((_rewrite_string_literals(c, cols),
                   _rewrite_string_literals(v, cols)) for c, v in e.whens),
            None if e.default is None
            else _rewrite_string_literals(e.default, cols))
    return e


def _check_expr(e: A.Expr, cols, allow_string: bool) -> None:
    """Fused row grammar + string columns where allowed."""
    if isinstance(e, A.ColumnRef):
        if e.name not in cols:
            raise _Bail("unknown column")
        c = cols[e.name]
        if getattr(c, "is_vector", False):
            raise _Bail("vector column")
        if c.sqltype.is_string and not allow_string:
            raise _Bail("string in arithmetic")
        return
    if isinstance(e, A.BinOp):
        if e.op in ("=", "<>"):
            # code comparisons on string columns are fine
            _check_expr(e.left, cols, allow_string=True)
            _check_expr(e.right, cols, allow_string=True)
            return
        if e.op not in ("+", "-", "*", "/", "%", "<", ">", "<=", ">=",
                        "and", "or"):
            raise _Bail(f"op {e.op}")
        _check_expr(e.left, cols, allow_string=False)
        _check_expr(e.right, cols, allow_string=False)
        return
    if isinstance(e, A.UnaryOp):
        if e.op not in ("-", "not"):
            raise _Bail(f"unary {e.op}")
        _check_expr(e.operand, cols, allow_string=False)
        return
    if isinstance(e, A.Call):
        if e.func not in fg._MATH:
            raise _Bail(f"call {e.func}")
        for a in e.args:
            _check_expr(a, cols, allow_string=False)
        return
    if isinstance(e, A.Literal):
        if e.is_string or e.value is None:
            raise _Bail("string/null literal")
        return
    if isinstance(e, A.CaseWhen):
        if e.default is None:
            raise _Bail("CASE without ELSE (NULL branch)")
        for cond, val in e.whens:
            _check_expr(cond, cols, allow_string=False)
            _check_expr(val, cols, allow_string=False)
        _check_expr(e.default, cols, allow_string=False)
        return
    raise _Bail(f"expr {e}")


def try_run(session, sel: A.Select) -> Table | None:
    if (sel.group_by or sel.assumptions or sel.distinct or sel.unions
            or sel.having or sel.into_outfile):
        return None
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        return None
    if sel.sources[0].name not in session.catalog:
        return None
    table = session.catalog.get(sel.sources[0].name)
    cols = table.columns
    n = table.nrows
    if n == 0:
        return None
    if getattr(session, "mesh", None) is not None:
        return None          # sharded tables use the SPMD/general paths

    try:
        projections: list[tuple[str, A.Expr]] = []
        names_seen: dict[str, int] = {}

        def uname(base: str) -> str:
            k = base.lower()
            if k not in names_seen:
                names_seen[k] = 0
                return base
            names_seen[k] += 1
            return f"{base}_{names_seen[k]}"

        from aquery2_tpu.engine.executor import _derive_name

        for p in sel.projections:
            if isinstance(p.expr, A.Star):
                for c in cols.values():
                    if getattr(c, "is_vector", False):
                        raise _Bail("vector column in *")
                    projections.append((uname(c.name),
                                        A.ColumnRef(c.name, None)))
                continue
            e = _rewrite_string_literals(p.expr, cols)
            _check_expr(e, cols, allow_string=True)
            projections.append((uname(p.alias or _derive_name(p.expr)), e))

        where = None
        if sel.where is not None:
            where = _rewrite_string_literals(sel.where, cols)
            _check_expr(where, cols, allow_string=True)

        order: list[tuple[A.Expr, bool]] = []
        for item in (sel.order_by or []):
            e = item.expr
            # alias → projected expression
            if isinstance(e, A.ColumnRef) and e.table is None \
                    and e.name not in cols:
                for nm, pe in projections:
                    if nm.lower() == e.name.lower():
                        e = pe
                        break
            e = _rewrite_string_literals(e, cols)
            _check_expr(e, cols, allow_string=True)
            order.append((e, item.ascending))
    except _Bail:
        return None

    # referenced columns
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

    for _, e in projections:
        walk(e)
    if where is not None:
        walk(where)
    for e, _ in order:
        walk(e)
    col_order = sorted(referenced)
    if table.has_nulls(col_order):
        return None
    if any(getattr(cols[nm], "is_vector", False) for nm in col_order):
        return None

    # string order keys need rank LUTs as extra operands
    rank_luts: list[tuple[str, jax.Array]] = []

    def order_key_arrays(env):
        keys = []
        for (e, asc), (nm, lut) in zip(
                [o for o in order], _rank_iter(order, cols)):
            pass
        return keys

    arrays = [cols[nm].data for nm in col_order]
    cap = int(arrays[0].shape[0])
    luts = {}
    for e, _asc in order:
        if isinstance(e, A.ColumnRef) and cols[e.name].sqltype.is_string \
                and cols[e.name].dictionary is not None:
            d = cols[e.name].dictionary
            luts[e.name.lower()] = jnp.asarray(d.ranks) if len(d) \
                else jnp.zeros((1,), jnp.int32)

    lut_names = sorted(luts)
    fingerprint = (
        "scan", repr([(nm, e) for nm, e in projections]), repr(where),
        repr(order), tuple(lut_names),
        tuple((a.shape[0], str(a.dtype)) for a in arrays),
    )
    entry = _cache.get(fingerprint)
    if entry is None:
        def fused(nn, luts_in, *arrs):
            env = dict(zip(col_order, arrs))
            idx = jnp.arange(cap, dtype=jnp.int32)
            valid = idx < nn
            if where is not None:
                w = fg._row_eval(where, env)
                if not hasattr(w, "dtype"):
                    w = jnp.broadcast_to(jnp.asarray(bool(w)), (cap,))
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            cnt = jnp.sum(valid, dtype=jnp.int32)
            projs = []
            for _nm, e in projections:
                v = fg._row_eval(e, env)
                if not hasattr(v, "shape") or v.ndim == 0:
                    v = jnp.broadcast_to(jnp.asarray(v), (cap,))
                projs.append(v)
            okeys = []
            for e, asc in order:
                k = fg._row_eval(e, env)
                if isinstance(e, A.ColumnRef) and e.name.lower() in lut_names:
                    lut = luts_in[lut_names.index(e.name.lower())]
                    k = lut[jnp.clip(k, 0, lut.shape[0] - 1)]
                if not asc:
                    k = ~k if k.dtype.kind in "iu" else (
                        ~k.astype(jnp.int32) if k.dtype == jnp.bool_ else -k)
                okeys.append(k)
            # ONE sort: invalid rows last, then order keys, iota tiebreak
            res = jax.lax.sort([~valid, *okeys, idx, *projs],
                               num_keys=2 + len(okeys), is_stable=False)
            return res[2 + len(okeys):], cnt

        entry = jax.jit(fused)
        _cache[fingerprint] = entry

    sorted_projs, cnt = entry(n, tuple(luts[nm] for nm in lut_names),
                              *arrays)
    m = int(cnt)                       # the ONE sync
    if sel.limit is not None:
        m = min(m, sel.limit)
    out_cap = config.bucket_size(max(m, 1))

    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    for (nm, e), arr in zip(projections, sorted_projs):
        if isinstance(e, A.ColumnRef) and cols[e.name].sqltype.is_string:
            src = cols[e.name]
            out.columns[nm] = Column(nm, src.sqltype, arr[:out_cap], nrows=m,
                                     dictionary=src.dictionary)
        else:
            st = _result_type(e, cols, arr)
            out.columns[nm] = Column(nm, st, arr[:out_cap], nrows=m)

    if sel.into_table:
        out.name = sel.into_table
        session.catalog.create(out, replace=True)
    return out


def _rank_iter(order, cols):
    return [(None, None)] * len(order)


def _result_type(e: A.Expr, cols, arr) -> T.SQLType:
    if isinstance(e, A.ColumnRef):
        return cols[e.name].sqltype
    if arr.dtype == jnp.bool_:
        return T.BoolT
    return T.from_np_dtype(np.dtype(arr.dtype))
