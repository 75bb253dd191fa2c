"""Expression evaluation — grouped and ungrouped, one code path.

Counterpart of the reference's dual-target expression compiler
(engine/expr.py renders SQL *and* C++ from each node, tracking
is_special/is_compound :17-21) — here every expression evaluates directly
to device arrays tagged with an evaluation *kind*:

  'scalar' : python/0-d value            (literals, agg over whole table)
  'row'    : one value per row [cap]     (columns, windowed ops)
  'group'  : one value per group [gcap]  (aggregates under GROUP BY)

Mixing kinds broadcasts: group→row via segment-id gather, scalar→any.
Ungrouped queries evaluate with the trivial 1-group context, which makes
SELECT max(price-mins(price)) and SELECT sd(a)+sales (scalar agg mixed
with a bare column, tests/joins.a) fall out of the same rules the
reference implements with its is_special/postproc machinery.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.ops import ragged, scan, segment
from aquery2_tpu.ops.scan import _fp_dtype, _long_dtype
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, StringDict, Table, VectorColumn


class EvalError(Exception):
    pass


@dataclass
class Value:
    kind: str                       # 'scalar' | 'row' | 'group'
    data: Any                       # python scalar / jax array
    sqltype: T.SQLType
    dictionary: StringDict | None = None
    mask: jax.Array | None = None   # row-kind: subvec row selection
    pack_cols: list | None = None   # pack(): list of row arrays
    nulls: jax.Array | None = None  # SQL NULL mask (True = null); None = no
    #                                 nulls. Reference `missing`/IS NULL is
    #                                 real against MonetDB validity
    #                                 (common/types.py:359-364).


# --- scalar math registry (reference cstdlib bindings, types.py:368-374) --

_MATH_FNS: dict[str, Callable] = {
    "sqrt": jnp.sqrt, "exp": jnp.exp, "log": jnp.log, "ln": jnp.log,
    "log2": jnp.log2, "log10": jnp.log10, "sin": jnp.sin, "cos": jnp.cos,
    "tan": jnp.tan, "asin": jnp.arcsin, "acos": jnp.arccos,
    "atan": jnp.arctan, "abs": jnp.abs, "floor": jnp.floor,
    "ceil": jnp.ceil, "round": jnp.round, "sign": jnp.sign,
}

_AGG_NAMES = {"sum", "avg", "mean", "min", "max", "count", "var", "stddev",
              "corr", "median", "first", "last", "distinct_count"}

_RUNNING_NAMES = set(scan.RUNNING)
_WINDOW_EXPLICIT = {"sumw", "avgw", "minw", "maxw", "varw", "stddevw", "ratiow"}


class WorkingSet:
    """Current row layout over one or more source tables.

    Holds per-source row-index arrays (None = identity) so that joins,
    ASSUMING sorts, and filters compose by permutation without copying
    every column eagerly; gathered columns are cached."""

    def __init__(self, sources: list[tuple[str | None, Table]],
                 indices: list[jax.Array | None], n: int, capacity: int,
                 missing: list[jax.Array | None] | None = None):
        self.sources = sources          # [(alias, Table)]
        self.indices = indices          # per source
        self.n = n
        self.capacity = capacity
        # per-source row mask: True = this source contributed NO row here
        # (outer-join null side) — every column of that source reads NULL
        self.missing = missing if missing is not None \
            else [None] * len(sources)
        self._cache: dict[tuple[int, str], jax.Array] = {}

    @classmethod
    def from_table(cls, table: Table, alias: str | None = None) -> "WorkingSet":
        cap = config.bucket_size(max(table.nrows, 1))
        return cls([(alias or table.name, table)], [None], table.nrows, cap)

    # -- column resolution -------------------------------------------------

    def find(self, name: str, qualifier: str | None = None):
        """→ (source_idx, Column/VectorColumn) or raise."""
        hits = []
        for si, (alias, tbl) in enumerate(self.sources):
            if qualifier and (alias or "").lower() != qualifier.lower() \
                    and tbl.name.lower() != qualifier.lower():
                continue
            if name in tbl.columns:
                hits.append((si, tbl.columns[name]))
        if not hits:
            q = f"{qualifier}." if qualifier else ""
            raise EvalError(f"unknown column {q}{name}")
        return hits[0]

    def has_column(self, name: str, qualifier: str | None = None) -> bool:
        try:
            self.find(name, qualifier)
            return True
        except EvalError:
            return False

    def gather(self, si: int, col: Column) -> jax.Array:
        key = (si, col.name.lower())
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        idx = self.indices[si]
        if idx is None:
            out = col.data[: self.capacity]
            if out.shape[0] < self.capacity:
                out = jnp.pad(out, (0, self.capacity - out.shape[0]))
        else:
            out = col.data[jnp.clip(idx[: self.capacity], 0, col.capacity - 1)]
        self._cache[key] = out
        return out

    def gather_nulls(self, si: int, col: Column) -> jax.Array | None:
        """Null mask (True = null) in working-set row order, or None.
        Folds in the source's outer-join missing mask."""
        miss = self.missing[si]
        if col.valid is None and miss is None:
            return None
        key = (si, "\0nulls\0" + col.name.lower())
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        if col.valid is None:
            out = miss[: self.capacity]
        else:
            nulls = ~col.valid
            idx = self.indices[si]
            if idx is None:
                out = nulls[: self.capacity]
                if out.shape[0] < self.capacity:
                    out = jnp.pad(out, (0, self.capacity - out.shape[0]))
            else:
                out = nulls[jnp.clip(idx[: self.capacity], 0, col.capacity - 1)]
            if miss is not None:
                out = out | miss[: self.capacity]
        self._cache[key] = out
        return out

    def column_value(self, name: str, qualifier: str | None = None) -> Value:
        si, col = self.find(name, qualifier)
        if isinstance(col, VectorColumn):
            raise EvalError(
                f"vector column {name} can only be passed whole to module "
                f"functions / pack in this context")
        arr = self.gather(si, col)
        return Value("row", arr, col.sqltype, dictionary=col.dictionary,
                     nulls=self.gather_nulls(si, col))

    def vector_column(self, name: str, qualifier: str | None = None):
        si, col = self.find(name, qualifier)
        return si, col

    def all_columns(self) -> list[tuple[str, Value | tuple]]:
        """For SELECT *: (name, Value|(si,VectorColumn)) in schema order,
        de-duplicating natural-join key columns by name."""
        out: list[tuple[str, Any]] = []
        seen: set[str] = set()
        for si, (alias, tbl) in enumerate(self.sources):
            for col in tbl.columns.values():
                k = col.name.lower()
                if k in seen:
                    continue
                seen.add(k)
                if isinstance(col, VectorColumn):
                    out.append((col.name, (si, col)))
                else:
                    out.append((col.name, Value("row", self.gather(si, col),
                                                col.sqltype, col.dictionary,
                                                nulls=self.gather_nulls(si, col))))
        return out

    # -- layout transforms -------------------------------------------------

    def permuted(self, perm: jax.Array, new_n: int) -> "WorkingSet":
        new_cap = int(perm.shape[0])
        idxs: list[jax.Array | None] = []
        for idx in self.indices:
            if idx is None:
                idxs.append(perm)
            else:
                idxs.append(idx[jnp.clip(perm, 0, idx.shape[0] - 1)])
        miss = [None if m is None
                else m[jnp.clip(perm, 0, m.shape[0] - 1)]
                for m in self.missing]
        return WorkingSet(self.sources, idxs, new_n, new_cap, missing=miss)


@dataclass
class GroupInfo:
    """Grouped-evaluation state; None fields for ungrouped contexts."""
    grouping: Any                    # engine.groupby.Grouping or None
    has_groups: bool
    gcap: int                        # padded group capacity


class EvalContext:
    """Evaluation state: working set (row layout), grouping, session."""

    def __init__(self, ws: WorkingSet, session=None, grouping=None):
        self.ws = ws
        self.session = session
        self.grouping = grouping     # Grouping with rows already permuted
        self.env: list[dict[str, Value]] = []   # UDF locals (lexical stack)

        if grouping is not None:
            self.has_groups = True
            self.G = grouping.num_groups
            self.gcap = config.bucket_size(max(self.G, 1))
            self.seg = grouping.sorted_seg         # [cap]
            self.pos = grouping.pos
            self.flags = grouping.flags
            off = grouping.offsets                 # host [G+1]
            starts = np.zeros(self.gcap, dtype=np.int64)
            ends = np.zeros(self.gcap, dtype=np.int64)
            starts[: self.G] = off[:-1]
            ends[: self.G] = off[1:]
            self.group_starts = jnp.asarray(starts)
            self.group_ends = jnp.asarray(ends)
            self.group_lens = self.group_ends - self.group_starts
        else:
            self.has_groups = False
            self.G = 1
            self.gcap = 1
            n, cap = ws.n, ws.capacity
            idx = jnp.arange(cap, dtype=jnp.int32)
            self.seg = jnp.where(idx < n, 0, 1).astype(jnp.int32)
            self.pos = segment.flat_pos(cap)
            self.flags = None
            self.group_starts = jnp.zeros(1, jnp.int64)
            self.group_ends = jnp.asarray([n], dtype=jnp.int64)
            self.group_lens = self.group_ends - self.group_starts

    # -- kind coercion -----------------------------------------------------

    def to_row(self, v: Value) -> Value:
        if v.kind == "row":
            return v
        if v.kind == "scalar":
            return v  # jnp broadcasting handles python scalars
        # group → row broadcast
        arr = v.data
        seg = jnp.clip(self.seg, 0, arr.shape[0] - 1)
        nulls = v.nulls[seg] if v.nulls is not None else None
        return Value("row", arr[seg], v.sqltype, v.dictionary, nulls=nulls)

    def np_offsets(self):
        if self.grouping is not None:
            return self.grouping.offsets
        return np.asarray([0, self.ws.n], dtype=np.int64)

    # -- main dispatch -----------------------------------------------------

    def eval(self, e: A.Expr) -> Value:
        if isinstance(e, A.Literal):
            return self._literal(e)
        if isinstance(e, A.ColumnRef):
            return self._column(e)
        if isinstance(e, A.BinOp):
            return self._binop(e)
        if isinstance(e, A.UnaryOp):
            return self._unary(e)
        if isinstance(e, A.Call):
            return self._call(e)
        if isinstance(e, A.WindowExpr):
            return self._window(e)
        if isinstance(e, A.CaseWhen):
            return self._case(e)
        if isinstance(e, A.Index):
            return self._index(e)
        if isinstance(e, A.Subquery):
            return self._scalar_subquery(e)
        if isinstance(e, A.Star):
            raise EvalError("* not valid in this position")
        raise EvalError(f"cannot evaluate {e!r}")

    # -- subqueries (uncorrelated) ------------------------------------------

    def _run_subquery(self, e: A.Subquery) -> Table:
        from aquery2_tpu.engine.executor import Executor

        return Executor(self.session).run_select(e.select)

    def _scalar_subquery(self, e: A.Subquery) -> Value:
        t = self._run_subquery(e)
        if t.ncols != 1 or t.nrows != 1:
            raise EvalError(
                f"scalar subquery returned {t.nrows}×{t.ncols}, want 1×1")
        col = next(iter(t.columns.values()))
        v = col.to_python()[0]
        st = col.sqltype
        if st.is_string:
            return Value("scalar", v, T.StrT)
        return Value("scalar", v, st)

    def _in_subquery(self, e: A.BinOp) -> Value:
        lv = self.to_row(self.eval(e.left))
        t = self._run_subquery(e.right)
        if t.ncols != 1:
            raise EvalError("IN subquery must produce one column")
        col = next(iter(t.columns.values()))
        if lv.sqltype.is_string or col.sqltype.is_string:
            if lv.dictionary is None or not col.sqltype.is_string:
                raise EvalError("IN subquery: incompatible string operands")
            # encode the subquery's strings in the probe's dictionary;
            # unknown strings can never match
            vals = np.asarray(
                [lv.dictionary.lookup(s) for s in col.to_python()],
                dtype=np.int32)
        else:
            vals = np.asarray(col.data[: col.nrows])
        member = jnp.isin(lv.data, jnp.asarray(vals))
        return Value("row", member, T.BoolT)

    def _literal(self, e: A.Literal) -> Value:
        v = e.value
        if e.is_string:
            return Value("scalar", v, T.StrT)
        if v is None:
            return Value("scalar", None, T.DoubleT)
        if isinstance(v, bool):
            return Value("scalar", v, T.BoolT)
        if isinstance(v, int):
            return Value("scalar", v, T.LongT if abs(v) > 2**31 else T.IntT)
        return Value("scalar", float(v), T.DoubleT)

    def _column(self, e: A.ColumnRef) -> Value:
        # UDF locals shadow table columns
        for frame in reversed(self.env):
            if e.table is None and e.name in frame:
                return frame[e.name]
        return self.ws.column_value(e.name, e.table)

    # -- binary / unary ----------------------------------------------------

    def _coerce_literal(self, lit: Value, other: Value, op: str) -> Value:
        """String literal vs date/string column → integer code."""
        if lit.sqltype is T.StrT and isinstance(lit.data, str):
            if other.sqltype.is_temporal:
                return Value("scalar", T.parse_temporal_literal(other.sqltype, lit.data),
                             other.sqltype)
            if other.sqltype.is_string and other.dictionary is not None:
                if op in ("=", "<>"):
                    return Value("scalar", other.dictionary.lookup(lit.data), T.StrT)
                if op not in ("<", ">", "<=", ">="):
                    return lit  # e.g. LIKE patterns stay raw strings
                # range comparison: both sides become lexicographic ranks
                # (dictionary.ranks maps code → sorted position)
                import bisect

                strs = sorted(other.dictionary.strings())
                pos = bisect.bisect_left(strs, lit.data)
                # exact match → its rank; otherwise a half-rank between
                # neighbours keeps strict/non-strict comparisons correct
                if pos < len(strs) and strs[pos] == lit.data:
                    rank: float = float(pos)
                else:
                    rank = pos - 0.5
                return Value("scalar", rank, T.DoubleT)
        return lit

    def _binop(self, e: A.BinOp) -> Value:
        if e.op == "in" and isinstance(e.right, A.Subquery):
            return self._in_subquery(e)
        lv = self.eval(e.left)
        rv = self.eval(e.right)
        op = e.op
        if isinstance(lv.data, str) or isinstance(rv.data, str):
            if isinstance(lv.data, str) and isinstance(rv.data, str):
                res = _str_compare(op, lv.data, rv.data)
                return Value("scalar", res, T.BoolT)
            if isinstance(lv.data, str):
                lv = self._coerce_literal(lv, rv, op)
            else:
                rv = self._coerce_literal(rv, lv, op)
        # string column vs string column across dictionaries
        if (lv.sqltype.is_string and rv.sqltype.is_string
                and lv.dictionary is not None and rv.dictionary is not None
                and lv.dictionary is not rv.dictionary):
            rv = _translate_codes(rv, lv.dictionary)

        # range comparisons on strings compare lexicographic ranks
        if op in ("<", ">", "<=", ">="):
            lv = _to_ranks(lv)
            rv = _to_ranks(rv)

        kind = _result_kind(lv.kind, rv.kind)

        # NULL literal operand: x <op> NULL is NULL for every scalar op
        # (AND/OR get Kleene treatment below via an all-null operand)
        if (lv.kind == "scalar" and lv.data is None) or \
                (rv.kind == "scalar" and rv.data is None):
            if op not in ("and", "or"):
                shape = self._kind_shape(kind)
                t = T.BoolT if op in ("=", "<>", "<", ">", "<=", ">=",
                                      "like") else T.promote(lv.sqltype,
                                                             rv.sqltype)
                return Value(kind, jnp.zeros(shape, jnp.dtype(t.np_dtype)), t,
                             nulls=jnp.ones(shape, jnp.bool_))

        if kind == "row":
            lv2, rv2 = self.to_row(lv), self.to_row(rv)
            a, b = lv2.data, rv2.data
            anull, bnull = lv2.nulls, rv2.nulls
        else:
            a, b = lv.data, rv.data
            anull, bnull = lv.nulls, rv.nulls
        nulls = _or_nulls(anull, bnull)

        if op in ("and", "or"):
            ab, bb = _as_bool(a), _as_bool(b)
            if nulls is None:
                fn = jnp.logical_and if op == "and" else jnp.logical_or
                return Value(kind, fn(ab, bb), T.BoolT)
            # Kleene 3-valued logic: NULL AND false = false, NULL OR true
            # = true — nullness only survives when the other side can't
            # decide the result
            ta = ab & _not_null(anull, ab)
            fa = ~ab & _not_null(anull, ab)
            tb = bb & _not_null(bnull, bb)
            fb = ~bb & _not_null(bnull, bb)
            if op == "and":
                data = ta & tb
                known = (ta & tb) | fa | fb
            else:
                data = ta | tb
                known = (fa & fb) | ta | tb
            return Value(kind, data, T.BoolT, nulls=~known)
        if op in ("=", "<>", "<", ">", "<=", ">="):
            fn = {"=": jnp.equal, "<>": jnp.not_equal, "<": jnp.less,
                  ">": jnp.greater, "<=": jnp.less_equal, ">=": jnp.greater_equal}[op]
            return Value(kind, fn(a, b), T.BoolT, nulls=nulls)
        if op == "like":
            return self._like(lv, rv, kind)
        lt, rt = lv.sqltype, rv.sqltype
        if op == "+":
            return Value(kind, jnp.add(a, b), T.promote(lt, rt), nulls=nulls)
        if op == "-":
            return Value(kind, jnp.subtract(a, b), T.promote(lt, rt), nulls=nulls)
        if op == "*":
            return Value(kind, jnp.multiply(a, b), T.promote(lt, rt), nulls=nulls)
        if op == "/":
            out_t = T.div_type(lt, rt)
            af = a.astype(jnp.dtype(out_t.np_dtype)) if hasattr(a, "astype") else a
            return Value(kind, jnp.true_divide(af, b), out_t, nulls=nulls)
        if op == "%":
            return Value(kind, jnp.mod(a, b), T.promote(lt, rt), nulls=nulls)
        raise EvalError(f"unknown operator {op}")

    def _kind_shape(self, kind: str) -> tuple:
        if kind == "row":
            return (self.ws.capacity,)
        if kind == "group":
            return (self.gcap,)
        return ()

    def _like(self, lv: Value, rv: Value, kind: str) -> Value:
        """LIKE: SQL wildcard match. The pattern is matched against the
        dictionary on host (tiny), producing a per-code boolean lookup
        gathered on device — zero per-row string work."""
        import re

        if not (isinstance(rv.data, str)):
            raise EvalError("LIKE pattern must be a string literal")
        if lv.kind == "scalar" and isinstance(lv.data, str):
            return Value("scalar", _like_match(lv.data, rv.data), T.BoolT)
        if not (lv.sqltype.is_string and lv.dictionary is not None):
            raise EvalError("LIKE requires a string column")
        pat = re.compile(_like_regex(rv.data))
        lut = np.asarray([bool(pat.fullmatch(s))
                          for s in lv.dictionary.strings()], dtype=bool)
        if len(lut) == 0:
            return Value(lv.kind, jnp.zeros(lv.data.shape, jnp.bool_), T.BoolT)
        codes = jnp.clip(lv.data, 0, len(lut) - 1)
        return Value(lv.kind, jnp.asarray(lut)[codes], T.BoolT)

    def _unary(self, e: A.UnaryOp) -> Value:
        if e.op == "exists" and isinstance(e.operand, A.Subquery):
            t = self._run_subquery(e.operand)
            return Value("scalar", t.nrows > 0, T.BoolT)
        v = self.eval(e.operand)
        if e.op == "-":
            if v.kind == "scalar" and v.data is None:
                return v
            return Value(v.kind, jnp.negative(v.data), v.sqltype,
                         v.dictionary, nulls=v.nulls)
        if e.op == "not":
            if v.kind == "scalar" and v.data is None:
                return v
            # NOT NULL is NULL: nullness passes through unchanged
            return Value(v.kind, jnp.logical_not(_as_bool(v.data)), T.BoolT,
                         nulls=v.nulls)
        if e.op == "missing":
            # IS NULL reads the validity mask (reference `missing`,
            # common/types.py:359-364, real against MonetDB nulls)
            if v.kind == "scalar":
                return Value("scalar", v.data is None, T.BoolT)
            if v.nulls is not None:
                return Value(v.kind, v.nulls, T.BoolT)
            return Value(v.kind, jnp.zeros(v.data.shape, jnp.bool_), T.BoolT)
        raise EvalError(f"unknown unary {e.op}")

    def _case(self, e: A.CaseWhen) -> Value:
        res = None
        t = None
        default = self.eval(e.default) if e.default is not None else None
        acc = default
        cap = self.ws.capacity
        if acc is not None and acc.kind == "scalar" and acc.data is None:
            acc = None                       # ELSE NULL ≡ no ELSE
        for cond, val in reversed(e.whens):
            c = self.to_row(self.eval(cond))
            v = self.to_row(self.eval(val))
            t = v.sqltype if t is None else T.promote(t, v.sqltype)
            sel = _as_bool(c.data)
            if c.nulls is not None:          # NULL condition never matches
                sel = sel & ~c.nulls
            base = (acc.data if acc is not None
                    else jnp.zeros((), jnp.asarray(v.data).dtype))
            res = jnp.where(sel, v.data, base)
            # unmatched rows with no ELSE are NULL; branch nulls propagate
            nullable = (v.nulls is not None or acc is None
                        or acc.nulls is not None)
            nulls = None
            if nullable:
                vn = v.nulls if v.nulls is not None else jnp.zeros(cap, jnp.bool_)
                an = (jnp.ones(cap, jnp.bool_) if acc is None
                      else acc.nulls if acc.nulls is not None
                      else jnp.zeros(cap, jnp.bool_))
                nulls = jnp.where(sel, jnp.broadcast_to(vn, (cap,)),
                                  jnp.broadcast_to(an, (cap,)))
            acc = Value("row", res, t, nulls=nulls)
        return acc if acc is not None else Value("scalar", None, T.DoubleT)

    def _index(self, e: A.Index) -> Value:
        base = self.eval(e.base)
        idx = self.eval(e.index)
        if base.kind == "row" and idx.kind == "scalar":
            i = jnp.asarray(idx.data, jnp.int32)
            return Value("scalar", base.data[i], base.sqltype, base.dictionary)
        if base.kind == "row":
            iv = self.to_row(idx)
            gathered = base.data[jnp.clip(iv.data.astype(jnp.int32), 0,
                                          base.data.shape[0] - 1)]
            return Value("row", gathered, base.sqltype, base.dictionary)
        raise EvalError("unsupported indexing")

    # -- calls -------------------------------------------------------------

    def _call(self, e: A.Call) -> Value:
        name = e.func

        # UDFs first (user functions may shadow builtins? reference
        # registers them alongside builtins; we give builtins priority
        # except when a UDF of the same name exists)
        if self.session is not None and name in self.session.udfs:
            return self._call_udf(self.session.udfs[name], e)
        if self.session is not None and name in self.session.module_functions:
            return self._call_module(self.session.module_functions[name], e)

        if name == "count" and (not e.args or isinstance(e.args[0], A.Star)):
            return Value("group", self.group_lens, T.LongT)

        if name in _AGG_NAMES:
            return self._call_agg(name, e)

        if name in _RUNNING_NAMES or name in _WINDOW_EXPLICIT:
            return self._call_windowed(name, e)

        if name == "subvec":
            return self._call_subvec(e)
        if name == "pack":
            cols = [self.to_row(self.eval(a)) for a in e.args]
            elem = cols[0].sqltype
            for c in cols[1:]:
                elem = T.promote(elem, c.sqltype)
            return Value("row", cols[0].data, T.VectorT(elem),
                         pack_cols=[c.data for c in cols])
        if name == "missing":
            return self._unary(A.UnaryOp("missing", e.args[0]))
        if name == "pow":
            a = self.eval(e.args[0])
            b = self.eval(e.args[1])
            kind = _result_kind(a.kind, b.kind)
            av = self.to_row(a).data if kind == "row" else a.data
            bv = self.to_row(b).data if kind == "row" else b.data
            return Value(kind, jnp.power(_as_float(av), bv), T.DoubleT)
        if name == "truncate":
            a = self.eval(e.args[0])
            p = self.eval(e.args[1])
            mult = 10.0 ** int(_host_scalar(p.data))
            return Value(a.kind, jnp.round(_as_float(a.data) * mult) / mult,
                         T.fp_type(a.sqltype))
        if name in _MATH_FNS:
            v = self.eval(e.args[0])
            data = _MATH_FNS[name](_as_float(v.data))
            return Value(v.kind, data, T.fp_type(v.sqltype))

        raise EvalError(f"unknown function {name}")

    def _call_agg(self, name: str, e: A.Call) -> Value:
        from aquery2_tpu.engine import grouped_agg

        args = [self.to_row(self.eval(a)) for a in e.args]
        # scalar fallback: agg of a scalar is the reference's no-op table
        # (aggregations.h:499-527)
        if args and args[0].kind == "scalar":
            return _scalar_agg_fallback(name, args)
        # SQL aggregates skip NULLs: a null row behaves exactly like a
        # subvec-masked-out row, so nulls fold into Value.mask
        folded = []
        for v in args:
            if v.kind == "row" and v.nulls is not None:
                m = ~v.nulls if v.mask is None else (v.mask & ~v.nulls)
                v = replace(v, mask=m, nulls=None)
            folded.append(v)
        return grouped_agg.compute(self, name, folded)

    def _call_windowed(self, name: str, e: A.Call) -> Value:
        args = list(e.args)
        w = None
        base = name
        if base in _WINDOW_EXPLICIT:
            base = {"sumw": "sums", "avgw": "avgs", "minw": "mins",
                    "maxw": "maxs", "varw": "vars", "stddevw": "stddevs",
                    "ratiow": "ratios"}[base]
            w = int(_host_scalar(self.eval(args[0]).data))
            args = args[1:]
        elif len(args) == 2 and base in scan.WINDOWED:
            # two-arg form avgs(3, x) = windowed (reference types.py:349-357)
            w = int(_host_scalar(self.eval(args[0]).data))
            args = args[1:]
        vals = [self.to_row(self.eval(a)) for a in args]
        v = vals[0]
        if v.kind == "scalar":
            return _scalar_window_fallback(base, v)
        if w is None:
            fn = scan.RUNNING[base]
            data = fn(v.data, self.pos, self.flags)
        else:
            fn = scan.WINDOWED[base]
            data = fn(w, v.data, self.pos, self.flags)
        return Value("row", data, scan.result_type(base, v.sqltype), v.dictionary)

    # -- SQL window functions (OVER) ----------------------------------------

    def _window(self, e: A.WindowExpr) -> Value:
        """fn(...) OVER (PARTITION BY ... ORDER BY ... [frame]).

        TPU-native plan: one stable lexsort by (validity, partition keys,
        order keys) moves every partition into a contiguous run; all frame
        math is then segmented scans over the whole column at once
        (ops/window.py), and one scatter restores row order. The reference
        parses the same clause (aquery_parser/windows.py:89-96) and lets
        MonetDB execute it."""
        from aquery2_tpu.ops import window as W

        if self.has_groups:
            raise EvalError(
                "window functions over GROUP BY queries are not supported; "
                "wrap the grouped query in a derived table")
        n, cap = self.ws.n, self.ws.capacity
        idx = jnp.arange(cap, dtype=jnp.int32)

        def orderable(v: Value) -> jax.Array:
            r = _to_ranks(v)
            d = r.data
            if d.dtype == jnp.bool_:
                d = d.astype(jnp.int8)
            return d

        # lexsort keys, minor → major (jnp.lexsort: last key is primary).
        # Per key, a nulls-last flag sits just above the value key.
        part_vals = [self.to_row(self.eval(p)) for p in e.partition_by]
        order_vals = [(self.to_row(self.eval(o.expr)), o.ascending)
                      for o in e.order_by]
        keys: list[jax.Array] = []
        for v, asc in reversed(order_vals):
            d = orderable(v)
            # DESC: ~d for integer kinds (exact for unsigned/INT_MIN
            # where -d wraps, ADVICE r4); -d only for floats
            keys.append(d if asc else
                        (~d if d.dtype.kind in "iu" else -d))
            if v.nulls is not None:
                keys.append(v.nulls)
        for v in reversed(part_vals):
            keys.append(orderable(v))
            if v.nulls is not None:
                keys.append(v.nulls)
        invalid = idx >= n
        keys.append(invalid)
        perm = jnp.lexsort(tuple(keys)) if keys else idx

        def srt(a: jax.Array) -> jax.Array:
            return a[perm]

        # partition starts: validity edge or any partition-key change.
        # NULL keys compare equal to each other (one NULL partition/peer
        # group): zero the value where null so garbage codes can't split it.
        def edge(acc: jax.Array, v: Value) -> jax.Array:
            d = srt(orderable(v))
            if v.nulls is not None:
                ns = srt(v.nulls)
                d = jnp.where(ns, jnp.zeros_like(d), d)
                acc = acc | jnp.concatenate(
                    [jnp.ones((1,), bool), ns[1:] != ns[:-1]])
            return acc | jnp.concatenate(
                [jnp.ones((1,), bool), d[1:] != d[:-1]])

        valid_s = ~invalid[perm]
        prev_differs = jnp.concatenate(
            [jnp.ones((1,), bool), valid_s[1:] != valid_s[:-1]])
        for v in part_vals:
            prev_differs = edge(prev_differs, v)
        flags = prev_differs
        pos = W.positions(flags)
        # peer groups: partition start or any order-key change
        peer_flags = flags
        for v, _asc in order_vals:
            peer_flags = edge(peer_flags, v)

        start_i = idx - pos
        last_i = W.last_index(flags)
        part_len = (last_i - start_i + 1).astype(jnp.int64)

        def unsort(a: jax.Array) -> jax.Array:
            return jnp.zeros(cap, a.dtype).at[perm].set(a)

        def out(data_s, sqltype, nulls_s=None, dictionary=None) -> Value:
            nulls = None if nulls_s is None else unsort(nulls_s)
            return Value("row", unsort(data_s), sqltype, dictionary,
                         nulls=nulls)

        fname = e.func.func
        args = list(e.func.args)
        if e.func.distinct:
            raise EvalError("DISTINCT window aggregates are not supported")

        # ---- ranking functions (frame-free) -------------------------------
        if fname in ("row_number", "rank", "dense_rank", "percent_rank",
                     "cume_dist", "ntile"):
            if fname == "row_number":
                return out((pos + 1).astype(jnp.int64), T.LongT)
            peer_first = W.first_index(peer_flags)
            if fname == "rank":
                return out((peer_first - start_i + 1).astype(jnp.int64),
                           T.LongT)
            if fname == "dense_rank":
                dr = scan.seg_cumsum(peer_flags.astype(jnp.int64), flags)
                return out(dr, T.LongT)
            if fname == "percent_rank":
                rk = (peer_first - start_i).astype(jnp.float64)
                denom = jnp.maximum(part_len - 1, 1).astype(jnp.float64)
                return out(jnp.where(part_len > 1, rk / denom, 0.0),
                           T.DoubleT)
            if fname == "cume_dist":
                peer_last = W.last_index(peer_flags)
                cd = (peer_last - start_i + 1).astype(jnp.float64) \
                    / part_len.astype(jnp.float64)
                return out(cd, T.DoubleT)
            # ntile(k)
            k = int(_host_scalar(self.eval(args[0]).data))
            tile = (pos.astype(jnp.int64) * k) // jnp.maximum(part_len, 1) + 1
            return out(tile, T.LongT)

        # ---- lag / lead ----------------------------------------------------
        if fname in ("lag", "lead"):
            v = self.to_row(self.eval(args[0]))
            off = 1
            if len(args) >= 2:
                off = int(_host_scalar(self.eval(args[1]).data))
            default = None
            if len(args) >= 3:
                default = self.eval(args[2])
            x_s = srt(v.data)
            n_s = srt(v.nulls) if v.nulls is not None else None
            tgt = idx - off if fname == "lag" else idx + off
            in_part = (tgt >= start_i) & (tgt <= last_i)
            g = jnp.clip(tgt, 0, cap - 1)
            data = jnp.where(in_part, x_s[g], x_s)
            nulls = jnp.zeros(cap, bool) if n_s is None else \
                jnp.where(in_part, n_s[g], False)
            if default is not None and default.data is not None:
                dv = default.data
                if v.sqltype.is_string:
                    if not (default.sqltype.is_string and v.dictionary):
                        raise EvalError("lag/lead default must match type")
                    dv = v.dictionary.encode_one(str(dv))
                data = jnp.where(in_part, data, jnp.asarray(dv, data.dtype))
            else:
                nulls = nulls | ~in_part
            return out(data, v.sqltype, nulls, v.dictionary)

        # ---- frame resolution ----------------------------------------------
        lo: int | None
        hi: int | None
        lo_idx = hi_idx = None
        if e.frame is None:
            if e.order_by:
                # default frame: RANGE UNBOUNDED PRECEDING .. CURRENT ROW
                lo, hi = None, 0
                hi_idx = W.last_index(peer_flags)
            else:
                lo = hi = None          # whole partition
        else:
            def bound(b: A.FrameBound, is_start: bool):
                if b.kind == "unbounded_preceding":
                    return None, None
                if b.kind == "unbounded_following":
                    return None, None
                if b.kind == "current":
                    if e.frame.unit == "range":
                        pf = W.first_index(peer_flags) if is_start \
                            else W.last_index(peer_flags)
                        return 0, pf
                    return 0, None
                if e.frame.unit == "range":
                    raise EvalError(
                        "RANGE frames with numeric offsets are not "
                        "supported; use ROWS")
                off = b.offset if b.kind == "following" else -b.offset
                return off, None
            lo, lo_idx = bound(e.frame.start, True)
            hi, hi_idx = bound(e.frame.end, False)
            if e.frame.start.kind == "unbounded_following" or \
                    e.frame.end.kind == "unbounded_preceding":
                raise EvalError("invalid window frame bounds")

        lo_i, hi_i, empty = W.frame_bounds(flags, lo, hi, lo_idx, hi_idx)

        # ---- first/last/nth value -------------------------------------------
        if fname in ("first_value", "last_value", "nth_value"):
            v = self.to_row(self.eval(args[0]))
            x_s = srt(v.data)
            n_s = srt(v.nulls) if v.nulls is not None else None
            if fname == "first_value":
                g = lo_i
            elif fname == "last_value":
                g = hi_i
            else:
                k = int(_host_scalar(self.eval(args[1]).data))
                g = lo_i + (k - 1)
                empty = empty | (g > hi_i)
                g = jnp.clip(g, 0, cap - 1)
            data = x_s[g]
            nulls = empty if n_s is None else (n_s[g] | empty)
            return out(data, v.sqltype, nulls, v.dictionary)

        # ---- frame aggregates ------------------------------------------------
        if fname not in ("sum", "avg", "mean", "min", "max", "count",
                         "var", "stddev"):
            raise EvalError(f"unsupported window function {fname}")

        if fname == "count" and (not args or isinstance(args[0], A.Star)):
            cnt = jnp.where(empty, 0, (hi_i - lo_i + 1).astype(jnp.int64))
            return out(cnt, T.LongT)

        v = self.to_row(self.eval(args[0]))
        x_s = srt(v.data)
        null_s = srt(v.nulls) if v.nulls is not None else None
        if v.mask is not None:
            m = srt(v.mask)
            null_s = ~m if null_s is None else (null_s | ~m)
        ind = valid_s if null_s is None else (valid_s & ~null_s)

        if fname == "count":
            C = scan.seg_cumsum(ind.astype(jnp.int64), flags)
            c = C[hi_i] - C[lo_i] + ind[lo_i].astype(jnp.int64)
            return out(jnp.where(empty, 0, c), T.LongT)

        if fname in ("min", "max"):
            op = jnp.minimum if fname == "min" else jnp.maximum
            is_str = v.sqltype.is_string and v.dictionary is not None
            xv = srt(orderable(v)) if is_str else x_s
            if jnp.issubdtype(xv.dtype, jnp.floating):
                ident = jnp.inf if fname == "min" else -jnp.inf
            else:
                info = jnp.iinfo(xv.dtype)
                ident = info.max if fname == "min" else info.min
            xe = jnp.where(ind, xv, jnp.asarray(ident, xv.dtype))
            if lo is not None and hi is not None and not (lo <= 0 <= hi):
                raise EvalError(
                    "bounded min/max window frames must include the "
                    "current row")
            r = W.frame_extreme(xe, flags, pos, lo, hi, op, lo_i, hi_i)
            C = scan.seg_cumsum(ind.astype(jnp.int32), flags)
            c = C[hi_i] - C[lo_i] + ind[lo_i].astype(jnp.int32)
            nulls = empty | (c == 0)
            if is_str:
                # result is a lexicographic rank → map back to codes
                ranks = np.asarray(v.dictionary.ranks)
                code_of_rank = jnp.asarray(np.argsort(ranks).astype(np.int32))
                r = code_of_rank[jnp.clip(r, 0, len(ranks) - 1)]
                return out(r, v.sqltype, nulls, v.dictionary)
            return out(r, v.sqltype, nulls, v.dictionary)

        xz = jnp.where(ind, x_s, jnp.zeros_like(x_s))
        if fname == "sum":
            s, c = W.frame_sum_count(xz, ind, flags, lo_i, hi_i)
            return out(s, T.long_type(v.sqltype), empty | (c == 0))
        s, q, c = W.frame_moments(xz, ind, flags, lo_i, hi_i)
        nulls = empty | (c == 0)
        cs = jnp.maximum(c, 1.0)
        if fname in ("avg", "mean"):
            return out(s / cs, T.DoubleT, nulls)
        varv = jnp.maximum(q / cs - (s / cs) ** 2, 0.0)
        if fname == "var":
            return out(varv, T.DoubleT, nulls)
        return out(jnp.sqrt(varv), T.DoubleT, nulls)

    def _call_subvec(self, e: A.Call) -> Value:
        v = self.to_row(self.eval(e.args[0]))
        a = int(_host_scalar(self.eval(e.args[1]).data))
        b = int(_host_scalar(self.eval(e.args[2]).data))
        mask = (self.pos >= a) & (self.pos < b)
        if v.mask is not None:
            mask = mask & v.mask
        return Value("row", v.data, v.sqltype, v.dictionary, mask=mask)

    def _call_udf(self, udf, e: A.Call) -> Value:
        from aquery2_tpu.engine import udf as udf_mod

        args = [self.eval(a) for a in e.args]
        if udf.is_aggregation:
            return udf_mod.run_aggregation_udf(self, udf, args)
        return udf_mod.run_scalar_udf(self, udf, args)

    def _call_module(self, fn, e: A.Call) -> Value:
        from aquery2_tpu.sdk import modules as sdk_modules

        return sdk_modules.call_module_function(self, fn, list(e.args))


# --- helpers --------------------------------------------------------------

def _or_nulls(a, b):
    """Combine operand null masks: null if either side is null."""
    if a is None:
        return b
    if b is None:
        return a
    return a | b


def _not_null(nulls, like):
    """Known-mask for Kleene logic; all-true when no null mask exists."""
    if nulls is None:
        return jnp.ones(jnp.shape(like), jnp.bool_) if hasattr(like, "shape") else True
    return ~nulls


def _result_kind(a: str, b: str) -> str:
    if "row" in (a, b):
        return "row"
    if "group" in (a, b):
        return "group"
    return "scalar"


def _as_bool(x):
    if isinstance(x, (bool, int, float)):
        return bool(x)
    if hasattr(x, "dtype") and x.dtype != jnp.bool_:
        return x != 0
    return x


def _as_float(x):
    if isinstance(x, (int, float)):
        return float(x)
    if hasattr(x, "dtype") and x.dtype.kind != "f":
        return x.astype(jnp.float64)
    return x


def _host_scalar(x) -> Any:
    if hasattr(x, "shape"):
        return np.asarray(x).item() if x.shape == () else np.asarray(x).reshape(-1)[0].item()
    return x


def _str_compare(op: str, a: str, b: str):
    return {"=": a == b, "<>": a != b, "<": a < b, ">": a > b,
            "<=": a <= b, ">=": a >= b}[op]


def _like_regex(pattern: str) -> str:
    import re

    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _like_match(s: str, pattern: str) -> bool:
    import re

    return bool(re.fullmatch(_like_regex(pattern), s))


def _to_ranks(v: Value) -> Value:
    """String codes → lexicographic ranks for ordering comparisons."""
    if not v.sqltype.is_string or v.dictionary is None:
        return v
    if v.kind == "scalar":
        return v  # literals were already rank-coerced
    ranks = np.asarray(v.dictionary.ranks)
    if len(ranks) == 0:
        return Value(v.kind, v.data, T.IntT, mask=v.mask)
    arr = jnp.asarray(ranks)[jnp.clip(v.data, 0, len(ranks) - 1)]
    return Value(v.kind, arr, T.IntT, mask=v.mask)


def _translate_codes(v: Value, target: StringDict) -> Value:
    src = v.dictionary
    remap = np.asarray([target.lookup(s) for s in src.strings()], dtype=np.int32)
    if len(remap) == 0:
        return replace(v, dictionary=target)
    data = jnp.asarray(remap)[jnp.clip(v.data, 0, len(remap) - 1)]
    return Value(v.kind, data, v.sqltype, target, v.mask)


def _scalar_agg_fallback(name: str, args: list[Value]) -> Value:
    """Aggregate applied to a scalar — reference's constexpr no-op table
    (aggregations.h:499-527): sum/avg/min/max/first/last = identity,
    count = 1, var/stddev = 0, corr = nan-ish (we return 1.0 identity-less
    cases conservatively)."""
    v = args[0]
    if name in ("sum", "avg", "mean", "min", "max", "first", "last", "median"):
        return v
    if name == "count":
        return Value("scalar", 1, T.LongT)
    if name in ("var", "stddev"):
        return Value("scalar", 0.0, T.DoubleT)
    if name == "corr":
        return Value("scalar", float("nan"), T.DoubleT)
    raise EvalError(f"aggregate {name} of scalar")


def _scalar_window_fallback(name: str, v: Value) -> Value:
    if name in ("sums", "avgs", "mins", "maxs", "prev", "next", "aggnext"):
        return v
    if name in ("deltas", "vars", "stddevs"):
        return Value("scalar", 0, v.sqltype)
    if name == "ratios":
        return Value("scalar", 1.0, T.DoubleT)
    return v
