"""Statement executor: DDL/DML/SELECT against a Session.

Counterpart of the reference's hybrid-engine compiler + C++ dispatcher
(engine/ast.py node classes → SQL + C++ → server.cpp command loop). Here
each parsed statement executes directly; SELECT lowers to the device
kernel pipeline:

    sources (join) → ASSUMING sort → WHERE compaction → GROUP BY
    → projection eval (grouped expression kinds) → HAVING → ORDER BY
    → DISTINCT → LIMIT → INTO

Reference parity anchors are noted per method.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.engine import groupby as gb
from aquery2_tpu.engine import join as join_mod
from aquery2_tpu.engine.eval import (
    EvalContext, EvalError, Value, WorkingSet, _translate_codes,
)
from aquery2_tpu.ops import filter as filter_ops
from aquery2_tpu.ops import ragged
from aquery2_tpu.ops.sort import sort_perm
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage import csvio
from aquery2_tpu.storage.result import Result
from aquery2_tpu.storage.table import Column, StringDict, Table, VectorColumn
from aquery2_tpu.utils import base62uuid, legal_name


class ExecError(Exception):
    pass


class Executor:
    def __init__(self, session) -> None:
        self.session = session

    # ------------------------------------------------------------------ #
    # statement dispatch
    # ------------------------------------------------------------------ #

    def execute(self, stmt: A.Statement) -> Result | None:
        if isinstance(stmt, A.CreateTable):
            return self._create_table(stmt)
        if isinstance(stmt, A.DropTable):
            self.session.catalog.drop(stmt.name, if_exists=stmt.if_exists)
            return None
        if isinstance(stmt, A.Insert):
            return self._insert(stmt)
        if isinstance(stmt, A.Delete):
            return self._delete(stmt)
        if isinstance(stmt, A.Update):
            return self._update(stmt)
        if isinstance(stmt, A.Load):
            tbl = self.session.catalog.get(stmt.table)
            csvio.load_csv_into(tbl, self.session.resolve_path(stmt.path),
                                field_sep=stmt.field_sep,
                                element_sep=stmt.element_sep,
                                complex_cells=stmt.complex)
            self.session.place_table(tbl)
            self.session.notify_insert(tbl.name)
            return None
        if isinstance(stmt, A.Select):
            table = self.run_select(stmt)
            return Result(table) if table is not None else None
        if isinstance(stmt, A.CreateFunction):
            from aquery2_tpu.engine.udf import Udf

            self.session.udfs[stmt.name.lower()] = Udf(stmt)
            return None
        if isinstance(stmt, A.LoadModule):
            from aquery2_tpu.sdk import modules as sdk_modules

            sdk_modules.load_module(self.session, stmt)
            return None
        if isinstance(stmt, A.CreateTrigger):
            self.session.triggers.create(stmt)
            return None
        if isinstance(stmt, A.DropTrigger):
            self.session.triggers.drop(stmt.name)
            return None
        if isinstance(stmt, A.CreateIndex):
            return None  # indexes are a no-op: scans are always vectorized
        if isinstance(stmt, A.CacheTable):
            return None  # tables are always device-resident here
        if isinstance(stmt, A.PassthroughSQL):
            # the reference forwards to MonetDB; we ARE the SQL engine:
            # parse and run the inner statements (engine/ast.py:1814-1841)
            from aquery2_tpu.parser import parse

            last = None
            for s in parse(stmt.text):
                r = self.execute(s)
                if r is not None:
                    last = r
            return last
        raise ExecError(f"cannot execute {type(stmt).__name__}")

    # ------------------------------------------------------------------ #
    # DDL / DML
    # ------------------------------------------------------------------ #

    def _create_table(self, stmt: A.CreateTable) -> None:
        if stmt.as_select is not None:
            tbl = self.run_select(stmt.as_select)
            tbl.name = stmt.name
            self.session.catalog.create(tbl, replace=True)
            self.session.place_table(tbl)
            return None
        cols: list[Column | VectorColumn] = []
        for cd in stmt.columns:
            t = T.from_sql_name(cd.type_name)
            if t.is_vector:
                cols.append(VectorColumn.from_lists(cd.name, t, []))
            elif t.is_string:
                cols.append(Column.from_host(cd.name, t, [], dictionary=StringDict()))
            else:
                cols.append(Column.from_host(cd.name, t, []))
        self.session.catalog.create(Table(stmt.name, cols))
        return None

    def _insert(self, stmt: A.Insert) -> None:
        tbl = self.session.catalog.get(stmt.table)
        if stmt.select is not None:
            src = self.run_select(stmt.select)
            tbl.append_table(src)
        else:
            rows = []
            for row in stmt.values:
                vals = []
                for e in row:
                    if isinstance(e, A.Literal):
                        vals.append(e.value)
                    elif isinstance(e, A.UnaryOp) and e.op == "-" and \
                            isinstance(e.operand, A.Literal):
                        vals.append(-e.operand.value)
                    else:
                        ctx = EvalContext(_empty_ws(), self.session)
                        vals.append(_host_item(ctx.eval(e).data))
                rows.append(vals)
            if stmt.columns:
                order = [c.lower() for c in stmt.columns]
                names = [c.lower() for c in tbl.column_names()]
                if set(order) != set(names):
                    raise ExecError("INSERT column list must cover all columns")
                perm = [order.index(n) for n in names]
                rows = [[r[i] for i in perm] for r in rows]
            tbl.append_rows(rows)
        self.session.place_table(tbl)
        self.session.notify_insert(tbl.name)
        return None

    def _delete(self, stmt: A.Delete) -> None:
        tbl = self.session.catalog.get(stmt.table)
        if stmt.where is None:
            for name in tbl.column_names():
                col = tbl.columns[name]
                if isinstance(col, VectorColumn):
                    tbl.columns[name] = VectorColumn.from_lists(
                        col.name, col.sqltype, [], dictionary=col.dictionary)
                else:
                    tbl.columns[name] = Column(
                        col.name, col.sqltype,
                        np.zeros(0, dtype=col.data.dtype), nrows=0,
                        dictionary=col.dictionary)
            return None
        ws = WorkingSet.from_table(tbl)
        ctx = EvalContext(ws, self.session)
        keep = ctx.eval(A.UnaryOp("not", stmt.where))
        ws2, _ = self._apply_filter(ws, ctx.to_row(keep))
        for name in tbl.column_names():
            v = ws2.column_value(name)
            tbl.columns[name] = Column(name, v.sqltype, v.data, nrows=ws2.n,
                                       dictionary=v.dictionary)
        return None

    def _update(self, stmt: A.Update) -> None:
        """UPDATE t SET c = expr [, ...] [WHERE cond] — masked overwrite
        of device columns (the reference forwards UPDATEs to MonetDB)."""
        tbl = self.session.catalog.get(stmt.table)
        ws = WorkingSet.from_table(tbl)
        ctx = EvalContext(ws, self.session)
        if stmt.where is not None:
            mv = ctx.to_row(ctx.eval(stmt.where))
            mask = mv.data if mv.data.dtype == jnp.bool_ else mv.data != 0
        else:
            mask = jnp.ones((ws.capacity,), jnp.bool_)
        idx = jnp.arange(ws.capacity, dtype=jnp.int32)
        mask = mask & (idx < ws.n)
        for cname, expr in stmt.assignments:
            col = tbl.columns[cname]
            if isinstance(col, VectorColumn):
                raise ExecError("UPDATE of vector columns not supported")
            nv = ctx.to_row(ctx.eval(expr))
            newdata = nv.data
            if col.sqltype.is_string:
                if isinstance(nv.data, str) or nv.kind == "scalar":
                    d = col.dictionary or StringDict()
                    code = d.encode_one(str(nv.data))
                    newdata = jnp.full((ws.capacity,), code, jnp.int32)
                elif nv.dictionary is not None and nv.dictionary is not col.dictionary:
                    newdata = _translate_codes(nv, col.dictionary).data
            elif nv.kind == "scalar":
                newdata = jnp.full((ws.capacity,), nv.data,
                                   col.data.dtype)
            data = jnp.where(mask, newdata.astype(col.data.dtype),
                             col.data[: ws.capacity])
            tbl.columns[cname] = Column(col.name, col.sqltype, data,
                                        nrows=tbl.nrows,
                                        dictionary=col.dictionary)
        return None

    # ------------------------------------------------------------------ #
    # SELECT pipeline
    # ------------------------------------------------------------------ #

    def run_select(self, sel: A.Select) -> Table:
        """SELECT entry point; on a mesh session, accounts whether the
        query ran as one SPMD program or fell back to single-chip logic
        over sharded arrays (VERDICT r2: fallbacks must be observable)."""
        session = self.session
        if session.mesh is None:
            return self._run_select(sel)
        prev = (session._dist_hit, session._dist_reason)   # re-entrant:
        session._dist_hit = False                          # nested SELECTs
        session._dist_reason = None                        # count separately
        try:
            t = self._run_select(sel)
        finally:
            if session._dist_hit:
                session.stats.dist_spmd += 1
            else:
                session._record_mesh_fallback(
                    session._dist_reason or "query class not distributed")
            session._dist_hit, session._dist_reason = prev
        return t

    def _run_select(self, sel: A.Select) -> Table:
        # accumulation-pattern aggregation UDFs rewrite into plain
        # aggregate expressions FIRST, so every tier below — fused,
        # distributed, general — executes them at built-in speed
        # (engine/udf_rewrite.py; reference simd-vectorizes the C++
        # lambda instead, engine/ast.py:1551-1812)
        if self.session.udfs:
            from aquery2_tpu.engine import udf_rewrite

            sel2 = udf_rewrite.rewrite_select(self.session, sel)
            if sel2 is not None:
                sel = sel2

        # SELECT DISTINCT <plain exprs> ≡ GROUP BY those exprs (the
        # reference hands DISTINCT to MonetDB; its own path is the
        # record-hash set, table.h:601-614). Rewriting lets the fused
        # single-chip tiers AND the distributed SPMD tiers execute
        # DISTINCT with the same one-program group-by machinery; both
        # produce the key-sorted order _distinct() would.
        sel2 = _distinct_to_groupby(sel, self.session)
        if sel2 is not None:
            sel = sel2

        # UNION/EXCEPT/INTERSECT containers: execute the main branch as
        # its own SELECT (riding every fused/SPMD tier) instead of
        # forcing it down the general pipeline (round 5 — mixed UNION
        # ALL of independent aggregates was the last always-fallback
        # class). Declines (None) when an outer ORDER BY key cannot be
        # resolved against the output columns statically.
        if sel.unions:
            t = self._run_union(sel)
            if t is not None:
                return t

        # fused fast path: grouped aggregation over a single table traces
        # into one XLA program (engine/fused_groupby.py); distributed
        # sessions run the SPMD variant over the mesh (engine/dist_query.py)
        if (sel.group_by and len(sel.sources) == 1
                and isinstance(sel.sources[0], A.TableSource)
                and sel.sources[0].name in self.session.catalog):
            if self.session.mesh is not None:
                from aquery2_tpu.engine import dist_query

                t = dist_query.run(
                    self.session, sel,
                    self.session.catalog.get(sel.sources[0].name))
                if t is not None:
                    return t
                # ordered/windowed grouped shapes (ASSUMING, subvec,
                # running aggregates): shuffle-by-key colocation tier
                from aquery2_tpu.engine import dist_ordered

                t = dist_ordered.run_ordered(
                    self.session, sel,
                    self.session.catalog.get(sel.sources[0].name))
                if t is not None:
                    return t
            from aquery2_tpu.engine import fused_groupby

            t = fused_groupby.run(self.session,
                                  sel, self.session.catalog.get(sel.sources[0].name))
            if t is not None:
                return t
            from aquery2_tpu.engine import fused_ordered

            t = fused_ordered.run(self.session,
                                  sel, self.session.catalog.get(sel.sources[0].name))
            if t is not None:
                return t

            from aquery2_tpu.engine import udf_device

            # scalar aggregation-UDF group-by: fused grouping preamble
            # + vmapped body (skips the multi-sync general pipeline)
            t = udf_device.try_run_fused(
                self.session, sel,
                self.session.catalog.get(sel.sources[0].name))
            if t is not None:
                return t

        if (not sel.assumptions
                and (len(sel.sources) == 2
                     or (len(sel.sources) == 1
                         and isinstance(sel.sources[0], A.JoinSource)))):
            # star/FK join + aggregation (comma, NATURAL, ON, USING
            # forms): dense-lookup the dim side, then the single-table
            # fused group-by — or its SPMD variant on a mesh session
            # (engine/fused_star.py); tried before the count-join so a
            # mesh session keeps join+group-by as ONE distributed program
            from aquery2_tpu.engine import fused_star

            t = fused_star.try_run(self.session, sel)
            if t is not None:
                return t

        if len(sel.sources) == 2 and not sel.group_by:
            from aquery2_tpu.engine import fused_join

            t = fused_join.try_run(self.session, sel)
            if t is not None:
                return t

        if (self.session.mesh is not None and not sel.assumptions
                and (len(sel.sources) == 2
                     or (len(sel.sources) == 1
                         and isinstance(sel.sources[0], A.JoinSource)))):
            # general distributed equi-join (non-unique/wide build keys):
            # materialized all_to_all shuffle join + SPMD aggregation
            from aquery2_tpu.engine import dist_join_query

            t = dist_join_query.try_run(self.session, sel)
            if t is not None:
                return t

        if not sel.group_by and not sel.assumptions:
            if (self.session.mesh is not None and len(sel.sources) == 1
                    and isinstance(sel.sources[0], A.TableSource)
                    and sel.sources[0].name in self.session.catalog):
                # OVER windows: shuffle-colocate partitions, run the
                # window kernels shard-locally (engine/dist_window.py)
                if any(isinstance(pr.expr, A.WindowExpr)
                       for pr in sel.projections):
                    from aquery2_tpu.engine import dist_window

                    t = dist_window.try_run(
                        self.session, sel,
                        self.session.catalog.get(sel.sources[0].name))
                    if t is not None:
                        return t
                # whole-table aggregates over the mesh: ONE psum
                from aquery2_tpu.engine import dist_query

                t = dist_query.run_ungrouped(
                    self.session, sel,
                    self.session.catalog.get(sel.sources[0].name))
                if t is not None:
                    return t
                # ungrouped projection scans: top-k (ORDER BY … LIMIT,
                # per-shard top-L + ONE replicated merge) or unbounded
                # (row-aligned lanes, host compaction) — dist_scan.py
                from aquery2_tpu.engine import dist_scan

                t = dist_scan.try_run(self.session, sel)
                if t is not None:
                    return t
            # ungrouped scan-filter-project-order-limit: ONE jitted
            # program, ONE host sync (engine/fused_scan.py)
            from aquery2_tpu.engine import fused_scan

            t = fused_scan.try_run(self.session, sel)
            if t is not None:
                return t

        ws, residual_where = self._build_sources(sel)

        if sel.assumptions:
            ws = self._apply_assuming(ws, sel.assumptions)

        if residual_where is not None:
            ctx0 = EvalContext(ws, self.session)
            mv = ctx0.eval(residual_where)
            ws, _ = self._apply_filter(ws, ctx0.to_row(mv))

        grouping = None
        key_value_list: list[Value] = []
        key_sentinels: list = []
        if sel.group_by:
            ctx0 = EvalContext(ws, self.session)
            key_value_list = [ctx0.to_row(ctx0.eval(e)) for e in sel.group_by]
            keys = []
            for v in key_value_list:
                # SQL groups all NULL keys together, distinct from every
                # real value: substitute a sentinel one past the non-null
                # max, and remember it so the output key column can carry
                # the null mask back out
                if v.kind == "row" and v.nulls is not None:
                    data, sent = _null_key_sentinel(v.data, v.nulls, ws.n)
                    key_sentinels.append(sent)
                    keys.append(_KeyCol(data, ws.n))
                else:
                    key_sentinels.append(None)
                    keys.append(_KeyCol(v.data, ws.n))
            grouping = gb.group_by(keys, ws.n)
            ws = ws.permuted(grouping.order, ws.n)

        ctx = EvalContext(ws, self.session, grouping)

        projections = self._expand_projections(sel, ws)
        named: list[tuple[str, Value | tuple]] = []
        for name, expr in projections:
            v = self._eval_projection(ctx, sel, expr, key_value_list, grouping,
                                      key_sentinels)
            named.append((name, v))

        table = self._materialize(ctx, named, has_groupby=grouping is not None)

        if sel.having is not None:
            table = self._apply_having(ctx, sel, table, named, grouping)

        for kind, sub in sel.unions:
            sub_t = self.run_select(sub)
            if kind in ("all", "distinct"):
                table.append_table(sub_t)
                if kind == "distinct":
                    table = self._distinct_any(table)
            else:   # EXCEPT [ALL] / INTERSECT [ALL]
                t2 = None
                if self.session.mesh is not None:
                    from aquery2_tpu.engine import dist_setop

                    t2 = dist_setop.try_setop(self.session, table, sub_t,
                                              kind)
                table = t2 if t2 is not None \
                    else self._set_op(table, sub_t, kind)

        if sel.distinct:
            table = self._distinct_any(table)

        if sel.order_by:
            table = self._apply_order(ctx, sel, table)

        if sel.limit is not None:
            table = _limit_table(table, sel.limit)

        if sel.into_table:
            table.name = sel.into_table
            self.session.catalog.create(table, replace=True)
        if sel.into_outfile:
            Result(table).to_csv(
                self.session.resolve_path(sel.into_outfile),
                sep=sel.outfile_sep, header=False)
        return table

    def _run_union(self, sel: A.Select) -> Table | None:
        """Set-operation container: main branch + every union arm run as
        independent SELECTs (each takes its own fused/SPMD tier and is
        accounted separately), then append/set-op/distinct/order/limit
        here. Returns None if an ORDER BY key needs the general
        pipeline's row context (not an output column)."""
        from dataclasses import replace as _replace

        # outer ORDER BY must resolve against output columns statically
        aliases = {(p.alias or "").lower() for p in sel.projections}
        proj_cols = {p.expr.name.lower() for p in sel.projections
                     if isinstance(p.expr, A.ColumnRef)}
        for item in (sel.order_by or []):
            e = item.expr
            if isinstance(e, A.ColumnRef) and e.table is None and \
                    (e.name.lower() in aliases
                     or e.name.lower() in proj_cols):
                continue
            if any(not isinstance(p.expr, A.Star) and p.expr == e
                   for p in sel.projections):
                continue
            return None

        main = _replace(sel, unions=(), order_by=(), limit=None,
                        distinct=False, into_table=None, into_outfile=None)
        session = self.session
        sp0 = fb0 = 0
        if session.mesh is not None:
            sp0, fb0 = session.stats.dist_spmd, session.stats.dist_fallback
        table = self.run_select(main)
        for kind, sub in sel.unions:
            sub_t = self.run_select(sub)
            if kind in ("all", "distinct"):
                table.append_table(sub_t)
                if kind == "distinct":
                    table = self._distinct_any(table)
            else:   # EXCEPT [ALL] / INTERSECT [ALL]
                t2 = None
                if session.mesh is not None:
                    from aquery2_tpu.engine import dist_setop

                    t2 = dist_setop.try_setop(session, table, sub_t, kind)
                table = t2 if t2 is not None \
                    else self._set_op(table, sub_t, kind)
        if session.mesh is not None and \
                session.stats.dist_fallback == fb0 and \
                session.stats.dist_spmd > sp0:
            # every branch ran SPMD → the container counts as SPMD too
            session.note_spmd()

        if sel.distinct:
            table = self._distinct_any(table)
        if sel.order_by and table.nrows:
            names = table.column_names()
            skeys = []
            for item in sel.order_by:
                e = item.expr
                col = None
                if isinstance(e, A.ColumnRef) and e.table is None \
                        and e.name in table.columns:
                    col = table.columns[e.name]
                else:
                    for p, out_name in zip(sel.projections, names):
                        if (not isinstance(p.expr, A.Star)
                                and p.expr == e) or \
                                (isinstance(e, A.ColumnRef) and p.alias
                                 and p.alias.lower() == e.name.lower()):
                            col = table.columns[out_name]
                            break
                if col is None:
                    return None     # raced projection rename: general path
                skeys.append((jnp.asarray(
                    _sort_key_of(col, table.nrows)), item.ascending))
            perm = np.asarray(sort_perm(skeys, table.nrows))[:table.nrows]
            table = _take_table(table, perm)
        if sel.limit is not None:
            table = _limit_table(table, sel.limit)
        if sel.into_table:
            table.name = sel.into_table
            self.session.catalog.create(table, replace=True)
        if sel.into_outfile:
            Result(table).to_csv(
                self.session.resolve_path(sel.into_outfile),
                sep=sel.outfile_sep, header=False)
        return table

    # -- sources -----------------------------------------------------------

    def _build_sources(self, sel: A.Select):
        """Resolve FROM into a WorkingSet; returns (ws, residual_where).

        Equi-conditions in WHERE that connect two sources become join keys
        (the reference builds the same `joint_cols` equivalence graph,
        engine/ast.py:874-1090)."""
        if not sel.sources:
            return _empty_ws(), sel.where

        conjuncts = _split_conjuncts(sel.where)
        used = [False] * len(conjuncts)

        def leaf(ts: A.TableSource) -> WorkingSet:
            tbl = self.session.catalog.get(ts.name)
            return WorkingSet.from_table(tbl, ts.alias)

        def build(src: A.Source) -> WorkingSet:
            if isinstance(src, A.TableSource):
                return leaf(src)
            if isinstance(src, A.SubquerySource):
                # derived table: run the subquery, use its result in place
                sub_t = self.run_select(src.select)
                if src.alias:
                    sub_t.name = src.alias
                return WorkingSet.from_table(sub_t, src.alias)
            left = build(src.left)
            right = build(src.right)
            if src.kind == "natural":
                keys = _common_columns(left, right)
                if not keys:
                    raise ExecError("NATURAL JOIN with no common columns")
                pairs = [((None, k), (None, k)) for k in keys]
            elif src.using:
                pairs = [((None, k), (None, k)) for k in src.using]
            elif src.on is not None:
                on_conj = _split_conjuncts(src.on)
                pairs = []
                for c in on_conj:
                    p = _equi_pair(c, left, right)
                    if p is None:
                        raise ExecError(f"unsupported join condition {c}")
                    pairs.append(p)
            elif src.kind == "cross":
                raise ExecError("CROSS JOIN not supported yet")
            else:
                raise ExecError("JOIN requires ON/USING")
            jkind = src.kind if src.kind in ("left", "right", "full") \
                else "inner"
            return self._join(left, right, pairs, kind=jkind)

        ws = build(sel.sources[0])
        for src in sel.sources[1:]:
            right = build(src)
            pairs = []
            for i, c in enumerate(conjuncts):
                if used[i]:
                    continue
                p = _equi_pair(c, ws, right)
                if p is not None:
                    pairs.append(p)
                    used[i] = True
            if not pairs:
                raise ExecError(
                    "comma-join without a connecting equality in WHERE "
                    "(cartesian products not supported)")
            ws = self._join(ws, right, pairs)

        residual = _join_conjuncts([c for i, c in enumerate(conjuncts) if not used[i]])
        return ws, residual

    def _join(self, left: WorkingSet, right: WorkingSet, pairs,
              kind: str = "inner") -> WorkingSet:
        lkeys, rkeys = [], []
        lnulls = rnulls = None
        for (lq, lname), (rq, rname) in pairs:
            lv = left.column_value(lname, lq)
            rv = right.column_value(rname, rq)
            if lv.sqltype.is_string and rv.dictionary is not None \
                    and lv.dictionary is not None and rv.dictionary is not lv.dictionary:
                rv = _translate_codes(rv, lv.dictionary)
            lkeys.append(lv.data)
            rkeys.append(rv.data)
            if lv.nulls is not None:
                lnulls = lv.nulls if lnulls is None else (lnulls | lv.nulls)
            if rv.nulls is not None:
                rnulls = rv.nulls if rnulls is None else (rnulls | rv.nulls)
        if kind in ("left", "right", "full"):
            li, ri, m = join_mod.outer_join(lkeys, rkeys, left.n, right.n,
                                            kind, lnulls, rnulls)
            cap = config.bucket_size(max(m, 1))
            li = jnp.asarray(np.pad(li, (0, cap - m)))
            ri = jnp.asarray(np.pad(ri, (0, cap - m)))
        else:
            li, ri, m = join_mod.equi_join(lkeys, rkeys, left.n, right.n,
                                           lnulls, rnulls)
            cap = config.bucket_size(max(m, 1))
            li = li[:cap]
            ri = ri[:cap]
        miss_l = li < 0          # outer-join null side (reads as all-NULL)
        miss_r = ri < 0
        sources = left.sources + right.sources
        indices: list = []
        missing: list = []
        for idx, om in zip(left.indices, left.missing):
            indices.append(li if idx is None
                           else idx[jnp.clip(li, 0, idx.shape[0] - 1)])
            nm = om[jnp.clip(li, 0, om.shape[0] - 1)] if om is not None else None
            if kind in ("right", "full"):
                nm = miss_l if nm is None else (nm | miss_l)
            missing.append(nm)
        for idx, om in zip(right.indices, right.missing):
            indices.append(ri if idx is None
                           else idx[jnp.clip(ri, 0, idx.shape[0] - 1)])
            nm = om[jnp.clip(ri, 0, om.shape[0] - 1)] if om is not None else None
            if kind in ("left", "full"):
                nm = miss_r if nm is None else (nm | miss_r)
            missing.append(nm)
        return WorkingSet(sources, indices, m, cap, missing=missing)

    def _apply_assuming(self, ws: WorkingSet, assumptions) -> WorkingSet:
        keys = []
        for a in assumptions:
            v = ws.column_value(a.col.name, a.col.table)
            arr = v.data
            if v.sqltype.is_string and v.dictionary is not None:
                ranks = jnp.asarray(v.dictionary.ranks)
                arr = ranks[jnp.clip(arr, 0, len(v.dictionary) - 1)]
            keys.append((arr, a.ascending))
        perm = sort_perm(keys, ws.n)
        return ws.permuted(perm, ws.n)

    def _apply_filter(self, ws: WorkingSet, mask_value: Value):
        mask = mask_value.data
        if not hasattr(mask, "dtype"):      # python bool/None scalar
            mask = jnp.full((ws.capacity,), bool(mask), jnp.bool_)
        if mask.ndim == 0:
            mask = jnp.broadcast_to(mask, (ws.capacity,))
        if mask.dtype != jnp.bool_:
            mask = mask != 0
        if mask_value.nulls is not None:    # NULL predicate excludes the row
            mask = mask & ~jnp.broadcast_to(mask_value.nulls, mask.shape)
        idx = jnp.arange(mask.shape[0], dtype=jnp.int32)
        mask = mask & (idx < ws.n)
        perm, cnt = filter_ops.compact_indices(mask)
        n = int(cnt)
        cap = config.bucket_size(max(n, 1))
        return ws.permuted(perm[:cap], n), n

    # -- projections -------------------------------------------------------

    def _expand_projections(self, sel: A.Select, ws: WorkingSet):
        out: list[tuple[str, A.Expr | Value | tuple]] = []
        names_seen: dict[str, int] = {}

        def uname(base: str) -> str:
            k = base.lower()
            if k not in names_seen:
                names_seen[k] = 0
                return base
            names_seen[k] += 1
            return f"{base}_{names_seen[k]}"

        for p in sel.projections:
            if isinstance(p.expr, A.Star):
                for cname, val in ws.all_columns():
                    out.append((uname(cname), val))
                continue
            name = p.alias or _derive_name(p.expr)
            out.append((uname(name), p.expr))
        return out

    def _eval_projection(self, ctx: EvalContext, sel: A.Select, expr,
                         key_value_list, grouping, key_sentinels=()) -> Value:
        if isinstance(expr, Value):           # pre-resolved (SELECT *)
            return expr
        if isinstance(expr, tuple):           # (si, VectorColumn) from *
            return expr
        if grouping is not None:
            ki = _match_group_key(expr, sel.group_by)
            if ki is not None:
                kv = key_value_list[ki]
                data = grouping.key_values[ki]
                gcap = ctx.gcap
                if data.shape[0] < gcap:
                    data = jnp.pad(data, (0, gcap - data.shape[0]))
                data = data[:gcap]
                nulls = None
                sent = key_sentinels[ki] if ki < len(key_sentinels) else None
                if sent is not None:            # restore the NULL-group key
                    nulls = data == jnp.asarray(sent, data.dtype)
                    data = jnp.where(nulls, jnp.zeros((), data.dtype), data)
                return Value("group", data, kv.sqltype, kv.dictionary,
                             nulls=nulls)
        return ctx.eval(expr)

    # -- materialization ---------------------------------------------------

    def _materialize(self, ctx: EvalContext, named, has_groupby: bool) -> Table:
        name_ = f"result_{base62uuid(4)}"
        has_row = any(isinstance(v, Value) and v.kind == "row"
                      or isinstance(v, tuple) for _, v in named)
        if has_groupby:
            nrows = ctx.G
        elif has_row:
            nrows = ctx.ws.n
        else:
            nrows = 1 if named else 0

        cols: list[Column | VectorColumn] = []
        for name, v in named:
            cols.append(self._materialize_one(ctx, name, v, has_groupby, nrows))
        t = Table.__new__(Table)
        t.name = name_
        from aquery2_tpu.utils import CaseInsensitiveDict

        t.columns = CaseInsensitiveDict()
        t.sorted_by = ()
        for c in cols:
            t.columns[c.name] = c
        return t

    def _materialize_one(self, ctx: EvalContext, name: str, v,
                         has_groupby: bool, nrows: int):
        if isinstance(v, tuple):  # passthrough VectorColumn from SELECT *
            si, vcol = v
            idx = ctx.ws.indices[si]
            if idx is None:
                return vcol.with_name(name)
            total_cap = config.bucket_size(max(int(np.asarray(vcol.offsets[-1])), 1))
            vals, offs = ragged.take(vcol.values, vcol.offsets,
                                     idx.astype(jnp.int32), ctx.ws.n,
                                     total_cap, int(np.asarray(vcol.offsets[-1])))
            return VectorColumn(name, vcol.sqltype, vals,
                                np.asarray(offs[: ctx.ws.n + 1]),
                                nrows=ctx.ws.n, dictionary=vcol.dictionary)

        assert isinstance(v, Value)
        if v.pack_cols is not None:
            k = len(v.pack_cols)
            n = nrows if not has_groupby else ctx.ws.n
            stacked = jnp.stack([c[: ctx.ws.capacity] for c in v.pack_cols],
                                axis=1).reshape(-1)
            offsets = np.arange(n + 1, dtype=np.int64) * k
            return VectorColumn(name, v.sqltype, stacked[: n * k], offsets,
                                nrows=n)

        if v.kind == "scalar":
            t = v.sqltype
            if isinstance(v.data, str):
                d = StringDict()
                code = d.encode_one(v.data)
                arr = np.full(nrows, code, dtype=np.int32)
                return Column(name, T.StrT, arr, nrows=nrows, dictionary=d)
            val = _host_item(v.data)
            arr = np.full(nrows, val if val is not None else 0,
                          dtype=t.np_dtype)
            valid = (np.zeros(nrows, bool) if val is None
                     else None)                       # NULL literal column
            return Column(name, t, arr, nrows=nrows, valid=valid)

        if v.kind == "group":
            data = v.data
            if has_groupby:
                return Column(name, v.sqltype, data[: max(ctx.G, 1)],
                              nrows=ctx.G, dictionary=v.dictionary,
                              valid=_valid_of(v, max(ctx.G, 1)))
            # trivial group (whole-table agg) → single row
            return Column(name, v.sqltype, data[:1], nrows=nrows,
                          dictionary=v.dictionary, valid=_valid_of(v, 1))

        # row kind
        if not has_groupby:
            if v.mask is not None:
                perm, cnt = filter_ops.compact_indices(
                    v.mask & (jnp.arange(v.mask.shape[0]) < ctx.ws.n))
                n2 = int(cnt)
                valid = (~v.nulls[perm][:max(n2, 1)]
                         if v.nulls is not None else None)
                return Column(name, v.sqltype, v.data[perm][:max(n2, 1)],
                              nrows=n2, dictionary=v.dictionary, valid=valid)
            return Column(name, v.sqltype, v.data, nrows=nrows,
                          dictionary=v.dictionary,
                          valid=_valid_of(v, v.data.shape[0]))

        # grouped ragged output: one vector per group
        offsets = ctx.np_offsets()
        if v.mask is None:
            total = int(offsets[-1])
            return VectorColumn(name, T.VectorT(v.sqltype), v.data[:max(total, 1)],
                                offsets, nrows=ctx.G, dictionary=v.dictionary)
        mask = v.mask & (jnp.arange(v.mask.shape[0]) < ctx.ws.n)
        perm, cnt = filter_ops.compact_indices(mask)
        values = v.data[perm]
        # per-group selected counts → offsets
        seg = jnp.minimum(ctx.seg, ctx.gcap).astype(jnp.int32)
        counts = jax_segment_sum(mask.astype(jnp.int64), seg, ctx.gcap + 1)[: ctx.G]
        counts = np.asarray(counts)
        offs = np.zeros(ctx.G + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        total = int(offs[-1])
        return VectorColumn(name, T.VectorT(v.sqltype), values[:max(total, 1)],
                            offs, nrows=ctx.G, dictionary=v.dictionary)

    # -- post-processing ---------------------------------------------------

    def _apply_having(self, ctx, sel, table: Table, named, grouping) -> Table:
        hv = ctx.eval(sel.having)
        if hv.kind != "group":
            raise ExecError("HAVING must be a per-group predicate")
        mask = np.asarray(hv.data[: table.nrows]).astype(bool)
        keep = np.nonzero(mask)[0]
        return _take_table(table, keep)

    def _apply_order(self, ctx, sel: A.Select, table: Table) -> Table:
        keys = []
        for item in sel.order_by:
            arr = self._order_key(ctx, sel, table, item.expr)
            keys.append((arr, item.ascending))
        n = table.nrows
        if n == 0:
            return table
        perm = np.asarray(sort_perm(
            [(jnp.asarray(k), asc) for k, asc in keys], n))[:n]
        return _take_table(table, perm)

    def _order_key(self, ctx, sel, table: Table, expr) -> np.ndarray:
        # 1. alias / output column
        if isinstance(expr, A.ColumnRef) and expr.table is None \
                and expr.name in table.columns:
            col = table.columns[expr.name]
            return _sort_key_of(col, table.nrows)
        # 2. AST equality with a projection
        for p, out_name in zip(sel.projections, table.column_names()):
            if not isinstance(p.expr, A.Star) and p.expr == expr:
                return _sort_key_of(table.columns[out_name], table.nrows)
        # 3. evaluate in grouped/ungrouped context, reduce to one per row
        v = ctx.eval(expr)
        if v.kind == "group":
            return np.asarray(v.data)[: table.nrows]
        if v.kind == "scalar":
            return np.zeros(table.nrows)
        if ctx.grouping is not None:
            from aquery2_tpu.engine import grouped_agg

            fv = grouped_agg.compute(ctx, "first", [v])
            return np.asarray(fv.data)[: table.nrows]
        return np.asarray(v.data)[: table.nrows]

    def _set_op(self, left: Table, right: Table, kind: str) -> Table:
        """EXCEPT [ALL] / INTERSECT [ALL] (reference except_clause,
        engine/ast.py:1143-1155 — executed by MonetDB there). Row-exact
        host-side set algebra over decoded tuples: result tables are
        post-aggregation and small, and tuple equality is exact where a
        64-bit row hash would not be. Left-input row order is preserved;
        the distinct forms dedupe the left side."""
        if left.ncols != right.ncols:
            raise ExecError("set operation requires equal column counts")
        if any(isinstance(c, VectorColumn) for c in
               list(left.columns.values()) + list(right.columns.values())):
            raise ExecError("set operations over vector columns not supported")
        lrows = Result(left).rows()
        rrows = Result(right).rows()
        out_rows: list[tuple]
        if kind == "except":
            rset = set(rrows)
            seen: set = set()
            out_rows = []
            for r in lrows:
                if r not in rset and r not in seen:
                    seen.add(r)
                    out_rows.append(r)
        elif kind == "except_all":      # bag difference
            from collections import Counter

            budget = Counter(rrows)
            out_rows = []
            for r in lrows:
                if budget[r] > 0:
                    budget[r] -= 1
                else:
                    out_rows.append(r)
        elif kind == "intersect":
            rset = set(rrows)
            seen = set()
            out_rows = []
            for r in lrows:
                if r in rset and r not in seen:
                    seen.add(r)
                    out_rows.append(r)
        elif kind == "intersect_all":   # bag intersection
            from collections import Counter

            budget = Counter(rrows)
            out_rows = []
            for r in lrows:
                if budget[r] > 0:
                    budget[r] -= 1
                    out_rows.append(r)
        else:
            raise ExecError(f"unknown set operation {kind}")

        out = Table.__new__(Table)
        out.name = left.name
        from aquery2_tpu.utils import CaseInsensitiveDict

        out.columns = CaseInsensitiveDict()
        out.sorted_by = ()
        for j, c in enumerate(left.columns.values()):
            vals = [r[j] for r in out_rows]
            if c.sqltype.is_temporal:
                # Result.rows() formatted temporals back to strings
                out.columns[c.name] = Column.from_host(c.name, c.sqltype, vals)
            else:
                out.columns[c.name] = Column.from_host(
                    c.name, c.sqltype, vals, dictionary=c.dictionary)
        return out

    def _distinct_any(self, table: Table) -> Table:
        """DISTINCT of a materialized table: SPMD tuple dedupe on a mesh
        session (engine/dist_setop.py), host group-by otherwise."""
        if self.session.mesh is not None:
            from aquery2_tpu.engine import dist_setop

            t = dist_setop.try_distinct(self.session, table)
            if t is not None:
                return t
        return self._distinct(table)

    def _distinct(self, table: Table) -> Table:
        """Deduplicate rows (reference `distinct` via record-hash set,
        table.h:601-614). Deterministic: output in key-sorted order.
        NULLs compare equal to each other (SQL duplicate-row rule) via
        the sentinel coding; masks carry through to the output."""
        n = table.nrows
        if n == 0:
            return table
        cols = list(table.columns.values())
        if any(isinstance(c, VectorColumn) for c in cols):
            raise ExecError("DISTINCT over vector columns not supported")
        keys = []
        sents: list = []
        for c in cols:
            if c.valid is not None:
                data, sent = _null_key_sentinel(c.data, ~c.valid, n)
                sents.append(sent)
                keys.append(_KeyCol(data, n))
            else:
                sents.append(None)
                keys.append(_KeyCol(c.data, n))
        grouping = gb.group_by(keys, n)
        out = Table.__new__(Table)
        out.name = table.name
        from aquery2_tpu.utils import CaseInsensitiveDict

        out.columns = CaseInsensitiveDict()
        out.sorted_by = ()
        G = grouping.num_groups
        for c, kv, sent in zip(cols, grouping.key_values, sents):
            kv = kv[:max(G, 1)]
            valid = None
            if sent is not None:
                valid = kv != jnp.asarray(sent, kv.dtype)
                kv = jnp.where(valid, kv, jnp.zeros((), kv.dtype))
            out.columns[c.name] = Column(c.name, c.sqltype,
                                         kv.astype(c.data.dtype),
                                         nrows=G, dictionary=c.dictionary,
                                         valid=valid)
        return out


# --------------------------------------------------------------------- #
# helpers
# --------------------------------------------------------------------- #

def _distinct_to_groupby(sel: A.Select, session) -> A.Select | None:
    """Rewrite SELECT DISTINCT e1,…,ek → SELECT e1,…,ek GROUP BY e1,…,ek
    when every projection is a plain row expression (no aggregates, no
    windows, no *). Returns the rewritten Select or None. Conservative:
    only column refs, literals, arithmetic/comparison operators and pure
    math calls qualify — anything order-dependent or aggregate-like
    keeps the post-materialization _distinct() path."""
    if (not sel.distinct or sel.group_by or sel.unions
            or sel.having is not None or sel.assumptions
            or not sel.sources):
        return None

    from aquery2_tpu.engine.fused_groupby import _MATH

    def plain(e) -> bool:
        if isinstance(e, (A.ColumnRef, A.Literal)):
            return True
        if isinstance(e, A.BinOp):
            return plain(e.left) and plain(e.right)
        if isinstance(e, A.UnaryOp):
            return plain(e.operand)
        if isinstance(e, A.Call):
            return e.func in _MATH and all(plain(a) for a in e.args)
        return False

    # bare-literal projections stay on _distinct() (GROUP BY <literal>
    # would read as a constant key; SELECT DISTINCT 1 must give one row)
    if not sel.projections or any(isinstance(p.expr, (A.Star, A.Literal))
                                  or not plain(p.expr)
                                  for p in sel.projections):
        return None

    # every leaf source must be a catalog table, and no referenced
    # column may be a vector (grouping over ragged cells is undefined;
    # _distinct() raises the explicit error instead)
    def leaves(src):
        if isinstance(src, A.TableSource):
            yield src
        elif isinstance(src, A.JoinSource):
            yield from leaves(src.left)
            yield from leaves(src.right)
        else:
            yield None
    refs: set[str] = set()

    def walk(e):
        if isinstance(e, A.ColumnRef):
            refs.add(e.name.lower())
        elif isinstance(e, A.BinOp):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, A.UnaryOp):
            walk(e.operand)
        elif isinstance(e, A.Call):
            for a in e.args:
                walk(a)
    for p in sel.projections:
        walk(p.expr)
    for src in sel.sources:
        for leaf in leaves(src):
            if leaf is None or leaf.name not in session.catalog:
                return None
            t = session.catalog.get(leaf.name)
            for nm in refs:
                if nm in t.columns and isinstance(t.columns[nm],
                                                  VectorColumn):
                    return None
    import dataclasses

    group_by = []
    for p in sel.projections:          # dedupe repeated key exprs
        if not any(p.expr == g for g in group_by):
            group_by.append(p.expr)
    return dataclasses.replace(sel, distinct=False, group_by=group_by)


def jax_segment_sum(x, seg, num_segments):
    import jax

    return jax.ops.segment_sum(x, seg, num_segments=num_segments)


class _KeyCol:
    """Adapter giving group_by() computed key arrays with lazy stats."""

    def __init__(self, data, n: int):
        self.data = data
        self.n = n
        self._stats = None

    def stats(self):
        if self._stats is None:
            idx = jnp.arange(self.data.shape[0], dtype=jnp.int32)
            d = self.data
            if d.dtype == jnp.bool_:
                d = d.astype(jnp.int32)
                self.data = d
            if d.dtype.kind in ("i", "u"):
                big = jnp.iinfo(d.dtype).max
                small = jnp.iinfo(d.dtype).min
            else:
                big, small = jnp.inf, -jnp.inf
            mn = jnp.min(jnp.where(idx < self.n, d, big))
            mx = jnp.max(jnp.where(idx < self.n, d, small))
            self._stats = (int(mn), int(mx)) if d.dtype.kind in ("i", "u", "b") \
                else (float(mn), float(mx))
        return self._stats


def _empty_ws() -> WorkingSet:
    t = Table("__dual__", [])
    ws = WorkingSet([( "__dual__", t)], [None], 1, 1)
    return ws


def _split_conjuncts(e: A.Expr | None) -> list[A.Expr]:
    if e is None:
        return []
    if isinstance(e, A.BinOp) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _join_conjuncts(cs: list[A.Expr]) -> A.Expr | None:
    if not cs:
        return None
    out = cs[0]
    for c in cs[1:]:
        out = A.BinOp("and", out, c)
    return out


def _equi_pair(c: A.Expr, left: WorkingSet, right: WorkingSet):
    """If c is `lcol = rcol` linking left to right → ((lq,lname),(rq,rname))."""
    if not (isinstance(c, A.BinOp) and c.op == "="):
        return None
    a, b = c.left, c.right
    if not (isinstance(a, A.ColumnRef) and isinstance(b, A.ColumnRef)):
        return None

    def side(ref: A.ColumnRef, ws: WorkingSet) -> bool:
        return ws.has_column(ref.name, ref.table)

    a_l, a_r = side(a, left), side(a, right)
    b_l, b_r = side(b, left), side(b, right)
    # qualified names pin the side; unqualified must be unambiguous
    if a_l and b_r and not (a_r and b_l):
        return ((a.table, a.name), (b.table, b.name))
    if b_l and a_r and not (b_r and a_l):
        return ((b.table, b.name), (a.table, a.name))
    if a_l and b_r:
        return ((a.table, a.name), (b.table, b.name))
    return None


def _common_columns(left: WorkingSet, right: WorkingSet) -> list[str]:
    lnames = {c.lower(): c for _, t in left.sources for c in t.column_names()}
    out = []
    for _, t in right.sources:
        for c in t.column_names():
            if c.lower() in lnames:
                out.append(c)
    return out


def _match_group_key(expr: A.Expr, group_by: list[A.Expr]) -> int | None:
    for i, g in enumerate(group_by):
        if expr == g:
            return i
        # unqualified vs qualified column refs naming the same column
        if isinstance(expr, A.ColumnRef) and isinstance(g, A.ColumnRef) \
                and expr.name.lower() == g.name.lower():
            return i
    return None


def _derive_name(e: A.Expr) -> str:
    if isinstance(e, A.ColumnRef):
        return e.name
    if isinstance(e, A.Call):
        inner = "_".join(_derive_name(a) for a in e.args if not isinstance(a, A.Star))
        return legal_name(f"{e.func}_{inner}") if inner else e.func
    if isinstance(e, A.BinOp):
        return legal_name(f"{_derive_name(e.left)}_{e.op}_{_derive_name(e.right)}")
    if isinstance(e, A.Literal):
        return legal_name(str(e.value))
    if isinstance(e, A.UnaryOp):
        return legal_name(f"{e.op}_{_derive_name(e.operand)}")
    return f"col_{base62uuid(4)}"


def _valid_of(v, k: int):
    """Validity mask of length k from a Value's null mask, or None."""
    if v.nulls is None:
        return None
    nulls = v.nulls
    if not hasattr(nulls, "shape") or nulls.ndim == 0:
        return jnp.broadcast_to(~jnp.asarray(nulls, jnp.bool_), (k,))
    return ~nulls[:k]


def _null_key_sentinel(data, nulls, n: int):
    """Substitute NULL key rows with a sentinel one past the non-null max
    so SQL's 'all NULLs form one group' holds. Returns (data', sentinel)."""
    idx = jnp.arange(data.shape[0], dtype=jnp.int32)
    ok = (idx < n) & ~nulls
    if data.dtype.kind == "f":
        sent = jnp.inf
        return jnp.where(nulls, jnp.asarray(sent, data.dtype), data), sent
    d64 = data.astype(jnp.int64)
    mx = jnp.max(jnp.where(ok, d64, jnp.iinfo(jnp.int64).min))
    sent = int(max(int(mx), -2**62)) + 1
    wide = jnp.where(nulls, jnp.asarray(sent, jnp.int64), d64)
    if sent <= jnp.iinfo(data.dtype).max:
        return wide.astype(data.dtype), sent
    return wide, sent


def _host_item(x):
    if hasattr(x, "shape"):
        a = np.asarray(x)
        return a.item() if a.shape == () else a.reshape(-1)[0].item()
    return x


def _sort_key_of(col, n: int) -> np.ndarray:
    if isinstance(col, VectorColumn):
        # order by a vector column: use each vector's first element
        vals = np.asarray(col.values)
        offs = np.asarray(col.offsets)
        first = vals[np.clip(offs[:n], 0, max(len(vals) - 1, 0))]
        lens = (offs[1: n + 1] - offs[:n])
        first = np.where(lens > 0, first, np.zeros_like(first))
        return first
    if col.sqltype.is_string and col.dictionary is not None:
        ranks = col.dictionary.ranks
        codes = np.asarray(col.data[:n])
        key = ranks[np.clip(codes, 0, max(len(ranks) - 1, 0))]
    else:
        key = np.asarray(col.data[:n])
    if getattr(col, "valid", None) is not None:
        # NULLs sort first ascending (MonetDB convention): dtype minimum
        ok = np.asarray(col.valid[:n])
        small = (np.iinfo(key.dtype).min if key.dtype.kind in "iu"
                 else -np.inf if key.dtype.kind == "f" else 0)
        key = np.where(ok, key, small)
    return key


def _take_table(table: Table, idx: np.ndarray) -> Table:
    out = Table.__new__(Table)
    out.name = table.name
    from aquery2_tpu.utils import CaseInsensitiveDict

    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    k = len(idx)
    for c in table.columns.values():
        if isinstance(c, VectorColumn):
            vals = np.asarray(c.values)
            offs = np.asarray(c.offsets)
            lists = [vals[offs[i]: offs[i + 1]].tolist() for i in idx]
            out.columns[c.name] = VectorColumn.from_lists(
                c.name, c.sqltype, lists, dictionary=c.dictionary)
        else:
            data = np.asarray(c.data)[idx] if k else np.zeros(0, c.data.dtype)
            valid = None
            if c.valid is not None:
                valid = (np.asarray(c.valid)[idx] if k
                         else np.zeros(0, bool))
            out.columns[c.name] = Column(c.name, c.sqltype, data, nrows=k,
                                         dictionary=c.dictionary, valid=valid)
    return out


def _limit_table(table: Table, k: int) -> Table:
    n = min(table.nrows, k)
    return _take_table(table, np.arange(n))
