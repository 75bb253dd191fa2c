"""SQL-level materialized distributed join (general two-table shapes).

Covers the equi-join aggregation queries the star rewrite declines —
non-unique build keys, unbounded key domains — by materializing the join
over the mesh (parallel/dist_join.dist_equijoin_safe: radix all_to_all
shuffle → shard-local sort-merge probe → CSR pair expansion) and then
running the rewritten single-table aggregation as the usual SPMD program
(engine/dist_query.py) over the joined, row-sharded, ragged-validity
buffers. Reference analogue: the shared-memory hash join feeding the
grouped post-processing stage (server/hasher.h:146-199,
engine/ast.py:874-1090) — which cannot scale past one node.

Pipeline (two SPMD programs, no host round-trip between them beyond the
overflow check):

    shuffle+join  →  tmp table {__jk, __l_*, __r_*} sharded [ndev·cap]
                     with per-shard validity (tmp.shard_valid)
    dist_query    →  grouped/ungrouped aggregation over tmp
"""

from __future__ import annotations

from dataclasses import replace

import jax.numpy as jnp

from aquery2_tpu import config
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, Table
from aquery2_tpu.utils import CaseInsensitiveDict


def _split_conjuncts(e):
    if isinstance(e, A.BinOp) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _and_all(conds):
    out = None
    for c in conds:
        out = c if out is None else A.BinOp(op="and", left=out, right=c)
    return out


def try_run(session, sel: A.Select) -> Table | None:
    """Distributed two-table equi-join aggregation; None → fall back."""
    mesh = getattr(session, "mesh", None)
    if mesh is None or mesh.shape[session.mesh_axis] <= 1:
        return None
    if sel.assumptions or sel.distinct or sel.unions:
        return None

    # normalize JOIN ... ON/USING/NATURAL into the comma+WHERE form;
    # RIGHT joins swap sides into LEFT (emit-unmatched-probe) form
    sources = list(sel.sources)
    extra_conds: list[A.Expr] = []
    jkind = "inner"
    if len(sources) == 1 and isinstance(sources[0], A.JoinSource):
        js = sources[0]
        if not (isinstance(js.left, A.TableSource)
                and isinstance(js.right, A.TableSource)
                and js.kind in ("inner", "natural", "left", "right",
                                "full")):
            return None
        try:
            lt = session.catalog.get(js.left.name)
            rt = session.catalog.get(js.right.name)
        except KeyError:
            return None
        la = js.left.alias or js.left.name
        ra = js.right.alias or js.right.name
        if js.on is not None:
            extra_conds = _split_conjuncts(js.on)
        else:
            names = (list(js.using) if js.using else
                     [nm for nm in lt.column_names()
                      if nm.lower() in {c.lower() for c in rt.column_names()}])
            if len(names) != 1:
                return None
            extra_conds = [A.BinOp(
                op="=", left=A.ColumnRef(name=names[0], table=la),
                right=A.ColumnRef(name=names[0], table=ra))]
        sources = [js.left, js.right]
        if js.kind == "right":
            sources = [js.right, js.left]
            jkind = "left"
        elif js.kind in ("left", "full"):
            jkind = js.kind
    if len(sources) != 2 or not all(isinstance(s, A.TableSource)
                                    for s in sources):
        return None
    try:
        tables = [session.catalog.get(s.name) for s in sources]
    except KeyError:
        return None
    aliases = [(s.alias or s.name).lower() for s in sources]

    # shapes: GROUP BY / all-aggregate projections (→ dist_query over
    # the joined buffers), or pure row projections (→ dist_scan over
    # them: top-k merge or unbounded row-aligned lanes — round 5,
    # VERDICT r4 #6). Mixed agg+row ungrouped shapes stay general.
    from aquery2_tpu.engine.fused_star import _contains_agg

    row_projection = False
    if not sel.group_by:
        if not sel.projections or any(isinstance(p.expr, A.Star)
                                      for p in sel.projections):
            return None
        n_agg = sum(_contains_agg(p.expr) for p in sel.projections)
        if n_agg == 0:
            row_projection = True
        elif n_agg != len(sel.projections):
            return None

    def side_of(ref: A.ColumnRef):
        if ref.table is not None:
            tl = ref.table.lower()
            for i, s in enumerate(sources):
                if tl in (aliases[i], s.name.lower()):
                    return i if ref.name in tables[i].columns else None
            return None
        hits = [i for i in (0, 1) if ref.name in tables[i].columns]
        return hits[0] if len(hits) == 1 else None

    # exactly one cross-table equality link (v1). For OUTER joins the
    # link must come from the ON clause — a WHERE equality filters
    # AFTER null-extension (it would silently turn the join inner).
    conds = extra_conds + (_split_conjuncts(sel.where)
                           if sel.where is not None else [])
    link = None
    residual = []
    for i, c in enumerate(conds):
        linkable = jkind == "inner" or i < len(extra_conds)
        if (link is None and linkable and isinstance(c, A.BinOp)
                and c.op == "="
                and isinstance(c.left, A.ColumnRef)
                and isinstance(c.right, A.ColumnRef)):
            ls, rs = side_of(c.left), side_of(c.right)
            if ls is not None and rs is not None and ls != rs:
                link = ((c.left, ls), (c.right, rs))
                continue
        residual.append(c)
    if link is None:
        return None
    if jkind != "inner" and residual:
        # residual predicates over null-extended rows need 3-valued
        # WHERE logic — keep the general path (counted fallback)
        session.note_dist_bail("outer join with residual predicates")
        return None

    (refa, sa), (refb, sb) = link
    key_by_side = {sa: refa, sb: refb}
    lkey_col = tables[0].columns[key_by_side[0].name]
    rkey_col = tables[1].columns[key_by_side[1].name]
    for kc in (lkey_col, rkey_col):
        if getattr(kc, "is_vector", False) or kc.data.dtype.kind not in "iub":
            return None
    if lkey_col.sqltype.is_string or rkey_col.sqltype.is_string:
        if lkey_col.dictionary is not rkey_col.dictionary:
            return None          # dictionary translation: general path

    # rewrite refs onto the joined tmp table; collect per-side payloads.
    # Null-extended sides: their KEY column reads as NULL on unmatched
    # rows, but __jk always carries the preserved side's value — so a
    # null-side key reference cannot map to __jk and bails.
    null_sides = {"inner": frozenset(), "left": frozenset({1}),
                  "full": frozenset({0, 1})}[jkind]
    key_names = {i: key_by_side[i].name.lower() for i in (0, 1)}
    payloads: dict[int, dict[str, str]] = {0: {}, 1: {}}
    unresolvable = []

    def rewrite(e):
        if isinstance(e, A.ColumnRef):
            s = side_of(e)
            if s is None:
                unresolvable.append(e)
                return e
            if e.name.lower() == key_names[s]:
                if s in null_sides:
                    unresolvable.append(e)
                    return e
                return A.ColumnRef(name="__jk", table=None)
            mang = payloads[s].setdefault(
                e.name.lower(), f"__{'lr'[s]}_{e.name.lower()}")
            return A.ColumnRef(name=mang, table=None)
        if isinstance(e, A.BinOp):
            return A.BinOp(op=e.op, left=rewrite(e.left),
                           right=rewrite(e.right))
        if isinstance(e, A.UnaryOp):
            return A.UnaryOp(op=e.op, operand=rewrite(e.operand))
        if isinstance(e, A.Call):
            return A.Call(func=e.func,
                          args=tuple(a if isinstance(a, A.Star)
                                     else rewrite(a) for a in e.args),
                          distinct=e.distinct)
        return e

    new_group = [rewrite(g) for g in sel.group_by]
    new_projs = [A.Projection(expr=(p.expr if isinstance(p.expr, A.Star)
                                    else rewrite(p.expr)), alias=p.alias)
                 for p in sel.projections]
    new_resid = [rewrite(c) for c in residual]
    new_having = rewrite(sel.having) if sel.having is not None else None
    new_order = [replace(o, expr=rewrite(o.expr))
                 for o in (sel.order_by or [])]
    if unresolvable:
        return None
    for p in sel.projections:
        if isinstance(p.expr, A.Star):
            return None

    # nullable/vector payloads: bail (join-side null threading is future)
    for s in (0, 1):
        for nm in list(payloads[s]) + [key_names[s]]:
            c = tables[s].columns[nm]
            if getattr(c, "is_vector", False) \
                    or getattr(c, "valid", None) is not None:
                session.note_dist_bail(
                    "NULL/vector columns in distributed join")
                return None

    ndev = mesh.shape[session.mesh_axis]
    lcap = int(lkey_col.data.shape[0])
    rcap = int(rkey_col.data.shape[0])
    if lcap % ndev or rcap % ndev or not tables[0].nrows \
            or not tables[1].nrows:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    # note_spmd is left to the dist_query tier that consumes the joined
    # buffers — if it declines, the query correctly counts as a fallback

    from aquery2_tpu.parallel.dist_join import (dist_equijoin_outer_safe,
                                                dist_equijoin_safe)
    from aquery2_tpu.parallel.mesh import shard_1d

    axis = session.mesh_axis
    S = lambda x: shard_1d(mesh, x, axis)       # noqa: E731
    lnames = sorted(payloads[0])
    rnames = sorted(payloads[1])
    lpays = [S(tables[0].columns[nm].data) for nm in lnames]
    rpays = [S(tables[1].columns[nm].data) for nm in rnames]
    lvalid = S(jnp.arange(lcap, dtype=jnp.int32) < tables[0].nrows)
    rvalid = S(jnp.arange(rcap, dtype=jnp.int32) < tables[1].nrows)

    blk = max(lcap, rcap) // ndev
    bucket_cap = config.bucket_size(max(2 * blk // ndev, 512))
    out_cap = config.bucket_size(max(2 * blk, 1024))
    if jkind == "inner":
        key_out, louts, routs, ok, pairs = dist_equijoin_safe(
            mesh, axis, S(lkey_col.data), lvalid, lpays,
            S(rkey_col.data), rvalid, rpays, bucket_cap, out_cap)
        lnull = rnull = None
    else:
        key_out, louts, routs, ok, lnull, rnull, pairs = \
            dist_equijoin_outer_safe(
                mesh, axis, S(lkey_col.data), lvalid, lpays,
                S(rkey_col.data), rvalid, rpays, bucket_cap, out_cap,
                emit_left=True, emit_right=(jkind == "full"))

    tmp = Table.__new__(Table)
    tmp.name = "__dist_join_tmp"
    tmp.columns = CaseInsensitiveDict()
    tmp.sorted_by = ()
    cap_out = int(key_out.shape[0])
    # Column() pads data/valid to bucket_size(cap_out); the bare
    # shard_valid attribute must pad identically (False) or the SPMD
    # lane masks misalign (outer-join outputs append an m-sized block
    # per shard, so cap_out is not always already bucket-shaped)
    padcap = config.bucket_size(cap_out)
    if padcap != cap_out:
        ok = jnp.pad(ok, (0, padcap - cap_out))
        if lnull is not None:
            lnull = jnp.pad(lnull, (0, padcap - cap_out))
        if rnull is not None:
            rnull = jnp.pad(rnull, (0, padcap - cap_out))
    tmp.columns["__jk"] = Column("__jk", lkey_col.sqltype, key_out,
                                 nrows=cap_out,
                                 dictionary=lkey_col.dictionary)
    for nm, arr in zip(lnames, louts):
        src = tables[0].columns[nm]
        tmp.columns[payloads[0][nm]] = Column(
            payloads[0][nm], src.sqltype, arr, nrows=cap_out,
            dictionary=src.dictionary,
            valid=(~lnull if lnull is not None and jkind == "full"
                   else None))
    for nm, arr in zip(rnames, routs):
        src = tables[1].columns[nm]
        tmp.columns[payloads[1][nm]] = Column(
            payloads[1][nm], src.sqltype, arr, nrows=cap_out,
            dictionary=src.dictionary,
            valid=(~rnull if rnull is not None else None))
    tmp.shard_valid = ok

    new_sel = replace(
        sel, sources=[A.TableSource(name="__dist_join_tmp", alias=None)],
        where=_and_all(new_resid), group_by=list(new_group),
        projections=list(new_projs), having=new_having,
        order_by=list(new_order))

    from aquery2_tpu.engine import dist_query, dist_scan

    if new_sel.group_by:
        return dist_query.run(session, new_sel, tmp)
    if row_projection:
        return dist_scan.try_run(session, new_sel, table=tmp)
    return dist_query.run_ungrouped(session, new_sel, tmp)
