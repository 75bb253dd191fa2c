"""Distributed ungrouped ORDER BY … LIMIT (top-k) scans.

The last ungrouped query class running single-chip logic on a mesh
session: SELECT row-exprs FROM t [WHERE …] ORDER BY … LIMIT L. The
SPMD form is the classic distributed top-k — each shard filters,
evaluates, and sorts ITS rows, keeps its local top-L (a shard's
contribution to the global top-L can never exceed L rows), and one
replicated merge sort of the ndev·L candidates yields the exact global
answer. Outputs are replicated (≤ ndev·L rows), so every process holds
the full result — multi-process safe, unlike the O(n) host-assembly
tiers. LIMIT-less ordered scans (O(n) output) stay on the fallback
path.

Reference analogue: ORDER BY …  LIMIT is handed to MonetDB single-node
(engine/ast.py orderby/outfile lowering); no distributed analogue
exists there.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from aquery2_tpu import config
from aquery2_tpu import types as T
from aquery2_tpu.engine import fused_groupby as fg
from aquery2_tpu.engine import fused_scan as fs
from aquery2_tpu.engine.dist_ordered import _shard
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, Table
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_cache: dict[tuple, Any] = {}

_MAX_LIMIT = 1 << 17        # top-k merge stays ndev·L ≪ rows


def try_run(session, sel: A.Select, table: Table | None = None) -> Table | None:
    """Distributed projection scans. Two modes:

    * top-k (ORDER BY … LIMIT ≤ _MAX_LIMIT): per-shard local top-L +
      one replicated merge (round 4).
    * unbounded (no LIMIT, or LIMIT past the merge cap): row-aligned
      projection lanes + keep mask, evaluated shard-locally with no
      collectives; host assembly compacts/sorts, and the lanes
      replicate in-program under multi-controller runs (round 5 — the
      same write-back contract as the window tier).

    ``table`` may be passed directly (the joined row-sharded tmp of
    engine/dist_join_query.py — its ragged ``shard_valid`` mask is
    threaded through as an extra validity lane)."""
    mesh = getattr(session, "mesh", None)
    if mesh is None:
        return None
    axis = session.mesh_axis
    ndev = mesh.shape[axis]
    if ndev <= 1:
        return None
    if (sel.group_by or sel.assumptions or sel.distinct or sel.unions
            or sel.having or sel.into_outfile):
        return None
    if table is None:
        if len(sel.sources) != 1 \
                or not isinstance(sel.sources[0], A.TableSource):
            return None
        if sel.sources[0].name not in session.catalog:
            return None
        table = session.catalog.get(sel.sources[0].name)
    unbounded = sel.limit is None or sel.limit > _MAX_LIMIT
    cols = table.columns
    n = table.nrows
    if n == 0:
        session.note_dist_bail("empty table")
        return None

    # reuse the single-chip fused-scan grammar/planning (string-literal
    # code folding, alias resolution, fused row-expression checks)
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
                        raise fs._Bail("vector column in *")
                    projections.append((uname(c.name),
                                        A.ColumnRef(c.name, None)))
                continue
            e = fs._rewrite_string_literals(p.expr, cols)
            fs._check_expr(e, cols, allow_string=True)
            projections.append((uname(p.alias or _derive_name(p.expr)), e))

        where = None
        if sel.where is not None:
            where = fs._rewrite_string_literals(sel.where, cols)
            fs._check_expr(where, cols, allow_string=True)

        order: list[tuple[A.Expr, bool]] = []
        for item in (sel.order_by or []):
            e = item.expr
            if isinstance(e, A.ColumnRef) and e.table is None \
                    and e.name not in cols:
                for nm, pe in projections:
                    if nm.lower() == e.name.lower():
                        e = pe
                        break
            e = fs._rewrite_string_literals(e, cols)
            fs._check_expr(e, cols, allow_string=True)
            order.append((e, item.ascending))
    except fs._Bail as e:
        session.note_dist_bail(f"unsupported scan shape: {e}")
        return None

    referenced: set[str] = set()
    for _, e in projections:
        referenced.update(fg._refs(e))
    if where is not None:
        referenced.update(fg._refs(where))
    for e, _ in order:
        referenced.update(fg._refs(e))
    col_order = sorted(referenced)
    if table.has_nulls(col_order):
        session.note_dist_bail("NULL columns in distributed scan")
        return None
    if any(getattr(cols[nm], "is_vector", False) for nm in col_order):
        session.note_dist_bail("vector column in distributed scan")
        return None

    luts = {}
    for e, _asc in order:
        if isinstance(e, A.ColumnRef) and cols[e.name].sqltype.is_string \
                and cols[e.name].dictionary is not None:
            d = cols[e.name].dictionary
            luts[e.name.lower()] = (jnp.asarray(d.ranks) if len(d)
                                    else jnp.zeros((1,), jnp.int32))
    lut_names = sorted(luts)

    arrays = [cols[nm].data for nm in col_order]
    if not arrays:
        session.note_dist_bail("no referenced columns in distributed scan")
        return None
    shard_valid = getattr(table, "shard_valid", None)
    if shard_valid is not None:
        arrays = arrays + [shard_valid]
    has_sv = shard_valid is not None
    cap = int(arrays[0].shape[0])
    if cap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    blk = cap // ndev

    if unbounded:
        return _run_unbounded(session, sel, table, projections, where,
                              order, lut_names, luts, col_order, has_sv,
                              arrays, mesh, axis, ndev, blk, cap, n)

    L = config.bucket_size(max(min(sel.limit, blk), 8))
    # Output slice: the merge holds ndev·L candidates, which always cover
    # the global top-min(limit, ndev·L) (limit ≤ blk ⇒ L ≥ limit per
    # shard; limit > blk ⇒ L ≥ blk keeps every shard row). Slicing to L
    # alone silently truncated results whenever limit > blk (ADVICE r4).
    Lout = min(config.bucket_size(max(min(sel.limit, ndev * L), 8)),
               ndev * L)
    session.note_spmd()

    fingerprint = ("dist-scan", ndev, L, Lout, has_sv,
                   repr([(nm, e) for nm, e in projections]), repr(where),
                   repr(order), tuple(lut_names),
                   tuple((a.shape[0], str(a.dtype)) for a in arrays))
    entry = _cache.get(fingerprint)
    if entry is None:
        entry = _build(projections, where, order, lut_names, col_order,
                       mesh, axis, ndev, blk, cap, L, Lout, has_sv)
        _cache[fingerprint] = entry

    sharded = [_shard(mesh, axis, a) for a in arrays]
    session._last_spmd = (entry, (n, tuple(luts[nm] for nm in lut_names),
                                  *sharded))      # comm accounting
    sorted_projs, cnt = entry(n, tuple(luts[nm] for nm in lut_names),
                              *sharded)
    m = min(int(cnt), sel.limit)       # the ONE sync
    out_cap = config.bucket_size(max(m, 1))

    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    for (nm, e), arr in zip(projections, sorted_projs):
        if isinstance(e, A.ColumnRef) and cols[e.name].sqltype.is_string:
            src = cols[e.name]
            out.columns[nm] = Column(nm, src.sqltype, arr[:out_cap],
                                     nrows=m, dictionary=src.dictionary)
        else:
            st = fs._result_type(e, cols, arr)
            out.columns[nm] = Column(nm, st, arr[:out_cap], nrows=m)

    if sel.into_table:
        out.name = sel.into_table
        session.catalog.create(out, replace=True)
    return out


def _build(projections, where, order, lut_names, col_order, mesh, axis,
           ndev, blk, cap, L, Lout, has_sv=False):
    def fused(nn, luts_in, *arrs):
        nspec = len(arrs)
        nproj = len(projections)
        nord = len(order)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), *([P(axis)] * nspec)),
                 out_specs=((P(axis),) * (2 + nord + nproj)   # top-L lanes
                            + (P(),)))                        # total count
        def local(nn_, luts_l, *blocks):
            d = jax.lax.axis_index(axis).astype(jnp.int32)
            gidx = d * blk + jnp.arange(blk, dtype=jnp.int32)
            env = dict(zip(col_order, blocks))
            valid = gidx < nn_
            if has_sv:
                valid = valid & blocks[-1]      # joined-tmp ragged rows
            if where is not None:
                w = fg._row_eval(where, env)
                if not hasattr(w, "dtype"):
                    w = jnp.broadcast_to(jnp.asarray(bool(w)), (blk,))
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            cnt = jax.lax.psum(jnp.sum(valid, dtype=jnp.int64), axis)
            projs = []
            for _nm, e in projections:
                v = fg._row_eval(e, env)
                if not hasattr(v, "shape") or v.ndim == 0:
                    v = jnp.broadcast_to(jnp.asarray(v), (blk,))
                projs.append(v)
            okeys = []
            for e, asc in order:
                k = fg._row_eval(e, env)
                if isinstance(e, A.ColumnRef) and e.name.lower() in lut_names:
                    lut = luts_l[lut_names.index(e.name.lower())]
                    k = lut[jnp.clip(k, 0, lut.shape[0] - 1)]
                if not asc:
                    k = ~k if k.dtype.kind in "iu" else (
                        ~k.astype(jnp.int32) if k.dtype == jnp.bool_ else -k)
                okeys.append(k)
            # shard-local: invalid last, order keys, gidx tiebreak (the
            # stable general-path order); keep ONLY the local top-L —
            # a shard can contribute at most L rows to the global top-L
            res = jax.lax.sort([~valid, *okeys, gidx, *projs],
                               num_keys=2 + nord, is_stable=False)
            return (*[r[:L] for r in res], cnt)

        res = local(nn, luts_in, *arrs)
        cnt = res[-1]
        lanes = res[:-1]               # each [ndev·L], row-sharded
        nord = len(order)
        # replicated merge: ONE sort of the ndev·L candidates — every
        # process holds the full top-L (multi-controller contract)
        merged = jax.lax.sort(list(lanes), num_keys=2 + nord,
                              is_stable=False)
        rep = lambda x: jax.lax.with_sharding_constraint(       # noqa
            x[:Lout], jax.sharding.NamedSharding(mesh, P()))
        return [rep(x) for x in merged[2 + nord:]], jnp.minimum(
            cnt, jnp.int64(Lout))

    return jax.jit(fused)


# --------------------------------------------------------------------- #
# unbounded mode: O(rows) projection output, row-aligned lanes
# --------------------------------------------------------------------- #

def _run_unbounded(session, sel, table, projections, where, order,
                   lut_names, luts, col_order, has_sv, arrays,
                   mesh, axis, ndev, blk, cap, n):
    """LIMIT-less (or merge-cap-exceeding) projection scans: evaluate
    row-aligned lanes shard-locally (no collectives), assemble by
    boolean compaction + host ORDER BY. Under multi-controller runs the
    lanes replicate in-program (the result materialization cost)."""
    from aquery2_tpu.engine.executor import _limit_table, _take_table
    from aquery2_tpu.ops.sort import sort_perm

    session.note_spmd()
    fingerprint = ("dist-scan-unbounded", ndev, has_sv,
                   repr([(nm, e) for nm, e in projections]), repr(where),
                   repr(order), tuple(lut_names),
                   tuple((a.shape[0], str(a.dtype)) for a in arrays))
    entry = _cache.get(fingerprint)
    if entry is None:
        entry = _build_unbounded(projections, where, order, lut_names,
                                 col_order, mesh, axis, ndev, blk, has_sv)
        _cache[fingerprint] = entry
    sharded = [_shard(mesh, axis, a) for a in arrays]
    lut_vals = tuple(luts[nm] for nm in lut_names)
    session._last_spmd = (entry, (n, lut_vals, *sharded))
    keep, projs, okeys = entry(n, lut_vals, *sharded)

    cols = table.columns
    keep_np = np.asarray(keep)
    m = int(keep_np.sum())
    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    for (nm, e), arr in zip(projections, projs):
        data = np.asarray(arr)[keep_np]
        if isinstance(e, A.ColumnRef) and cols[e.name].sqltype.is_string:
            src = cols[e.name]
            out.columns[nm] = Column(nm, src.sqltype, data, nrows=m,
                                     dictionary=src.dictionary)
        else:
            st = fs._result_type(e, cols, data)
            out.columns[nm] = Column(nm, st, data, nrows=m)

    if order and m:
        skeys = [(jnp.asarray(np.asarray(k)[keep_np]), asc)
                 for k, (_e, asc) in zip(okeys, order)]
        perm = np.asarray(sort_perm(skeys, m))[:m]
        out = _take_table(out, perm)
    if sel.limit is not None:
        out = _limit_table(out, sel.limit)
    if sel.into_table:
        out.name = sel.into_table
        session.catalog.create(out, replace=True)
    return out


def _build_unbounded(projections, where, order, lut_names, col_order,
                     mesh, axis, ndev, blk, has_sv):
    def fused(nn, luts_in, *arrs):
        nspec = len(arrs)
        nproj = len(projections)
        nord = len(order)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), *([P(axis)] * nspec)),
                 out_specs=((P(axis),) * (1 + nproj + nord)))
        def local(nn_, luts_l, *blocks):
            d = jax.lax.axis_index(axis).astype(jnp.int32)
            gidx = d * blk + jnp.arange(blk, dtype=jnp.int32)
            env = dict(zip(col_order, blocks))
            valid = gidx < nn_
            if has_sv:
                valid = valid & blocks[-1]      # joined-tmp ragged rows
            if where is not None:
                w = fg._row_eval(where, env)
                if not hasattr(w, "dtype"):
                    w = jnp.broadcast_to(jnp.asarray(bool(w)), (blk,))
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid = valid & w
            outs = [valid]
            for _nm, e in projections:
                v = fg._row_eval(e, env)
                if not hasattr(v, "shape") or v.ndim == 0:
                    v = jnp.broadcast_to(jnp.asarray(v), (blk,))
                outs.append(v)
            for e, _asc in order:
                k = fg._row_eval(e, env)
                if not hasattr(k, "shape") or k.ndim == 0:
                    k = jnp.broadcast_to(jnp.asarray(k), (blk,))
                if isinstance(e, A.ColumnRef) and e.name.lower() in lut_names:
                    lut = luts_l[lut_names.index(e.name.lower())]
                    k = lut[jnp.clip(k, 0, lut.shape[0] - 1)]
                outs.append(k)
            return tuple(outs)

        res = local(nn, luts_in, *arrs)
        if jax.process_count() > 1:
            repf = lambda x: jax.lax.with_sharding_constraint(  # noqa
                x, jax.sharding.NamedSharding(mesh, P()))
            res = tuple(repf(x) for x in res)
        nproj = len(projections)
        return res[0], res[1:1 + nproj], res[1 + nproj:]

    return jax.jit(fused)
