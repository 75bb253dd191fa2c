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


def try_run(session, sel: A.Select) -> Table | None:
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
    if sel.limit is None or sel.limit > _MAX_LIMIT:
        return None          # O(n) ordered output: fallback assembles
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        return None
    if sel.sources[0].name not in session.catalog:
        return None
    table = session.catalog.get(sel.sources[0].name)
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
    cap = int(arrays[0].shape[0])
    if cap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    blk = cap // ndev
    L = config.bucket_size(max(min(sel.limit, blk), 8))
    # Output slice: the merge holds ndev·L candidates, which always cover
    # the global top-min(limit, ndev·L) (limit ≤ blk ⇒ L ≥ limit per
    # shard; limit > blk ⇒ L ≥ blk keeps every shard row). Slicing to L
    # alone silently truncated results whenever limit > blk (ADVICE r4).
    Lout = min(config.bucket_size(max(min(sel.limit, ndev * L), 8)),
               ndev * L)
    session.note_spmd()

    fingerprint = ("dist-scan", ndev, L, Lout,
                   repr([(nm, e) for nm, e in projections]), repr(where),
                   repr(order), tuple(lut_names),
                   tuple((a.shape[0], str(a.dtype)) for a in arrays))
    entry = _cache.get(fingerprint)
    if entry is None:
        entry = _build(projections, where, order, lut_names, col_order,
                       mesh, axis, ndev, blk, cap, L, Lout)
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
           ndev, blk, cap, L, Lout):
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
