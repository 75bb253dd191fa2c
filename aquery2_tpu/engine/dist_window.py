"""Distributed SQL window functions (OVER clauses) over a device mesh.

VERDICT r3 missing #1: OVER windows were the largest query class still
falling back to single-chip logic on a mesh session. Partitions are
independent, so the same shuffle-colocation recipe as the distributed
ordered tier applies: an all_to_all radix shuffle on the PARTITION BY
key colocates every partition on exactly one shard, after which the
single-chip window kernels (ops/window.py — segmented scans, no
per-partition loop) run shard-locally and are EXACT. Each row carries
its global index through the shuffle; the host re-orders the per-shard
outputs back to input row order (window functions preserve row order).

Reference analogue: the OVER grammar the reference parses
(aquery_parser/windows.py:89-96) and hands to MonetDB single-node; the
windowed kernels live in server/aggregations.h:127-330. Neither scales
past one node — this tier is the new axis.

Supported shape: SELECT of plain row expressions and window calls over
one table, where every window shares the same non-empty PARTITION BY
(plain packable key columns) and the same OVER ORDER BY. Frames: none,
ROWS with literal bounds, or the default RANGE-to-current-row. Function
set mirrors engine/eval.py's single-chip `_window`: frame aggregates
(sum/avg/min/max/count/var/stddev), ranking (row_number/rank/dense_rank/
percent_rank/cume_dist), lag/lead, first/last/nth_value. NULL-able
referenced columns bail to the (equality-tested) fallback.
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
from aquery2_tpu.engine.dist_ordered import (_MultiKey, _shard, _shuffle,
                                             _WordKey)
from aquery2_tpu.ops import scan
from aquery2_tpu.ops import window as W
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, Table
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_cache: dict[tuple, Any] = {}

_RANKING = {"row_number", "rank", "dense_rank", "percent_rank",
            "cume_dist", "ntile"}
_GATHER = {"lag", "lead", "first_value", "last_value", "nth_value"}
_FRAME_AGGS = {"sum", "avg", "mean", "min", "max", "count", "var", "stddev"}


def _walk_cols(e, out: set):
    if isinstance(e, A.ColumnRef):
        out.add(e.name.lower())
    elif isinstance(e, A.BinOp):
        _walk_cols(e.left, out)
        _walk_cols(e.right, out)
    elif isinstance(e, A.UnaryOp):
        _walk_cols(e.operand, out)
    elif isinstance(e, A.Call):
        for a in e.args:
            if not isinstance(a, A.Star):
                _walk_cols(a, out)
    elif isinstance(e, A.CaseWhen):
        for cond, val in e.whens:
            _walk_cols(cond, out)
            _walk_cols(val, out)
        if e.default is not None:
            _walk_cols(e.default, out)


def _plan(session, sel: A.Select, table: Table):
    """Return the plan dict or None (bail reason reported)."""
    if (sel.group_by or sel.assumptions or sel.unions or sel.distinct
            or sel.having is not None):
        return None
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        return None
    cols = table.columns

    referenced: set[str] = set()
    wins: list[A.WindowExpr] = []
    projections: list[tuple] = []       # ("win", win_index) | ("row", expr)
    for pr in sel.projections:
        e = pr.expr
        if isinstance(e, A.WindowExpr):
            projections.append(("win", len(wins), pr.alias, e))
            wins.append(e)
            continue
        if isinstance(e, A.Star):
            return None
        if isinstance(e, A.ColumnRef) and e.name in cols \
                and not getattr(cols[e.name], "is_vector", False):
            pass        # bare column (string codes pass through)
        else:
            try:
                fg._check_row_expr(e, cols)
            except fg.Unsupported:
                return None
        _walk_cols(e, referenced)
        projections.append(("row", None, pr.alias, e))
    if not wins:
        return None

    def bail(msg: str):
        session.note_dist_bail(msg)
        return None

    # all windows must share the PARTITION BY (one shuffle); differing
    # OVER ORDER BY clauses each get their own shard-local sorted layout
    part = wins[0].partition_by
    for w in wins[1:]:
        if repr(w.partition_by) != repr(part):
            return bail("window partition keys differ across projections")
    if not part:
        return bail("window without PARTITION BY")
    for k in part:
        if isinstance(k, A.ColumnRef) and k.name in cols:
            continue
        try:                            # computed partition key
            fg._check_row_expr(k, cols)
        except fg.Unsupported:
            return bail("untraceable window partition key")
        _walk_cols(k, referenced)

    layouts: list[list] = []            # distinct OVER ORDER BY lists
    layout_of: list[int] = []           # per-window layout index
    for w in wins:
        sig = repr(w.order_by)
        for li, lo in enumerate(layouts):
            if repr(lo) == sig:
                layout_of.append(li)
                break
        else:
            layout_of.append(len(layouts))
            layouts.append(list(w.order_by))

    for k in part:
        _walk_cols(k, referenced)
    for lo in layouts:
        for o in lo:
            try:
                fg._check_row_expr(o.expr, cols)
            except fg.Unsupported:
                return bail("untraceable window order key")
            _walk_cols(o.expr, referenced)
            okset: set[str] = set()
            _walk_cols(o.expr, okset)
            for nm in okset:
                if nm in cols and cols[nm].sqltype.is_string:
                    return bail("string window order key")
    if sel.where is not None:
        try:
            fg._check_row_expr(sel.where, cols)
        except fg.Unsupported:
            return bail("untraceable WHERE")
        _walk_cols(sel.where, referenced)

    for w in wins:
        fname = w.func.func
        if w.func.distinct:
            return bail("DISTINCT window aggregate")
        if fname in _RANKING:
            if fname == "ntile" and (not w.func.args or _literal_value(
                    w.func.args[0]) is None):
                return bail("ntile requires a literal tile count")
        elif fname in _GATHER:
            a0 = w.func.args[0] if w.func.args else None
            if a0 is None or isinstance(a0, A.Star):
                return bail(f"{fname} requires an argument")
            if isinstance(a0, A.ColumnRef) and a0.name in cols \
                    and cols[a0.name].sqltype.is_string:
                referenced.add(a0.name.lower())   # codes gather: fine
            else:
                try:
                    fg._check_row_expr(a0, cols)
                except fg.Unsupported:
                    return bail("untraceable window argument")
                _walk_cols(a0, referenced)
            for extra in w.func.args[1:]:
                if _literal_value(extra) is None:
                    return bail("non-literal window offset/default")
        elif fname in _FRAME_AGGS:
            args = [a for a in w.func.args if not isinstance(a, A.Star)]
            if fname == "count" and not args:
                pass
            else:
                if not args:
                    return bail(f"{fname} requires an argument")
                try:
                    fg._check_row_expr(args[0], cols)
                except fg.Unsupported:
                    return bail("untraceable window argument")
                aset: set[str] = set()
                _walk_cols(args[0], aset)
                for nm in aset:
                    if nm in cols and cols[nm].sqltype.is_string:
                        return bail("string window aggregate argument")
                referenced |= aset
        else:
            return bail(f"unsupported window function {fname}")
        fr = w.frame
        if fr is not None:
            for b in (fr.start, fr.end):
                if b.kind in ("preceding", "following") and fr.unit == "range":
                    return bail("RANGE frame with numeric offsets")
            if fr.start.kind == "unbounded_following" or \
                    fr.end.kind == "unbounded_preceding":
                return bail("invalid window frame bounds")
        if fname in ("min", "max") and fr is not None and fr.unit == "rows":
            lo = (None if fr.start.kind == "unbounded_preceding"
                  else 0 if fr.start.kind == "current" else -fr.start.offset
                  if fr.start.kind == "preceding" else fr.start.offset)
            hi = (None if fr.end.kind == "unbounded_following"
                  else 0 if fr.end.kind == "current" else fr.end.offset
                  if fr.end.kind == "following" else -fr.end.offset)
            if lo is not None and hi is not None and not (lo <= 0 <= hi):
                return bail("bounded min/max frame excludes current row")

    # outer ORDER BY keys: output columns, or row exprs over source
    # columns (evaluated post-assembly from the kept rows' global idx)
    order_by: list[tuple] = []          # ("col", i, asc) | ("expr", e, asc)
    for item in (sel.order_by or []):
        target = None
        for i, pr in enumerate(sel.projections):
            if not isinstance(pr.expr, A.Star) and pr.expr == item.expr:
                target = i
                break
            if (isinstance(item.expr, A.ColumnRef) and item.expr.table is None
                    and pr.alias
                    and pr.alias.lower() == item.expr.name.lower()):
                target = i
                break
        if target is not None:
            order_by.append(("col", target, item.ascending))
            continue
        try:
            fg._check_row_expr(item.expr, cols)
        except fg.Unsupported:
            return bail("untraceable order key")
        oset: set[str] = set()
        _walk_cols(item.expr, oset)
        if any(nm in cols and cols[nm].sqltype.is_string for nm in oset):
            return bail("string order key is not an output column")
        referenced |= oset              # host re-eval needs these columns
        order_by.append(("expr", item.expr, item.ascending))

    # NULL-able columns (round 5, VERDICT r4 #7): aggregate arguments
    # and row projections thread their validity masks through the
    # shuffle + per-layout sorts (SQL aggregates skip NULL inputs;
    # lag/lead/first/last propagate the source NULL). Partition keys,
    # OVER/outer ORDER BY keys and WHERE stay on the general path —
    # 3-valued ordering/filter semantics live there.
    nullable = {nm for nm in referenced
                if nm in cols and getattr(cols[nm], "valid", None)
                is not None}
    if nullable:
        gate_refs: set[str] = set()
        for k in part:
            _walk_cols(k, gate_refs)
        for lo in layouts:
            for o in lo:
                _walk_cols(o.expr, gate_refs)
        for kind_, what_, _asc in order_by:
            if kind_ == "expr":
                _walk_cols(what_, gate_refs)
        if sel.where is not None:
            _walk_cols(sel.where, gate_refs)
        if gate_refs & nullable:
            return bail("NULL-able window key/order/filter columns")

    # partition-key codec (shared with the ordered tier): packed single
    # word when possible, raw multi-lane keys for computed expressions
    # and wide/multi-word int layouts (VERDICT r3 parity sweep)
    key_names = [k.name.lower() for k in part
                 if isinstance(k, A.ColumnRef)]
    codec = None
    if len(key_names) == len(part) and all(
            cols[kn].data.dtype.kind in "iub" for kn in key_names):
        key_mins, key_ranges = [], []
        for kn in key_names:
            mn, mx = cols[kn].stats()
            key_mins.append(int(mn))
            key_ranges.append(int(mx) - int(mn) + 1)
        plan_w = fg._plan_words(key_ranges)
        if plan_w is not None and plan_w[1] == 1:
            codec = _WordKey(key_names, key_mins, plan_w[0],
                             [cols[kn].data.dtype for kn in key_names])
    if codec is None:
        for k in part:
            for nm in fg._refs(k):
                if nm in cols and cols[nm].data.dtype.kind not in "iub":
                    return bail("non-integer window partition key")
        codec = _MultiKey(list(part),
                          [cols[k.name.lower()].data.dtype
                           if isinstance(k, A.ColumnRef) else None
                           for k in part])

    return {"wins": wins, "projections": projections, "layouts": layouts,
            "layout_of": layout_of,
            "where": sel.where, "codec": codec,
            "col_order": sorted(referenced),
            "null_order": sorted(nullable) if nullable else [],
            "order_by": order_by, "limit": sel.limit,
            "into_table": sel.into_table,
            "into_outfile": sel.into_outfile,
            "outfile_sep": sel.outfile_sep}


def _literal_value(e: A.Expr):
    if isinstance(e, A.Literal):
        return e.value
    if isinstance(e, A.UnaryOp) and e.op == "-" \
            and isinstance(e.operand, A.Literal):
        return -e.operand.value
    return None


def _frame_spec(w: A.WindowExpr):
    """Static (lo, hi, use_peer_hi, use_peer_lo) mirroring the
    single-chip frame resolution (engine/eval.py)."""
    if w.frame is None:
        if w.order_by:
            return (None, 0, True, False)     # RANGE UNBOUNDED..CURRENT
        return (None, None, False, False)     # whole partition

    def bound(b: A.FrameBound):
        if b.kind == "unbounded_preceding" or b.kind == "unbounded_following":
            return None, False
        if b.kind == "current":
            return 0, w.frame.unit == "range"
        return (b.offset if b.kind == "following" else -b.offset), False

    lo, peer_lo = bound(w.frame.start)
    hi, peer_hi = bound(w.frame.end)
    return (lo, hi, peer_hi, peer_lo)


def try_run(session, sel: A.Select, table: Table) -> Table | None:
    mesh = getattr(session, "mesh", None)
    if mesh is None:
        return None
    axis = session.mesh_axis
    ndev = mesh.shape[axis]
    if ndev <= 1:
        return None
    p = _plan(session, sel, table)
    if p is None:
        return None
    cols = table.columns
    n = table.nrows
    if n == 0:
        session.note_dist_bail("empty table")
        return None
    arrays = ([cols[nm].data for nm in p["col_order"]]
              + [cols[nm].valid for nm in p["null_order"]])
    cap = int(arrays[0].shape[0])
    if cap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    blk = cap // ndev
    session.note_spmd()

    sharded = [_shard(mesh, axis, a) for a in arrays]
    bcap = config.bucket_size(max(2 * blk // ndev, 512))
    for _ in range(6):          # doubled-cap retry on shuffle overflow
        fingerprint = ("dist-window", ndev, bcap,
                       repr([pr[3] for pr in p["projections"]]),
                       repr(p["where"]), p["codec"].fingerprint(),
                       tuple(p["null_order"]),
                       tuple((a.shape[0], str(a.dtype)) for a in arrays))
        entry = _cache.get(fingerprint)
        if entry is None:
            entry = _build(p, cols, mesh, axis, ndev, blk, bcap)
            _cache[fingerprint] = entry
        session._last_spmd = (entry, (n, *sharded))   # comm accounting
        keep, outs, nulls_all, okeys, dropped = entry(n, *sharded)
        if int(dropped) == 0:
            break
        bcap *= 2
    else:
        session.note_dist_bail("shuffle overflow persists")
        return None

    return _assemble(session, p, cols, keep, outs, nulls_all, okeys)


def _build(p, cols, mesh, axis, ndev, blk, bcap):
    col_order = p["col_order"]
    null_order = p["null_order"]
    codec = p["codec"]
    ngl = codec.nsort
    m = ndev * bcap
    # outer-ORDER-BY row expressions over source columns are computed
    # in-program (extra write-back lanes) so assembly never touches the
    # row-sharded source columns — the multi-process contract
    order_exprs = [what for kind, what, _asc in p["order_by"]
                   if kind == "expr"]

    def fused(nn, *arrs):
        nspec = len(arrs)
        nproj = len(p["projections"])
        nord = len(order_exprs)

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), *([P(axis)] * nspec)),
                 out_specs=((P(axis),)                  # row keep mask
                            + (P(axis),) * nproj        # projections
                            + (P(axis),) * nproj        # null masks
                            + (P(axis),) * nord         # order-key lanes
                            + (P(),)))                  # dropped
        def local(nn_, *blocks):
            d = jax.lax.axis_index(axis).astype(jnp.int32)
            gidx = d * blk + jnp.arange(blk, dtype=jnp.int32)
            ncols = len(col_order)
            env0 = dict(zip(col_order, blocks[:ncols]))
            nulls0 = [~v for v in blocks[ncols:]]   # NULL masks
            valid0 = gidx < nn_
            if p["where"] is not None:
                w = fg._row_eval(p["where"], env0)
                if w.dtype != jnp.bool_:
                    w = w != 0
                valid0 = valid0 & w
            skey = codec.shuffle_key(env0, valid0, blk)
            kpay = codec.key_payload(env0)
            nkp = len(kpay)
            payload = (kpay + [gidx] + [env0[nm] for nm in col_order]
                       + nulls0)
            wr, payr, okr, ndrop = _shuffle(skey, payload, valid0, axis,
                                            ndev, bcap)
            gidx_r = payr[nkp]
            env = dict(zip(col_order, payr[nkp + 1: nkp + 1 + ncols]))
            nmask = dict(zip(null_order, payr[nkp + 1 + ncols:]))

            def null_of(expr, masks):
                """OR of the referenced nullable columns' masks."""
                out_m = None
                for nm in fg._refs(expr) & set(null_order):
                    out_m = (masks[nm] if out_m is None
                             else out_m | masks[nm])
                return out_m
            klanes0 = codec.sort_keys(wr, payr[:nkp], okr)
            gidx_key = jnp.where(okr, gidx_r, jnp.int32(2**31 - 1))
            recv_idx = jnp.arange(m, dtype=jnp.int32)

            # each distinct OVER ORDER BY gets its own sorted layout of
            # the received rows; values scatter back to the receive
            # domain so all projections stay row-aligned. Sort keys end
            # with the global idx: within equal order keys rows keep
            # original order — the single-chip stable lexsort's ties.
            projs: list = [None] * nproj
            nulls: list = [None] * nproj
            for li, layout in enumerate(p["layouts"]):
                ops = list(klanes0)
                for o in layout:
                    a = fg._row_eval(o.expr, env)
                    if a.dtype == jnp.bool_:
                        a = a.astype(jnp.int8)
                    if not o.ascending:
                        # ~a (not -a) for integer kinds: bitwise-not
                        # reverses order exactly for unsigned keys and
                        # at INT_MIN, where negation wraps (ADVICE r4;
                        # same idiom as dist_scan)
                        a = ~a if a.dtype.kind in "iu" else -a
                    ops.append(jnp.where(
                        okr, a, jnp.asarray(fg._sentinel_max(a.dtype),
                                            a.dtype)))
                res = jax.lax.sort([*ops, gidx_key, recv_idx],
                                   num_keys=len(ops) + 1, is_stable=False)
                klanes = res[:ngl]
                perm = res[-1]          # sorted pos → receive-domain pos
                valid_s = okr[perm]
                env_s = {nm: env[nm][perm] for nm in col_order}
                nmask_s = {nm: nmask[nm][perm] for nm in null_order}

                flags = jnp.zeros((m,), bool).at[0].set(True)
                for kl in klanes:
                    prev = jnp.concatenate([kl[:1], kl[:-1]])
                    flags = flags | (kl != prev)
                pos = W.positions(flags)
                idx = jnp.arange(m, dtype=jnp.int32)
                start_i = idx - pos
                last_i = W.last_index(flags)
                part_len = (last_i - start_i + 1).astype(jnp.int64)
                peer_flags = flags
                for o in layout:
                    a = fg._row_eval(o.expr, env_s)
                    peer_flags = peer_flags | jnp.concatenate(
                        [jnp.ones((1,), bool), a[1:] != a[:-1]])

                for pi, (kindp, wi, _alias, _e) in \
                        enumerate(p["projections"]):
                    if kindp != "win" or p["layout_of"][wi] != li:
                        continue
                    data, nl = _win_value(
                        p["wins"][wi], env_s, flags, peer_flags, pos, idx,
                        start_i, last_i, part_len, valid_s, m,
                        argnull=lambda a: null_of(a, nmask_s))
                    projs[pi] = jnp.zeros((m,), data.dtype).at[perm].set(
                        data)
                    if nl is None:
                        nulls[pi] = jnp.zeros((m,), jnp.bool_)
                    else:
                        nulls[pi] = jnp.zeros((m,), jnp.bool_).at[perm].set(
                            nl)

            for pi, (kindp, _wi, _alias, expr) in \
                    enumerate(p["projections"]):
                if kindp != "row":
                    continue
                v = fg._row_eval(expr, env)
                if not hasattr(v, "shape") or v.ndim == 0:
                    v = jnp.broadcast_to(jnp.asarray(v), (m,))
                projs[pi] = v
                nl = null_of(expr, nmask)
                nulls[pi] = (jnp.zeros((m,), jnp.bool_) if nl is None
                             else nl)

            okeys = []
            for e in order_exprs:
                v = fg._row_eval(e, env)
                if not hasattr(v, "shape") or v.ndim == 0:
                    v = jnp.broadcast_to(jnp.asarray(v), (m,))
                okeys.append(v)

            # inverse shuffle (VERDICT r4 #1): the forward exchange sent
            # bucket [o→r] positionally, so a second all_to_all of the
            # receive-domain [ndev, bcap] lanes returns every computed
            # row to its ORIGIN shard in that shard's own pack layout —
            # no overflow possible. Scattering at gidx-d·blk yields
            # row-aligned P(axis) outputs: each process holds exactly
            # its table shard's result rows, like the source columns.
            inv = lambda x: jax.lax.all_to_all(          # noqa: E731
                x.reshape(ndev, bcap), axis, 0, 0, tiled=False).reshape(-1)
            gidx_b = inv(gidx_r)
            ok_b = inv(okr)
            slot = jnp.where(ok_b, gidx_b - d * blk, jnp.int32(blk))

            def scat(x, fill=None):
                z = (jnp.zeros((blk + 1,), x.dtype) if fill is None
                     else jnp.full((blk + 1,), fill, x.dtype))
                return z.at[slot].set(inv(x))[:blk]

            keep = jnp.zeros((blk + 1,), jnp.bool_).at[slot].set(
                ok_b)[:blk]
            projs = [scat(x) for x in projs]
            nulls = [scat(x) for x in nulls]
            okeys = [scat(x) for x in okeys]
            return (keep, *projs, *nulls, *okeys,
                    jax.lax.psum(ndrop.astype(jnp.int64), axis))

        res = local(nn, *arrs)
        nproj = len(p["projections"])
        if jax.process_count() > 1:
            # multi-controller: assembly happens in every process, so
            # the O(rows) outputs replicate (one all-gather — the
            # result materialization cost itself)
            repf = lambda x: jax.lax.with_sharding_constraint(  # noqa
                x, jax.sharding.NamedSharding(mesh, P()))
            res = tuple(repf(x) for x in res[:-1]) + (res[-1],)
        return (res[0], res[1:1 + nproj], res[1 + nproj:1 + 2 * nproj],
                res[1 + 2 * nproj:1 + 2 * nproj + nord], res[-1])

    return jax.jit(fused)


def _win_value(w: A.WindowExpr, env_s, flags, peer_flags, pos, idx,
               start_i, last_i, part_len, valid_s, m, argnull=None):
    """One window projection in the shard-local sorted domain. Mirrors
    engine/eval.py's `_window` post-sort logic exactly (the equality
    tests in tests/test_dist_window.py hold the two paths together).
    ``argnull(expr)`` returns the expr's NULL mask in the sorted domain
    (or None) — SQL aggregates skip NULL inputs; gathers propagate."""
    fname = w.func.func
    args = list(w.func.args)
    if argnull is None:
        argnull = lambda a: None        # noqa: E731

    if fname in _RANKING:
        if fname == "row_number":
            return (pos + 1).astype(jnp.int64), None
        peer_first = W.first_index(peer_flags)
        if fname == "rank":
            return (peer_first - start_i + 1).astype(jnp.int64), None
        if fname == "dense_rank":
            return scan.seg_cumsum(peer_flags.astype(jnp.int64), flags), None
        if fname == "percent_rank":
            rk = (peer_first - start_i).astype(jnp.float64)
            denom = jnp.maximum(part_len - 1, 1).astype(jnp.float64)
            return jnp.where(part_len > 1, rk / denom, 0.0), None
        if fname == "cume_dist":
            peer_last = W.last_index(peer_flags)
            return ((peer_last - start_i + 1).astype(jnp.float64)
                    / part_len.astype(jnp.float64)), None
        k = int(_literal_value(args[0]))        # ntile(k)
        return ((pos.astype(jnp.int64) * k)
                // jnp.maximum(part_len, 1) + 1), None

    if fname in ("lag", "lead"):
        x = _arg_value(args[0], env_s, m)
        nx = argnull(args[0])
        off = int(_literal_value(args[1])) if len(args) >= 2 else 1
        tgt = idx - off if fname == "lag" else idx + off
        in_part = (tgt >= start_i) & (tgt <= last_i)
        g = jnp.clip(tgt, 0, m - 1)
        data = jnp.where(in_part, x[g], x)
        gnull = (nx[g] & in_part) if nx is not None else None
        if len(args) >= 3:
            dv = _literal_value(args[2])
            return jnp.where(in_part, data,
                             jnp.asarray(dv, data.dtype)), gnull
        return data, (~in_part if gnull is None else ~in_part | gnull)

    lo, hi, use_peer_hi, use_peer_lo = _frame_spec(w)
    lo_idx = W.first_index(peer_flags) if use_peer_lo else None
    hi_idx = W.last_index(peer_flags) if use_peer_hi else None
    lo_i, hi_i, empty = W.frame_bounds(flags, lo, hi, lo_idx, hi_idx)

    if fname in ("first_value", "last_value", "nth_value"):
        x = _arg_value(args[0], env_s, m)
        nx = argnull(args[0])
        if fname == "first_value":
            g = lo_i
        elif fname == "last_value":
            g = hi_i
        else:
            k = int(_literal_value(args[1]))
            g = lo_i + (k - 1)
            empty = empty | (g > hi_i)
            g = jnp.clip(g, 0, m - 1)
        return x[g], (empty if nx is None else empty | nx[g])

    if fname == "count" and (not args or isinstance(args[0], A.Star)):
        return jnp.where(empty, 0,
                         (hi_i - lo_i + 1).astype(jnp.int64)), None

    x = _arg_value(args[0], env_s, m)
    ind = valid_s
    nx = argnull(args[0])
    if nx is not None:
        ind = ind & ~nx                 # SQL aggregates skip NULL inputs

    if fname == "count":
        C = scan.seg_cumsum(ind.astype(jnp.int64), flags)
        c = C[hi_i] - C[lo_i] + ind[lo_i].astype(jnp.int64)
        return jnp.where(empty, 0, c), None

    if fname in ("min", "max"):
        op = jnp.minimum if fname == "min" else jnp.maximum
        if jnp.issubdtype(x.dtype, jnp.floating):
            ident = jnp.inf if fname == "min" else -jnp.inf
        else:
            info = jnp.iinfo(x.dtype)
            ident = info.max if fname == "min" else info.min
        xe = jnp.where(ind, x, jnp.asarray(ident, x.dtype))
        r = W.frame_extreme(xe, flags, pos, lo, hi, op, lo_i, hi_i)
        C = scan.seg_cumsum(ind.astype(jnp.int32), flags)
        c = C[hi_i] - C[lo_i] + ind[lo_i].astype(jnp.int32)
        return r, empty | (c == 0)

    xz = jnp.where(ind, x, jnp.zeros_like(x))
    if fname == "sum":
        s, c = W.frame_sum_count(xz, ind, flags, lo_i, hi_i)
        return s, empty | (c == 0)
    s, q, c = W.frame_moments(xz, ind, flags, lo_i, hi_i)
    nulls = empty | (c == 0)
    cs = jnp.maximum(c, 1.0)
    if fname in ("avg", "mean"):
        return s / cs, nulls
    mean = s / cs
    v = jnp.maximum(q / cs - mean * mean, 0.0)
    if fname == "var":
        return v, nulls
    return jnp.sqrt(v), nulls


def _arg_value(a: A.Expr, env_s, m):
    v = fg._row_eval(a, env_s)
    if not hasattr(v, "shape") or v.ndim == 0:
        v = jnp.broadcast_to(jnp.asarray(v), (m,))
    return v


def _assemble(session, p, cols, keep_mask, outs, nulls_all, okeys):
    """Row-aligned write-back outputs → Table in input row order. The
    keep mask and every lane arrive aligned with the source rows (the
    in-program inverse shuffle did the reordering), so assembly is a
    boolean compaction — no argsort, and multi-process safe (the lanes
    are replicated under multi-controller runs)."""
    from aquery2_tpu.engine.executor import (_derive_name, _limit_table,
                                             _sort_key_of, _take_table)
    from aquery2_tpu.ops.sort import sort_perm

    keep = np.asarray(keep_mask)
    n_out = int(keep.sum())

    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    used: dict[str, int] = {}
    for (kindp, wi, alias, expr), arr, nl in zip(p["projections"], outs,
                                                 nulls_all):
        name = alias or _derive_name(expr)
        lk = name.lower()
        if lk in used:
            used[lk] += 1
            name = f"{name}_{used[lk]}"
        else:
            used[lk] = 0
        data = np.asarray(arr)[keep]
        nls = np.asarray(nl)[keep]
        valid = ~nls if nls.any() else None
        sqltype, dictionary = _proj_type(kindp, wi, expr, p, cols, data)
        out.columns[name] = Column(name, sqltype, data, nrows=n_out,
                                   dictionary=dictionary, valid=valid)

    if p["order_by"] and n_out:
        names = out.column_names()
        skeys = []
        oi = 0
        for kind, what, asc in p["order_by"]:
            if kind == "col":
                skeys.append((jnp.asarray(
                    _sort_key_of(out.columns[names[what]], n_out)), asc))
            else:       # in-program order-key lane (write-back aligned)
                skeys.append((jnp.asarray(np.asarray(okeys[oi])[keep]),
                              asc))
                oi += 1
        perm = np.asarray(sort_perm(skeys, n_out))[:n_out]
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


def _proj_type(kindp, wi, expr, p, cols, data):
    """(sqltype, dictionary) for one output column."""
    if kindp == "row" and isinstance(expr, A.ColumnRef) \
            and expr.name in cols:
        src = cols[expr.name]
        return src.sqltype, src.dictionary
    if kindp == "win":
        w = p["wins"][wi]
        fname = w.func.func
        if fname in _GATHER and isinstance(w.func.args[0], A.ColumnRef) \
                and w.func.args[0].name in cols:
            src = cols[w.func.args[0].name]
            return src.sqltype, src.dictionary
    st = (T.from_np_dtype(np.dtype(data.dtype))
          if data.dtype != np.bool_ else T.BoolT)
    return st, None
