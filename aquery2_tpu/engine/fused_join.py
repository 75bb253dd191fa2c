"""Fused join aggregates: count over an equi-join without materialization.

`SELECT count(*) FROM a, b WHERE a.k = b.k` needs no pair expansion: the
answer is Σ_i |matches(i)|. One jitted program — sort the build side,
searchsorted the probe side, sum the range widths — one scalar pull.
(The reference materializes the full hash join for this, engine/ast.py
:874-1090.) The general pair-materializing join stays in engine/join.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Column, Table
from aquery2_tpu.utils import CaseInsensitiveDict, base62uuid

_cache: dict[tuple, Any] = {}


def try_run(session, sel: A.Select) -> Table | None:
    """Pattern: two comma/cross sources, WHERE is exactly one equality
    linking them, projections all count(*). Returns result or None."""
    if (sel.group_by or sel.assumptions or sel.order_by or sel.having
            or sel.distinct or sel.unions or sel.limit is not None):
        return None
    if len(sel.sources) != 2:
        return None
    if not all(isinstance(s, A.TableSource) for s in sel.sources):
        return None
    for p in sel.projections:
        if not (isinstance(p.expr, A.Call) and p.expr.func == "count"
                and (not p.expr.args or isinstance(p.expr.args[0], A.Star))):
            return None
    w = sel.where
    if not (isinstance(w, A.BinOp) and w.op == "="
            and isinstance(w.left, A.ColumnRef)
            and isinstance(w.right, A.ColumnRef)):
        return None
    try:
        lt = session.catalog.get(sel.sources[0].name)
        rt = session.catalog.get(sel.sources[1].name)
    except KeyError:
        return None
    if lt.has_nulls() or rt.has_nulls():
        return None          # nullable columns: null-aware general path

    def resolve(ref: A.ColumnRef):
        for src, tbl in ((sel.sources[0], lt), (sel.sources[1], rt)):
            alias = (src.alias or src.name).lower()
            if ref.table and ref.table.lower() != alias \
                    and ref.table.lower() != src.name.lower():
                continue
            if ref.name in tbl.columns:
                return tbl, tbl.columns[ref.name]
        return None, None

    lt_hit, lcol = resolve(w.left)
    rt_hit, rcol = resolve(w.right)
    if lcol is None or rcol is None or lt_hit is rt_hit:
        return None
    if getattr(lcol, "is_vector", False) or getattr(rcol, "is_vector", False):
        return None
    # string keys must share or translate dictionaries — leave to general path
    if lcol.sqltype.is_string or rcol.sqltype.is_string:
        return None

    ln = lt_hit.nrows
    rn = rt_hit.nrows

    # dense-histogram fast path: build-side key stats give a small value
    # domain (reference PerfectHashTable stats gating, hasher.h:209-322)
    # → one small scatter builds per-key multiplicities, one gather
    # probes them. Otherwise sort-based searchsorted.
    from aquery2_tpu import config

    domain = None
    rmn = rmx = 0
    if rcol.data.dtype.kind in "iub":
        rmn, rmx = (int(x) for x in rcol.stats())
        d = rmx - rmn + 1
        if 0 < d <= config.PERFECT_HASH_MAX_DOMAIN:
            domain = d

    # tagged-sort count join: both key columns integer with a packed
    # span (|range| · 4 in int32). The per-row gather of the histogram
    # probe costs ~25 ns per probe (0.9 s for h2o qj at 1e8 rows); ONE
    # single-operand sort of concat(left, right, right) with a 2-bit
    # tag in the low bits costs ~1.5 ns/row:
    #     value·4 + 0   right row as a "<" query     (rank_left)
    #     value·4 + 1   valid left row
    #     value·4 + 2   right row as a "≤" query     (rank_right)
    # In the sorted stream, (#left-rows before position) at a ≤-query
    # minus at a <-query is that right row's match count; the join
    # count is the signed sum — no extraction pass at all. Measured
    # h2o qj at 1e8: 0.90 s → ~0.3 s.
    span = None
    if (lcol.data.dtype.kind in "iub" and rcol.data.dtype.kind in "iub"):
        lmn, lmx = (int(x) for x in lcol.stats())
        kmn = min(lmn, rmn)
        s = max(lmx, rmx) - kmn + 1
        if rcol.data.dtype.kind in "iub" and 0 < s and s * 4 < 2**31 - 8:
            span = s

    mesh = getattr(session, "mesh", None)
    if mesh is not None and mesh.shape[session.mesh_axis] > 1:
        total = _mesh_count_join(session, lcol, rcol, ln, rn, domain, rmn)
        if total is not None:
            session.note_spmd()
            return _result(sel, total)

    key = (lcol.data.shape[0], rcol.data.shape[0],
           str(lcol.data.dtype), str(rcol.data.dtype), domain, rmn,
           span, span and kmn)
    fn = _cache.get(key)
    if fn is None:
        if span is not None:
            base = kmn
            # tag bits 3 (unused by live rows): padding must not look
            # like a query or a left row after the & 3 below
            sentinel = jnp.int32(span * 4 + 7)

            @jax.jit
            def count_join(lk, rk, nl, nr):
                li = jnp.arange(lk.shape[0], dtype=jnp.int32)
                ri = jnp.arange(rk.shape[0], dtype=jnp.int32)
                lp = jnp.where(li < nl,
                               (lk - base).astype(jnp.int32) * 4 + 1,
                               sentinel)
                rp = (rk - base).astype(jnp.int32) * 4
                lo_q = jnp.where(ri < nr, rp, sentinel)
                hi_q = jnp.where(ri < nr, rp + 2, sentinel)
                comb = jax.lax.sort(
                    [jnp.concatenate([lp, lo_q, hi_q])],
                    num_keys=1, is_stable=False)[0]
                tag = comb & 3
                # exclusive running count of left rows; i32 is safe
                # (counts ≤ cap < 2^31)
                before = jnp.cumsum((tag == 1).astype(jnp.int32)) \
                    - (tag == 1).astype(jnp.int32)
                signed = (jnp.where(tag == 2, before, 0)
                          - jnp.where(tag == 0, before, 0))
                return jnp.sum(signed.astype(jnp.int64))
        elif domain is not None:
            dom, base = domain, rmn

            @jax.jit
            def count_join(lk, rk, nl, nr):
                ri = jnp.arange(rk.shape[0], dtype=jnp.int32)
                rcode = jnp.where(ri < nr, (rk - base).astype(jnp.int32),
                                  dom)
                hist = jnp.zeros((dom + 1,), jnp.int32).at[rcode].add(1)
                li = jnp.arange(lk.shape[0], dtype=jnp.int32)
                inrange = (li < nl) & (lk >= base) & (lk <= base + (dom - 1))
                lcode = jnp.clip((lk - base).astype(jnp.int32), 0, dom)
                cnt = jnp.where(inrange, hist[lcode], 0)
                return jnp.sum(cnt, dtype=jnp.int64)
        else:
            @jax.jit
            def count_join(lk, rk, nl, nr):
                li = jnp.arange(lk.shape[0], dtype=jnp.int32)
                ri = jnp.arange(rk.shape[0], dtype=jnp.int32)
                big = jnp.asarray(jnp.iinfo(rk.dtype).max, rk.dtype)
                rk_s = jnp.sort(jnp.where(ri < nr, rk, big))
                # method="sort": batched search via one big sort — the
                # default "scan" method is a 2·log(m)-step serialized
                # gather loop on TPU (~5 s at 16M probes)
                lkc = lk.astype(rk.dtype)
                lo = jnp.searchsorted(rk_s, lkc, side="left", method="sort")
                hi = jnp.searchsorted(rk_s, lkc, side="right", method="sort")
                cnt = jnp.where(li < nl, (hi - lo).astype(jnp.int64), 0)
                return jnp.sum(cnt, dtype=jnp.int64)

        fn = count_join
        _cache[key] = fn

    total = int(fn(lcol.data, rcol.data, ln, rn))
    return _result(sel, total)


def _result(sel: A.Select, total: int) -> Table:
    out = Table.__new__(Table)
    out.name = f"result_{base62uuid(4)}"
    out.columns = CaseInsensitiveDict()
    out.sorted_by = ()
    for p in sel.projections:
        name = p.alias or "count"
        out.columns[name] = Column(name, T.LongT,
                                   np.asarray([total], dtype=np.int64))
    return out


_mesh_cache: dict[tuple, Any] = {}

# dense-histogram SPMD gate: the psum ships O(domain) int32 per chip, so
# cap the domain where one ICI pass (~1 GB/s effective per lane at
# 4 B/key) stays well under the shuffle alternative's cost
_MESH_HIST_MAX_DOMAIN = 1 << 22


def _mesh_count_join(session, lcol, rcol, ln: int, rn: int,
                     domain, rmn) -> int | None:
    """Distributed count-join over the session mesh as ONE SPMD program.

    Small build-side key domains: per-shard histogram partials + ONE
    psum, then a local probe gather + psum of the counts (communication
    O(domain), independent of row count). Large/unbounded domains:
    radix all_to_all shuffle + shard-local searchsorted probe
    (parallel/dist_join.py, skew-safe via doubled-cap retry). The
    reference's analogue is the shared-memory hash join
    (server/hasher.h:146-199) which cannot scale past one node."""
    import jax
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from aquery2_tpu.parallel.mesh import shard_1d

    mesh = session.mesh
    axis = session.mesh_axis
    ndev = mesh.shape[axis]
    lcap = int(lcol.data.shape[0])
    rcap = int(rcol.data.shape[0])
    if lcap % ndev or rcap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None

    lk = shard_1d(mesh, lcol.data, axis)
    rk = shard_1d(mesh, rcol.data, axis)

    if domain is not None and domain <= _MESH_HIST_MAX_DOMAIN:
        ck = ("hist", ndev, lcap, rcap, str(lk.dtype), str(rk.dtype),
              domain, rmn)
        fn = _mesh_cache.get(ck)
        if fn is None:
            dom, base = domain, rmn
            blk_l, blk_r = lcap // ndev, rcap // ndev

            @jax.jit
            @partial(shard_map, mesh=mesh,
                     in_specs=(P(), P(), P(axis), P(axis)), out_specs=P())
            def fn(nl, nr, lkb, rkb):
                d = jax.lax.axis_index(axis).astype(jnp.int32)
                ri = d * blk_r + jnp.arange(blk_r, dtype=jnp.int32)
                rcode = jnp.where(ri < nr, (rkb - base).astype(jnp.int32),
                                  dom)
                hist = jax.lax.psum(
                    jnp.zeros((dom + 1,), jnp.int32).at[rcode].add(1), axis)
                li = d * blk_l + jnp.arange(blk_l, dtype=jnp.int32)
                inrange = ((li < nl) & (lkb >= base)
                           & (lkb <= base + (dom - 1)))
                lcode = jnp.clip((lkb - base).astype(jnp.int32), 0, dom)
                cnt = jnp.where(inrange, hist[lcode], 0)
                return jax.lax.psum(jnp.sum(cnt, dtype=jnp.int64), axis)

            _mesh_cache[ck] = fn
        session._last_spmd = (fn, (ln, rn, lk, rk))   # comm accounting
        return int(fn(ln, rn, lk, rk))

    # unbounded domain: radix shuffle + local searchsorted (skew-safe)
    from aquery2_tpu import config
    from aquery2_tpu.parallel.dist_join import dist_join_counts_safe

    lvalid = shard_1d(mesh, jnp.arange(lcap, dtype=jnp.int32) < ln, axis)
    rvalid = shard_1d(mesh, jnp.arange(rcap, dtype=jnp.int32) < rn, axis)
    blk = max(lcap, rcap) // ndev
    cap0 = config.bucket_size(max(2 * blk // ndev, 512))
    return int(dist_join_counts_safe(mesh, axis, lk, lvalid, rk, rvalid,
                                     cap0))
