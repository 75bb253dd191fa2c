"""Distributed fused group-by: SQL queries over a device mesh.

The defining new axis vs the reference (BASELINE.md: scaling efficiency
1 chip → N; the reference's analogue is its shared-memory hash table,
server/hasher.h:146-199, which cannot scale past one node). Design per
the scaling-book recipe: tables are row-sharded over a 1-D mesh
(contiguous blocks, `NamedSharding(mesh, P(axis))`), every query runs as
ONE jitted SPMD program:

  dense    — per-shard perfect-hash scatter into (domain+1,) local
             accumulators, ONE `psum`/`pmin`/`pmax` over ICI per lane:
             communication O(domain), independent of row count.
  packed / — per-shard local sort + boundary reduction → per-shard
  multikey   PARTIAL groups (≤ #local rows, never overflows), then
             `all_gather` of the small partials + one replicated merge
             reduction. Partial-aggregate-before-exchange is also the
             skew answer: a heavy-hitter key contributes ONE partial
             row per shard regardless of its row count (contrast the
             row-shuffle tier in parallel/dist_groupby.py, whose fixed
             buckets overflow under skew).

Aggregate decomposition: sum/count/min/max/avg/var/stddev/corr are all
sums/mins/maxs of per-shard partials (float sums ride the exact f32
limb-split of fused_groupby._build_lanes, which merges losslessly);
median does not decompose — it falls back to the single-program path.

Results are bit-identical to the single-chip fused tiers for integer
lanes and limb-split f32 sums, in the same group order.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aquery2_tpu import config
from aquery2_tpu.engine import fused_groupby as fg
from aquery2_tpu.parser import ast_nodes as A
from aquery2_tpu.storage.table import Table

_cache: dict[tuple, Any] = {}


def _combine_psum(outs: dict, axis: str) -> dict:
    """Combine per-shard dense accumulators: sums add, extremes min/max."""
    comb = {}
    for tag, arr in outs.items():
        if tag.endswith(":min"):
            comb[tag] = jax.lax.pmin(arr, axis)
        elif tag.endswith(":max"):
            comb[tag] = jax.lax.pmax(arr, axis)
        else:
            comb[tag] = jax.lax.psum(arr, axis)
    return comb


def run(session, sel: A.Select, table: Table) -> Table | None:
    """Distributed fused group-by; None → caller falls back (the bail
    reason is reported via session.note_dist_bail for `stats`)."""
    mesh = getattr(session, "mesh", None)
    if mesh is None:
        return None
    axis = session.mesh_axis
    ndev = mesh.shape[axis]
    if ndev <= 1:
        return None

    try:
        p = fg.plan(sel, table)
    except fg.Unsupported as e:
        session.note_dist_bail(f"unsupported shape: {e}")
        return None
    if p["has_median"]:
        # median does not decompose into partials — shuffle rows so each
        # group colocates, then the packed-sort median kernel is exact
        # per shard (engine/dist_ordered.py)
        from aquery2_tpu.engine import dist_ordered

        return dist_ordered.run_median(session, sel, table, p)

    n = table.nrows
    if n == 0:
        session.note_dist_bail("empty table")
        return None
    # nullable GROUP BY keys: sentinel-code before the SPMD tiers (the
    # fused single-chip path does the same; fg.sentinel_code_null_keys)
    sub = fg.sentinel_code_null_keys(p, table)
    if sub is not None:
        table, p["key_sentinels"] = sub
    cols = table.columns
    col_order = fg.referenced_columns(sel, p)
    nullable, bail = fg.nullable_gate(p, cols, col_order)
    if bail:
        session.note_dist_bail(bail)
        return None
    null_order = sorted(nullable)

    chosen = fg.choose_strategy(p, cols)
    if chosen is None:
        session.note_dist_bail("median without packable key layout")
        return None
    strategy, key_mins, key_ranges, domain = chosen
    scatters = fg._needed_scatters(p["aggs"])
    key_names = [k.name.lower() for k in p["keys"]
                 if isinstance(k, A.ColumnRef)]

    arrays = ([_shard(mesh, axis, cols[nm].data) for nm in col_order]
              + [_shard(mesh, axis, cols[nm].valid) for nm in null_order])
    # per-shard ragged validity (materialized-join outputs,
    # engine/dist_join_query.py): replaces the contiguous idx<n base mask
    shard_valid = getattr(table, "shard_valid", None)
    if shard_valid is not None:
        arrays.append(_shard(mesh, axis, shard_valid))
    cap = int(arrays[0].shape[0])
    if cap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    blk = cap // ndev
    session.note_spmd()

    fingerprint = (
        "dist", strategy, ndev, shard_valid is not None,
        repr(sel.group_by), repr([pr[1] for pr in p["projections"]]),
        repr(p["where"]), repr(p["having"]),
        tuple(key_mins), tuple(key_ranges), tuple(null_order),
        tuple((a.shape[0], str(a.dtype)) for a in arrays),
    )

    has_sv = shard_valid is not None
    if strategy == "dense":
        return _run_dense(session, table, p, col_order, arrays, fingerprint,
                          n, key_names, key_mins, key_ranges, scatters,
                          domain, mesh, axis, blk, null_order, has_sv)
    if strategy == "packed":
        plan_w = fg._plan_words(key_ranges)
        if plan_w is None:
            return _run_sortmerge(session, table, p, col_order, arrays,
                                  fingerprint, n, scatters, mesh, axis, blk,
                                  packed=None, null_order=null_order,
                                  has_sv=has_sv)
        return _run_sortmerge(session, table, p, col_order, arrays,
                              fingerprint, n, scatters, mesh, axis, blk,
                              packed=(plan_w, key_mins, key_ranges, key_names),
                              null_order=null_order, has_sv=has_sv)
    return _run_sortmerge(session, table, p, col_order, arrays, fingerprint,
                          n, scatters, mesh, axis, blk, packed=None,
                          null_order=null_order, has_sv=has_sv)


def _shard(mesh: Mesh, axis: str, x: jax.Array) -> jax.Array:
    from aquery2_tpu.parallel.mesh import shard_1d

    return shard_1d(mesh, x, axis)      # multi-host aware placement


# --------------------------------------------------------------------- #
# ungrouped tier: whole-table aggregates as local partials + ONE psum
# --------------------------------------------------------------------- #

def run_ungrouped(session, sel: A.Select, table: Table) -> Table | None:
    """Distributed ungrouped aggregation: SELECT agg(expr)... FROM t
    [WHERE rowpred] over a mesh session — the degenerate dense tier with
    a single group slot (communication: O(#lanes) scalars over ICI).
    Every aggregate the grouped tiers decompose decomposes here too;
    median does not and falls back. None → caller falls back."""
    mesh = getattr(session, "mesh", None)
    if mesh is None:
        return None
    axis = session.mesh_axis
    ndev = mesh.shape[axis]
    if ndev <= 1:
        return None
    if (sel.group_by or sel.assumptions or sel.distinct or sel.unions
            or sel.having or sel.order_by):
        return None
    if len(sel.sources) != 1 or not isinstance(sel.sources[0], A.TableSource):
        return None

    cols = table.columns
    n = table.nrows
    if n == 0:
        session.note_dist_bail("empty table")
        return None

    try:
        aggs: list[A.Call] = []
        projections = []
        for pr in sel.projections:
            e = pr.expr
            if isinstance(e, A.Star):
                raise fg.Unsupported("star")
            before = len(aggs)
            fg._collect_aggs(e, cols, aggs)
            if len(aggs) == before and fg._refs(e):
                # constant projections (SELECT 999, count(*)) evaluate
                # via _post_agg_eval; only COLUMN row projections need
                # the general pipeline
                raise fg.Unsupported("row projection in ungrouped agg")
            projections.append(("agg", e, pr.alias))
        if not projections:
            raise fg.Unsupported("no projections")
        if any(a.func == "median" for a in aggs):
            raise fg.Unsupported("median does not decompose into partials")
        if sel.where is not None:
            fg._check_row_expr(sel.where, cols)
    except fg.Unsupported as e:
        session.note_dist_bail(f"unsupported shape: {e}")
        return None

    p = {"keys": [], "projections": projections, "aggs": aggs,
         "where": sel.where, "limit": sel.limit, "having": None,
         "order_by": [], "expr_keys": False, "has_median": False,
         "into_table": sel.into_table, "into_outfile": sel.into_outfile,
         "outfile_sep": sel.outfile_sep}
    col_order = fg.referenced_columns(sel, p)
    nullable, bail = fg.nullable_gate(p, cols, col_order)
    if bail:
        session.note_dist_bail(bail)
        return None
    null_order = sorted(nullable)
    scatters = fg._needed_scatters(aggs)

    arrays = ([_shard(mesh, axis, cols[nm].data) for nm in col_order]
              + [_shard(mesh, axis, cols[nm].valid) for nm in null_order])
    if not arrays:
        # column-free shapes (SELECT 999, count(*)): one anchor lane
        # carries the row domain / sharding (env ignores it)
        try:
            anchor = next(c for c in cols.values()
                          if not getattr(c, "is_vector", False))
        except StopIteration:
            session.note_dist_bail("no scalar columns to anchor scan")
            return None
        arrays = [_shard(mesh, axis, anchor.data)]
    shard_valid = getattr(table, "shard_valid", None)
    if shard_valid is not None:
        arrays.append(_shard(mesh, axis, shard_valid))
    has_sv = shard_valid is not None
    cap = int(arrays[0].shape[0])
    if cap % ndev:
        session.note_dist_bail("capacity not divisible by mesh size")
        return None
    blk = cap // ndev
    session.note_spmd()

    lbounds = fg.lane_bounds(scatters, cols)
    from aquery2_tpu.ops.reduce import _digits_for_bound, bound_bucket
    bounds_fp = tuple(sorted((t, _digits_for_bound(b), bound_bucket(b))
                             for t, b in lbounds.items()))
    fingerprint = ("dist-ungrouped", ndev, has_sv,
                   repr([pr[1] for pr in projections]), repr(sel.where),
                   tuple(null_order), bounds_fp,
                   tuple((a.shape[0], str(a.dtype)) for a in arrays))
    entry = _cache.get(fingerprint)
    if entry is None:
        nspec = len(arrays)

        def fused(nn, *arrs):
            @partial(shard_map, mesh=mesh,
                     in_specs=(P(), *([P(axis)] * nspec)), out_specs=P())
            def local(nn_, *blocks):
                d = jax.lax.axis_index(axis).astype(jnp.int32)
                idx = d * blk + jnp.arange(blk, dtype=jnp.int32)
                env = dict(zip(col_order, blocks))
                env_null = {nm: ~v for nm, v in
                            zip(null_order, blocks[len(col_order):])}
                null_fn = fg.make_null_fn(env_null) if env_null else None
                valid = blocks[-1] if has_sv else (idx < nn_)
                if p["where"] is not None:
                    w = fg._row_eval(p["where"], env)
                    if w.dtype != jnp.bool_:
                        w = w != 0
                    valid = valid & w
                code = jnp.where(valid, 0, 1).astype(jnp.int32)
                outs = fg._scatter_aggs(env, valid, code, 1, scatters,
                                        null_fn=null_fn, bounds=lbounds)
                return _combine_psum(outs, axis)

            outs = local(nn, *arrs)
            counts = outs["__counts__"][:1]
            dense = {t: a[:1] for t, a in outs.items()}
            res = [fg._post_agg_eval(expr, dense, counts, None)
                   for _, expr, _ in projections]
            return [jnp.broadcast_to(jnp.asarray(r), (1,))
                    if not (hasattr(r, "ndim") and r.ndim) else r
                    for r in res]

        entry = jax.jit(fused)
        _cache[fingerprint] = entry

    session._last_spmd = (entry, (n, *arrays))   # comm accounting
    results = entry(n, *arrays)
    return fg._finish(session, p, cols, results, 1)


# --------------------------------------------------------------------- #
# dense tier: local perfect-hash scatter + psum
# --------------------------------------------------------------------- #

def _run_dense(session, table, p, col_order, arrays, fingerprint, n,
               key_names, key_mins, key_ranges, scatters, domain,
               mesh, axis, blk, null_order=(), has_sv=False):
    cols = table.columns
    strides = []
    s = 1
    for r in reversed(key_ranges):
        strides.append(s)
        s *= r
    strides.reverse()
    dom = s
    gcap = config.bucket_size(dom)
    key_dtypes = [cols[kn].data.dtype for kn in key_names]

    lbounds = fg.lane_bounds(scatters, cols)
    from aquery2_tpu.ops.reduce import _digits_for_bound, bound_bucket
    fingerprint = fingerprint + (tuple(sorted(
        (t, _digits_for_bound(b), bound_bucket(b))
        for t, b in lbounds.items())),)
    entry = _cache.get(fingerprint)
    if entry is None:
        nspec = len(arrays)

        def fused(nn, *arrs):
            @partial(shard_map, mesh=mesh,
                     in_specs=(P(), *([P(axis)] * nspec)), out_specs=P())
            def local(nn_, *blocks):
                d = jax.lax.axis_index(axis).astype(jnp.int32)
                idx = d * blk + jnp.arange(blk, dtype=jnp.int32)
                env = dict(zip(col_order, blocks))
                env_null = {nm: ~v for nm, v in
                            zip(null_order, blocks[len(col_order):])}
                null_fn = fg.make_null_fn(env_null) if env_null else None
                valid = blocks[-1] if has_sv else (idx < nn_)
                if p["where"] is not None:
                    w = fg._row_eval(p["where"], env)
                    if w.dtype != jnp.bool_:
                        w = w != 0
                    valid = valid & w
                code = None
                for kn, mn, st in zip(key_names, key_mins, strides):
                    part = (env[kn].astype(jnp.int32) - jnp.int32(mn)) \
                        * jnp.int32(st)
                    code = part if code is None else code + part
                code = jnp.where(valid, code, dom).astype(jnp.int32)
                outs = fg._scatter_aggs(env, valid, code, dom, scatters,
                                        null_fn=null_fn, bounds=lbounds)
                return _combine_psum(outs, axis)

            outs = local(nn, *arrs)
            counts_all = outs["__counts__"]
            present = counts_all[:dom] > 0
            num_groups = jnp.sum(present, dtype=jnp.int32)
            from aquery2_tpu.ops.reduce import compact_indices
            ucodes = compact_indices(present, gcap, fill=dom)
            safe = jnp.minimum(ucodes, dom)
            gathered = {t: arr[safe] for t, arr in outs.items()}
            counts = counts_all[safe]
            results = []
            for kindp, expr, alias in p["projections"]:
                if kindp == "key":
                    ki = key_names.index(expr.name.lower())
                    kv = ((ucodes.astype(jnp.int64) // strides[ki])
                          % key_ranges[ki] + key_mins[ki])
                    results.append(kv.astype(key_dtypes[ki]))
                else:
                    results.append(fg._post_agg_eval(expr, gathered,
                                                     counts, None))
            if p["having"] is not None:
                results.append(fg._post_agg_eval(p["having"], gathered,
                                                 counts, None))
            return results, num_groups

        entry = jax.jit(fused)
        _cache[fingerprint] = entry

    session._last_spmd = (entry, (n, *arrays))   # comm accounting
    results, num_groups = entry(n, *arrays)
    g = int(num_groups)          # the single host sync
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < gcap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return fg._finish(session, p, cols, results, g, having=hv)


# --------------------------------------------------------------------- #
# sort tiers: local sort-reduce → all_gather partials → replicated merge
# --------------------------------------------------------------------- #

def _run_sortmerge(session, table, p, col_order, arrays, fingerprint, n,
                   scatters, mesh, axis, blk, packed, null_order=(),
                   has_sv=False):
    """packed = ((fields, nwords), key_mins, key_ranges, key_names) for
    the bit-packed tier, or None for raw multikey sort.

    Merge modes (AQ_TPU_DIST_MERGE):
      owner (default) — hash(key)→owner all_to_all of COMPACTED per-
          shard partials; each group merges on exactly one shard, so
          the final all-gather carries every group ONCE: wire
          O(partials + G) instead of the replicated merge's
          O(ndev·partials) of padded lanes (VERDICT r3 weak #2; bound
          is O(min(domain, rows/ndev)) per shard either way).
      replicated — all-gather every shard's padded partials and merge
          on every device (kept for A/B and as the known-simple path).
    """
    if config.dist_merge == "owner":
        return _run_sortmerge_owner(session, table, p, col_order, arrays,
                                    fingerprint, n, scatters, mesh, axis,
                                    blk, packed, null_order, has_sv)
    return _run_sortmerge_replicated(session, table, p, col_order, arrays,
                                     fingerprint, n, scatters, mesh, axis,
                                     blk, packed, null_order, has_sv)


def _sortmerge_layout(cols, keys, packed, blk, ndev, cap):
    """(nkeycols, key_dtypes|None, lgcap, gcap) shared by both modes.

    Local partial capacity: a shard of blk rows yields ≤ blk groups —
    the partial layout can NEVER overflow (contrast dist_groupby.py's
    fixed shuffle buckets). For packed keys the group count is also
    bounded by the key domain. lgcap must not exceed blk:
    sorted_group_reduce outputs are sliced from length-blk row arrays."""
    if packed is not None:
        (fields, nwords), key_mins, key_ranges, key_names = packed
        nkeycols = nwords
        key_dtypes = [cols[kn].data.dtype for kn in key_names]
        domain = 1
        for r in key_ranges:
            domain *= r
        lgcap = min(blk, config.bucket_size(min(domain, blk)))
    else:
        nkeycols = len(keys)
        key_dtypes = None
        lgcap = blk
    gcap = min(ndev * lgcap, config.bucket_size(min(cap, ndev * lgcap)))
    return nkeycols, key_dtypes, lgcap, gcap


def _shard_partials(nn_, blocks, axis, blk, p, col_order, null_order,
                    has_sv, packed, keys, scatters, lgcap, narrow):
    """Shard-local stage shared by both merge modes: row block → sorted
    partial groups. Returns (outs dict incl __k{i}/__counts__, slot_ok)."""
    d = jax.lax.axis_index(axis).astype(jnp.int32)
    idx = d * blk + jnp.arange(blk, dtype=jnp.int32)
    env = dict(zip(col_order, blocks))
    env_null = {nm: ~v for nm, v in
                zip(null_order, blocks[len(col_order):])}
    null_fn = fg.make_null_fn(env_null) if env_null else None
    valid = blocks[-1] if has_sv else (idx < nn_)
    if p["where"] is not None:
        w = fg._row_eval(p["where"], env)
        if w.dtype != jnp.bool_:
            w = w != 0
        valid = valid & w

    if packed is not None:
        (fields, nwords), key_mins, _key_ranges, key_names = packed
        kops = [jnp.zeros((blk,), jnp.int32) for _ in range(nwords)]
        for ki, kn in enumerate(key_names):
            wi, shift, _b = fields[ki]
            kv = env[kn] - jnp.asarray(key_mins[ki], env[kn].dtype)
            kops[wi] = kops[wi] | (kv.astype(jnp.int32) << shift)
    else:
        kops = [fg._row_eval(ke, env) for ke in keys]

    lanes = fg._build_lanes(env, valid, scatters, null_fn=null_fn)
    lanes[0].pop("__counts__")
    payload, tag_groups = fg._lane_payload(lanes)
    invalid = ~valid
    sorted_res = jax.lax.sort(
        [invalid, *kops, *payload], num_keys=1 + len(kops),
        is_stable=False)
    valid_s = ~sorted_res[0]
    skeys = sorted_res[1:1 + len(kops)]
    add_s, mins_s, maxs_s, f64s_s = fg._split_sorted_payload(
        sorted_res, 1 + len(kops), tag_groups)
    dif = sorted_res[0][1:] != sorted_res[0][:-1]
    for sk in skeys:
        dif = dif | (sk[1:] != sk[:-1])
    starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
    last = jnp.concatenate([dif, jnp.ones((1,), jnp.bool_)]) & valid_s
    add_s["__counts__"] = valid_s
    from aquery2_tpu.ops import reduce as R
    outs, _ends, lng = R.sorted_group_reduce(
        starts, last, add_s, mins_s, maxs_s, f64s_s, lgcap,
        counts_from_ends="__counts__",
        extract={f"__k{i}": skeys[i] for i in range(len(kops))},
        narrow_tags=narrow)
    slot_ok = jnp.arange(lgcap, dtype=jnp.int32) < lng
    return outs, slot_ok


def _classify_merge_lanes(partials, ok):
    """Partial lane dicts for the second (merge) reduction: sums add,
    extremes min/max of the per-shard partials, invalid slots masked to
    each op's identity."""
    counts_p = partials.pop("__counts__")
    add_m: dict[str, jax.Array] = {"__counts__": jnp.where(
        ok, counts_p, jnp.zeros((), counts_p.dtype))}
    mins_m: dict[str, jax.Array] = {}
    maxs_m: dict[str, jax.Array] = {}
    f64_m: dict[str, jax.Array] = {}
    for t, v in partials.items():
        if t.endswith(":min"):
            mins_m[t] = jnp.where(ok, v, fg._sentinel_max(v.dtype))
        elif t.endswith(":max"):
            maxs_m[t] = jnp.where(ok, v, fg._sentinel_min(v.dtype))
        elif v.dtype == jnp.float64:
            f64_m[t] = jnp.where(ok, v, 0.0)
        else:
            add_m[t] = jnp.where(ok, v, jnp.zeros((), v.dtype))
    return add_m, mins_m, maxs_m, f64_m


def _run_sortmerge_replicated(session, table, p, col_order, arrays,
                              fingerprint, n, scatters, mesh, axis, blk,
                              packed, null_order=(), has_sv=False):
    cols = table.columns
    keys = p["keys"]
    cap = int(arrays[0].shape[0])
    ndev = mesh.shape[axis]
    nkeycols, key_dtypes, lgcap, gcap = _sortmerge_layout(
        cols, keys, packed, blk, ndev, cap)
    if packed is not None:
        (fields, _nwords), key_mins, key_ranges, key_names = packed

    narrow = fg.narrow_sum_tags(scatters, table.columns, blk)
    fingerprint = fingerprint + (tuple(sorted(narrow)), "replicated")
    entry = _cache.get(fingerprint)
    if entry is None:
        nspec = len(arrays)

        def fused(nn, *arrs):
            # local stage emits per-shard partials with out_specs=P(axis):
            # the merge below consumes the [ndev·lgcap] arrays and XLA
            # inserts the all-gather where the replicated sort needs it
            @partial(shard_map, mesh=mesh,
                     in_specs=(P(), *([P(axis)] * nspec)),
                     out_specs=P(axis))
            def local(nn_, *blocks):
                outs, slot_ok = _shard_partials(
                    nn_, blocks, axis, blk, p, col_order, null_order,
                    has_sv, packed, keys, scatters, lgcap, narrow)
                outs["__ok"] = slot_ok
                return outs

            partials = local(nn, *arrs)

            # replicated merge: sort the ≤ ndev·lgcap partial rows by key,
            # reduce again (sum of sums / min of mins / max of maxs)
            ok = partials.pop("__ok")
            pkeys = [partials.pop(f"__k{i}") for i in range(nkeycols)]
            add_m, mins_m, maxs_m, f64_m = _classify_merge_lanes(
                partials, ok)
            payload, tag_groups = fg._lane_payload(
                (add_m, mins_m, maxs_m, f64_m))
            invalid = ~ok
            sorted_res = jax.lax.sort(
                [invalid, *pkeys, *payload], num_keys=1 + nkeycols,
                is_stable=False)
            valid_s = ~sorted_res[0]
            skeys = sorted_res[1:1 + nkeycols]
            add_s, mins_s, maxs_s, f64s_s = fg._split_sorted_payload(
                sorted_res, 1 + nkeycols, tag_groups)
            dif = sorted_res[0][1:] != sorted_res[0][:-1]
            for sk in skeys:
                dif = dif | (sk[1:] != sk[:-1])
            starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
            last = jnp.concatenate([dif, jnp.ones((1,), jnp.bool_)]) & valid_s
            from aquery2_tpu.ops import reduce as R
            outs, _ends, ng = R.sorted_group_reduce(
                starts, last, add_s, mins_s, maxs_s, f64s_s, gcap,
                extract={f"__k{i}": skeys[i] for i in range(nkeycols)})
            results = _project_tail(outs, p, packed, keys, key_dtypes)
            return results, ng

        entry = jax.jit(fused)
        _cache[fingerprint] = entry

    session._last_spmd = (entry, (n, *arrays))   # comm accounting
    results, num_groups = entry(n, *arrays)
    g = int(num_groups)          # the single host sync
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < gcap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return fg._finish(session, p, cols, results, g, having=hv)


def _project_tail(outs, p, packed, keys, key_dtypes):
    """Per-projection group arrays from the merged lane dict (traced)."""
    counts = outs["__counts__"]
    if packed is not None:
        (fields, _nwords), key_mins, _key_ranges, key_names = packed
    results = []
    for kindp, expr, alias in p["projections"]:
        if kindp == "key":
            if packed is not None:
                ki = key_names.index(expr.name.lower())
                wi, shift, b = fields[ki]
                kdt = key_dtypes[ki]
                kv = ((outs[f"__k{wi}"] >> shift) & ((1 << b) - 1)
                      ).astype(kdt) + jnp.asarray(key_mins[ki], kdt)
                results.append(kv)
            else:
                ki = fg._key_index(keys, expr)
                results.append(outs[f"__k{ki}"])
        else:
            results.append(fg._post_agg_eval(expr, outs, counts, None))
    if p["having"] is not None:
        results.append(fg._post_agg_eval(p["having"], outs, counts, None))
    return results


def _run_sortmerge_owner(session, table, p, col_order, arrays, fingerprint,
                         n, scatters, mesh, axis, blk, packed,
                         null_order=(), has_sv=False):
    """Owner-partitioned merge (VERDICT r3 weak #2): per-shard partials
    route to hash(key)→owner via all_to_all as COMPACTED rows; each
    group is re-reduced on exactly ONE shard, and the final all-gather
    (the replicated key sort every process needs for output) carries
    every group once — wire O(partials/shard + G) vs the replicated
    merge's O(ndev·lgcap) of padded lanes. Fixed-capacity buckets with
    the usual doubled-cap retries (dropped rows / merged-group
    overflow); a persistent overflow falls back to the replicated
    merge, never to a wrong answer."""
    cols = table.columns
    keys = p["keys"]
    cap = int(arrays[0].shape[0])
    ndev = mesh.shape[axis]
    nkeycols, key_dtypes, lgcap, _g0 = _sortmerge_layout(
        cols, keys, packed, blk, ndev, cap)
    narrow = fg.narrow_sum_tags(scatters, table.columns, blk)
    nspec = len(arrays)

    # expected per-destination load is lgcap/ndev (hash-uniform);
    # 1.5× headroom — the doubled-cap retry handles real skew
    pbcap = config.bucket_size(max(3 * lgcap // (2 * ndev), 256))
    mcap = config.bucket_size(max(3 * lgcap // (2 * ndev), 512))
    for _ in range(6):
        gcap = min(ndev * mcap, config.bucket_size(min(cap, ndev * mcap)))
        fp = fingerprint + (tuple(sorted(narrow)), "owner", pbcap, mcap)
        entry = _cache.get(fp)
        if entry is None:
            entry = _build_owner(p, col_order, null_order, has_sv, packed,
                                 keys, scatters, mesh, axis, ndev, blk,
                                 lgcap, pbcap, mcap, gcap, narrow,
                                 nkeycols, key_dtypes, nspec)
            _cache[fp] = entry
        session._last_spmd = (entry, (n, *arrays))   # comm accounting
        results, num_groups, dropped, overflow = entry(n, *arrays)
        dropped_i, overflow_i = int(dropped), int(overflow)
        if dropped_i == 0 and overflow_i == 0:
            break
        if dropped_i:
            pbcap *= 2
        if overflow_i:
            mcap *= 2
    else:
        return _run_sortmerge_replicated(
            session, table, p, col_order, arrays, fingerprint, n, scatters,
            mesh, axis, blk, packed, null_order, has_sv)

    g = int(num_groups)          # the single host sync
    out_cap = config.bucket_size(max(g, 1))
    if out_cap < gcap:
        results = [r[:out_cap] for r in results]
    hv = results.pop() if p["having"] is not None else None
    return fg._finish(session, p, cols, results, g, having=hv)


def _build_owner(p, col_order, null_order, has_sv, packed, keys, scatters,
                 mesh, axis, ndev, blk, lgcap, pbcap, mcap, gcap, narrow,
                 nkeycols, key_dtypes, nspec):
    from aquery2_tpu.ops import hashing
    from aquery2_tpu.parallel.dist_join import _pack_buckets_multi

    def fused(nn, *arrs):
        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), *([P(axis)] * nspec)),
                 out_specs=(P(axis), P(), P()))
        def local(nn_, *blocks):
            outs, slot_ok = _shard_partials(
                nn_, blocks, axis, blk, p, col_order, null_order,
                has_sv, packed, keys, scatters, lgcap, narrow)
            pkeys = [outs.pop(f"__k{i}") for i in range(nkeycols)]
            lane_tags = sorted(outs)

            # route each partial group row to hash(key) mod ndev; the
            # pack compacts (only `ok` rows ship) — padding never rides
            hv = hashing.combine_hashes(
                [hashing.hash64(hashing.bits64(k)) for k in pkeys])
            route = (hv & jnp.uint64(2**62 - 1)).astype(jnp.int64)
            _kb, pb, okb, ndrop = _pack_buckets_multi(
                route, [*pkeys, *[outs[t] for t in lane_tags]],
                slot_ok, ndev, pbcap)
            a2a = lambda x: jax.lax.all_to_all(x, axis, 0, 0,    # noqa
                                               tiled=False)
            ok_r = a2a(okb).reshape(-1)
            recv = [a2a(x).reshape(-1) for x in pb]
            keys_r = recv[:nkeycols]
            lanes_r = dict(zip(lane_tags, recv[nkeycols:]))

            # owner-local merge: every received partial of a group is
            # here and nowhere else — one sort + boundary reduction
            add_m, mins_m, maxs_m, f64_m = _classify_merge_lanes(
                lanes_r, ok_r)
            payload, tag_groups = fg._lane_payload(
                (add_m, mins_m, maxs_m, f64_m))
            invalid = ~ok_r
            sorted_res = jax.lax.sort(
                [invalid, *keys_r, *payload], num_keys=1 + nkeycols,
                is_stable=False)
            valid_s = ~sorted_res[0]
            skeys = sorted_res[1:1 + nkeycols]
            add_s, mins_s, maxs_s, f64s_s = fg._split_sorted_payload(
                sorted_res, 1 + nkeycols, tag_groups)
            dif = sorted_res[0][1:] != sorted_res[0][:-1]
            for sk in skeys:
                dif = dif | (sk[1:] != sk[:-1])
            starts = jnp.concatenate([jnp.ones((1,), jnp.bool_), dif])
            last = jnp.concatenate(
                [dif, jnp.ones((1,), jnp.bool_)]) & valid_s
            from aquery2_tpu.ops import reduce as R
            outs2, _ends, ng2 = R.sorted_group_reduce(
                starts, last, add_s, mins_s, maxs_s, f64s_s, mcap,
                extract={f"__k{i}": skeys[i] for i in range(nkeycols)})
            merged_ok = jnp.arange(mcap, dtype=jnp.int32) < ng2
            overflow = jnp.maximum(ng2 - mcap, 0)
            out_d = {f"__k{i}": outs2[f"__k{i}"] for i in range(nkeycols)}
            for t in lane_tags:                 # includes "__counts__"
                out_d[t] = outs2[t]
            out_d["__ok"] = merged_ok
            return (out_d,
                    jax.lax.psum(ndrop.astype(jnp.int64), axis),
                    jax.lax.psum(overflow.astype(jnp.int64), axis))

        merged, dropped, overflow = local(nn, *arrs)

        # final: every group exists exactly ONCE globally — the output
        # needs only a replicated key sort of the ndev·mcap merged rows
        # (this all-gather is the O(G) output, not an O(ndev·partials)
        # re-merge)
        ok = merged.pop("__ok")
        fkeys = [merged.pop(f"__k{i}") for i in range(nkeycols)]
        tags = sorted(merged)
        sorted_res = jax.lax.sort(
            [~ok, *fkeys, *[merged[t] for t in tags]],
            num_keys=1 + nkeycols, is_stable=False)
        ng = jnp.sum(ok, dtype=jnp.int32)
        rep = lambda x: jax.lax.with_sharding_constraint(        # noqa
            x[:gcap], jax.sharding.NamedSharding(mesh, P()))
        outs = {f"__k{i}": rep(sorted_res[1 + i])
                for i in range(nkeycols)}
        for j, t in enumerate(tags):
            outs[t] = rep(sorted_res[1 + nkeycols + j])
        results = _project_tail(outs, p, packed, keys, key_dtypes)
        return results, ng, dropped, overflow

    return jax.jit(fused)
