"""Distributed join: radix all_to_all shuffle + shard-local probe.

Design (BASELINE.json north star): rows are re-partitioned so that equal
keys land on the same chip — destination = hash(key) mod ndev — via one
`all_to_all` over ICI, then each chip runs the local sort-merge join
(engine/join.py). Buckets are fixed-capacity (static shapes for XLA):
each shard packs its rows into [ndev, cap] send buffers by stable sort on
destination; rows overflowing a bucket are counted on device and the
``_safe`` wrapper retries with doubled caps until the exchange is
lossless (same skew policy as dist_groupby.dist_grouped_sums_shuffle_safe
— doubling converges in O(log skew) rounds; each retry recompiles once
per cap, amortized by the jit cache).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from aquery2_tpu.ops import hashing


def _pack_buckets(key: jax.Array, payload: jax.Array, valid: jax.Array,
                  ndev: int, cap: int):
    """Sort rows by destination and scatter into [ndev, cap] buckets.
    Returns (keys[ndev,cap], payload[ndev,cap], ok[ndev,cap],
    ndrop scalar — valid rows that overflowed their bucket)."""
    dest = (hashing.hash64(key.astype(jnp.int64)) % jnp.uint64(ndev)).astype(jnp.int32)
    dest = jnp.where(valid, dest, ndev)  # invalid rows → overflow dest
    order = jnp.argsort(dest, stable=True)
    d_sorted = dest[order]
    k_sorted = key[order]
    p_sorted = payload[order]
    # position within destination run
    idx = jnp.arange(dest.shape[0], dtype=jnp.int32)
    first_flag = jnp.concatenate([jnp.ones((1,), bool), d_sorted[1:] != d_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(first_flag, idx, 0))
    within = idx - run_start
    ok = (d_sorted < ndev) & (within < cap)
    slot = jnp.clip(d_sorted, 0, ndev - 1) * cap + jnp.clip(within, 0, cap - 1)
    # rows that miss their bucket go to a dump slot so they can't clobber
    # valid rows (buffers have one extra trailing slot, sliced off below)
    slot = jnp.where(ok, slot, ndev * cap)
    keys_b = jnp.zeros((ndev * cap + 1,), key.dtype).at[slot].set(k_sorted)
    pay_b = jnp.zeros((ndev * cap + 1,), payload.dtype).at[slot].set(p_sorted)
    okf = jnp.zeros((ndev * cap + 1,), jnp.bool_).at[slot].set(ok)
    ndrop = jnp.sum(((d_sorted < ndev) & ~ok).astype(jnp.int32))
    return (keys_b[:-1].reshape(ndev, cap), pay_b[:-1].reshape(ndev, cap),
            okf[:-1].reshape(ndev, cap), ndrop)


def dist_join_counts(mesh: Mesh, axis: str,
                     lkey: jax.Array, lvalid: jax.Array,
                     rkey: jax.Array, rvalid: jax.Array,
                     bucket_cap: int):
    """Radix-shuffle both sides; per shard, count matching pairs of the
    re-partitioned sides (the probe phase of a distributed hash join).
    Returns (pairs, dropped): the global pair count and the global count
    of rows that overflowed their fixed shuffle bucket and were NOT
    exchanged (both replicated scalars). ``dropped > 0`` means the pair
    count undercounts — use :func:`dist_join_counts_safe` to retry with
    larger caps until lossless."""
    ndev = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(), P()))
    def step(lk, lv, rk, rv):
        lkb, lpb, lok, ldrop = _pack_buckets(lk, lk, lv, ndev, bucket_cap)
        rkb, rpb, rok, rdrop = _pack_buckets(rk, rk, rv, ndev, bucket_cap)
        # exchange: bucket i goes to device i
        lk_recv = jax.lax.all_to_all(lkb, axis, 0, 0, tiled=False)
        lok_recv = jax.lax.all_to_all(lok, axis, 0, 0, tiled=False)
        rk_recv = jax.lax.all_to_all(rkb, axis, 0, 0, tiled=False)
        rok_recv = jax.lax.all_to_all(rok, axis, 0, 0, tiled=False)
        lkf = lk_recv.reshape(-1)
        lof = lok_recv.reshape(-1)
        rkf = rk_recv.reshape(-1)
        rof = rok_recv.reshape(-1)
        # local probe: sort right side, binary-search ranges
        big = jnp.asarray(jnp.iinfo(rkf.dtype).max, rkf.dtype)
        rk_sorted = jnp.sort(jnp.where(rof, rkf, big))
        lo = jnp.searchsorted(rk_sorted, lkf, side="left")
        hi = jnp.searchsorted(rk_sorted, lkf, side="right")
        cnt = jnp.sum(jnp.where(lof, (hi - lo).astype(jnp.int64), 0))
        return (jax.lax.psum(cnt, axis),
                jax.lax.psum(ldrop + rdrop, axis))

    return step(lkey, lvalid, rkey, rvalid)


def _pack_buckets_multi(key: jax.Array, payloads: list, valid: jax.Array,
                        ndev: int, cap: int):
    """_pack_buckets generalized to N payload columns. Returns
    (keys[ndev,cap], [payload[ndev,cap]...], ok[ndev,cap], ndrop)."""
    dest = (hashing.hash64(key.astype(jnp.int64))
            % jnp.uint64(ndev)).astype(jnp.int32)
    dest = jnp.where(valid, dest, ndev)
    order = jnp.argsort(dest, stable=True)
    d_sorted = dest[order]
    k_sorted = key[order]
    p_sorted = [p[order] for p in payloads]
    idx = jnp.arange(dest.shape[0], dtype=jnp.int32)
    first_flag = jnp.concatenate([jnp.ones((1,), bool),
                                  d_sorted[1:] != d_sorted[:-1]])
    run_start = jax.lax.cummax(jnp.where(first_flag, idx, 0))
    within = idx - run_start
    ok = (d_sorted < ndev) & (within < cap)
    slot = jnp.clip(d_sorted, 0, ndev - 1) * cap + jnp.clip(within, 0, cap - 1)
    slot = jnp.where(ok, slot, ndev * cap)
    keys_b = jnp.zeros((ndev * cap + 1,), key.dtype).at[slot].set(k_sorted)
    pays_b = [jnp.zeros((ndev * cap + 1,), p.dtype).at[slot].set(ps)
              for p, ps in zip(payloads, p_sorted)]
    okf = jnp.zeros((ndev * cap + 1,), jnp.bool_).at[slot].set(ok)
    ndrop = jnp.sum(((d_sorted < ndev) & ~ok).astype(jnp.int32))
    return (keys_b[:-1].reshape(ndev, cap),
            [p[:-1].reshape(ndev, cap) for p in pays_b],
            okf[:-1].reshape(ndev, cap), ndrop)


def dist_equijoin(mesh: Mesh, axis: str,
                  lkey: jax.Array, lvalid: jax.Array, lpays: list,
                  rkey: jax.Array, rvalid: jax.Array, rpays: list,
                  bucket_cap: int, out_cap: int):
    """MATERIALIZED distributed inner equi-join (VERDICT r2 missing #2).

    One SPMD program: radix all_to_all shuffle of both sides (equal keys
    colocate: dest = hash(key) mod ndev), shard-local sort-merge probe
    (sort the received build side, searchsorted the probe side — the
    same core as engine/join.py), then CSR pair expansion into fixed
    [out_cap] output slots per shard. Reference analogue: the shared-
    memory hash join (server/hasher.h:146-199, engine/ast.py:874-1090).

    Returns (lkey_out, louts, routs, ok, pairs, dropped, overflowed):
    output arrays are row-sharded [ndev·out_cap] with per-shard ragged
    validity ``ok``; ``pairs`` = exact global pair count; ``dropped`` =
    rows lost to bucket overflow; ``overflowed`` = pairs lost to the
    fixed out_cap. dropped/overflowed > 0 ⇒ retry with doubled caps
    (dist_equijoin_safe)."""
    ndev = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis),) * (4 + len(lpays) + len(rpays)),
             out_specs=((P(axis),) * (2 + len(lpays) + len(rpays))
                        + (P(), P(), P())))
    def step(lk, lv, rk, rv, *pays):
        lp = pays[: len(lpays)]
        rp = pays[len(lpays):]
        lkb, lpb, lok, ldrop = _pack_buckets_multi(lk, list(lp), lv, ndev,
                                                   bucket_cap)
        rkb, rpb, rok, rdrop = _pack_buckets_multi(rk, list(rp), rv, ndev,
                                                   bucket_cap)
        # exchange: bucket i of every shard lands on device i
        a2a = lambda x: jax.lax.all_to_all(x, axis, 0, 0, tiled=False)
        lkf = a2a(lkb).reshape(-1)
        lof = a2a(lok).reshape(-1)
        lpf = [a2a(x).reshape(-1) for x in lpb]
        rkf = a2a(rkb).reshape(-1)
        rof = a2a(rok).reshape(-1)
        rpf = [a2a(x).reshape(-1) for x in rpb]
        m = rkf.shape[0]

        # local probe: sort right side valid-first-by-key, payloads ride
        rsorted = jax.lax.sort([~rof, rkf, *rpf], num_keys=2,
                               is_stable=False)
        rk_s = rsorted[1]
        rp_s = rsorted[2:]
        nvalid = jnp.sum(rof, dtype=jnp.int32)
        # binary search needs a globally sorted array: overwrite the
        # invalid tail (sorted behind the valid prefix) with the dtype
        # max, then clamp ranges to the valid prefix — exact even when a
        # valid key equals the dtype max
        ii = jnp.arange(m, dtype=jnp.int32)
        rk_search = jnp.where(ii < nvalid, rk_s,
                              jnp.asarray(jnp.iinfo(rk_s.dtype).max,
                                          rk_s.dtype))
        lo = jnp.minimum(jnp.searchsorted(rk_search, lkf, side="left",
                                          method="sort"), nvalid)
        hi = jnp.minimum(jnp.searchsorted(rk_search, lkf, side="right",
                                          method="sort"), nvalid)
        cnt = jnp.where(lof, hi - lo, 0).astype(jnp.int32)
        csum = jnp.cumsum(cnt)                       # inclusive CSR ends
        total = csum[m - 1]

        # CSR pair expansion into out_cap slots: slot j belongs to the
        # first probe row whose inclusive end exceeds j
        j = jnp.arange(out_cap, dtype=jnp.int32)
        li = jnp.searchsorted(csum, j, side="right", method="sort")
        li = jnp.minimum(li, m - 1)
        start = csum[li] - cnt[li]
        ridx = jnp.minimum(lo[li] + (j - start), m - 1)
        ok = j < total
        louts = [p[li] for p in lpf]
        routs = [p[ridx] for p in rp_s]
        key_out = lkf[li]
        return (key_out, ok, *louts, *routs,
                jax.lax.psum(total.astype(jnp.int64), axis),
                jax.lax.psum((ldrop + rdrop).astype(jnp.int64), axis),
                jax.lax.psum(jnp.maximum(total - out_cap, 0)
                             .astype(jnp.int64), axis))

    res = step(lkey, lvalid, rkey, rvalid, *lpays, *rpays)
    key_out, ok = res[0], res[1]
    louts = list(res[2: 2 + len(lpays)])
    routs = list(res[2 + len(lpays): 2 + len(lpays) + len(rpays)])
    pairs, dropped, overflowed = res[-3], res[-2], res[-1]
    return key_out, louts, routs, ok, pairs, dropped, overflowed


def dist_equijoin_safe(mesh: Mesh, axis: str,
                       lkey, lvalid, lpays, rkey, rvalid, rpays,
                       bucket_cap: int, out_cap: int, max_retries: int = 5):
    """Skew-robust materialized join: doubles whichever cap overflowed
    until the exchange and the expansion are both lossless (a heavy-
    hitter key converges in O(log skew) rounds; each cap recompiles once,
    amortized by the jit cache)."""
    bcap, ocap = int(bucket_cap), int(out_cap)
    for _ in range(max_retries + 1):
        out = dist_equijoin(mesh, axis, lkey, lvalid, lpays,
                            rkey, rvalid, rpays, bcap, ocap)
        key_out, louts, routs, ok, pairs, dropped, overflowed = out
        dropped_i, overflowed_i = int(dropped), int(overflowed)
        if dropped_i == 0 and overflowed_i == 0:
            return key_out, louts, routs, ok, int(pairs)
        if dropped_i:
            bcap *= 2
        if overflowed_i:
            ocap *= 2
    raise RuntimeError(
        f"dist_equijoin: overflow persists at bucket_cap={bcap} "
        f"out_cap={ocap}")


def dist_equijoin_outer(mesh: Mesh, axis: str,
                        lkey: jax.Array, lvalid: jax.Array, lpays: list,
                        rkey: jax.Array, rvalid: jax.Array, rpays: list,
                        bucket_cap: int, out_cap: int,
                        emit_left: bool, emit_right: bool):
    """MATERIALIZED distributed OUTER equi-join (VERDICT r3 missing #1).

    Same shuffle + shard-local sort-merge probe as :func:`dist_equijoin`,
    extended to emit unmatched rows (colocation makes this exact: after
    the all_to_all, a key absent on THIS shard is absent everywhere):

    * ``emit_left`` (LEFT/FULL): an unmatched probe row claims one CSR
      slot (cnt := max(cnt, 1)) whose right payloads are NULL
      (``rnull``).
    * ``emit_right`` (RIGHT/FULL): unmatched build rows — membership-
      tested against the sorted received probe keys — append a second
      per-shard block of bucket-received size whose left payloads are
      NULL (``lnull``). One slot per received row: never overflows.

    Returns (key_out, louts, routs, ok, lnull, rnull, pairs, dropped,
    overflowed): [ndev·(out_cap[+ndev·bucket_cap])] row-sharded arrays.
    Reference analogue: the outer branches of the join-graph compiler
    (engine/ast.py:874-1090), executed by MonetDB single-node there."""
    ndev = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis),) * (4 + len(lpays) + len(rpays)),
             out_specs=((P(axis),) * (4 + len(lpays) + len(rpays))
                        + (P(), P(), P())))
    def step(lk, lv, rk, rv, *pays):
        lp = pays[: len(lpays)]
        rp = pays[len(lpays):]
        lkb, lpb, lok, ldrop = _pack_buckets_multi(lk, list(lp), lv, ndev,
                                                   bucket_cap)
        rkb, rpb, rok, rdrop = _pack_buckets_multi(rk, list(rp), rv, ndev,
                                                   bucket_cap)
        a2a = lambda x: jax.lax.all_to_all(x, axis, 0, 0, tiled=False)  # noqa
        lkf = a2a(lkb).reshape(-1)
        lof = a2a(lok).reshape(-1)
        lpf = [a2a(x).reshape(-1) for x in lpb]
        rkf = a2a(rkb).reshape(-1)
        rof = a2a(rok).reshape(-1)
        rpf = [a2a(x).reshape(-1) for x in rpb]
        m = rkf.shape[0]
        ii = jnp.arange(m, dtype=jnp.int32)

        rsorted = jax.lax.sort([~rof, rkf, *rpf], num_keys=2,
                               is_stable=False)
        rk_s = rsorted[1]
        rp_s = rsorted[2:]
        nvalid_r = jnp.sum(rof, dtype=jnp.int32)
        big = jnp.asarray(jnp.iinfo(rk_s.dtype).max, rk_s.dtype)
        rk_search = jnp.where(ii < nvalid_r, rk_s, big)
        lo = jnp.minimum(jnp.searchsorted(rk_search, lkf, side="left",
                                          method="sort"), nvalid_r)
        hi = jnp.minimum(jnp.searchsorted(rk_search, lkf, side="right",
                                          method="sort"), nvalid_r)
        cnt = jnp.where(lof, hi - lo, 0).astype(jnp.int32)
        cnt_eff = jnp.where(lof & jnp.bool_(emit_left),
                            jnp.maximum(cnt, 1), cnt)
        csum = jnp.cumsum(cnt_eff)
        total = csum[m - 1]

        j = jnp.arange(out_cap, dtype=jnp.int32)
        li = jnp.searchsorted(csum, j, side="right", method="sort")
        li = jnp.minimum(li, m - 1)
        start = csum[li] - cnt_eff[li]
        within = j - start
        matched = within < cnt[li]
        ridx = jnp.minimum(lo[li] + jnp.where(matched, within, 0), m - 1)
        ok = j < total
        rnull = ok & ~matched
        key_out = lkf[li]
        louts = [p[li] for p in lpf]
        routs = [jnp.where(rnull, jnp.zeros((), p.dtype), p[ridx])
                 for p in rp_s]
        lnull = jnp.zeros((out_cap,), jnp.bool_)

        if emit_right:
            lsorted = jax.lax.sort([~lof, lkf], num_keys=2,
                                   is_stable=False)
            lk_s = lsorted[1]
            nvalid_l = jnp.sum(lof, dtype=jnp.int32)
            lk_search = jnp.where(ii < nvalid_l, lk_s,
                                  jnp.asarray(jnp.iinfo(lk_s.dtype).max,
                                              lk_s.dtype))
            pos = jnp.searchsorted(lk_search, rk_s, side="left",
                                   method="sort")
            posc = jnp.minimum(pos, m - 1)
            matched_r = (lk_search[posc] == rk_s) & (pos < nvalid_l)
            rof_s = ii < nvalid_r
            ok_r = rof_s & ~matched_r
            key_out = jnp.concatenate([key_out, rk_s])
            louts = [jnp.concatenate([a, jnp.zeros((m,), a.dtype)])
                     for a in louts]
            routs = [jnp.concatenate([a, s]) for a, s in zip(routs, rp_s)]
            ok = jnp.concatenate([ok, ok_r])
            lnull = jnp.concatenate([lnull, jnp.ones((m,), jnp.bool_)])
            rnull = jnp.concatenate([rnull, jnp.zeros((m,), jnp.bool_)])
            total_out = total + jnp.sum(ok_r, dtype=jnp.int32)
        else:
            total_out = total
        return (key_out, ok, lnull, rnull, *louts, *routs,
                jax.lax.psum(total_out.astype(jnp.int64), axis),
                jax.lax.psum((ldrop + rdrop).astype(jnp.int64), axis),
                jax.lax.psum(jnp.maximum(total - out_cap, 0)
                             .astype(jnp.int64), axis))

    res = step(lkey, lvalid, rkey, rvalid, *lpays, *rpays)
    key_out, ok, lnull, rnull = res[0], res[1], res[2], res[3]
    louts = list(res[4: 4 + len(lpays)])
    routs = list(res[4 + len(lpays): 4 + len(lpays) + len(rpays)])
    pairs, dropped, overflowed = res[-3], res[-2], res[-1]
    return (key_out, louts, routs, ok, lnull, rnull, pairs, dropped,
            overflowed)


def dist_equijoin_outer_safe(mesh: Mesh, axis: str,
                             lkey, lvalid, lpays, rkey, rvalid, rpays,
                             bucket_cap: int, out_cap: int,
                             emit_left: bool, emit_right: bool,
                             max_retries: int = 5):
    """Skew-robust outer join: doubles whichever cap overflowed until
    the exchange and the pair expansion are both lossless."""
    bcap, ocap = int(bucket_cap), int(out_cap)
    for _ in range(max_retries + 1):
        out = dist_equijoin_outer(mesh, axis, lkey, lvalid, lpays,
                                  rkey, rvalid, rpays, bcap, ocap,
                                  emit_left, emit_right)
        (key_out, louts, routs, ok, lnull, rnull, pairs, dropped,
         overflowed) = out
        dropped_i, overflowed_i = int(dropped), int(overflowed)
        if dropped_i == 0 and overflowed_i == 0:
            return key_out, louts, routs, ok, lnull, rnull, int(pairs)
        if dropped_i:
            bcap *= 2
        if overflowed_i:
            ocap *= 2
    raise RuntimeError(
        f"dist_equijoin_outer: overflow persists at bucket_cap={bcap} "
        f"out_cap={ocap}")


def dist_join_counts_safe(mesh: Mesh, axis: str,
                          lkey: jax.Array, lvalid: jax.Array,
                          rkey: jax.Array, rvalid: jax.Array,
                          bucket_cap: int, max_retries: int = 4):
    """Skew-robust distributed join count: retry with doubled bucket
    caps until no row is dropped by the fixed-capacity exchange (a
    heavy-hitter key routing > bucket_cap rows of one shard to one
    destination overflows; doubling converges in O(log skew) rounds).
    Returns the exact global pair count."""
    cap = int(bucket_cap)
    for _ in range(max_retries + 1):
        pairs, dropped = dist_join_counts(mesh, axis, lkey, lvalid,
                                          rkey, rvalid, cap)
        if int(dropped) == 0:
            return pairs
        cap *= 2
    raise RuntimeError(
        f"dist_join_counts: bucket overflow persists at cap={cap}")
