"""Tiered segment reduction + stream compaction primitives.

TPU-native replacement for the reference's scatter-style aggregation loops
(server/aggregations.h, server/hasher.h AQHashTable/PerfectHashTable):
row→group reductions are the heart of every GROUP BY.

Measured on TPU v5e at 4-16M rows: an XLA int32 scatter-add costs
~9 ns/row regardless of destination size, an int64 scatter ~130 ns/row
(decomposed into u32 pairs — avoid!), a gather ~9 ns/element, a sort
~3-6 ns/row (payload operands ride along almost free), a cumsum
~0.5 ns/row, and `jnp.nonzero` ~90 ns/row. The tiers follow:

  * small domains (≤ ``config.ONEHOT_MATMUL_MAX_GROUPS``): one-hot
    matmul on the MXU — rows stream through a `lax.scan` in chunks;
    every additive lane is decomposed into balanced base-128 digits so
    the bf16 matmul is EXACT (a digit ∈ [-64,64] is exact in bf16,
    per-chunk dot products stay < 2^19 < 2^24 inside the MXU's f32
    accumulator). All lanes share one matmul (the 128-wide MXU
    dimension is free). ~25× faster than scatter for ≤ 100 groups.
  * large domains: sort rows by group code carrying the lanes as
    payload operands (`sorted_group_reduce`), then per-lane int64
    cumsum + boundary gathers — no scatter wider than 32 bits, no
    random gather of row data.

Stream compaction (`compact_indices`) replaces `jnp.nonzero`, which is
~13× slower than its own building blocks (cumsum + scatter) at 16M rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aquery2_tpu import config

_DIGIT_BITS = 7           # balanced base-128 digits: exact in bf16
_DIGIT_BASE = 1 << _DIGIT_BITS
_CHUNK = 8192             # minimum rows per scan step (divisibility gate)


def _pick_chunk(n: int, dp: int, max_digit: int) -> int:
    """Rows per lax.scan step for the one-hot MXU reduction.

    Bigger chunks amortize the scan's per-step dispatch (measured on the
    real chip at 1e8 rows: q1 67→55 ms, q2 121→61 ms going 8192→65536,
    then 46→29 ms with stats-bounded chunks; ~25 µs/step fixed cost).
    Bounds: the chunk must divide n (shape buckets are multiples of
    8192, so powers of two always can), the per-chunk dot must stay
    < 2^24 for exact f32 accumulation (worst-case Σ|digit| over a chunk
    = max_digit · chunk), the materialized [dp, chunk] one-hot is
    capped at 2^24 bf16 elements, and chunk ≤ 2^17 — measured flat
    55/61 ms beyond 2^16 at 1e8 rows, and a 2^20 chunk wedged the
    tunneled chip's XLA (do not raise without re-profiling)."""
    cap = min((1 << 24) // max(max_digit, 1), 1 << 17)
    while cap * dp > (1 << 24):
        cap //= 2
    c = max(_CHUNK, 1 << (cap.bit_length() - 1))
    while c > _CHUNK and (n % c != 0):
        c //= 2
    return c


def compact_indices(mask: jax.Array, out_cap: int,
                    fill: int | None = None) -> jax.Array:
    """Indices of True entries, compacted to the front; `fill` beyond.

    Drop-in for ``jnp.nonzero(mask, size=out_cap, fill_value=fill)[0]``
    built from cumsum + one int32 scatter (13× faster at 16M rows)."""
    n = mask.shape[0]
    if fill is None:
        fill = n
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask, pos, out_cap)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    return (jnp.full((out_cap + 1,), fill, jnp.int32)
            .at[tgt].set(idx, mode="drop")[:out_cap])


# --------------------------------------------------------------------- #
# digit decomposition (exact bf16-matmul payloads)
# --------------------------------------------------------------------- #

def _digits_for_bound(bound: int) -> int:
    """Smallest nd with |v| ≤ bound representable in nd balanced base-128
    digits (d ∈ [-64,63]: range ±63·(128^nd − 1)/127 symmetric-safe)."""
    nd = 1
    while 63 * ((_DIGIT_BASE ** nd - 1) // (_DIGIT_BASE - 1)) < bound:
        nd += 1
    return nd


def bound_bucket(bound: int) -> int:
    """Stat bound rounded up to the next power of two.

    Cache soundness (ADVICE r4): compiled entries bake in max_digit
    (→ acc dtype, chunk, Pallas steps_per_sb) from the bound, but
    callers fingerprint on derived quantities. Fingerprinting AND
    deriving max_digit from the pow2 bucket makes the baked decisions
    valid for every bound that maps to the same cache entry, while
    still amortizing recompiles to ≤ log2(bound) per lane."""
    return 1 << max(int(bound) - 1, 0).bit_length()


def _ndigits_for(tag: str, dt, bound: int | None = None) -> int:
    """Digits needed per lane; static per (tag, dtype, stats bound).

    bound: max |value| of the lane from column stats (fused_groupby.
    lane_bounds) — small-valued lanes shrink from the worst-case digit
    count to the minimum (q1's sum(v1), v1 ∈ [1,5]: 5 digits → 1; f32
    sums of unit-range data: 8-digit coarse limb → 3). Fewer digit
    lanes = a narrower one-hot matmul payload = less HBM traffic in the
    dense tier's hot loop (VERDICT r3 weak #5)."""
    dt = jnp.dtype(dt)
    if dt == jnp.bool_:
        return 1
    if dt.kind == "f":
        # float-sum limb lanes (fused_groupby._build_lanes): the fine
        # limb "#B" is bounded by 2^23; the coarse "#A" covers |v|·2^14
        if tag.endswith("#B"):
            return 4
        if bound is not None:
            return min(_digits_for_bound(bound), 8)
        return 8
    if dt.itemsize <= 4:
        if bound is not None:
            return min(_digits_for_bound(bound), 5)
        return 5                                  # 5 × 7 ≥ 32 bits
    if bound is not None and bound < 2**31:
        # int64 lane whose values fit int32: _digits_int casts and
        # takes the native-int32 path (nd ≤ 5 skips the limb split)
        return min(_digits_for_bound(bound), 5)
    return 10                                     # products et al.


def _digits_int(r: jax.Array, nd: int) -> list[jax.Array]:
    """Base-128 digits of an integer array on a uniform 128^j weight
    grid, native-width ops only.

    int64 inputs are pre-split into two unsigned 21-bit parts plus a
    signed 22-bit top (int64 arithmetic is emulated on TPU — two orders
    of magnitude slower per op); 21 = 3 × 7 keeps every digit on the
    same weight grid. Non-negative parts use plain digits ∈ [0,127],
    the signed top (and signed int32 lanes) balanced digits ∈ [-64,64];
    both are exact in bf16 and keep chunk dot products < 2^20."""
    if r.dtype.itemsize > 4 and nd > 5:
        m21 = jnp.int64((1 << 21) - 1)
        lo = (r & m21).astype(jnp.int32)                  # bits 0..20
        mid = ((r >> 21) & m21).astype(jnp.int32)         # bits 21..41
        hi = (r >> 42).astype(jnp.int32)                  # bits 42.. signed
        return (_digits_uint32(lo, 3) + _digits_uint32(mid, 3)
                + _digits_int32(hi, nd - 6))
    return _digits_int32(r.astype(jnp.int32), nd)


def _digits_uint32(r: jax.Array, nd: int) -> list[jax.Array]:
    """Digits ∈ [0,127] of a non-negative int32 < 2^(7·nd)."""
    out = []
    for _ in range(nd):
        out.append((r & (_DIGIT_BASE - 1)).astype(jnp.bfloat16))
        r = r >> _DIGIT_BITS
    return out


def _digits_int32(r: jax.Array, nd: int) -> list[jax.Array]:
    """Balanced digits ∈ [-64,64) of a signed int32 array."""
    half = _DIGIT_BASE // 2
    out = []
    for _ in range(nd):
        d = ((r + half) % _DIGIT_BASE) - half
        r = (r - d) // _DIGIT_BASE
        out.append(d.astype(jnp.bfloat16))
    return out


def _digits_f32(a: jax.Array, nd: int) -> list[jax.Array]:
    """Balanced base-128 digits of an integer-valued float32 array.

    All ops are exact: x/128 is an exponent shift, round() of an
    integer-valued quotient ≥ 2^24 is the identity, and the subtraction
    cancels exactly (both operands within a factor of 2)."""
    out = []
    r = a
    for _ in range(nd):
        q = jnp.round(r * jnp.float32(1.0 / _DIGIT_BASE))
        d = r - q * jnp.float32(_DIGIT_BASE)
        r = q
        out.append(d.astype(jnp.bfloat16))
    return out


def _lane_digits(tag: str, v: jax.Array, nd: int) -> list[jax.Array]:
    if v.dtype == jnp.bool_:
        return [v.astype(jnp.bfloat16)]
    if jnp.dtype(v.dtype).kind == "f":
        return _digits_f32(v.astype(jnp.float32), nd)
    return _digits_int(v, nd)


# --------------------------------------------------------------------- #
# tier 1: one-hot matmul (MXU) for small domains
# --------------------------------------------------------------------- #

def _digit_mag(t, dt, nd, bounds) -> int:
    """Max |digit| a lane's decomposition can produce (exactness caps)."""
    dt = jnp.dtype(dt)
    if dt == jnp.bool_:
        return 1
    if nd == 1 and t in bounds:
        # values ARE the digits; pow2 bucket so the cached entry's
        # acc-dtype/chunk choices stay valid as appends grow the bound
        # within the same bucket (fingerprints use the same bucket)
        return min(bound_bucket(max(int(bounds[t]), 1)), _DIGIT_BASE // 2)
    if dt.kind != "f" and dt.itemsize > 4 and nd > 5:
        return _DIGIT_BASE - 1                # uint lo/mid limb digits
    return _DIGIT_BASE // 2                   # balanced digits


def _pallas_onehot_ok(n: int, dp: int) -> bool:
    """Gate for the fused one-hot Pallas reduction: TPU backend
    (Mosaic), block-aligned capacity, large enough to beat the XLA scan
    warm-up. Opt-in via AQ_TPU_ONEHOT=1 (see config.use_pallas_onehot:
    a failed remote Mosaic compile can wedge the tunneled chip)."""
    if not (config.use_pallas and config.use_pallas_onehot):
        return False
    if n % 8192 != 0 or n < (1 << 16):
        return False
    return jax.default_backend() == "tpu"


def _pallas_onehot_reduce(code, add_lanes, domain, bounds=None,
                          interpret=False):
    """Additive lanes via the fused one-hot MXU kernel: the one-hot
    lives only in VMEM (pallas_kernels.onehot_segment_sums), cutting the
    dense tier's HBM traffic to code + digit lanes (measured q1 at 1e8:
    48 -> ~31 ms, the residual being the tunnel's ~23 ms sync)."""
    from aquery2_tpu.ops import pallas_kernels as PK

    add_tags = list(add_lanes)
    dp = domain + 1
    n = int(code.shape[0])
    bounds = bounds or {}
    nd_per = [_ndigits_for(t, add_lanes[t].dtype, bounds.get(t))
              for t in add_tags]
    max_digit = max((_digit_mag(t, add_lanes[t].dtype, nd, bounds)
                     for t, nd in zip(add_tags, nd_per)), default=1)

    digs = []
    for t, nd in zip(add_tags, nd_per):
        digs.extend(_lane_digits(t, add_lanes[t], nd))
    pay = jnp.stack(digs, axis=0)                       # [L, n] bf16
    parts = PK.onehot_segment_sums(code, pay, dp, max_digit,
                                   interpret=interpret)
    acc = jnp.sum(parts.astype(jnp.int64), axis=0)      # [dp, L] exact

    outs = {}
    off = 0
    for t, nd in zip(add_tags, nd_per):
        total = jnp.zeros((dp,), jnp.int64)
        for j in range(nd):
            total = total + (acc[:, off + j] << (_DIGIT_BITS * j))
        off += nd
        outs[t] = total
    return outs


def _mxu_reduce(code, add_lanes, min_lanes, max_lanes, domain,
                bounds=None):
    add_tags = list(add_lanes)
    min_tags = list(min_lanes)
    max_tags = list(max_lanes)
    dp = domain + 1
    n = int(code.shape[0])
    bounds = bounds or {}
    nd_per = [
        _ndigits_for(t, add_lanes[t].dtype, bounds.get(t))
        for t in add_tags]
    nlanes = sum(nd_per)

    max_digit = max((_digit_mag(t, add_lanes[t].dtype, nd, bounds)
                     for t, nd in zip(add_tags, nd_per)), default=1)
    chunk = _pick_chunk(n, dp, max_digit)
    nc = n // chunk

    code2 = code.reshape(nc, chunk)
    adds2 = [add_lanes[t].reshape(nc, chunk) for t in add_tags]
    mins2 = [min_lanes[t].reshape(nc, chunk) for t in min_tags]
    maxs2 = [max_lanes[t].reshape(nc, chunk) for t in max_tags]

    # int32 carry when worst-case digit totals fit, else int64 (the
    # per-lane digit magnitude bound above makes this exact, not the
    # generic 127: q1's bound-5 lane carries int32 even at 1e8 rows)
    acc_dtype = (jnp.int32 if max_digit * n < 2**31 else jnp.int64)

    def step(carry, xs):
        acc, macc, xacc = carry
        cc, aa, mm, xx = xs
        # one-hot as [dp, C], NOT [C, dp]: the minor dim must be the
        # chunk (already lane-aligned) — a [C, dp] layout tile-pads the
        # tiny dp minor dim to 128 lanes, inflating the materialized
        # one-hot 128/dp× in HBM (measured: q1's scan was one-hot-
        # traffic-bound at 33 MB/step instead of 2.8 MB)
        oh_b = (cc[None, :]
                == jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0))
        new_macc = [
            jnp.minimum(prev, jnp.min(
                jnp.where(oh_b, v[None, :], prev[:, None]), axis=1))
            for prev, v in zip(macc, mm)
        ]
        new_xacc = [
            jnp.maximum(prev, jnp.max(
                jnp.where(oh_b, v[None, :], prev[:, None]), axis=1))
            for prev, v in zip(xacc, xx)
        ]
        if nlanes:
            oh = oh_b.astype(jnp.bfloat16)
            digs = []
            for t, a, nd in zip(add_tags, aa, nd_per):
                digs.extend(_lane_digits(t, a, nd))
            # payload as [L, C] for the same minor-dim-alignment reason
            # as the one-hot ([C, L] pads L → 128 lanes: 64× blowup for
            # a 2-lane q1)
            pay = jnp.stack(digs, axis=0)                  # [L, C] bf16
            part = jax.lax.dot_general(
                oh, pay, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [dp, L] exact
            acc = acc + part.astype(acc_dtype)
        return (acc, new_macc, new_xacc), None

    # under shard_map the scanned inputs are device-varying while these
    # literal inits are not — pcast the inits to the inputs' vma so the
    # scan carry types match (jax >= 0.9 vma check)
    vma = getattr(jax.typeof(code2), "vma", frozenset())

    def _v(x):
        if not vma:
            return x
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, tuple(vma), to="varying")
        return jax.lax.pvary(x, tuple(vma))

    init = (
        _v(jnp.zeros((dp, nlanes), acc_dtype)),
        [_v(jnp.full((dp,), _big_of(min_lanes[t].dtype),
                     min_lanes[t].dtype)) for t in min_tags],
        [_v(jnp.full((dp,), _small_of(max_lanes[t].dtype),
                     max_lanes[t].dtype)) for t in max_tags],
    )
    (acc, macc, xacc), _ = jax.lax.scan(
        step, init, (code2, adds2, mins2, maxs2))

    outs = {}
    off = 0
    for t, nd in zip(add_tags, nd_per):
        cols = acc[:, off:off + nd].astype(jnp.int64)
        off += nd
        total = jnp.zeros((dp,), jnp.int64)
        for j in range(nd):
            total = total + (cols[:, j] << (_DIGIT_BITS * j))
        outs[t] = total
    for t, arr in zip(min_tags, macc):
        outs[t] = arr
    for t, arr in zip(max_tags, xacc):
        outs[t] = arr
    return outs


def segment_reduce(code: jax.Array, add_lanes: dict[str, jax.Array],
                   min_lanes: dict[str, jax.Array],
                   max_lanes: dict[str, jax.Array],
                   f64_lanes: dict[str, jax.Array],
                   domain: int, bounds=None) -> dict[str, jax.Array]:
    """Reduce rows into ``domain + 1`` dense slots (slot ``domain`` is
    the overflow/invalid slot; lane arrays are [n], ``code`` int32 [n]
    with invalid rows carrying ``domain``).

    add_lanes: integer or integer-valued-float lanes, summed exactly
    into int64. min_/max_lanes: any dtype, pre-masked with ±sentinels.
    f64_lanes: float64 sums. bounds: tag → max |value| from column
    stats (fused_groupby.lane_bounds) — shrinks the MXU tier's digit
    lanes. Returns tag → [domain + 1] arrays."""
    outs: dict[str, jax.Array] = {}
    n = int(code.shape[0])
    dp = domain + 1

    use_mxu = (dp <= config.ONEHOT_MATMUL_MAX_GROUPS and n >= _CHUNK
               and n % _CHUNK == 0 and (add_lanes or min_lanes or max_lanes))
    if use_mxu:
        rem_adds = add_lanes
        if add_lanes and _pallas_onehot_ok(n, dp):
            outs.update(_pallas_onehot_reduce(code, add_lanes, domain,
                                              bounds))
            rem_adds = {}
        if rem_adds or min_lanes or max_lanes:
            outs.update(_mxu_reduce(code, rem_adds, min_lanes, max_lanes,
                                    domain, bounds=bounds))
    else:
        for t, col in add_lanes.items():
            outs[t] = (jnp.zeros((dp,), jnp.int64)
                       .at[code].add(col.astype(jnp.int64)))
        for t, col in min_lanes.items():
            outs[t] = (jnp.full((dp,), _big_of(col.dtype), col.dtype)
                       .at[code].min(col))
        for t, col in max_lanes.items():
            outs[t] = (jnp.full((dp,), _small_of(col.dtype), col.dtype)
                       .at[code].max(col))

    for t, col in f64_lanes.items():
        outs[t] = jnp.zeros((dp,), jnp.float64).at[code].add(col)
    return outs


# --------------------------------------------------------------------- #
# tier 2: sorted-run reduction for large domains
# --------------------------------------------------------------------- #

def _segmented_extreme(starts: jax.Array, v: jax.Array, is_min: bool):
    """Per-row running min/max that resets at segment starts; the value
    at each segment's last row is the segment extreme. One-pass Pallas
    block scan on TPU, Hillis-Steele doubling via ops.scan.seg_scan
    elsewhere (a tuple `associative_scan` is catastrophically slow on
    TPU — see there)."""
    from aquery2_tpu.ops.scan import _pallas_scan_ok, seg_scan

    if _pallas_scan_ok(v) and v.dtype in (jnp.int32, jnp.float32):
        from aquery2_tpu.ops import pallas_kernels as PK

        return PK.seg_scan_multi(starts, (v,),
                                 ("min" if is_min else "max",))[0]
    return seg_scan(v, starts, jnp.minimum if is_min else jnp.maximum)


def sorted_group_reduce(starts, last, add_lanes, min_lanes, max_lanes,
                        f64_lanes, gcap, counts_from_ends: str | None = None,
                        extract: dict[str, jax.Array] | None = None,
                        narrow_tags: frozenset = frozenset()):
    """Group reduction over rows ALREADY sorted by group key.

    starts: [n] bool, True at each group's first row (row 0 True).
    last: [n] bool, True at each VALID group's last row (invalid rows
    must sort to the back — sentinel keys — so they never set `last`).
    Lanes are [n] arrays in sorted row order (carry them through
    `lax.sort` as payload operands; a random gather costs as much as
    the whole sort).

    extract: extra [n] arrays whose value at each group's END row is
    wanted (sorted key columns, packed code words, …) — returned under
    their tags alongside the reductions.

    Returns (outs: tag → [gcap] per-group values in sorted-key order;
    ends_idx [gcap] row index of each group's last row; ng scalar group
    count). Slots ≥ ng hold garbage — callers slice by the
    materialized group count.

    Boundary extraction strategy, from measured v5e costs: a random
    gather is ~9 ns per OUTPUT element per 32-bit word, so when groups
    are sparse (gcap ≪ n) per-lane gathers at ends_idx are cheap; when
    nearly every row is its own group (h2o q10: 1e7 groups from 1e7
    rows) the gathers dominate — instead ONE unstable sort on a unique
    composite int32 key (end rows first, ascending) carries every
    extraction lane to the front in a single pass (~6× cheaper than
    four 64-bit gathers at 16M rows)."""
    n = int(starts.shape[0])
    ng = jnp.sum(last, dtype=jnp.int32)

    # Add lanes: a SEGMENTED 64-bit running sum in int32 limb pairs via
    # the one-pass Pallas kernel when eligible — the value at each
    # group's END row is directly the group sum (no global-cumsum
    # prev-diff), all arithmetic native int32. Fallback: global int64
    # cumsum (emulated on TPU: measured ~13× slower than int32 at 16M
    # rows) + boundary difference.
    pair_ok = _pallas_segsum_ok(n)
    end_vals: dict[str, jax.Array] = {}
    pair_tags: set[str] = set()
    n32_tags: set[str] = set()
    for t, col in (add_lanes or {}).items():
        if t == counts_from_ends:
            continue
        if col.dtype == jnp.bool_ or t in narrow_tags:
            # total provably < 2^31 (bool lanes: ≤ n rows; narrow_tags:
            # stats-bounded, fused_groupby.narrow_sum_tags) — ONE native
            # int32 cumsum, one extraction lane instead of two limbs
            end_vals[t] = jnp.cumsum(col.astype(jnp.int32))
            n32_tags.add(t)
        elif pair_ok and col.dtype in (jnp.int64, jnp.int32, jnp.float32):
            from aquery2_tpu.ops import pallas_kernels as PK
            hi, lo = PK.split_i64_limbs(col)
            shi, slo = PK.seg_cumsum_i64(starts, hi, lo)
            end_vals[t + "\0hi"] = shi
            end_vals[t + "\0lo"] = slo
            pair_tags.add(t)
        else:
            end_vals[t] = jnp.cumsum(col.astype(jnp.int64))
    for t, col in (min_lanes or {}).items():
        end_vals[t] = _segmented_extreme(starts, col, True)
    for t, col in (max_lanes or {}).items():
        end_vals[t] = _segmented_extreme(starts, col, False)
    for t, col in (f64_lanes or {}).items():
        end_vals[t] = jnp.cumsum(col.astype(jnp.float64))
    for t, col in (extract or {}).items():
        end_vals[t] = col

    # Measured v5e @ 1e8 rows (2026-08 round 5, tunneled chip, timings
    # forced by a host fetch — block_until_ready does NOT await remote
    # completion over the tunnel): one unstable int32-key sort costs
    # ~1.5 ns/row + ~1.55 ns/row per payload lane; an int32 scatter
    # costs ~4.6-6.6 ns/row so compact_indices (cumsum + full-size
    # scatter) is dominated by a key-only sort and was removed.
    # Separate per-lane gathers cost ~25 ns per OUTPUT element (7 lanes
    # at 1.26e7 ends: 2.4 s) but ONE row-gather from a [n, L] stack of
    # the lanes costs ~0.23 s for the same extraction — stacking is a
    # sequential write and the gather amortizes its addressing over the
    # whole row. Two extraction strategies:
    #   sparse:   key-only compaction sort (the key doubles as the end
    #             row index) + one stacked row-gather at ends_idx
    #               n · 1.5  +  stack/gather ≈ n·L·0.35 + gcap·20 [ns]
    #   carrying: every lane rides the compaction sort as payload
    #               n · (1.5 + 1.55 · L)           [ns]
    # Sparse wins (~4×) whenever groups are even modestly sparse —
    # h2o q3/q5 (1e7 groups from 1e8 rows): extraction 1.1 s → 0.38 s;
    # carrying keeps q10 (groups ≈ rows, where a row-gather at
    # gcap ≈ n degenerates to ~29 ns · n of random reads).
    L = len(end_vals)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    # the sort key doubles as the end-row index (key = idx at end
    # rows, which sort to the front) — no separate idx payload lane
    key = jnp.where(last, idx, idx + jnp.int32(n))       # unique → unstable ok
    # measured-constant cost model (ns): carrying pays 1.55/row/lane of
    # extra sort payload; sparse pays the 1.5/row key-only sort plus
    # the cheaper of L separate gathers (25/output/lane) or a stacked
    # [n, L] row-gather (0.35/row/lane stack + one 25/output gather).
    # L=1 at large gcap stays carrying (h2o q8: a lone 1.26e7-element
    # gather costs ~315 ms vs ~155 ms of sort payload).
    sparse_cost = 1.5 * n + min(25.0 * gcap * L, 0.35 * n * L + 25.0 * gcap)
    if sparse_cost < 1.55 * L * n:
        ends_idx = jnp.minimum(
            jax.lax.sort([key], num_keys=1, is_stable=False)[0][:gcap],
            n - 1)
        at_ends = _gather_lanes(end_vals, ends_idx)
    else:
        tags = list(end_vals)
        res = jax.lax.sort([key, *[end_vals[t] for t in tags]],
                           num_keys=1, is_stable=False)
        ends_idx = jnp.minimum(res[0][:gcap], n - 1)
        at_ends = {t: r[:gcap] for t, r in zip(tags, res[1:])}

    outs: dict[str, jax.Array] = {}
    if counts_from_ends is not None:
        # when invalid rows are GUARANTEED to sort behind every valid
        # group (sentinel keys), every row inside a group is valid, so
        # group sizes are just boundary-index differences — saves one
        # cumsum + one boundary extraction on every query
        prev_e = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), ends_idx[:-1]])
        outs[counts_from_ends] = ends_idx - prev_e
    for t in (add_lanes or {}):
        if t == counts_from_ends:
            continue
        if t in pair_tags:
            from aquery2_tpu.ops import pallas_kernels as PK
            outs[t] = PK.join_i64_limbs(at_ends[t + "\0hi"],
                                        at_ends[t + "\0lo"])
            continue
        ends_v = at_ends[t]
        if t in n32_tags:
            prev32 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                      ends_v[:-1]])
            outs[t] = (ends_v - prev32).astype(jnp.int64)
            continue
        prev = jnp.concatenate([jnp.zeros((1,), jnp.int64), ends_v[:-1]])
        outs[t] = ends_v - prev
    for t in (min_lanes or {}):
        outs[t] = at_ends[t]
    for t in (max_lanes or {}):
        outs[t] = at_ends[t]
    for t in (f64_lanes or {}):
        ends_v = at_ends[t]
        prev = jnp.concatenate([jnp.zeros((1,), jnp.float64), ends_v[:-1]])
        outs[t] = ends_v - prev
    for t in (extract or {}):
        outs[t] = at_ends[t]
    return outs, ends_idx, ng


def _gather_lanes(end_vals: dict[str, jax.Array],
                  ends_idx: jax.Array) -> dict[str, jax.Array]:
    """Extract every lane at ``ends_idx`` with ONE row-gather per dtype
    width: lanes bitcast to a common int type, stack to [n, L], gather
    gcap rows, unstack, bitcast back. Measured v5e at 1e8 rows /
    1.26e7 ends: 7 stacked lanes ≈ 0.23 s vs ≈ 2.4 s as 7 separate
    gathers (the gather's per-element addressing amortizes over the
    row; the stack is a sequential HBM write)."""
    by_width: dict[int, list[str]] = {}
    out: dict[str, jax.Array] = {}
    for t, v in end_vals.items():
        if v.dtype == jnp.bool_:
            out[t] = v[ends_idx]                # rare; keep it simple
        else:
            by_width.setdefault(jnp.dtype(v.dtype).itemsize, []).append(t)
    for width, tags in by_width.items():
        if len(tags) == 1:
            t = tags[0]
            out[t] = end_vals[t][ends_idx]
            continue
        itype = jnp.int32 if width == 4 else jnp.int64
        stacked = jnp.stack(
            [jax.lax.bitcast_convert_type(end_vals[t], itype)
             for t in tags], axis=1)[ends_idx]
        for j, t in enumerate(tags):
            out[t] = jax.lax.bitcast_convert_type(stacked[:, j],
                                                  end_vals[t].dtype)
    return out


def _pallas_segsum_ok(n: int) -> bool:
    """Gate for the one-pass Pallas segmented limb-pair sum: TPU backend
    (Mosaic), capacity a Pallas-block multiple, large enough that one
    HBM pass beats XLA's log-n doubling. AQ_TPU_PALLAS=0 disables."""
    from aquery2_tpu import config
    if not config.use_pallas:
        return False
    if n % 8192 != 0 or n < (1 << 16):
        return False
    return jax.default_backend() == "tpu"


def _big_of(dt):
    dt = jnp.dtype(dt)
    if dt.kind == "f":
        return jnp.inf
    if dt == jnp.bool_:
        return True
    return jnp.iinfo(dt).max


def _small_of(dt):
    dt = jnp.dtype(dt)
    if dt.kind == "f":
        return -jnp.inf
    if dt == jnp.bool_:
        return False
    return jnp.iinfo(dt).min
