"""Pallas TPU kernels for hot ordered-scan paths.

The XLA formulations in ops/scan.py issue one pass over HBM per
aggregate (cummin, cummax, cumsum are separate scans). For AQuery's
best-profit-style queries — `max(price - mins(price))` — and multi-stat
windows, this kernel computes **all running statistics in one HBM
pass**: the grid walks row blocks sequentially (TPU grid steps execute
in order), each step scans its VMEM-resident block and carries
(sum, min, max) forward in SMEM scratch.

Counterpart of the reference's single sequential loop per kernel
(aggregations.h) — but one fused pass produces every statistic at once,
at HBM speed-of-light (read n + write 3n elements).

CPU tests run with interpret=True; on TPU the same code compiles with
Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# block shape: (ROWS, 128) f32/i32 tiles; 8 sublanes minimum
_LANES = 128
_ROWS = 64          # 64*128 = 8192 elements per grid step
_BLOCK = _ROWS * _LANES


def _block_scan_2d(x, combine, axis_identity):
    """Inclusive scan over a (R, L) block in row-major element order:
    scan each row along lanes, then offset rows by the running combine of
    previous rows' totals."""
    row_scan = jax.lax.associative_scan(combine, x, axis=1)
    row_tot = row_scan[:, -1]                        # [R]
    row_carry = jax.lax.associative_scan(combine, row_tot)     # inclusive
    prev = jnp.concatenate(
        [jnp.full((1,), axis_identity, x.dtype), row_carry[:-1]])
    return combine(row_scan, prev[:, None])


def _running_kernel(x_ref, sums_ref, mins_ref, maxs_ref, carry_ref):
    """Grid step: fused running sum/min/max over one (R,128) block."""
    step = pl.program_id(0)
    x = x_ref[...]

    @pl.when(step == 0)
    def _():
        carry_ref[0] = jnp.zeros((), sums_ref.dtype)          # sum carry
        carry_ref[1] = jnp.asarray(jnp.inf, sums_ref.dtype)   # min carry
        carry_ref[2] = jnp.asarray(-jnp.inf, sums_ref.dtype)  # max carry

    xs = x.astype(sums_ref.dtype)
    s = _block_scan_2d(xs, jnp.add, jnp.zeros((), sums_ref.dtype))
    mn = _block_scan_2d(xs, jnp.minimum, jnp.asarray(jnp.inf, sums_ref.dtype))
    mx = _block_scan_2d(xs, jnp.maximum, jnp.asarray(-jnp.inf, sums_ref.dtype))

    sums_ref[...] = s + carry_ref[0]
    mins_ref[...] = jnp.minimum(mn, carry_ref[1])
    maxs_ref[...] = jnp.maximum(mx, carry_ref[2])

    carry_ref[0] = carry_ref[0] + s[-1, -1]
    carry_ref[1] = jnp.minimum(carry_ref[1], mn[-1, -1])
    carry_ref[2] = jnp.maximum(carry_ref[2], mx[-1, -1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_running_stats(x: jax.Array, interpret: bool = False):
    """One-pass running (sums, mins, maxs) over a padded 1-D f32 column.

    Returns three arrays of x's shape in f32. Padding rows produce
    garbage (callers mask). Capacity must be a multiple of 8192
    (guaranteed by config.bucket_size for columns ≥ 8192)."""
    cap = x.shape[0]
    assert cap % _BLOCK == 0, cap
    nblocks = cap // _BLOCK
    x2 = x.reshape(nblocks * _ROWS, _LANES).astype(jnp.float32)

    grid = (nblocks,)
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, np.int32(0)))
    out_shape = jax.ShapeDtypeStruct((nblocks * _ROWS, _LANES), jnp.float32)
    sums, mins, maxs = pl.pallas_call(
        _running_kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(x2)
    return (sums.reshape(cap), mins.reshape(cap), maxs.reshape(cap))


def best_profit(x: jax.Array, n, interpret: bool = False):
    """max(x - mins(x)) in one fused pass + one reduction
    (tests/best_profit.a's hot query)."""
    _, mins, _ = fused_running_stats(x, interpret=interpret)
    xf = x.astype(jnp.float32)
    profit = xf - mins
    idx = jnp.arange(x.shape[0], dtype=jnp.int32)
    return jnp.max(jnp.where(idx < n, profit, -jnp.inf))


# ======================================================================= #
# One-pass segmented multi-scan
# ======================================================================= #
#
# The XLA formulation of a segmented scan (ops/scan.py seg_scan) is
# Hillis-Steele doubling: log2(n) masked roll+combine passes, each a full
# HBM read+write of the column — ~27 round trips at 2^27 rows. This
# kernel computes the same inclusive segmented scan in ONE HBM pass:
# the grid walks row blocks sequentially (TPU grid steps are ordered),
# each step runs the doubling entirely in VMEM (log2(block) steps over
# registers/VMEM, no HBM traffic) and carries each open segment's
# running value forward in SMEM.
#
# Several scans over DIFFERENT inputs but the SAME segmentation fuse into
# the one pass (e.g. vars needs cumsum(x) and cumsum(x²); the boundary
# flags are shared) — the flag OR-scan is computed once per block and
# reused by every lane.

_OP_TABLE = {
    "add": (jnp.add, lambda dt: 0),
    "min": (jnp.minimum,
            lambda dt: jnp.inf if jnp.dtype(dt).kind == "f"
            else jnp.iinfo(dt).max),
    "max": (jnp.maximum,
            lambda dt: -jnp.inf if jnp.dtype(dt).kind == "f"
            else jnp.iinfo(dt).min),
}


def _flat_roll(a, s: int):
    """roll by s in row-major element order over a (R, 128) block:
    result[r, l] = a[r - (l < s%128), (l - s) % 128] shifted whole rows
    for multiples of 128. Wrapped rows produce garbage that the caller
    masks via flat-position guards."""
    from jax.experimental.pallas import tpu as _pt

    # shifts must be i32 scalars: under jax_enable_x64 a bare Python int
    # traces as i64, which tpu.dynamic_rotate rejects
    if s % _LANES == 0:
        return _pt.roll(a, np.int32(s // _LANES), axis=0)
    assert s < _LANES, s     # powers of two only: either <128 or multiple
    r1 = _pt.roll(a, np.int32(s), axis=1)
    r2 = _pt.roll(r1, np.int32(1), axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane < s, r2, r1)


def _make_segscan_kernel(ops: tuple[str, ...], rows: int,
                         dtypes: tuple, has_flags: bool):
    block = rows * _LANES

    def kernel(*refs):
        # refs = [f_ref?], x_refs..., out_refs..., carry_refs... (SMEM)
        if has_flags:
            f_ref, refs = refs[0], refs[1:]
        k = len(ops)
        x_refs = refs[:k]
        out_refs = refs[k:2 * k]
        carry_refs = refs[2 * k:]
        step = pl.program_id(0)

        flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
                * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))

        @pl.when(step == 0)
        def _():
            for i, op in enumerate(ops):
                _, ident = _OP_TABLE[op]
                carry_refs[i][0] = jnp.asarray(ident(dtypes[i]), dtypes[i])

        # flags stay int32: Mosaic's dynamic_rotate rejects i1 vectors
        f = f_ref[...] if has_flags else None
        vs = [x_ref[...] for x_ref in x_refs]
        s = 1
        while s < block:
            ok = flat >= s
            stop = ((f != 0) | ~ok) if has_flags else ~ok
            if has_flags:
                fsh = _flat_roll(f, s)
            for i, op in enumerate(ops):
                combine, _ = _OP_TABLE[op]
                vsh = _flat_roll(vs[i], s)
                vs[i] = jnp.where(stop, vs[i], combine(vsh, vs[i]))
            if has_flags:
                f = f | jnp.where(ok, fsh, np.int32(0))
            s <<= 1
        # rows in the block's first (still-open) segment fold in the carry
        open_ = (f == 0) if has_flags else True
        for i, op in enumerate(ops):
            combine, _ = _OP_TABLE[op]
            carried = combine(vs[i],
                              jnp.asarray(carry_refs[i][0], vs[i].dtype))
            out = jnp.where(open_, carried, vs[i]) if has_flags else carried
            out_refs[i][...] = out
            carry_refs[i][0] = out[rows - 1, _LANES - 1]

    return kernel


def _add64(ah, al, bh, bl):
    """64-bit add on (hi, lo) int32 limb pairs, lo holding the raw low
    32 bits (unsigned semantics via two's-complement wraparound).
    Associative — usable inside a scan combine. Native int32 ops only:
    int64 arithmetic on TPU is emulated (~50 ops per divide, ~4 per
    add) AND doubles every HBM lane to 8 bytes."""
    sign = np.int32(-(2 ** 31))
    lo = al + bl                                   # wraps mod 2^32
    # unsigned lo < al  ⟺  (lo ^ 2^31) <signed (al ^ 2^31); select, not
    # astype — Mosaic's i1→i32 convert_element_type lowering recurses
    carry = jnp.where((lo ^ sign) < (al ^ sign),
                      np.int32(1), np.int32(0))
    hi = ah + bh + carry
    return hi, lo


def _make_segsum64_kernel(rows: int, has_flags: bool):
    block = rows * _LANES

    def kernel(*refs):
        if has_flags:
            f_ref, refs = refs[0], refs[1:]
        hi_ref, lo_ref, ohi_ref, olo_ref, carry_ref = refs
        step = pl.program_id(0)

        flat = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
                * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))

        @pl.when(step == 0)
        def _():
            carry_ref[0] = jnp.int32(0)
            carry_ref[1] = jnp.int32(0)

        # flags stay int32: Mosaic's dynamic_rotate rejects i1 vectors
        f = f_ref[...] if has_flags else None
        hi = hi_ref[...]
        lo = lo_ref[...]
        s = 1
        while s < block:
            ok = flat >= s
            stop = ((f != 0) | ~ok) if has_flags else ~ok
            if has_flags:
                fsh = _flat_roll(f, s)
            hsh = _flat_roll(hi, s)
            lsh = _flat_roll(lo, s)
            nh, nl = _add64(hsh, lsh, hi, lo)
            hi = jnp.where(stop, hi, nh)
            lo = jnp.where(stop, lo, nl)
            if has_flags:
                f = f | jnp.where(ok, fsh, np.int32(0))
            s <<= 1
        open_ = (f == 0) if has_flags else True
        ch, cl = _add64(carry_ref[0], carry_ref[1], hi, lo)
        if has_flags:
            ohi = jnp.where(open_, ch, hi)
            olo = jnp.where(open_, cl, lo)
        else:
            ohi, olo = ch, cl
        ohi_ref[...] = ohi
        olo_ref[...] = olo
        carry_ref[0] = ohi[rows - 1, _LANES - 1]
        carry_ref[1] = olo[rows - 1, _LANES - 1]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows"))
def seg_cumsum_i64(flags: jax.Array | None, hi: jax.Array, lo: jax.Array,
                   interpret: bool = False, block_rows: int = 0):
    """Inclusive segmented 64-bit cumsum over (hi, lo) int32 limb pairs
    in ONE HBM pass (vs log2(n) passes of emulated-int64 doubling).
    Returns (hi, lo) running values; reconstruct with
    hi.astype(i64) << 32 | lo viewed unsigned. flags semantics as in
    seg_scan_multi."""
    cap = hi.shape[0]
    if block_rows == 0:
        block_rows = _ROWS
        for cand in (512, 256, 128):
            if cap % (cand * _LANES) == 0:
                block_rows = cand
                break
    block = block_rows * _LANES
    assert cap % block == 0, (cap, block)
    nblocks = cap // block
    has_flags = flags is not None

    ins = []
    if has_flags:
        ins.append(flags.astype(jnp.int32).reshape(
            nblocks * block_rows, _LANES))
    ins.append(hi.reshape(nblocks * block_rows, _LANES))
    ins.append(lo.reshape(nblocks * block_rows, _LANES))

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, np.int32(0)))
    shp = jax.ShapeDtypeStruct((nblocks * block_rows, _LANES), jnp.int32)
    ohi, olo = pl.pallas_call(
        _make_segsum64_kernel(block_rows, has_flags),
        grid=(nblocks,),
        in_specs=[spec] * len(ins),
        out_specs=(spec, spec),
        out_shape=(shp, shp),
        scratch_shapes=[pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(*ins)
    return ohi.reshape(cap), olo.reshape(cap)


def split_i64_limbs(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(hi, lo) int32 limbs of an integer-valued lane (i64/i32/bool or
    integer-valued f32 — the exact-f32-sum limb lanes)."""
    if v.dtype == jnp.int64:
        return ((v >> 32).astype(jnp.int32),
                jax.lax.convert_element_type(
                    v.astype(jnp.uint64) & jnp.uint64(0xFFFFFFFF),
                    jnp.uint32).view(jnp.int32))
    if v.dtype == jnp.bool_:
        lo = v.astype(jnp.int32)
        return jnp.zeros_like(lo), lo
    lo = v.astype(jnp.int32)       # f32 limb lanes are integer-valued
    return lo >> 31, lo            # arithmetic shift: sign extension


def join_i64_limbs(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return ((hi.astype(jnp.int64) << 32)
            | lo.view(jnp.uint32).astype(jnp.int64))


@functools.partial(jax.jit,
                   static_argnames=("ops", "interpret", "block_rows"))
def seg_scan_multi(flags: jax.Array | None, xs: tuple[jax.Array, ...],
                   ops: tuple[str, ...], interpret: bool = False,
                   block_rows: int = 0):
    """Inclusive segmented scans of each xs[i] with combine ops[i]
    ('add' | 'min' | 'max'), all sharing one boundary-flag array, in a
    single HBM pass. flags True = segment start; flags[0] need not be
    set (the kernel's step-0 carry is the op identity, so row 0 starts
    fresh regardless); flags=None = one unsegmented scan (the flag
    input and its OR-scan are compiled out). Shapes: 1-D, equal,
    multiple of 8192; dtypes f32/i32 (callers gate)."""
    cap = xs[0].shape[0]
    if block_rows == 0:
        # largest block (≤ 512 rows = 64K elements) dividing cap
        block_rows = _ROWS
        for cand in (512, 256, 128):
            if cap % (cand * _LANES) == 0:
                block_rows = cand
                break
    block = block_rows * _LANES
    assert cap % block == 0, (cap, block)
    nblocks = cap // block
    has_flags = flags is not None

    ins = []
    if has_flags:
        ins.append(flags.astype(jnp.int32).reshape(
            nblocks * block_rows, _LANES))
    ins.extend(x.reshape(nblocks * block_rows, _LANES) for x in xs)
    dtypes = tuple(x.dtype for x in xs)

    spec = pl.BlockSpec((block_rows, _LANES), lambda i: (i, np.int32(0)))
    out_shapes = tuple(
        jax.ShapeDtypeStruct((nblocks * block_rows, _LANES), dt)
        for dt in dtypes)
    kernel = _make_segscan_kernel(ops, block_rows, dtypes, has_flags)
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec] * len(ins),
        out_specs=tuple(spec for _ in xs),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.SMEM((1,), dt) for dt in dtypes],
        interpret=interpret,
    )(*ins)
    if not isinstance(outs, (list, tuple)):
        outs = (outs,)
    return tuple(o.reshape(cap) for o in outs)


# ======================================================================= #
# Fused one-hot MXU segment reduction (small group domains)
# ======================================================================= #
#
# The XLA dense tier (ops/reduce._mxu_reduce) materializes the one-hot
# [dp, chunk] bf16 matrix to HBM every scan step — measured ~12 GB of
# pure one-hot traffic for h2o q1 at 1e8 rows (bool compare write + bf16
# cast write + dot read), ~3x the input data itself. This kernel builds
# the one-hot IN VMEM (an iota compare the MXU dot consumes directly),
# so HBM traffic is just code + digit lanes: speed-of-light for the
# dense tier. Reference analogue: the perfect-hash scatter loop
# (server/hasher.h PerfectHashTable) — here a systolic matmul.
#
# Exactness: digits |d| <= max_digit; each superblock spans
# steps_per_sb * cb rows with max_digit * rows_per_sb <= 2^24, so every
# f32 partial accumulation step stays integer-exact. The [nsb, dp, L]
# partials are summed in int64 OUTSIDE the kernel (tiny).

def _make_onehot_kernel(dp, steps_per_sb):
    # np.int32, not a Python int: under jax_enable_x64 the int traces as
    # an i64 constant and Mosaic's i64->i32 convert lowering recurses
    # (observed RecursionError on the real chip, round 5)
    steps_per_sb = np.int32(steps_per_sb)

    def kernel(code_ref, pay_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step % steps_per_sb == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        code = code_ref[...]                            # [1, CB] int32
        iota = jax.lax.broadcasted_iota(jnp.int32, (dp, 1), 0)
        # f32 select + f32 dot: an i1->bf16 cast recurses in Mosaic's
        # convert lowering AND a bf16 select on a broadcast i1 mask
        # hard-crashes the Mosaic compiler (v5e, round-5 bisection:
        # every bf16 one-hot variant died, the f32 form compiles and
        # the integer-valued f32 dot stays exact under 2^24)
        oh = jnp.where(code == iota, jnp.float32(1),
                       jnp.float32(0))                  # [dp, CB] VMEM
        pay = pay_ref[...].astype(jnp.float32)          # [L, CB]
        part = jax.lax.dot_general(
            oh, pay, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [dp, L] exact
        out_ref[...] += part[None]
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("dp", "max_digit", "interpret"))
def onehot_segment_sums(code: jax.Array, pay: jax.Array, dp: int,
                        max_digit: int, interpret: bool = False):
    """Per-superblock one-hot sums: code [n] int32 slots in [0, dp),
    pay [L, n] bf16 digit lanes (|value| <= max_digit) -> [nsb, dp, L]
    f32 integer-exact partials. Callers sum over axis 0 in int64."""
    n = int(code.shape[0])
    L = int(pay.shape[0])
    # block rows: one-hot [dp, cb] bf16 <= 2 MB and payload [L, cb]
    # bf16 <= 3 MB in VMEM (double-buffered by Mosaic)
    cb = 1 << 15
    while cb > 1024 and (n % cb or dp * cb * 2 > (2 << 20)
                         or L * cb * 2 > (3 << 20)):
        cb //= 2
    assert n % cb == 0, (n, cb)
    nsteps = n // cb
    steps_per_sb = max(1, ((1 << 24) // max(max_digit, 1)) // cb)
    nsb = -(-nsteps // steps_per_sb)

    code2 = code.reshape(1, nsteps * cb)
    out = pl.pallas_call(
        _make_onehot_kernel(dp, steps_per_sb),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, cb), lambda i: (np.int32(0), i)),
            pl.BlockSpec((L, cb), lambda i: (np.int32(0), i)),
        ],
        out_specs=pl.BlockSpec(
            (1, dp, L),
            lambda i, s=np.int32(steps_per_sb): (i // s, np.int32(0),
                                                 np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((nsb, dp, L), jnp.float32),
        interpret=interpret,
    )(code2, pay)
    return out
