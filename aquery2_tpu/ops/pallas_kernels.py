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
    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))
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
