"""Pallas kernel tests (interpret mode on CPU; same code compiles with
Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from aquery2_tpu.ops.pallas_kernels import best_profit, fused_running_stats


def test_fused_running_stats(rng):
    cap = 16384
    n = 10000
    x = np.zeros(cap, np.float32)
    x[:n] = rng.random(n).astype(np.float32) * 100 - 50
    sums, mins, maxs = fused_running_stats(jnp.asarray(x), interpret=True)
    np.testing.assert_allclose(np.asarray(sums)[:n],
                               np.cumsum(x[:n], dtype=np.float32), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(mins)[:n],
                                  np.minimum.accumulate(x[:n]))
    np.testing.assert_array_equal(np.asarray(maxs)[:n],
                                  np.maximum.accumulate(x[:n]))


def test_best_profit_kernel(rng):
    cap = 8192
    n = 5000
    x = np.zeros(cap, np.float32)
    x[:n] = rng.integers(1, 100, n)
    got = float(best_profit(jnp.asarray(x), n, interpret=True))
    want = float((x[:n] - np.minimum.accumulate(x[:n])).max())
    assert got == want


# --- one-pass segmented scans (the TPU hot-path kernels) -------------------

def _seg_oracle(x, flags, op, dtype=None):
    out = np.empty(len(x), dtype or x.dtype)
    acc = None
    for i in range(len(x)):
        v = x[i].astype(dtype) if dtype else x[i]
        acc = v if (flags[i] or acc is None) else op(acc, v)
        out[i] = acc
    return out


def test_seg_scan_multi(rng):
    from aquery2_tpu.ops.pallas_kernels import seg_scan_multi

    cap = 8192 * 3
    xi = rng.integers(-50, 50, cap).astype(np.int32)
    xf = rng.normal(size=cap).astype(np.float32)
    flags = rng.random(cap) < 0.01
    flags[0] = True
    got = seg_scan_multi(jnp.asarray(flags),
                         (jnp.asarray(xi), jnp.asarray(xf), jnp.asarray(xf)),
                         ("add", "min", "max"), interpret=True,
                         block_rows=64)
    np.testing.assert_array_equal(np.asarray(got[0]),
                                  _seg_oracle(xi, flags, np.add))
    np.testing.assert_array_equal(np.asarray(got[1]),
                                  _seg_oracle(xf, flags, np.minimum))
    np.testing.assert_array_equal(np.asarray(got[2]),
                                  _seg_oracle(xf, flags, np.maximum))


def test_seg_scan_multi_no_flags(rng):
    from aquery2_tpu.ops.pallas_kernels import seg_scan_multi

    cap = 8192 * 2
    xi = rng.integers(-50, 50, cap).astype(np.int32)
    got = seg_scan_multi(None, (jnp.asarray(xi),), ("add",),
                         interpret=True, block_rows=64)[0]
    np.testing.assert_array_equal(np.asarray(got), np.cumsum(xi))


def test_seg_cumsum_i64_limb_pairs(rng):
    from aquery2_tpu.ops.pallas_kernels import (join_i64_limbs,
                                                seg_cumsum_i64,
                                                split_i64_limbs)

    cap = 8192 * 2
    flags = rng.random(cap) < 0.005
    flags[0] = True
    cases = [
        rng.integers(-2**40, 2**40, cap),                  # int64 w/ carries
        rng.integers(-2**30, 2**30, cap).astype(np.int32),
        rng.integers(-2**24, 2**24, cap).astype(np.float32),  # limb lanes
        (rng.random(cap) < 0.5),                           # counts
    ]
    for v in cases:
        hi, lo = split_i64_limbs(jnp.asarray(v))
        shi, slo = seg_cumsum_i64(jnp.asarray(flags), hi, lo,
                                  interpret=True, block_rows=64)
        got = np.asarray(join_i64_limbs(shi, slo))
        want = _seg_oracle(np.asarray(v), flags, np.add, dtype=np.int64)
        np.testing.assert_array_equal(got, want)


def test_seg_cumsum_i64_cross_block_carry(rng):
    from aquery2_tpu.ops.pallas_kernels import (join_i64_limbs,
                                                seg_cumsum_i64,
                                                split_i64_limbs)

    cap = 8192 * 4
    v = np.full(cap, 2**31 - 1, np.int32)     # forces lo-limb carries
    flags = np.zeros(cap, bool)
    flags[20000] = True                        # one boundary mid-block
    hi, lo = split_i64_limbs(jnp.asarray(v))
    shi, slo = seg_cumsum_i64(jnp.asarray(flags), hi, lo,
                              interpret=True, block_rows=64)
    got = np.asarray(join_i64_limbs(shi, slo))
    want = _seg_oracle(v, flags, np.add, dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_onehot_segment_sums_exact():
    """Fused one-hot MXU reduction: integer-exact vs np.bincount."""
    import numpy as np
    from aquery2_tpu.ops import pallas_kernels as PK
    from aquery2_tpu.ops import reduce as R

    rng = np.random.default_rng(11)
    n, dp = 16384, 16
    code = rng.integers(0, dp, n).astype(np.int32)
    add = {
        "c": jnp.asarray(np.ones(n, bool)),
        "s": jnp.asarray(rng.integers(-5, 6, n).astype(np.int32)),
        "w": jnp.asarray(rng.integers(-(2**40), 2**40, n)),
    }
    outs = R._pallas_onehot_reduce(jnp.asarray(code), add, dp - 1,
                                   bounds={"s": 5}, interpret=True)
    for t, col in (("c", np.ones(n)), ("s", np.asarray(add["s"])),
                   ("w", np.asarray(add["w"]))):
        exp = np.bincount(code, weights=col.astype(np.float64),
                          minlength=dp).astype(np.int64)
        np.testing.assert_array_equal(np.asarray(outs[t])[:dp], exp,
                                      err_msg=t)


def test_onehot_superblock_boundaries():
    """Partials stay exact across superblock boundaries (max_digit
    forces steps_per_sb=1 at a small block)."""
    import numpy as np
    from aquery2_tpu.ops import reduce as R

    n, dp = 32768, 8
    code = (np.arange(n) % dp).astype(np.int32)
    v = np.full(n, 63, np.int32)
    outs = R._pallas_onehot_reduce(
        jnp.asarray(code), {"s": jnp.asarray(v)}, dp - 1,
        bounds={"s": 63}, interpret=True)
    exp = np.bincount(code, weights=v.astype(np.float64),
                      minlength=dp).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(outs["s"])[:dp], exp)
