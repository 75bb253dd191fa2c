"""Scalar aggregate and sort/filter kernel tests vs NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from aquery2_tpu import config
from aquery2_tpu.ops import agg, filter as filter_ops, hashing, sort


def _pad(x, cap=256):
    out = np.zeros(cap, dtype=x.dtype)
    out[: len(x)] = x
    return jnp.asarray(out)


def test_scalar_aggs(rng):
    x = rng.integers(-50, 100, 100).astype(np.int32)
    n = len(x)
    xp = _pad(x)
    assert int(agg.sum_(xp, n)) == x.sum()
    assert float(agg.avg(xp, n)) == pytest.approx(x.mean())
    assert int(agg.min_(xp, n)) == x.min()
    assert int(agg.max_(xp, n)) == x.max()
    assert int(agg.count(xp, n)) == n
    assert int(agg.first(xp, n)) == x[0]
    assert int(agg.last(xp, n)) == x[-1]


def test_var_reference_quirk(rng):
    """Reference `var` divides by n+1 (server/aggregations.h:333-348)."""
    x = rng.integers(0, 100, 64).astype(np.int32)
    n = len(x)
    s = x.astype(np.int64).sum()
    ssq = (x.astype(np.int64) ** 2).sum()
    want = (ssq - s * s / (n + 1)) / (n + 1)
    assert config.strict_reference_semantics
    got = float(agg.var(_pad(x), n))
    assert got == pytest.approx(want)


def test_corr(rng):
    x = rng.integers(0, 100, 80).astype(np.int32)
    y = (x * 3 + rng.integers(0, 30, 80)).astype(np.int32)
    got = float(agg.corr(_pad(x), _pad(y), len(x)))
    want = np.corrcoef(x, y)[0, 1]
    assert got == pytest.approx(want, rel=1e-9)


def test_median(rng):
    x = rng.integers(0, 1000, 51).astype(np.int32)
    assert float(agg.median(_pad(x), len(x))) == np.median(x)
    y = rng.integers(0, 1000, 50).astype(np.int32)
    assert float(agg.median(_pad(y), len(y))) == np.median(y)


def test_segment_reduce(rng):
    x = rng.integers(0, 100, 200).astype(np.int32)
    seg = rng.integers(0, 10, 200).astype(np.int32)
    got = np.asarray(agg.segment_reduce("sum", jnp.asarray(x), jnp.asarray(seg), 10))
    want = np.zeros(10, dtype=np.int64)
    np.add.at(want, seg, x)
    np.testing.assert_array_equal(got, want)
    gmin = np.asarray(agg.segment_reduce("min", jnp.asarray(x), jnp.asarray(seg), 10))
    want_min = np.full(10, np.iinfo(np.int32).max)
    np.minimum.at(want_min, seg, x)
    np.testing.assert_array_equal(gmin, want_min)


def test_filter_compact(rng):
    x = rng.integers(0, 100, 77).astype(np.int32)
    cap = 128
    xp = _pad(x, cap)
    mask = np.zeros(cap, dtype=bool)
    mask[: len(x)] = x > 50
    perm, cnt = filter_ops.compact_indices(jnp.asarray(mask))
    out = np.asarray(filter_ops.apply_perm(xp, perm))[: int(cnt)]
    np.testing.assert_array_equal(out, x[x > 50])


def test_sort_multikey(rng):
    a = rng.integers(0, 5, 60).astype(np.int32)
    b = rng.integers(0, 9, 60).astype(np.int32)
    perm = np.asarray(sort.sort_perm(
        [(_pad(a, 64), True), (_pad(b, 64), False)], 60))[:60]
    got = list(zip(a[perm], b[perm]))
    want = sorted(zip(a, b), key=lambda t: (t[0], -t[1]))
    assert got == want


def test_sort_desc_int_extremes():
    vals = np.array([5, -7, np.iinfo(np.int32).min, np.iinfo(np.int32).max, 0],
                    dtype=np.int32)
    perm = np.asarray(sort.sort_perm([(_pad(vals, 8), False)], 5))[:5]
    np.testing.assert_array_equal(vals[perm], np.sort(vals)[::-1])


def test_dense_pack_roundtrip(rng):
    k1 = rng.integers(3, 10, 50).astype(np.int32)
    k2 = rng.integers(-5, 5, 50).astype(np.int32)
    codes, domain, strides = hashing.dense_pack(
        [(jnp.asarray(k1), 3, 9), (jnp.asarray(k2), -5, 4)])
    assert domain == 7 * 10
    vals = hashing.dense_unpack(codes, [(3, 9), (-5, 4)], strides)
    np.testing.assert_array_equal(np.asarray(vals[0]), k1)
    np.testing.assert_array_equal(np.asarray(vals[1]), k2)


def test_hash64_avalanche():
    x = jnp.arange(1024, dtype=jnp.int64)
    h = np.asarray(hashing.hash64(x))
    assert len(np.unique(h)) == 1024
    # low bits should be well distributed for radix partitioning
    counts = np.bincount((h % np.uint64(8)).astype(int), minlength=8)
    assert counts.min() > 64
