"""Golden tests for running/windowed scan kernels vs a NumPy oracle.

The oracle re-states the reference semantics (server/aggregations.h) in
plain sequential NumPy — filling the testing gap noted in SURVEY.md §4.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aquery2_tpu.ops import scan, segment


# --- NumPy oracle: sequential re-statement of reference semantics ---------

def o_sums(x):
    return np.cumsum(np.asarray(x, dtype=np.int64 if x.dtype.kind in "ib" else np.float64))


def o_avgs(x):
    return o_sums(x) / np.arange(1, len(x) + 1)


def o_mins(x):
    return np.minimum.accumulate(x)


def o_maxs(x):
    return np.maximum.accumulate(x)


def o_deltas(x):
    out = np.zeros_like(x)
    out[1:] = x[1:] - x[:-1]
    return out


def o_prev(x):
    out = x.copy()
    out[1:] = x[:-1]
    return out


def o_next(x):
    out = x.copy()
    out[:-1] = x[1:]
    return out


def o_ratios(x):
    out = np.empty(len(x), dtype=np.float64)
    out[0] = x[0] / x[0]
    out[1:] = x[1:] / x[:-1].astype(np.float64)
    return out


def o_ratiow(w, x):
    # reference aggregations.h:169-188
    out = np.empty(len(x), dtype=np.float64)
    for i in range(len(x)):
        j = i - w if i >= w else 0
        out[i] = x[i] / np.float64(x[j])
    return out


def o_sumw(w, x):
    acc = np.asarray(x, dtype=np.int64 if x.dtype.kind in "ib" else np.float64)
    out = np.empty_like(acc)
    for i in range(len(x)):
        out[i] = acc[max(0, i - w + 1): i + 1].sum()
    return out


def o_avgw(w, x):
    out = np.empty(len(x), dtype=np.float64)
    for i in range(len(x)):
        win = x[max(0, i - w + 1): i + 1]
        out[i] = win.mean()
    return out


def o_minw(w, x):
    out = np.empty_like(x)
    for i in range(len(x)):
        out[i] = x[max(0, i - w + 1): i + 1].min()
    return out


def o_maxw(w, x):
    out = np.empty_like(x)
    for i in range(len(x)):
        out[i] = x[max(0, i - w + 1): i + 1].max()
    return out


def o_vars(x):
    out = np.empty(len(x), dtype=np.float64)
    for i in range(len(x)):
        win = x[: i + 1].astype(np.float64)
        out[i] = win.var()  # population
    return out


def o_varw(w, x):
    out = np.empty(len(x), dtype=np.float64)
    for i in range(len(x)):
        win = x[max(0, i - w + 1): i + 1].astype(np.float64)
        out[i] = win.var()
    return out


FLAT_RUNNING = [
    ("sums", o_sums), ("avgs", o_avgs), ("mins", o_mins), ("maxs", o_maxs),
    ("deltas", o_deltas), ("prev", o_prev), ("next", o_next),
    ("ratios", o_ratios), ("vars", o_vars),
]


@pytest.mark.parametrize("name,oracle", FLAT_RUNNING)
@pytest.mark.parametrize("dtype", [np.int32, np.float64])
def test_running_flat(name, oracle, dtype, rng):
    n = 137
    x = rng.integers(1, 100, n).astype(dtype)
    pos = segment.flat_pos(n)
    got = np.asarray(scan.RUNNING[name](jnp.asarray(x), pos, None))[:n]
    want = oracle(x)
    np.testing.assert_allclose(got, want, rtol=1e-9)


WINDOWED = [
    ("sums", o_sumw), ("avgs", o_avgw), ("mins", o_minw), ("maxs", o_maxw),
    ("ratios", o_ratiow), ("vars", o_varw),
]


@pytest.mark.parametrize("name,oracle", WINDOWED)
@pytest.mark.parametrize("w", [1, 2, 3, 5, 16, 200])
def test_windowed_flat(name, oracle, w, rng):
    n = 101
    x = rng.integers(1, 50, n).astype(np.int32)
    pos = segment.flat_pos(n)
    got = np.asarray(scan.WINDOWED[name](w, jnp.asarray(x), pos, None))[:n]
    want = oracle(w, x)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def _segmented_oracle(oracle, x, seg_ids, *args):
    out = None
    for s in np.unique(seg_ids):
        m = seg_ids == s
        r = oracle(*args, x[m]) if args else oracle(x[m])
        if out is None:
            out = np.empty(len(x), dtype=np.asarray(r).dtype)
        out[m] = r
    return out


@pytest.mark.parametrize("name,oracle", FLAT_RUNNING)
def test_running_segmented(name, oracle, rng):
    n = 97
    x = rng.integers(1, 100, n).astype(np.int32)
    seg_ids = np.sort(rng.integers(0, 7, n)).astype(np.int32)
    flags = segment.flags_from_segment_ids(jnp.asarray(seg_ids))
    pos = segment.pos_from_flags(flags)
    got = np.asarray(scan.RUNNING[name](jnp.asarray(x), pos, flags))[:n]
    want = _segmented_oracle(oracle, x, seg_ids)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("name,oracle", WINDOWED)
@pytest.mark.parametrize("w", [1, 3, 10])
def test_windowed_segmented(name, oracle, w, rng):
    n = 97
    x = rng.integers(1, 50, n).astype(np.int32)
    seg_ids = np.sort(rng.integers(0, 7, n)).astype(np.int32)
    flags = segment.flags_from_segment_ids(jnp.asarray(seg_ids))
    pos = segment.pos_from_flags(flags)
    got = np.asarray(scan.WINDOWED[name](w, jnp.asarray(x), pos, flags))[:n]
    want = _segmented_oracle(oracle, x, seg_ids, w)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_pos_from_flags():
    seg = jnp.asarray(np.array([0, 0, 1, 1, 1, 3, 4, 4], dtype=np.int32))
    flags = segment.flags_from_segment_ids(seg)
    pos = np.asarray(segment.pos_from_flags(flags))
    np.testing.assert_array_equal(pos, [0, 1, 0, 1, 2, 0, 0, 1])
