"""Distributed median + ordered/windowed grouped queries (VERDICT r2 #3).

h2o q6 (median) and q8 (ASSUMING + subvec) classes, plus running/
windowed aggregates, executed over the 8-device mesh by shuffle-by-key
colocation (engine/dist_ordered.py) and checked against the single-chip
engine. Reference analogue: aggregations.h:127-330 ordered kernels.
"""

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(21)
    n = 8 * 700
    rows = [(int(a), int(b), int(t), float(x)) for a, b, t, x in zip(
        rng.integers(1, 11, n), rng.integers(1, 16, n),
        rng.permutation(n), rng.random(n).round(5))]

    def load(db):
        db.execute("CREATE TABLE o(id4 INT, id5 INT, ts INT, v3 DOUBLE)")
        db.catalog.get("o").append_rows(rows)
        db.place_table(db.catalog.get("o"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


QUERIES = [
    # h2o q6 class: median + stddev, two keys (packed word)
    "SELECT id4, id5, median(v3) AS med, stddev(v3) AS sd FROM o "
    "GROUP BY id4, id5",
    "SELECT id4, median(v3) FROM o WHERE v3 > 0.25 GROUP BY id4",
    # h2o q8 class: top-2 per group via subvec under ASSUMING DESC
    "SELECT id4, subvec(v3, 0, 2) AS largest2 FROM o "
    "ASSUMING DESC v3 GROUP BY id4",
    # aggregate over a running scan
    "SELECT id4, max(sums(v3)) FROM o ASSUMING ASC ts GROUP BY id4",
    # windowed row output (ragged)
    "SELECT id4, avgs(3, v3) FROM o ASSUMING ASC ts GROUP BY id4",
    "SELECT id4, mins(v3), deltas(v3) FROM o ASSUMING ASC ts GROUP BY id4",
]


def _eq(x, y, q, a, b):
    if isinstance(x, (list, tuple)):
        assert len(x) == len(y), (q, a, b)
        for u, v in zip(x, y):
            _eq(u, v, q, a, b)
    elif isinstance(x, float):
        assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
    else:
        assert x == y, (q, a, b)


@pytest.mark.parametrize("q", QUERIES)
def test_dist_ordered_matches_single_chip(pair, q):
    s1, s8 = pair
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, f"{q} fell back"
    assert r1.column_names() == r8.column_names()
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            _eq(x, y, q, a, b)


def test_dist_ordered_string_key(pair):
    """Dictionary-coded VARCHAR group keys ride the ordered shuffle tier
    (codes are int32 — the packing needs no translation)."""
    rng = np.random.default_rng(5)
    syms = ["aa", "bb", "cc", "dd"]
    n = 8 * 300
    rows = [(syms[int(i)], float(x)) for i, x in
            zip(rng.integers(0, 4, n), rng.random(n).round(5))]
    s1 = aq.connect()
    s8 = aq.connect(mesh=8)
    for db in (s1, s8):
        db.execute("CREATE TABLE sv(sym VARCHAR(4), price DOUBLE)")
        db.catalog.get("sv").append_rows(rows)
        db.place_table(db.catalog.get("sv"))
    q = ("SELECT sym, subvec(price, 0, 2) FROM sv "
         "ASSUMING DESC price GROUP BY sym")
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, "string-key ordered fell back"
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        assert a[0] == b[0]
        assert list(a[1]) == pytest.approx(list(b[1]), rel=1e-12)


def test_dist_median_oracle(pair):
    """Distributed median equals the NumPy oracle exactly."""
    s1, s8 = pair
    tbl = s1.catalog.get("o")
    n = tbl.nrows
    k = np.asarray(tbl.columns["id4"].data[:n])
    v = np.asarray(tbl.columns["v3"].data[:n])
    want = {int(kk): float(np.median(v[k == kk])) for kk in np.unique(k)}
    r = s8.execute("SELECT id4, median(v3) FROM o GROUP BY id4")
    got = {row[0]: row[1] for row in r.rows()}
    assert got.keys() == want.keys()
    for kk in want:
        assert got[kk] == pytest.approx(want[kk], rel=1e-12)


def test_dist_subvec_oracle(pair):
    """Distributed top-2 per group equals the NumPy oracle."""
    s1, s8 = pair
    tbl = s1.catalog.get("o")
    n = tbl.nrows
    k = np.asarray(tbl.columns["id4"].data[:n])
    v = np.asarray(tbl.columns["v3"].data[:n])
    r = s8.execute("SELECT id4, subvec(v3, 0, 2) FROM o "
                   "ASSUMING DESC v3 GROUP BY id4")
    for kk, top2 in r.rows():
        want = np.sort(v[k == kk])[::-1][:2]
        assert list(top2) == pytest.approx(want.tolist(), rel=1e-12)


# --------------------------------------------------------------------- #
# nullable aggregate arguments through the ordered/median tiers
# (VERDICT r3 weak #3: parity with dist_query's lane handling)
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def null_pair():
    rng = np.random.default_rng(31)
    n = 8 * 600
    k = rng.integers(1, 9, n)
    t = rng.permutation(n)
    v = rng.random(n).round(5)
    nv = rng.integers(1, 100, n)
    null_nv = rng.random(n) < 0.3
    rows = [(int(kk), int(tt), float(vv),
             None if nn or kk == 8 else int(xx))
            for kk, tt, vv, nn, xx in zip(k, t, v, null_nv, nv)]

    def load(db):
        db.execute("CREATE TABLE on_(id4 INT, ts INT, v3 DOUBLE, nv INT)")
        db.catalog.get("on_").append_rows(rows)
        db.place_table(db.catalog.get("on_"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


NULL_QUERIES = [
    # median over a NON-null column + aggs over the nullable one
    "SELECT id4, median(v3), sum(nv), avg(nv), count(nv) FROM on_ "
    "GROUP BY id4",
    # dense ordered (bounded subvec) + nullable agg args
    "SELECT id4, subvec(v3, 0, 2), sum(nv), max(nv) FROM on_ "
    "ASSUMING DESC v3 GROUP BY id4",
    # host-merge ordered (unbounded row output) + nullable agg args
    "SELECT id4, avgs(3, v3), avg(nv) FROM on_ "
    "ASSUMING ASC ts GROUP BY id4",
]


@pytest.mark.parametrize("q", NULL_QUERIES)
def test_dist_ordered_nullable_agg_args(null_pair, q):
    s1, s8 = null_pair
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, f"{q} fell back"
    assert r1.column_names() == r8.column_names()
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float) and np.isnan(x):
                assert isinstance(y, float) and np.isnan(y), (q, a, b)
            else:
                _eq(x, y, q, a, b)


BAIL_QUERIES = [
    # nullable median argument: sorted middle must skip NULLs
    "SELECT id4, median(nv) FROM on_ GROUP BY id4",
    # nullable ASSUMING column: NULL order semantics
    "SELECT id4, sum(v3) FROM on_ ASSUMING ASC nv GROUP BY id4",
]


@pytest.mark.parametrize("q", BAIL_QUERIES)
def test_dist_ordered_nullable_bails_stay_correct(null_pair, q):
    """Unsupported nullable shapes fall back (never wrong answers)."""
    s1, s8 = null_pair
    fb0 = s8.stats.dist_fallback
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_fallback == fb0 + 1, f"{q} did not fall back"
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float) and np.isnan(x):
                assert isinstance(y, float) and np.isnan(y), (q, a, b)
            else:
                _eq(x, y, q, a, b)


# --------------------------------------------------------------------- #
# computed + multi-word group keys (VERDICT r3 weak #3: the last
# ordered-tier key gates — _MultiKey codec)
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def wide_pair():
    rng = np.random.default_rng(17)
    n = 8 * 500
    # two wide-range keys: 17 bits each, 34 bits packed > one int32 word
    k1 = rng.integers(0, 100_000, n)
    k2 = rng.integers(0, 100_000, n) // 9999      # ~11 distinct
    t = rng.permutation(n)
    v = rng.random(n).round(5)
    rows = [(int(a), int(b), int(tt), float(x))
            for a, b, tt, x in zip(k1, k2, t, v)]

    def load(db):
        db.execute("CREATE TABLE w(k1 INT, k2 INT, ts INT, v DOUBLE)")
        db.catalog.get("w").append_rows(rows)
        db.place_table(db.catalog.get("w"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


WIDE_QUERIES = [
    # median with keys exceeding one packed word (single-chip fused tier
    # refuses this shape too — the general path is the oracle)
    "SELECT k2, k1 % 7 AS kb, median(v) FROM w GROUP BY k2, k1 % 7",
    # median with a computed group key
    "SELECT k1 % 5 AS kg, median(v), sum(v) FROM w GROUP BY k1 % 5",
    # ordered dense (subvec) with multi-word int keys
    "SELECT k1, k2, subvec(v, 0, 2) FROM w ASSUMING DESC v "
    "GROUP BY k1, k2",
    # ordered host path (unbounded row output) with multi-word keys
    "SELECT k1, k2, avgs(2, v) FROM w ASSUMING ASC ts GROUP BY k1, k2",
]


@pytest.mark.parametrize("q", WIDE_QUERIES)
def test_dist_ordered_wide_and_computed_keys(wide_pair, q):
    s1, s8 = wide_pair
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, (
        f"{q} fell back: {s8.stats.dist_fallback_reasons[-2:]}")
    assert r1.column_names() == r8.column_names()
    rows1 = sorted(r1.rows(), key=lambda r: tuple(
        x if not isinstance(x, (list, tuple)) else tuple(x) for x in r))
    rows8 = sorted(r8.rows(), key=lambda r: tuple(
        x if not isinstance(x, (list, tuple)) else tuple(x) for x in r))
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            _eq(x, y, q, a, b)
