"""Distributed OVER-window tier (engine/dist_window.py): every query
must (a) take the SPMD path on a mesh session and (b) match the
single-chip engine row for row (VERDICT r3 missing #1)."""

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(77)
    n = 8 * 500
    rows = [(int(a), int(b), int(t), float(x)) for a, b, t, x in zip(
        rng.integers(1, 8, n), rng.integers(1, 30, n),
        rng.permutation(n), rng.random(n).round(5))]

    def load(db):
        db.execute("CREATE TABLE f(k INT, b INT, ts INT, v DOUBLE)")
        db.catalog.get("f").append_rows(rows)
        db.place_table(db.catalog.get("f"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


SPMD_QUERIES = [
    # whole-partition aggregates
    "SELECT k, sum(v) OVER (PARTITION BY k) AS s FROM f ORDER BY k "
    "LIMIT 20",
    "SELECT k, min(v) OVER (PARTITION BY k) AS mn, "
    "max(b) OVER (PARTITION BY k) AS mx FROM f ORDER BY k LIMIT 16",
    "SELECT k, count(*) OVER (PARTITION BY k) AS c, "
    "stddev(v) OVER (PARTITION BY k) AS sd FROM f WHERE b > 5 "
    "ORDER BY k LIMIT 16",
    # running aggregates (default RANGE frame with peer groups)
    "SELECT k, ts, sum(v) OVER (PARTITION BY k ORDER BY ts) AS rs "
    "FROM f ORDER BY k, ts LIMIT 25",
    # ROWS frames
    "SELECT k, avg(v) OVER (PARTITION BY k ORDER BY ts "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma FROM f "
    "ORDER BY k, ma LIMIT 20",
    "SELECT k, var(v) OVER (PARTITION BY k ORDER BY ts "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS vv FROM f "
    "ORDER BY k, vv LIMIT 20",
    "SELECT k, sum(v) OVER (PARTITION BY k ORDER BY ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING) AS s2 FROM f "
    "ORDER BY k, ts LIMIT 20",
    # ranking
    "SELECT k, row_number() OVER (PARTITION BY k ORDER BY ts) AS rn "
    "FROM f ORDER BY k, rn LIMIT 25",
    "SELECT k, rank() OVER (PARTITION BY k ORDER BY b) AS r, "
    "dense_rank() OVER (PARTITION BY k ORDER BY b) AS dr FROM f "
    "ORDER BY k, r LIMIT 30",
    "SELECT k, percent_rank() OVER (PARTITION BY k ORDER BY b) AS pr, "
    "cume_dist() OVER (PARTITION BY k ORDER BY b) AS cd FROM f "
    "ORDER BY k, pr LIMIT 20",
    "SELECT k, ntile(4) OVER (PARTITION BY k ORDER BY ts) AS nt FROM f "
    "ORDER BY k, ts LIMIT 20",
    # gathers (incl. NULL out-of-partition rows and literal defaults)
    "SELECT k, lag(v) OVER (PARTITION BY k ORDER BY ts) AS pv FROM f "
    "ORDER BY k, ts LIMIT 20",
    "SELECT k, lead(b, 2, -1) OVER (PARTITION BY k ORDER BY ts) AS nb "
    "FROM f ORDER BY k, ts LIMIT 20",
    # mixed OVER ORDER BY clauses in one query (two sorted layouts)
    "SELECT k, first_value(v) OVER (PARTITION BY k ORDER BY ts) AS fv, "
    "last_value(v) OVER (PARTITION BY k) AS lv FROM f "
    "ORDER BY k, ts LIMIT 20",
    "SELECT b, nth_value(v, 3) OVER (PARTITION BY k ORDER BY ts) AS n3 "
    "FROM f ORDER BY b, n3 LIMIT 20",
]


def _rows_equal(rows1, rows8, q):
    assert len(rows1) == len(rows8), q
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if x is None or y is None:
                assert x == y, (q, a, b)
            elif isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


@pytest.mark.parametrize("q", SPMD_QUERIES)
def test_dist_window_equals_single_chip(pair, q):
    s1, s8 = pair
    sp0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == sp0 + 1, f"fell back: {q}"
    assert r1.column_names() == r8.column_names()
    _rows_equal(r1.rows(), r8.rows(), q)


def test_dist_window_string_partition_key(pair):
    """Partition keys that are dictionary-coded VARCHAR columns."""
    s1, s8 = pair
    for db in (s1, s8):
        if "g" not in db.catalog:
            db.execute("CREATE TABLE g(name VARCHAR(8), x INT)")
            rng = np.random.default_rng(5)
            rows = [(f"id{int(a)}", int(b)) for a, b in zip(
                rng.integers(1, 6, 4000), rng.integers(0, 100, 4000))]
            db.catalog.get("g").append_rows(rows)
            db.place_table(db.catalog.get("g"))
    q = ("SELECT name, sum(x) OVER (PARTITION BY name) AS s FROM g "
         "ORDER BY name LIMIT 12")
    sp0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == sp0 + 1
    _rows_equal(r1.rows(), r8.rows(), q)


def test_dist_window_bails_are_reported(pair):
    """Unsupported shapes fall back with a recorded reason and still
    match the single-chip result (the honest-fallback contract)."""
    _, s8 = pair
    fb0 = s8.stats.dist_fallback
    # no PARTITION BY → global window, not colocatable by key shuffle
    s8.execute("SELECT sum(b) OVER () AS t FROM f LIMIT 3")
    assert s8.stats.dist_fallback == fb0 + 1


# --------------------------------------------------------------------- #
# computed + multi-word partition keys (key codec, shared with the
# distributed ordered tier)
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def wide_pair():
    rng = np.random.default_rng(13)
    n = 8 * 400
    rows = [(int(a), int(b), int(t), float(x)) for a, b, t, x in zip(
        rng.integers(0, 100_000, n), rng.integers(0, 100_000, n),
        rng.permutation(n), rng.random(n).round(5))]

    def load(db):
        db.execute("CREATE TABLE wf(k1 INT, k2 INT, ts INT, v DOUBLE)")
        db.catalog.get("wf").append_rows(rows)
        db.place_table(db.catalog.get("wf"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


WIDE_WINDOW_QUERIES = [
    # multi-word int partition keys (17+17 bits > one packed word)
    "SELECT k1, k2, sum(v) OVER (PARTITION BY k1, k2 ORDER BY ts) AS rs "
    "FROM wf ORDER BY k1, k2, ts LIMIT 30",
    # computed partition key
    "SELECT k1, row_number() OVER (PARTITION BY k1 % 5 ORDER BY ts) "
    "AS rn FROM wf ORDER BY k1, rn LIMIT 25",
]


@pytest.mark.parametrize("q", WIDE_WINDOW_QUERIES)
def test_dist_window_wide_and_computed_partition_keys(wide_pair, q):
    s1, s8 = wide_pair
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, (
        f"{q} fell back: {s8.stats.dist_fallback_reasons[-2:]}")
    assert r1.column_names() == r8.column_names()
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


# --------------------------------------------------------------------- #
# NULL-able aggregate arguments / row projections (round 5, VERDICT #7)
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def null_pair():
    rng = np.random.default_rng(21)
    n = 8 * 400
    k = rng.integers(1, 7, n)
    ts = rng.permutation(n)
    v = [None if x % 6 == 0 else float(x % 97) / 7
         for x in rng.integers(0, 1000, n)]

    def load(db):
        db.execute("CREATE TABLE nf(k INT, ts INT, v DOUBLE)")
        db.catalog.get("nf").append_rows(
            [(int(a), int(t), x) for a, t, x in zip(k, ts, v)])
        db.place_table(db.catalog.get("nf"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


NULL_WINDOW_QUERIES = [
    # frame aggregates skip NULL inputs; all-NULL frames are NULL
    "SELECT k, sum(v) OVER (PARTITION BY k ORDER BY ts) AS rs "
    "FROM nf ORDER BY k, ts LIMIT 30",
    "SELECT k, avg(v) OVER (PARTITION BY k ORDER BY ts "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma FROM nf "
    "ORDER BY k, ts LIMIT 25",
    "SELECT k, count(v) OVER (PARTITION BY k) AS c FROM nf "
    "ORDER BY k, ts LIMIT 20",
    "SELECT k, min(v) OVER (PARTITION BY k ORDER BY ts "
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mn FROM nf "
    "ORDER BY k, ts LIMIT 25",
    # gathers propagate the source NULL
    "SELECT k, lag(v) OVER (PARTITION BY k ORDER BY ts) AS pv "
    "FROM nf ORDER BY k, ts LIMIT 30",
    "SELECT k, first_value(v) OVER (PARTITION BY k ORDER BY ts) AS fv "
    "FROM nf ORDER BY k, ts LIMIT 25",
    # nullable row projection passes its mask through
    "SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY ts) AS rn "
    "FROM nf ORDER BY k, rn LIMIT 30",
]


@pytest.mark.parametrize("q", NULL_WINDOW_QUERIES)
def test_dist_window_nullable_agg_args(null_pair, q):
    s1, s8 = null_pair
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == spmd0 + 1, (
        f"{q} fell back: {s8.stats.dist_fallback_reasons[-2:]}")
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8)
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


def test_dist_window_nullable_key_bails(null_pair):
    """NULL-able partition/order keys stay on the general path with a
    recorded reason (3-valued ordering semantics)."""
    s1, s8 = null_pair
    for db in (s1, s8):
        if "ng" not in db.catalog:
            db.execute("CREATE TABLE ng(k INT, v DOUBLE)")
            db.execute("INSERT INTO ng VALUES (1, 1.5), (NULL, 2.5), "
                       "(1, 3.5), (2, 0.5)")
            db.place_table(db.catalog.get("ng"))
    fb0 = s8.stats.dist_fallback
    q = ("SELECT k, sum(v) OVER (PARTITION BY k) AS s FROM ng "
         "ORDER BY v LIMIT 4")
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_fallback == fb0 + 1
    assert r1.rows() == r8.rows()
