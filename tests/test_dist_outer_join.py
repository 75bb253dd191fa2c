"""Distributed OUTER joins (parallel/dist_join.dist_equijoin_outer +
engine/dist_join_query.py): unmatched-row emission with NULL-extended
payload sides, equal to the single-chip outer-join pipeline
(VERDICT r3 missing #1)."""

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(21)
    n = 8 * 400
    rows = [(int(a), int(b), float(x)) for a, b, x in zip(
        rng.integers(1, 30, n), rng.integers(1, 40, n),
        rng.random(n).round(4))]
    # dim covers keys 5..44: keys 1..4 are left-unmatched, 30..44
    # right-unmatched
    dim = [(int(k), int(w)) for k, w in
           zip(range(5, 45), rng.integers(1, 9, 40))]

    def load(db):
        db.execute("CREATE TABLE f(k INT, b INT, v DOUBLE)")
        db.catalog.get("f").append_rows(rows)
        db.place_table(db.catalog.get("f"))
        db.execute("CREATE TABLE d(k INT, w INT)")
        db.catalog.get("d").append_rows(dim)
        db.place_table(db.catalog.get("d"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


SPMD_QUERIES = [
    # LEFT join + group by preserved-side key: unmatched keys appear
    # with count(*) counting the null-extended row, sum(d.w) NULL-aware
    "SELECT f.k, count(*), sum(d.w) FROM f LEFT JOIN d ON f.k = d.k "
    "GROUP BY f.k ORDER BY f.k",
    # LEFT join ungrouped
    "SELECT count(*), sum(d.w), sum(f.b) FROM f LEFT JOIN d ON f.k = d.k",
    # RIGHT join normalizes by side swap
    "SELECT d.k, count(*), sum(f.b) FROM f RIGHT JOIN d ON f.k = d.k "
    "GROUP BY d.k ORDER BY d.k",
    # FULL join ungrouped: both sides emit unmatched rows
    "SELECT count(*), sum(f.b), sum(d.w) FROM f FULL JOIN d "
    "ON f.k = d.k",
    # group by a payload (non-key) column
    "SELECT f.b, count(*), sum(d.w) FROM f LEFT JOIN d ON f.k = d.k "
    "GROUP BY f.b ORDER BY f.b",
    # min/max/avg over the NULL-extended side
    "SELECT f.k, min(d.w), max(d.w), avg(d.w) FROM f LEFT JOIN d "
    "ON f.k = d.k GROUP BY f.k ORDER BY f.k",
]


@pytest.mark.parametrize("q", SPMD_QUERIES)
def test_dist_outer_join_equals_single_chip(pair, q):
    s1, s8 = pair
    sp0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == sp0 + 1, f"fell back: {q}"
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8), q
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if x is None or y is None:
                assert x == y, (q, a, b)
            elif isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


def test_outer_join_residual_where_falls_back(pair):
    """A WHERE predicate over an outer join needs 3-valued logic over
    null-extended rows — must fall back (counted) and still match."""
    s1, s8 = pair
    fb0 = s8.stats.dist_fallback
    q = ("SELECT f.k, count(*) FROM f LEFT JOIN d ON f.k = d.k "
         "WHERE f.b > 10 GROUP BY f.k ORDER BY f.k")
    r1, r8 = s1.execute(q).rows(), s8.execute(q).rows()
    assert s8.stats.dist_fallback == fb0 + 1
    assert r1 == r8


def test_outer_join_null_side_key_falls_back(pair):
    """Referencing the NULL-extended side's key column cannot map onto
    the preserved __jk — falls back and still matches."""
    s1, s8 = pair
    fb0 = s8.stats.dist_fallback
    q = ("SELECT d.k, count(*) FROM f LEFT JOIN d ON f.k = d.k "
         "GROUP BY d.k ORDER BY d.k")
    r1, r8 = s1.execute(q).rows(), s8.execute(q).rows()
    assert s8.stats.dist_fallback == fb0 + 1
    assert r1 == r8
