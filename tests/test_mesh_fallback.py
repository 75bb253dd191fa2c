"""Mesh-session fallback surface: single-chip logic over sharded arrays.

VERDICT r2 weak #6/#10: query classes the distributed tiers do not cover
run single-chip code over row-sharded columns, relying on GSPMD to
insert collectives implicitly — correctness was assumed, never tested.
Every query here (a) is asserted to take the FALLBACK path (stats), and
(b) must produce exactly the single-chip engine's result.
"""

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(31)
    n = 8 * 500
    rows = [(int(a), int(b), int(t), float(x)) for a, b, t, x in zip(
        rng.integers(1, 8, n), rng.integers(1, 30, n),
        rng.permutation(n), rng.random(n).round(5))]

    def load(db):
        db.execute("CREATE TABLE f(k INT, b INT, ts INT, v DOUBLE)")
        db.catalog.get("f").append_rows(rows)
        db.place_table(db.catalog.get("f"))
        db.execute("CREATE TABLE d(k INT, w INT)")
        db.catalog.get("d").append_rows([(i, i % 3 + 1) for i in range(1, 9)])
        db.place_table(db.catalog.get("d"))

    s1 = aq.connect()
    load(s1)
    s8 = aq.connect(mesh=8)
    load(s8)
    return s1, s8


# Query classes still running single-chip logic over sharded arrays.
# (DISTINCT, OVER windows, set ops and outer joins moved OUT in round
# 4; row-projection joins and LIMIT-less ordered scans in round 5 —
# test_dist_window.py, test_dist_setop.py, the DISTINCT rewrite, and
# dist_join_query→dist_scan row projections.)
FALLBACK_QUERIES = [
    # CASE without ELSE: unmatched rows are NULL → 3-valued general path
    "SELECT k, CASE WHEN b > 15 THEN 1 END AS hi FROM f "
    "ORDER BY k, b LIMIT 25",
]

# Round-5 graduates: asserted SPMD below AND equal to single-chip.
SPMD_QUERIES = [
    # plain row-projection join → materialized join + dist_scan top-k
    "SELECT f.b, d.w FROM f, d WHERE f.k = d.k ORDER BY f.b, d.w LIMIT 30",
    # row-projection join, unbounded (no LIMIT)
    "SELECT f.b, d.w FROM f, d WHERE f.k = d.k ORDER BY f.b, d.w",
    # LIMIT-less ordered scan (row-aligned lanes + host sort)
    "SELECT b, v FROM f WHERE v > 0.8 ORDER BY v, b",
    # plain unordered projection scan
    "SELECT k, b + 1 AS b1 FROM f WHERE v > 0.95 ORDER BY k, b1",
    # CASE with ELSE in projection and WHERE (fused grammar, round 5)
    "SELECT k, CASE WHEN b > 15 THEN 1 ELSE 0 END AS hi FROM f "
    "ORDER BY k, hi, b LIMIT 25",
    "SELECT k, count(*) FROM f WHERE CASE WHEN b > 20 THEN 1 ELSE 0 END"
    " = 1 GROUP BY k ORDER BY k",
    # CASE inside a grouped aggregate argument
    "SELECT k, sum(CASE WHEN b > 15 THEN b ELSE 0 END) FROM f "
    "GROUP BY k ORDER BY k",
    # mixed UNION ALL of independent aggregates: each branch rides its
    # own SPMD tier; constant projections join the ungrouped psum
    "SELECT k, count(*) FROM f GROUP BY k UNION ALL "
    "SELECT 999, count(*) FROM f",
]


@pytest.mark.parametrize("q", FALLBACK_QUERIES)
def test_mesh_fallback_equals_single_chip(pair, q):
    s1, s8 = pair
    r1, r8 = s1.execute(q), s8.execute(q)
    assert r1.column_names() == r8.column_names()
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8), q
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


def test_fallbacks_are_counted(pair):
    _, s8 = pair
    fb0 = s8.stats.dist_fallback
    s8.execute("SELECT k, CASE WHEN b > 15 THEN 1 END AS hi "
               "FROM f ORDER BY k, b LIMIT 5")
    assert s8.stats.dist_fallback > fb0
    assert s8.stats.dist_fallback_reasons


@pytest.mark.parametrize("q", SPMD_QUERIES)
def test_round5_spmd_graduates(pair, q):
    """Row-projection joins and unbounded ordered scans run SPMD
    (round 5; were fallback classes) and equal the single-chip engine."""
    s1, s8 = pair
    sp0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd > sp0, (
        q, s8.stats.dist_fallback_reasons)
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8), (q, len(rows1), len(rows8))
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12), (q, a, b)
            else:
                assert x == y, (q, a, b)


def test_topk_scan_runs_spmd(pair):
    """Ungrouped ORDER BY … LIMIT runs the distributed top-k tier
    (round-4; was a fallback class — engine/dist_scan.py)."""
    s1, s8 = pair
    sp0 = s8.stats.dist_spmd
    q = "SELECT b, v FROM f WHERE v > 0.9 ORDER BY v LIMIT 15"
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == sp0 + 1, (
        s8.stats.dist_fallback_reasons[-2:])
    assert r1.rows() == r8.rows()


def test_distinct_runs_spmd(pair):
    """SELECT DISTINCT rewrites to GROUP BY and rides the distributed
    group-by tiers (round-4; was a fallback class)."""
    s1, s8 = pair
    sp0 = s8.stats.dist_spmd
    q = "SELECT DISTINCT k FROM f ORDER BY k"
    r1, r8 = s1.execute(q), s8.execute(q)
    assert s8.stats.dist_spmd == sp0 + 1
    assert r1.rows() == r8.rows()


def test_insert_then_query_on_mesh(pair):
    """DML between queries keeps results equal to single-chip."""
    s1, s8 = pair
    for db in (s1, s8):
        db.execute("INSERT INTO f VALUES (3, 99, 999991, 0.5), "
                   "(7, 98, 999992, 0.25)")
    q = "SELECT k, count(*), sum(b) FROM f GROUP BY k ORDER BY k"
    assert s1.execute(q).rows() == s8.execute(q).rows()
