"""NULL masks + string keys through the distributed tier (VERDICT r2 #5).

Reference analogue: MonetDB nulls and string BATs behave identically on
every execution path (common/types.py:359-364); here the distributed
SPMD tiers must match the single-chip engine on nullable aggregate
arguments and dictionary-encoded VARCHAR group keys.
"""

import numpy as np
import pytest

import aquery2_tpu as aq


def _mk_pair(loader):
    s1 = aq.connect()
    s8 = aq.connect(mesh=8)
    loader(s1)
    loader(s8)
    return s1, s8


def _assert_equal(s1, s8, q, spmd=True):
    """dist result == single-chip result; optionally assert the SPMD
    path actually ran (not a silent fallback)."""
    spmd0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q), s8.execute(q)
    if spmd:
        assert s8.stats.dist_spmd == spmd0 + 1, f"{q} fell back"
    assert r1.column_names() == r8.column_names()
    rows1, rows8 = r1.rows(), r8.rows()
    assert len(rows1) == len(rows8), q
    for a, b in zip(rows1, rows8):
        for x, y in zip(a, b):
            if isinstance(x, float):
                if np.isnan(x):
                    assert np.isnan(y), (q, a, b)
                else:
                    assert y == pytest.approx(x, rel=1e-6, abs=1e-9), (q, a, b)
            else:
                assert x == y, (q, a, b)


# --------------------------------------------------------------------- #
# nullable aggregate arguments
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def null_pair():
    rng = np.random.default_rng(7)
    n = 8 * 500
    k = rng.integers(1, 9, n)
    v = rng.integers(1, 100, n)
    w = rng.random(n).round(4)
    null_v = rng.random(n) < 0.3
    null_w = rng.random(n) < 0.2
    rows = []
    for i in range(n):
        rows.append((int(k[i]),
                     None if null_v[i] else int(v[i]),
                     None if null_w[i] else float(w[i])))
    # key 8 gets ALL-NULL v rows (sum must be 0, count(v) 0 — the
    # general path's semantics, test_nulls.test_group_by_nullable_key)
    rows = [(kk, None if kk == 8 else vv, ww) for kk, vv, ww in rows]

    def load(db):
        db.execute("CREATE TABLE n(k INT, v INT, w DOUBLE)")
        db.catalog.get("n").append_rows(rows)
        db.place_table(db.catalog.get("n"))

    return _mk_pair(load)


NULL_QUERIES = [
    # dense tier
    "SELECT k, sum(v), count(v), count(*) FROM n GROUP BY k ORDER BY k",
    "SELECT k, avg(v), min(v), max(v) FROM n GROUP BY k ORDER BY k",
    "SELECT k, var(v), corr(v, w) FROM n GROUP BY k ORDER BY k",
    # sum over float with nulls (limb-split lanes masked per-agg)
    "SELECT k, sum(w), avg(w) FROM n GROUP BY k ORDER BY k",
    # multikey tier: computed key over a NON-null column
    "SELECT k + k, sum(v), count(v) FROM n GROUP BY k + k ORDER BY k + k",
]


@pytest.mark.parametrize("q", NULL_QUERIES)
def test_dist_nullable_agg_args(null_pair, q):
    s1, s8 = null_pair
    _assert_equal(s1, s8, q)


def test_dist_null_oracle(null_pair):
    """Distributed nullable sums equal an exact NumPy oracle."""
    s1, s8 = null_pair
    tbl = s1.catalog.get("n")
    n = tbl.nrows
    k = np.asarray(tbl.columns["k"].data[:n])
    v = np.asarray(tbl.columns["v"].data[:n]).astype(np.int64)
    ok = np.asarray(tbl.columns["v"].valid[:n])
    want = {int(kk): (int(v[(k == kk) & ok].sum()), int(((k == kk) & ok).sum()))
            for kk in np.unique(k)}
    r = s8.execute("SELECT k, sum(v), count(v) FROM n GROUP BY k")
    got = {row[0]: (row[1], row[2]) for row in r.rows()}
    assert got == want
    assert got[8] == (0, 0)          # all-null group: sum 0, count(v) 0


def test_single_chip_fused_null_matches_general(null_pair, monkeypatch):
    """The null-aware FUSED path equals the 3-valued general executor."""
    from aquery2_tpu.engine import fused_groupby

    s1, _ = null_pair
    q = "SELECT k, sum(v), count(v), avg(v) FROM n GROUP BY k ORDER BY k"
    fused_rows = s1.execute(q).rows()
    monkeypatch.setattr(fused_groupby, "run", lambda *a, **kw: None)
    general_rows = s1.execute(q).rows()
    assert len(fused_rows) == len(general_rows)
    for a, b in zip(fused_rows, general_rows):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert y == pytest.approx(x, rel=1e-9, abs=1e-12)
            else:
                assert x == y


def test_nullable_key_fused_and_distributed(null_pair):
    """Nullable GROUP BY keys sentinel-code through the fused AND the
    distributed tiers (round 4; previously forced the general path).
    All NULL keys form ONE group, reported as NULL."""
    s1, s8 = null_pair
    for db in (s1, s8):
        if "nk" in db.catalog:
            continue
        db.execute("CREATE TABLE nk(a INT, b INT)")
        db.execute("INSERT INTO nk VALUES (1, 10), (NULL, 5), (NULL, 7), "
                   "(1, 3), (2, 4)")
        rows = [(i % 5 if i % 7 else None, i % 11) for i in range(4000)]
        db.catalog.get("nk").append_rows(rows)
        db.place_table(db.catalog.get("nk"))
    q = "SELECT a, sum(b), count(*) FROM nk GROUP BY a ORDER BY a"
    sp0 = s8.stats.dist_spmd
    r1, r8 = s1.execute(q).rows(), s8.execute(q).rows()
    assert s8.stats.dist_spmd == sp0 + 1, "mesh session fell back"
    assert r1 == r8
    got = {row[0]: (row[1], row[2]) for row in r1}
    assert None in got and got[None][1] == 2 + sum(
        1 for i in range(4000) if i % 7 == 0)


def test_nullable_key_general_oracle(null_pair):
    """The sentinel-coded fused result equals the 3-valued general
    executor's (force the general path by monkey-free subquery shape)."""
    s1, _ = null_pair
    if "nk2" not in s1.catalog:
        s1.execute("CREATE TABLE nk2(a INT, b INT)")
        s1.execute("INSERT INTO nk2 VALUES (1, 10), (NULL, 5), (NULL, 7), "
                   "(1, 3)")
    r = s1.execute("SELECT a, sum(b) FROM nk2 GROUP BY a")
    got = {row[0]: row[1] for row in r.rows()}
    assert got == {1: 13, None: 12}


# --------------------------------------------------------------------- #
# dictionary-encoded VARCHAR group keys
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def str_pair():
    rng = np.random.default_rng(11)
    n = 8 * 400
    syms = ["aapl", "msft", "goog", "nvda", "amzn"]
    si = rng.integers(0, len(syms), n)
    v = rng.integers(1, 50, n)
    rows = [(syms[si[i]], int(v[i])) for i in range(n)]

    def load(db):
        db.execute("CREATE TABLE s(sym VARCHAR(8), v INT)")
        db.catalog.get("s").append_rows(rows)
        db.place_table(db.catalog.get("s"))

    return _mk_pair(load)


STR_QUERIES = [
    "SELECT sym, sum(v), count(*) FROM s GROUP BY sym ORDER BY sym",
    "SELECT sym, max(v) - min(v) FROM s GROUP BY sym ORDER BY sym",
    "SELECT sym, avg(v) FROM s WHERE v > 10 GROUP BY sym ORDER BY sym",
]


@pytest.mark.parametrize("q", STR_QUERIES)
def test_dist_string_group_keys(str_pair, q):
    s1, s8 = str_pair
    _assert_equal(s1, s8, q)


def test_dist_string_key_oracle(str_pair):
    s1, s8 = str_pair
    tbl = s1.catalog.get("s")
    n = tbl.nrows
    codes = np.asarray(tbl.columns["sym"].data[:n])
    d = tbl.columns["sym"].dictionary
    v = np.asarray(tbl.columns["v"].data[:n]).astype(np.int64)
    want = {d._strings[int(c)]: int(v[codes == c].sum())
            for c in np.unique(codes)}
    r = s8.execute("SELECT sym, sum(v) FROM s GROUP BY sym")
    got = {row[0]: row[1] for row in r.rows()}
    assert got == want
