"""SQL window functions (OVER clauses) vs a brute-force NumPy oracle.

The reference parses the full T-SQL-style OVER grammar
(aquery_parser/windows.py:89-96) and executes it through MonetDB; here
the sorted-domain scan formulation (ops/window.py, eval._window) must
match a per-row brute-force oracle exactly.
"""

import math

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture
def db(tmp_path):
    s = aq.connect(base_dir=str(tmp_path))
    yield s
    s.close()


def _mk(db, n=60, seed=7, with_nulls=False):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 5, n)
    t = rng.permutation(n)          # unique order key
    v = rng.integers(-20, 100, n)
    db.execute("CREATE TABLE w(k INT, t INT, v INT)")
    rows = []
    nullmask = np.zeros(n, dtype=bool)
    if with_nulls:
        nullmask = rng.random(n) < 0.25
    for i in range(n):
        vv = "NULL" if nullmask[i] else str(v[i])
        rows.append(f"({k[i]},{t[i]},{vv})")
    db.execute("INSERT INTO w VALUES " + ", ".join(rows))
    return k, t, np.where(nullmask, 0, v), nullmask


def _oracle(k, t, v, nulls, fn, frame, order=True):
    """Brute force: for each row, collect its frame rows and aggregate.
    frame = (lo, hi) row offsets, None = unbounded."""
    n = len(k)
    out = [None] * n
    for part in np.unique(k):
        idx = np.where(k == part)[0]
        idx = idx[np.argsort(t[idx], kind="stable")] if order else idx
        m = len(idx)
        for j in range(m):
            lo = 0 if frame[0] is None else max(0, j + frame[0])
            hi = m - 1 if frame[1] is None else min(m - 1, j + frame[1])
            rows = idx[lo:hi + 1] if lo <= hi else np.array([], dtype=int)
            vals = [v[r] for r in rows if not nulls[r]]
            i = idx[j]
            if fn == "count_star":
                out[i] = len(rows)
            elif fn == "count":
                out[i] = len(vals)
            elif not vals:
                out[i] = None
            elif fn == "sum":
                out[i] = sum(vals)
            elif fn == "avg":
                out[i] = sum(vals) / len(vals)
            elif fn == "min":
                out[i] = min(vals)
            elif fn == "max":
                out[i] = max(vals)
            elif fn == "var":
                mean = sum(vals) / len(vals)
                out[i] = sum((x - mean) ** 2 for x in vals) / len(vals)
            elif fn == "stddev":
                mean = sum(vals) / len(vals)
                out[i] = math.sqrt(
                    sum((x - mean) ** 2 for x in vals) / len(vals))
    return out


def _got(db, sql):
    r = db.execute(sql)
    return [row[-1] for row in r.rows()]


def _close(got, want):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        if w is None:
            assert g is None, (g, w)
        else:
            assert g is not None and abs(float(g) - float(w)) < 1e-9, (g, w)


FRAMES = [
    ("", (None, 0)),   # default: RANGE UNBOUNDED PRECEDING..CURRENT ROW
    ("ROWS UNBOUNDED PRECEDING", (None, 0)),
    ("ROWS 3 PRECEDING", (-3, 0)),
    ("ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING", (-2, 2)),
    ("ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING", (0, 4)),
    ("ROWS BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING", (-1, None)),
    ("ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
     (None, None)),
]


@pytest.mark.parametrize("fn", ["sum", "avg", "min", "max", "count",
                                "var", "stddev"])
@pytest.mark.parametrize("fspec", FRAMES, ids=[f[0] or "default"
                                               for f in FRAMES])
def test_frame_aggregates(db, fn, fspec):
    ftext, frame = fspec
    k, t, v, nulls = _mk(db)
    sql = (f"SELECT k, t, {fn}(v) OVER (PARTITION BY k ORDER BY t"
           f"{' ' + ftext if ftext else ''}) AS r FROM w ORDER BY t")
    got = _got(db, sql)
    order = np.argsort(t, kind="stable")
    want = [_oracle(k, t, v, nulls, fn, frame)[i] for i in order]
    _close(got, want)


@pytest.mark.parametrize("fn", ["sum", "avg", "min", "max", "count"])
def test_frame_aggregates_nulls(db, fn):
    k, t, v, nulls = _mk(db, with_nulls=True)
    sql = (f"SELECT k, t, {fn}(v) OVER (PARTITION BY k ORDER BY t "
           f"ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS r "
           f"FROM w ORDER BY t")
    got = _got(db, sql)
    order = np.argsort(t, kind="stable")
    want = [_oracle(k, t, v, nulls, fn, (-2, 1))[i] for i in order]
    _close(got, want)


def test_count_star_whole_partition(db):
    k, t, v, nulls = _mk(db)
    got = _got(db, "SELECT k, count(*) OVER (PARTITION BY k) AS c "
                   "FROM w ORDER BY t")
    order = np.argsort(t, kind="stable")
    sizes = {p: int((k == p).sum()) for p in np.unique(k)}
    want = [sizes[k[i]] for i in order]
    assert [int(g) for g in got] == want


def test_whole_table_over_empty(db):
    k, t, v, nulls = _mk(db)
    got = _got(db, "SELECT t, sum(v) OVER () AS s FROM w ORDER BY t")
    assert all(int(g) == int(v.sum()) for g in got)


def test_row_number_rank_dense_rank(db):
    db.execute("CREATE TABLE r(k INT, s INT)")
    # ties within partitions exercise rank vs dense_rank vs row_number
    data = [(1, 10), (1, 10), (1, 20), (1, 30), (1, 30), (1, 30),
            (2, 5), (2, 5), (2, 7)]
    db.execute("INSERT INTO r VALUES " +
               ", ".join(f"({a},{b})" for a, b in data))
    rows = db.execute(
        "SELECT k, s, row_number() OVER (PARTITION BY k ORDER BY s) AS rn,"
        " rank() OVER (PARTITION BY k ORDER BY s) AS rk,"
        " dense_rank() OVER (PARTITION BY k ORDER BY s) AS dr"
        " FROM r ORDER BY k, s").rows()
    want = [
        (1, 10, 1, 1, 1), (1, 10, 2, 1, 1), (1, 20, 3, 3, 2),
        (1, 30, 4, 4, 3), (1, 30, 5, 4, 3), (1, 30, 6, 4, 3),
        (2, 5, 1, 1, 1), (2, 5, 2, 1, 1), (2, 7, 3, 3, 2),
    ]
    assert [tuple(int(x) for x in row) for row in rows] == want


def test_percent_rank_cume_dist_ntile(db):
    db.execute("CREATE TABLE p(s INT)")
    db.execute("INSERT INTO p VALUES (10), (20), (20), (30), (40)")
    rows = db.execute(
        "SELECT s, percent_rank() OVER (ORDER BY s) AS pr,"
        " cume_dist() OVER (ORDER BY s) AS cd,"
        " ntile(2) OVER (ORDER BY s) AS nt FROM p ORDER BY s").rows()
    # rank: 1,2,2,4,5 → pr = (rank-1)/4; cd = peers_through/5
    want_pr = [0.0, 0.25, 0.25, 0.75, 1.0]
    want_cd = [0.2, 0.6, 0.6, 0.8, 1.0]
    want_nt = [1, 1, 1, 2, 2]
    for row, pr, cd, nt in zip(rows, want_pr, want_cd, want_nt):
        assert abs(float(row[1]) - pr) < 1e-12
        assert abs(float(row[2]) - cd) < 1e-12
        assert int(row[3]) == nt


def test_lag_lead(db):
    k, t, v, nulls = _mk(db, n=40)
    rows = db.execute(
        "SELECT k, t, v, lag(v) OVER (PARTITION BY k ORDER BY t) AS lg,"
        " lead(v, 2) OVER (PARTITION BY k ORDER BY t) AS ld,"
        " lag(v, 1, -999) OVER (PARTITION BY k ORDER BY t) AS lgd"
        " FROM w ORDER BY k, t").rows()
    by_part = {}
    for kk, tt, vv, lg, ld, lgd in rows:
        by_part.setdefault(kk, []).append((tt, vv, lg, ld, lgd))
    for kk, seq in by_part.items():
        vs = [s[1] for s in seq]
        for j, (tt, vv, lg, ld, lgd) in enumerate(seq):
            assert (lg is None) == (j == 0)
            if j > 0:
                assert int(lg) == int(vs[j - 1])
            if j + 2 < len(vs):
                assert int(ld) == int(vs[j + 2])
            else:
                assert ld is None
            assert int(lgd) == (int(vs[j - 1]) if j > 0 else -999)


def test_first_last_nth_value(db):
    k, t, v, nulls = _mk(db, n=30)
    rows = db.execute(
        "SELECT k, v, first_value(v) OVER (PARTITION BY k ORDER BY t) AS f,"
        " last_value(v) OVER (PARTITION BY k ORDER BY t"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS l,"
        " nth_value(v, 2) OVER (PARTITION BY k ORDER BY t"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n2"
        " FROM w ORDER BY k, t").rows()
    by_part = {}
    for row in rows:
        by_part.setdefault(row[0], []).append(row)
    for kk, seq in by_part.items():
        vs = [int(r[1]) for r in seq]     # v in ORDER BY t order
        for j, r in enumerate(seq):
            assert int(r[2]) == vs[0]
            assert int(r[3]) == vs[-1]
            if len(vs) >= 2:
                assert int(r[4]) == vs[1]
            else:
                assert r[4] is None


def test_range_default_frame_peers(db):
    """RANGE (default) sums through the END of the current peer group."""
    db.execute("CREATE TABLE pk(s INT, v INT)")
    db.execute("INSERT INTO pk VALUES (1, 10), (2, 20), (2, 30), (3, 40)")
    got = _got(db, "SELECT s, sum(v) OVER (ORDER BY s) AS r FROM pk "
                   "ORDER BY s, v")
    # peers (s=2) both see 10+20+30 = 60
    assert [int(g) for g in got] == [10, 60, 60, 100]


def test_rows_current_row_no_peer_smear(db):
    db.execute("CREATE TABLE pk2(s INT, v INT)")
    db.execute("INSERT INTO pk2 VALUES (1, 10), (2, 20), (2, 30), (3, 40)")
    got = _got(db, "SELECT s, sum(v) OVER (ORDER BY s "
                   "ROWS UNBOUNDED PRECEDING) AS r FROM pk2 ORDER BY s, v")
    # stable sort keeps insert order among the s=2 peers
    assert [int(g) for g in got] == [10, 30, 60, 100]


def test_window_desc_order(db):
    k, t, v, nulls = _mk(db, n=25)
    got = _got(db, "SELECT k, t, row_number() OVER "
                   "(PARTITION BY k ORDER BY t DESC) AS rn FROM w "
                   "ORDER BY k, t DESC")
    by_part = {}
    rows = db.execute("SELECT k, t FROM w ORDER BY k, t DESC").rows()
    want = []
    for kk, tt in rows:
        by_part[kk] = by_part.get(kk, 0) + 1
        want.append(by_part[kk])
    assert [int(g) for g in got] == want


def test_window_string_partition(db):
    db.execute("CREATE TABLE ws(name VARCHAR(10), v INT)")
    db.execute("INSERT INTO ws VALUES ('b', 1), ('a', 2), ('b', 3), "
               "('a', 4), ('c', 5)")
    got = db.execute("SELECT name, sum(v) OVER (PARTITION BY name) AS s "
                     "FROM ws ORDER BY name, v").rows()
    assert [(r[0], int(r[1])) for r in got] == [
        ("a", 6), ("a", 6), ("b", 4), ("b", 4), ("c", 5)]


def test_window_string_min_max(db):
    db.execute("CREATE TABLE wm(k INT, name VARCHAR(10))")
    db.execute("INSERT INTO wm VALUES (1,'pear'), (1,'apple'), (1,'fig'), "
               "(2,'kiwi'), (2,'banana')")
    rows = db.execute(
        "SELECT k, min(name) OVER (PARTITION BY k) AS lo,"
        " max(name) OVER (PARTITION BY k) AS hi FROM wm "
        "ORDER BY k, name").rows()
    assert [(r[0], r[1], r[2]) for r in rows] == [
        (1, "apple", "pear"), (1, "apple", "pear"), (1, "apple", "pear"),
        (2, "banana", "kiwi"), (2, "banana", "kiwi")]


def test_window_in_expression(db):
    """Window results compose with scalar expressions."""
    db.execute("CREATE TABLE wx(t INT, v INT)")
    db.execute("INSERT INTO wx VALUES (1, 10), (2, 20), (3, 40)")
    got = _got(db, "SELECT t, v - lag(v, 1, 0) OVER (ORDER BY t) AS d "
                   "FROM wx ORDER BY t")
    assert [int(g) for g in got] == [10, 10, 20]


def test_window_null_partition_groups_together(db):
    db.execute("CREATE TABLE wn(k INT, v INT)")
    db.execute("INSERT INTO wn VALUES (1, 10), (NULL, 5), (1, 20), "
               "(NULL, 7), (NULL, 8)")
    rows = db.execute("SELECT k, count(*) OVER (PARTITION BY k) AS c "
                      "FROM wn ORDER BY v").rows()
    # NULL keys form ONE partition of size 3
    by_k = {}
    for kk, c in rows:
        by_k.setdefault(kk, set()).add(int(c))
    assert by_k[None] == {3}
    assert by_k[1] == {2}


def test_window_rejected_in_grouped_query(db):
    db.execute("CREATE TABLE wg(k INT, v INT)")
    db.execute("INSERT INTO wg VALUES (1, 10), (1, 20), (2, 30)")
    with pytest.raises(Exception, match="window|GROUP"):
        db.execute("SELECT k, sum(sum(v)) OVER (ORDER BY k) FROM wg "
                   "GROUP BY k")
