"""SQL NULL semantics: validity masks end-to-end.

Reference: `missing`/IS NULL is real against MonetDB nulls
(common/types.py:359-364); empty CSV cells load as NULL via MonetDB COPY.
Here columns carry an optional validity mask (storage/table.py), eval
propagates 3-valued logic, aggregates skip nulls, null join keys never
match, and NULL group keys form their own group.
"""

import numpy as np
import pytest

import aquery2_tpu as aq


@pytest.fixture()
def db():
    return aq.connect()


def _setup(db):
    db.execute("CREATE TABLE t(a INT, b INT)")
    db.execute("INSERT INTO t VALUES (1, 10), (2, NULL), (NULL, 30), "
               "(4, NULL), (NULL, NULL), (6, 60)")


def test_is_null_filter(db):
    _setup(db)
    r = db.execute("SELECT a FROM t WHERE b IS NULL")
    assert sorted(x if x is not None else -999 for (x,) in r.rows()) \
        == [-999, 2, 4]
    r = db.execute("SELECT a FROM t WHERE b IS NOT NULL")
    assert sorted(x if x is not None else -999 for (x,) in r.rows()) \
        == [-999, 1, 6]


def test_null_display(db):
    _setup(db)
    r = db.execute("SELECT a, b FROM t")
    rows = r.rows()
    assert rows[2][0] is None and rows[2][1] == 30
    assert rows[4] == (None, None)


def test_comparison_with_null_is_not_true(db):
    _setup(db)
    # b > 0 is NULL (not true) for null b: rows 2,4,5 excluded
    r = db.execute("SELECT a FROM t WHERE b > 0")
    got = sorted(x if x is not None else -999 for (x,) in r.rows())
    assert got == [-999, 1, 6]
    # comparing with a NULL literal matches nothing
    r = db.execute("SELECT a FROM t WHERE b = NULL")
    assert r.nrows == 0


def test_null_arithmetic_propagates(db):
    _setup(db)
    r = db.execute("SELECT a + b FROM t")
    vals = [x for (x,) in r.rows()]
    assert vals[0] == 11
    assert vals[1] is None and vals[2] is None and vals[4] is None
    assert vals[5] == 66


def test_kleene_and_or(db):
    _setup(db)
    # NULL OR true = true: b IS NULL never blocks when a>0 is decisive
    r = db.execute("SELECT a FROM t WHERE a > 0 OR b > 1000000")
    got = sorted(x for (x,) in r.rows() if x is not None)
    assert got == [1, 2, 4, 6]
    # NULL AND false = false (excluded), NULL AND true = NULL (excluded)
    r = db.execute("SELECT a FROM t WHERE b > 0 AND a > 0")
    assert sorted(x for (x,) in r.rows()) == [1, 6]


def test_aggregates_skip_nulls(db):
    _setup(db)
    r = db.execute("SELECT sum(b), count(b), avg(b), min(b), max(b), "
                   "count(*) FROM t")
    s, c, a, mn, mx, cstar = r.rows()[0]
    assert s == 100 and c == 3 and cstar == 6
    assert abs(a - 100 / 3) < 1e-9
    assert mn == 10 and mx == 60


def test_group_by_nullable_key(db):
    _setup(db)
    db.execute("INSERT INTO t VALUES (NULL, 5)")
    r = db.execute("SELECT a, count(*), sum(b) FROM t GROUP BY a")
    got = {row[0]: (row[1], row[2]) for row in r.rows()}
    # all NULL keys in ONE group; sum skips null b
    assert got[None] == (3, 35)
    assert got[1] == (1, 10)
    assert got[2] == (1, 0)          # sum over all-null group = 0


def test_null_join_keys_never_match(db):
    db.execute("CREATE TABLE l(k INT, x INT)")
    db.execute("CREATE TABLE r(k INT, y INT)")
    db.execute("INSERT INTO l VALUES (1, 10), (NULL, 20), (3, 30)")
    db.execute("INSERT INTO r VALUES (1, 100), (NULL, 200), (3, 300)")
    res = db.execute("SELECT l.x, r.y FROM l, r WHERE l.k = r.k")
    assert sorted(res.rows()) == [(10, 100), (30, 300)]


def test_csv_empty_cells_load_as_null(db, tmp_path):
    p = tmp_path / "nulls.csv"
    p.write_text("a,b\n1,\n,2\n3,4\n")
    db.execute("CREATE TABLE c(a INT, b INT)")
    db.execute(f'LOAD DATA INFILE "{p}" INTO TABLE c FIELDS TERMINATED BY ","')
    r = db.execute("SELECT a, b FROM c")
    assert r.rows() == [(1, None), (None, 2), (3, 4)]
    r = db.execute("SELECT count(a), count(b), count(*) FROM c")
    assert r.rows()[0] == (2, 2, 3)


def test_order_by_nulls_first_asc(db):
    _setup(db)
    r = db.execute("SELECT a FROM t ORDER BY a")
    vals = [x for (x,) in r.rows()]
    assert vals[:2] == [None, None]
    assert vals[2:] == [1, 2, 4, 6]


def test_case_when_null_result(db):
    _setup(db)
    r = db.execute("SELECT CASE WHEN b > 20 THEN b ELSE NULL END FROM t")
    vals = [x for (x,) in r.rows()]
    assert vals[2] == 30 and vals[5] == 60
    assert vals[0] is None and vals[1] is None


def test_fused_path_still_used_without_nulls(db):
    """Non-null tables keep the fused group-by (result sanity check)."""
    db.execute("CREATE TABLE g(k INT, v INT)")
    db.execute("INSERT INTO g VALUES (1,1),(1,2),(2,3),(2,4)")
    r = db.execute("SELECT k, sum(v) FROM g GROUP BY k ORDER BY k")
    assert r.rows() == [(1, 3), (2, 7)]
