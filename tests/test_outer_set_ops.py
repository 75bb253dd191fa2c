"""Outer joins and EXCEPT/INTERSECT set operations.

Reference parses LEFT/RIGHT/FULL OUTER (aquery_parser/parser.py:149,
keywords.py:262-266) and except_clause (engine/ast.py:1143-1155),
executing both via MonetDB. Here: outer joins emit -1 side indices that
the WorkingSet surfaces as all-NULL source rows; set ops are exact
host-side tuple algebra.
"""

import pytest

import aquery2_tpu as aq


@pytest.fixture()
def db():
    s = aq.connect()
    s.execute("CREATE TABLE l(k INT, x INT)")
    s.execute("CREATE TABLE r(k INT, y INT)")
    s.execute("INSERT INTO l VALUES (1, 10), (2, 20), (3, 30)")
    s.execute("INSERT INTO r VALUES (2, 200), (3, 300), (4, 400)")
    return s


def test_left_join(db):
    res = db.execute(
        "SELECT l.k, x, y FROM l LEFT JOIN r ON l.k = r.k ORDER BY l.k")
    assert res.rows() == [(1, 10, None), (2, 20, 200), (3, 30, 300)]


def test_left_outer_join_keyword(db):
    res = db.execute(
        "SELECT l.k, y FROM l LEFT OUTER JOIN r ON l.k = r.k ORDER BY l.k")
    assert res.rows() == [(1, None), (2, 200), (3, 300)]


def test_right_join(db):
    res = db.execute(
        "SELECT r.k, x, y FROM l RIGHT JOIN r ON l.k = r.k ORDER BY r.k")
    assert res.rows() == [(2, 20, 200), (3, 30, 300), (4, None, 400)]


def test_full_join(db):
    res = db.execute(
        "SELECT x, y FROM l FULL OUTER JOIN r ON l.k = r.k")
    rows = set(res.rows())
    assert rows == {(10, None), (20, 200), (30, 300), (None, 400)}


def test_left_join_using(db):
    res = db.execute(
        "SELECT k, x, y FROM l LEFT JOIN r USING (k) ORDER BY k")
    assert res.rows() == [(1, 10, None), (2, 20, 200), (3, 30, 300)]


def test_outer_join_null_side_aggregates(db):
    # count(y) skips the NULL side; count(*) does not
    res = db.execute(
        "SELECT count(y), count(*) FROM l LEFT JOIN r ON l.k = r.k")
    assert res.rows()[0] == (2, 3)


def test_outer_join_is_null_filter(db):
    # anti-join idiom
    res = db.execute(
        "SELECT l.k FROM l LEFT JOIN r ON l.k = r.k WHERE y IS NULL")
    assert res.rows() == [(1,)]


def test_outer_join_then_groupby(db):
    db.execute("INSERT INTO l VALUES (2, 21)")
    res = db.execute(
        "SELECT l.k, count(y) FROM l LEFT JOIN r ON l.k = r.k "
        "GROUP BY l.k ORDER BY l.k")
    assert res.rows() == [(1, 0), (2, 2), (3, 1)]


def test_except(db):
    res = db.execute("SELECT k FROM l EXCEPT SELECT k FROM r")
    assert res.rows() == [(1,)]


def test_except_all_bag_semantics(db):
    db.execute("CREATE TABLE a(v INT)")
    db.execute("CREATE TABLE b(v INT)")
    db.execute("INSERT INTO a VALUES (1), (1), (1), (2)")
    db.execute("INSERT INTO b VALUES (1), (3)")
    res = db.execute("SELECT v FROM a EXCEPT ALL SELECT v FROM b")
    assert sorted(res.rows()) == [(1,), (1,), (2,)]


def test_intersect(db):
    res = db.execute("SELECT k FROM l INTERSECT SELECT k FROM r")
    assert sorted(res.rows()) == [(2,), (3,)]


def test_intersect_all(db):
    db.execute("CREATE TABLE a(v INT)")
    db.execute("CREATE TABLE b(v INT)")
    db.execute("INSERT INTO a VALUES (1), (1), (2)")
    db.execute("INSERT INTO b VALUES (1), (1), (1)")
    res = db.execute("SELECT v FROM a INTERSECT ALL SELECT v FROM b")
    assert sorted(res.rows()) == [(1,), (1,)]


def test_except_chain_left_associative(db):
    db.execute("CREATE TABLE a(v INT)")
    db.execute("CREATE TABLE b(v INT)")
    db.execute("CREATE TABLE c(v INT)")
    db.execute("INSERT INTO a VALUES (1), (2), (3)")
    db.execute("INSERT INTO b VALUES (2)")
    db.execute("INSERT INTO c VALUES (3)")
    # (a - b) - c = {1}; right-assoc a - (b - c) would be {1, 3}
    res = db.execute(
        "SELECT v FROM a EXCEPT SELECT v FROM b EXCEPT SELECT v FROM c")
    assert res.rows() == [(1,)]


def test_union_still_works(db):
    res = db.execute("SELECT k FROM l UNION SELECT k FROM r")
    assert sorted(res.rows()) == [(1,), (2,), (3,), (4,)]


def test_except_with_strings(db):
    db.execute("CREATE TABLE sa(s VARCHAR(8))")
    db.execute("CREATE TABLE sb(s VARCHAR(8))")
    db.execute('INSERT INTO sa VALUES ("x"), ("y"), ("z")')
    db.execute('INSERT INTO sb VALUES ("y")')
    res = db.execute("SELECT s FROM sa EXCEPT SELECT s FROM sb")
    assert sorted(res.rows()) == [("x",), ("z",)]
