"""Date/time expression surface end-to-end.

Reference wires date/time/timestamp parse + compare + formatting through
queries (server/libaquery.cpp:65-207). Here temporals are integer-coded
on device (types.py) — these tests pin literals in WHERE, ORDER BY on
dates, date ASSUMING, grouping by dates, and min/max over dates through
real queries.
"""

import pytest

import aquery2_tpu as aq


@pytest.fixture()
def db():
    s = aq.connect()
    s.execute("CREATE TABLE trades(sym VARCHAR(8), d DATE, t TIME, "
              "ts TIMESTAMP, price INT)")
    s.execute("""INSERT INTO trades VALUES
        ("A", '2023-01-10', '09:30:00', '2023-01-10 09:30:00', 100),
        ("A", '2023-01-11', '10:00:00', '2023-01-11 10:00:00', 105),
        ("B", '2023-01-10', '09:45:00', '2023-01-10 09:45:00', 50),
        ("B", '2023-01-12', '11:15:30', '2023-01-12 11:15:30', 65),
        ("A", '2023-01-12', '16:00:00', '2023-01-12 16:00:00', 95)""")
    return s


def test_date_literal_equality(db):
    r = db.execute("SELECT sym, price FROM trades WHERE d = '2023-01-10'")
    assert sorted(r.rows()) == [("A", 100), ("B", 50)]


def test_date_range_comparison(db):
    r = db.execute("SELECT price FROM trades WHERE d > '2023-01-10' "
                   "AND d <= '2023-01-12'")
    assert sorted(x for (x,) in r.rows()) == [65, 95, 105]


def test_order_by_date_desc(db):
    r = db.execute("SELECT d, price FROM trades WHERE sym = \"A\" "
                   "ORDER BY d DESC")
    assert [x for x, _ in r.rows()] == ["2023-01-12", "2023-01-11",
                                        "2023-01-10"]


def test_assuming_asc_date_running(db):
    # running max over date order: prices 100,105,95 for A
    r = db.execute("SELECT maxs(price) FROM trades ASSUMING ASC d "
                   "WHERE sym = \"A\"")
    assert [x for (x,) in r.rows()] == [100, 105, 105]


def test_group_by_date(db):
    r = db.execute("SELECT d, count(*), sum(price) FROM trades "
                   "GROUP BY d ORDER BY d")
    assert r.rows() == [("2023-01-10", 2, 150), ("2023-01-11", 1, 105),
                        ("2023-01-12", 2, 160)]


def test_min_max_dates_format(db):
    r = db.execute("SELECT min(d), max(d) FROM trades")
    assert r.rows() == [("2023-01-10", "2023-01-12")]


def test_time_comparison(db):
    r = db.execute("SELECT price FROM trades WHERE t >= '10:00:00'")
    assert sorted(x for (x,) in r.rows()) == [65, 95, 105]


def test_timestamp_comparison_and_display(db):
    r = db.execute("SELECT ts, price FROM trades "
                   "WHERE ts > '2023-01-11 00:00:00' ORDER BY ts")
    rows = r.rows()
    assert [p for _, p in rows] == [105, 65, 95]
    assert rows[0][0].startswith("2023-01-11 10:00:00")


def test_date_between(db):
    r = db.execute("SELECT count(*) FROM trades WHERE d BETWEEN "
                   "'2023-01-11' AND '2023-01-12'")
    assert r.scalar() == 3


def test_csv_date_roundtrip(db, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("sym,d,price\nX,2024-02-29,7\nY,2024-03-01,9\n")
    db.execute("CREATE TABLE dd(sym VARCHAR(4), d DATE, price INT)")
    db.execute(f'LOAD DATA INFILE "{p}" INTO TABLE dd '
               f'FIELDS TERMINATED BY ","')
    r = db.execute("SELECT sym FROM dd WHERE d = '2024-02-29'")
    assert r.rows() == [("X",)]
    r2 = db.execute("SELECT d FROM dd ORDER BY d")
    assert [x for (x,) in r2.rows()] == ["2024-02-29", "2024-03-01"]
