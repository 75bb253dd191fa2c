"""End-to-end tests replaying the reference's own test scripts
(reference tests/*.a — the dialect surface; SURVEY.md §4) with expected
values verified against hand/NumPy oracles.

Reference data fixtures are read from /root/reference/data (read-only);
tests skip if the mount is absent.
"""

import os

import numpy as np
import pytest

import aquery2_tpu as aq

REF_DATA = "/root/reference/data"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                               reason="reference data not mounted")


@pytest.fixture
def db(tmp_path):
    s = aq.connect(base_dir=str(tmp_path))
    yield s
    s.close()


def _load_stocks(db):
    db.execute("CREATE TABLE stocks(timestamp INT, price INT)")
    prices = [15, 19, 16, 17, 15, 13, 5, 8, 7, 13, 11, 14, 10, 5, 2, 5]
    vals = ", ".join(f"({i+1},{p})" for i, p in enumerate(prices))
    db.execute(f"INSERT INTO stocks VALUES {vals}")
    return np.array(prices)


# --- stock.a --------------------------------------------------------------

def test_stock_q1(db):
    _load_stocks(db)
    r = db.execute("SELECT max(price-min(timestamp)) FROM stocks")
    assert r.scalar() == 19 - 1


def test_stock_q2_best_profit(db):
    p = _load_stocks(db)
    r = db.execute("SELECT max(price-mins(price)) FROM stocks")
    want = (p - np.minimum.accumulate(p)).max()
    assert r.scalar() == want == 9


def test_stock_q3_filter(db):
    p = _load_stocks(db)
    r = db.execute("SELECT price, timestamp FROM stocks "
                   "where price - timestamp > 1 and not (price*timestamp<100)")
    ts = np.arange(1, 17)
    m = (p - ts > 1) & ~(p * ts < 100)
    got = r.rows()
    assert got == list(zip(p[m].tolist(), ts[m].tolist()))


def test_stock_q4_desc_assuming(db):
    p = _load_stocks(db)
    r = db.execute("SELECT max(price-mins(price)) FROM stocks ASSUMING DESC timestamp")
    rev = p[::-1]
    want = (rev - np.minimum.accumulate(rev)).max()
    assert r.scalar() == want


# --- moving_avg.a ---------------------------------------------------------

@needs_ref
def test_moving_avg(db, tmp_path):
    db.execute("CREATE TABLE sale(Mont INT, sales INT)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/moving_avg.csv" '
               f'INTO TABLE sale FIELDS TERMINATED BY ","')
    r = db.execute('SELECT Mont, avgs(3,sales) FROM sale ASSUMING ASC Mont '
                   f'INTO OUTFILE "out.csv" FIELDS TERMINATED BY ";"')
    # oracle
    raw = np.genfromtxt(f"{REF_DATA}/moving_avg.csv", delimiter=",",
                        skip_header=1, dtype=np.int64)
    order = np.argsort(raw[:, 0], kind="stable")
    sales = raw[order, 1]
    want = [sales[max(0, i - 2): i + 1].mean() for i in range(len(sales))]
    got = r.rows()
    assert [g[0] for g in got] == raw[order, 0].tolist()
    np.testing.assert_allclose([g[1] for g in got], want)
    assert (tmp_path / "out.csv").exists()
    # grouped windowed into ragged vectors
    r2 = db.execute("select Mont, mins(2,sales) from sale assuming desc Mont group by Mont")
    assert r2.nrows == len(np.unique(raw[:, 0]))


# --- q1.sql ---------------------------------------------------------------

@needs_ref
def test_q1_sql(db):
    db.execute("CREATE TABLE testq1(a INT, b INT, c INT, d INT)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/test.csv" INTO TABLE testq1 '
               f'FIELDS TERMINATED BY ","')
    r = db.execute("SELECT sum(c), b, d FROM testq1 group by a,b,d "
                   "order by d DESC, b ASC")
    raw = np.genfromtxt(f"{REF_DATA}/test.csv", delimiter=",",
                        skip_header=1, dtype=np.int64)
    groups = {}
    for a, b, c, d in raw:
        groups.setdefault((a, b, d), 0)
        groups[(a, b, d)] += c
    want = sorted(((s, b, d) for (a, b, d), s in groups.items()),
                  key=lambda t: (-t[2], t[1]))
    got = [tuple(row) for row in r.rows()]
    # group-key ties (same b,d different a) make full order ambiguous;
    # compare as multisets per (d,b) bucket and check sort keys ordered
    assert sorted(got) == sorted(want)
    keys = [(-row[2], row[1]) for row in got]
    assert keys == sorted(keys)


# --- joins.a --------------------------------------------------------------

@needs_ref
def test_joins(db):
    db.execute("""FUNCTION covariance (x , y ) {
        xmean := avg (x) ;
        ymean := avg (y) ;
        avg (( x - xmean ) * (y - ymean ))
        }""")
    db.execute("FUNCTION sd ( x) { sqrt ( covariance (x , x) ) }")
    db.execute("CREATE TABLE tt(a INT, b INT, c INT, d INT)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/test.csv" INTO TABLE tt '
               f'FIELDS TERMINATED BY ","')
    db.execute("CREATE TABLE sale1(Mont INT, sales INT)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/moving_avg.csv" INTO TABLE sale1 '
               f'FIELDS TERMINATED BY ","')

    r = db.execute("select * from tt, sale1 where tt.a = sale1.Mont")
    t = np.genfromtxt(f"{REF_DATA}/test.csv", delimiter=",", skip_header=1,
                      dtype=np.int64)
    s = np.genfromtxt(f"{REF_DATA}/moving_avg.csv", delimiter=",",
                      skip_header=1, dtype=np.int64)
    want_pairs = [(tuple(tr), tuple(sr)) for tr in t for sr in s if tr[0] == sr[0]]
    got = [tuple(row) for row in r.rows()]
    assert sorted(got) == sorted(tuple(a) + tuple(b) for a, b in want_pairs)

    r2 = db.execute("select sd(a) + sales from tt, sale1 where tt.a = sale1.Mont")
    a_joined = np.array([tr[0] for tr, _ in want_pairs], dtype=np.float64)
    sales_joined = np.array([sr[1] for _, sr in want_pairs], dtype=np.float64)
    # sd over the joined a column (population, via covariance formula)
    sd = np.sqrt(((a_joined - a_joined.mean()) ** 2).mean())
    want = sorted(sd + sales_joined)
    got2 = sorted(v[0] for v in r2.rows())
    np.testing.assert_allclose(got2, want, rtol=1e-9)


# --- funcs.a (UDFs + groupby + orderby) -----------------------------------

@needs_ref
def test_funcs(db):
    for fn in [
        """FUNCTION covariance (x , y ) {
            xmean := avg (x) ; ymean := avg (y) ;
            avg (( x - xmean ) * (y - ymean )) }""",
        "FUNCTION sd ( x) { sqrt ( covariance (x , x) ) }",
        "FUNCTION pairCorr (x , y ) { covariance (x , y ) / ( sd (x) * sd (y )) }",
    ]:
        db.execute(fn)
    db.execute("CREATE TABLE test1(a INT, b INT, c INT, d INT)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/test.csv" INTO TABLE test1 '
               f'FIELDS TERMINATED BY ","')
    r = db.execute("SELECT pairCorr(c, b) * d, a, sum(b) FROM test1 "
                   "group by a order by b ASC")
    assert r.nrows >= 1
    names = r.column_names()
    assert len(names) == 3


# --- network.a (groupby with windowed key expr) ---------------------------

@needs_ref
def test_network(db):
    db.execute("CREATE TABLE network(src varchar(3), dst varchar(3), len int, _time int)")
    db.execute(f'LOAD DATA INFILE "{REF_DATA}/network.csv" INTO TABLE network '
               f'FIELDS TERMINATED BY ","')
    r = db.execute("""SELECT src, dst, count(*), avg(len)
        FROM network ASSUMING ASC src, ASC dst, ASC _time
        GROUP BY src, dst, sums (deltas(_time) > 120)""")
    # oracle in numpy
    rows = []
    with open(f"{REF_DATA}/network.csv") as f:
        next(f)
        for line in f:
            srcv, dstv, lenv, timev = [x.strip() for x in line.split(",")]
            rows.append((srcv, dstv, int(lenv), int(timev)))
    rows.sort(key=lambda r: (r[0], r[1], r[3]))
    sess = []
    sid = 0
    prev_key = None
    prev_t = None
    cum = 0
    for srcv, dstv, lenv, timev in rows:
        delta = 0 if prev_key != (srcv, dstv) else timev - prev_t
        if prev_key != (srcv, dstv):
            cum = 0
        cum += 1 if delta > 120 else 0
        sess.append((srcv, dstv, cum))
        prev_key = (srcv, dstv)
        prev_t = timev
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for (k, row) in zip(sess, rows):
        agg[k][0] += 1
        agg[k][1] += row[2]
    want = {(k[0], k[1], cnt_len[0], cnt_len[1] / cnt_len[0])
            for k, cnt_len in agg.items()}
    got = {(a, b, c, d) for a, b, c, d in r.rows()}
    assert got == want


# --- jose_gh.a ------------------------------------------------------------

def test_select_star_and_scalar_udf(db):
    db.execute("CREATE TABLE t(indiv INT, grp STRING, val INT)")
    db.execute("INSERT INTO t VALUES(1, 'A', 1), (2, 'A', 2), (3, 'B', 10)")
    r = db.execute("SELECT * FROM t")
    assert r.rows() == [(1, "A", 1), (2, "A", 2), (3, "B", 10)]
    db.execute("""FUNCTION myCov(x, y) {
        center_x := x - avg(x);
        center_y := y - avg(y);
        num := sum(center_x * center_y);
        denom := sqrt(sum(center_x * center_x)) * sqrt(sum(center_y * center_y));
        num / denom
        }""")
    r2 = db.execute("select myCov(1,2)")
    assert r2.nrows == 1  # 0/0 → nan, as the reference's C++ would produce


# --- sqlblock.a -----------------------------------------------------------

def test_sql_block(db):
    db.execute("CREATE TABLE my_table (c1 INT, c2 INT, c3 STRING)")
    db.execute('INSERT INTO my_table VALUES(10, 20, "example"), (20, 30, "example2")')
    r = db.execute("""<sql>
        INSERT INTO my_table VALUES(14, 24, 'example3');
        SELECT * FROM my_table WHERE c1 < 15;
        </sql>""")
    assert sorted(r.rows()) == [(10, 20, "example"), (14, 24, "example3")]
    r2 = db.execute("SELECT * FROM my_table WHERE c1 > 15")
    assert r2.rows() == [(20, 30, "example2")]


# --- q4.a fragments -------------------------------------------------------

def test_insert_select_and_ctas(db):
    db.execute("CREATE TABLE my_table (c1 INT, c2 INT, c3 STRING)")
    db.execute('INSERT INTO my_table VALUES(10, 20, "example")')
    db.execute("INSERT INTO my_table SELECT * FROM my_table")
    r = db.execute("select * from my_table")
    assert r.nrows == 2
    db.execute("CREATE TABLE my_table_derived AS SELECT c1, c2 as twice_c2 FROM my_table")
    r2 = db.execute("SELECT * FROM my_table_derived")
    assert r2.column_names() == ["c1", "twice_c2"]
    assert r2.nrows == 2


def test_prev_ratios(db):
    db.execute("CREATE TABLE ticks(ID varchar(20), date int, endofdayprice int)")
    db.execute('INSERT INTO ticks VALUES("3001", 1, 10), ("3001", 2, 15), '
               '("3001", 3, 12), ("9999", 1, 99)')
    r = db.execute('SELECT max(endofdayprice/prev(endofdayprice)) as Max_Ratio '
                   'FROM ticks ASSUMING ASC date WHERE ID = "3001"')
    assert r.scalar() == pytest.approx(1.5)
    db.execute("CREATE TABLE ticks2(ID VARCHAR(20), max REAL, min REAL)")
    db.execute("INSERT INTO ticks2 SELECT ID AS ID, max(ratios(endofdayprice)) AS max, "
               "min(ratios(endofdayprice)) AS min from ticks group by ID")
    r2 = db.execute("SELECT ID, max, min FROM ticks2")
    got = {row[0]: (row[1], row[2]) for row in r2.rows()}
    assert got["3001"] == (pytest.approx(1.5), pytest.approx(0.8))
    assert got["9999"] == (pytest.approx(1.0), pytest.approx(1.0))


# --- complex_data.a (vector cells) ----------------------------------------

@needs_ref
def test_complex_data(db):
    db.execute("create table f (a float, b vecfloat, c int)")
    db.execute(f"load complex data infile '{REF_DATA}/test_complex.csv' "
               f"into table f fields terminated by ',' element terminated by ';'")
    r = db.execute("select * from f")
    assert r.nrows == 5  # test_complex.csv has 5 data rows (CRLF endings)
    rows = r.rows()
    assert rows[0][2] == 7
    np.testing.assert_allclose(rows[1][1], [2.0])          # scalar cell → 1-vec
    np.testing.assert_allclose(rows[2][1], [5, 6, 7, 8, 9])
    np.testing.assert_allclose(rows[4][1], [-4e7, 67456746744567, 75])


# --- distinct / into ------------------------------------------------------

def test_distinct_into(db):
    db.execute("CREATE TABLE tr(ID varchar(15), TradeDate date)")
    db.execute("INSERT INTO tr VALUES('a', '2020-01-01'), ('a', '2020-01-01'), "
               "('b', '2020-01-02')")
    db.execute("select distinct ID, TradeDate into td from tr")
    r = db.execute("select * from td")
    assert r.nrows == 2
    assert sorted(r.rows()) == [("a", "2020-01-01"), ("b", "2020-01-02")]


# --- union all ------------------------------------------------------------

def test_union_all(db):
    db.execute("CREATE TABLE u1(a INT)")
    db.execute("INSERT INTO u1 VALUES (1), (2)")
    r = db.execute("SELECT * FROM u1 UNION ALL SELECT * FROM u1")
    assert sorted(v[0] for v in r.rows()) == [1, 1, 2, 2]


# --- aggregation UDF (udf3.a) --------------------------------------------

@needs_ref
def test_aggregation_udf(db):
    src = open("/root/reference/tests/udf3.a").read()
    # execute the whole script: function def + create + load + select
    r = db.execute(src.replace('"data/test2.csv"', f'"{REF_DATA}/test2.csv"'))
    assert r is not None
    assert r.nrows >= 1
    cols = r.column_names()
    assert len(cols) == 2


# --- subvec / top-k per group (h2o q8 pattern) ----------------------------

def test_subvec_groupby(db):
    db.execute("CREATE TABLE s(id INT, v INT)")
    db.execute("INSERT INTO s VALUES (1, 9), (1, 7), (1, 8), (2, 3), (2, 4)")
    r = db.execute("SELECT id, subvec(v, 0, 2) AS v FROM s GROUP BY id")
    d = {row[0]: row[1] for row in r.rows()}
    assert d == {1: [9, 7], 2: [3, 4]}


def test_natural_join_grouped_window(db):
    db.execute("CREATE TABLE td(ID varchar(5), TradeDate date)")
    db.execute("INSERT INTO td VALUES('a','2020-01-01'), ('a','2020-01-02'), "
               "('b','2020-01-01')")
    db.execute("CREATE TABLE hq(ID varchar(5), TradeDate date, ClosePrice real)")
    db.execute("INSERT INTO hq VALUES('a','2020-01-01', 10), ('a','2020-01-02', 20), "
               "('b','2020-01-01', 5)")
    r = db.execute("SELECT ID, avgs(2, ClosePrice) FROM td NATURAL JOIN hq "
                   "ASSUMING ASC TradeDate GROUP BY ID")
    d = {row[0]: row[1] for row in r.rows()}
    assert d["a"] == [10.0, 15.0]
    assert d["b"] == [5.0]


def test_limit_and_orderby_string(db):
    db.execute("CREATE TABLE t(s varchar(5), v INT)")
    db.execute("INSERT INTO t VALUES('b', 1), ('a', 2), ('c', 3)")
    r = db.execute("SELECT s, v FROM t ORDER BY s LIMIT 2")
    assert r.rows() == [("a", 2), ("b", 1)]


def test_like_and_string_ranges(db):
    db.execute("CREATE TABLE n(name varchar(20), v INT)")
    db.execute("INSERT INTO n VALUES('alpha', 1), ('beta', 2), ('alphabet', 3), ('gamma', 4)")
    r = db.execute("SELECT name FROM n WHERE name LIKE 'alpha%'")
    assert sorted(v[0] for v in r.rows()) == ["alpha", "alphabet"]
    r2 = db.execute("SELECT name FROM n WHERE name LIKE '_eta'")
    assert [v[0] for v in r2.rows()] == ["beta"]
    r3 = db.execute("SELECT name, v FROM n WHERE name > 'b'")
    assert sorted(v[0] for v in r3.rows()) == ["beta", "gamma"]
    r4 = db.execute("SELECT name FROM n WHERE name <= 'beta'")
    assert sorted(v[0] for v in r4.rows()) == ["alpha", "alphabet", "beta"]


def test_update(db):
    db.execute("CREATE TABLE u(a INT, b INT, s varchar(4))")
    db.execute("INSERT INTO u VALUES (1, 10, 'x'), (2, 20, 'y'), (3, 30, 'z')")
    db.execute("UPDATE u SET b = b * 2 WHERE a >= 2")
    assert db.execute("SELECT b FROM u").rows() == [(10,), (40,), (60,)]
    db.execute("UPDATE u SET s = 'w', a = 0 WHERE b = 40")
    got = db.execute("SELECT a, s FROM u").rows()
    assert got == [(1, "x"), (0, "w"), (3, "z")]


def test_derived_table_subquery(db):
    db.execute("CREATE TABLE dt(a INT, b INT)")
    db.execute("INSERT INTO dt VALUES (1,2),(1,3),(2,5),(3,1)")
    r = db.execute("SELECT a, s FROM (SELECT a, sum(b) AS s FROM dt "
                   "GROUP BY a) sub WHERE s > 2")
    assert sorted(r.rows()) == [(1, 5), (2, 5)]
    # derived tables on both sides of a join
    r = db.execute("SELECT count(*) FROM (SELECT a FROM dt WHERE b > 1) x, "
                   "(SELECT a FROM dt WHERE b > 2) y WHERE x.a = y.a")
    assert r.scalar() == 3
    # nested aggregation over a derived table
    r = db.execute("SELECT max(s) FROM (SELECT a, sum(b) AS s FROM dt "
                   "GROUP BY a) q")
    assert r.scalar() == 5


def test_subquery_expressions(db):
    db.execute("CREATE TABLE sq(a INT, b INT, s VARCHAR(4))")
    db.execute("INSERT INTO sq VALUES (1,2,'x'),(2,3,'y'),(3,5,'x'),(4,1,'z')")
    r = db.execute("SELECT a FROM sq WHERE a IN (SELECT a FROM sq WHERE b > 2)")
    assert r.rows() == [(2,), (3,)]
    r = db.execute("SELECT a FROM sq WHERE b > (SELECT avg(b) FROM sq)")
    assert r.rows() == [(2,), (3,)]
    r = db.execute("SELECT a FROM sq WHERE s IN (SELECT s FROM sq WHERE b >= 3)")
    assert r.rows() == [(1,), (2,), (3,)]
    # scalar subquery in a projection
    r = db.execute("SELECT a - (SELECT min(a) FROM sq) AS z FROM sq")
    assert [x[0] for x in r.rows()] == [0, 1, 2, 3]
