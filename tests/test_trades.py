"""Trades benchmark suite replay (reference benchmark/quries/Aquery/
q0-q10 — select / multi-key group-by / append / windowed queries) with
NumPy oracle checks."""

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.utils.datagen import trades_table


@pytest.fixture(scope="module")
def db():
    s = aq.connect()
    trades_table("trade1m", 20_000, n_symbols=50, session=s)
    t = s.catalog.get("trade1m")
    d = {
        "sym": np.asarray(t["stocksymbol"].data[: t.nrows]),
        "time": np.asarray(t["time"].data[: t.nrows]),
        "qty": np.asarray(t["quantity"].data[: t.nrows]),
        "price": np.asarray(t["price"].data[: t.nrows]),
    }
    s._d = d
    yield s
    s.close()


def test_q0_select_all(db):
    db.execute("<sql>CREATE TABLE res0 AS SELECT * FROM trade1m</sql>")
    assert db.catalog.get("res0").nrows == 20_000


def test_q1_groupby_multi_fns(db):
    r = db.execute("""<sql>
        CREATE TABLE res1 AS
        SELECT avg(quantity) AS avg_quan, min(price) AS min_p
        FROM trade1m GROUP BY stocksymbol, time
        </sql>""")
    d = db._d
    from collections import defaultdict
    g = defaultdict(list)
    for s_, t_, q_, p_ in zip(d["sym"], d["time"], d["qty"], d["price"]):
        g[(s_, t_)].append((q_, p_))
    res1 = db.catalog.get("res1")
    assert res1.nrows == len(g)


def test_q2_count(db):
    assert db.execute("<sql>SELECT COUNT(*) FROM trade1m</sql>").scalar() == 20_000


def test_q3_groupby_sum(db):
    r = db.execute("SELECT sum(quantity) as sum_quantity FROM trade1m "
                   "GROUP BY stocksymbol, price")
    d = db._d
    from collections import defaultdict
    g = defaultdict(int)
    for s_, p_, q_ in zip(d["sym"], d["price"], d["qty"]):
        g[(s_, p_)] += q_
    got = sorted(row[0] for row in r.rows())
    assert got == sorted(g.values())


def test_q4_union_all(db):
    r = db.execute("SELECT * FROM trade1m UNION ALL SELECT * FROM trade1m")
    assert r.nrows == 40_000


def test_q7_grouped_moving_avg(db):
    r = db.execute("SELECT stocksymbol, avgs(5, price) FROM trade1m "
                   "ASSUMING ASC time GROUP BY stocksymbol")
    d = db._d
    # oracle for one symbol
    sym0 = r.rows(limit=1)[0][0]
    t0 = db.catalog.get("trade1m")
    code = t0["stocksymbol"].dictionary.lookup(sym0)
    m = d["sym"] == code
    order = np.argsort(d["time"][m], kind="stable")
    p = d["price"][m][order]
    want = [p[max(0, i - 4): i + 1].mean() for i in range(len(p))]
    got = r.rows(limit=1)[0][1]
    np.testing.assert_allclose(got, want)


def test_q8_range_filter(db):
    lo, hi = 100, 700
    r = db.execute(f"SELECT stocksymbol, quantity, price FROM trade1m "
                   f"WHERE time >= {lo} and time <= {hi}")
    d = db._d
    m = (d["time"] >= lo) & (d["time"] <= hi)
    assert r.nrows == int(m.sum())


def test_q9_minmax_range(db):
    r = db.execute("SELECT stocksymbol, MAX(price) - MIN(price) FROM trade1m "
                   "GROUP BY stocksymbol")
    d = db._d
    from collections import defaultdict
    mx = defaultdict(lambda: -1)
    mn = defaultdict(lambda: 10**9)
    for s_, p_ in zip(d["sym"], d["price"]):
        mx[s_] = max(mx[s_], p_)
        mn[s_] = min(mn[s_], p_)
    got = sorted(row[1] for row in r.rows())
    want = sorted(int(mx[k]) - int(mn[k]) for k in mx)
    assert got == want


def test_q10_max_windowed_stddev(db):
    r = db.execute("SELECT stocksymbol, MAX(stddevs(3, price)) FROM trade1m "
                   "ASSUMING ASC time GROUP BY stocksymbol")
    d = db._d
    sym0 = r.rows(limit=1)[0][0]
    code = db.catalog.get("trade1m")["stocksymbol"].dictionary.lookup(sym0)
    m = d["sym"] == code
    order = np.argsort(d["time"][m], kind="stable")
    p = d["price"][m][order].astype(np.float64)
    sds = [p[max(0, i - 2): i + 1].std() for i in range(len(p))]
    assert r.rows(limit=1)[0][1] == pytest.approx(max(sds), rel=1e-9)
