"""Verbatim replay of the reference's in-tree test scripts.

VERDICT round-1 item 7 / the reference's own matrix (test.aquery:1-44):
each surviving script in /root/reference/tests executes UNMODIFIED
through the engine, with result assertions computed from the same CSVs
by NumPy (standing in for the MonetDB oracle; BASELINE.md correctness
gate). Data comes from /root/reference/data (read-only → copied to a
tmp workdir); CSVs the scripts reference but the reference tree lost
(stocksym_price.csv, ticks.csv, datatypes.csv) are synthesized to the
schema each script declares.
"""

import os
import shutil

import numpy as np
import pytest

import aquery2_tpu as aq

REF = "/root/reference/tests"
REF_DATA = "/root/reference/data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference tree not mounted")


def _script(name: str) -> str:
    with open(os.path.join(REF, name)) as fh:
        return fh.read()


@pytest.fixture()
def workdir(tmp_path):
    data = tmp_path / "data"
    shutil.copytree(REF_DATA, data)
    # synthesize the CSVs the scripts reference but the tree lost
    with open(data / "stocksym_price.csv", "w") as f:   # q4.a: ticks
        f.write("id,timestamp,tradeDate,price\n")
        rng = np.random.default_rng(3)
        for i, p in enumerate(rng.integers(1, 50, 30)):
            f.write(f"S,{i},2022-10-01,{p}\n")
        for i, p in enumerate(rng.integers(1, 50, 10)):
            f.write(f"T,{i},2022-10-02,{p}\n")
    with open(data / "ticks.csv", "w") as f:            # q4.a: ticks2
        f.write("ID,date,endofdayprice\n")
        rng = np.random.default_rng(4)
        for sym in ("3001", "3002"):
            for d, p in enumerate(rng.integers(10, 99, 12)):
                f.write(f"{sym},{d},{p}\n")
    with open(data / "datatypes.csv", "w") as f:        # strings.a
        f.write("names,val,id\n")
        f.write("alpha,1.25,1\nbeta,2.5,2\ngamma,0.75,3\n")
    old = os.getcwd()
    os.chdir(tmp_path)
    yield tmp_path
    os.chdir(old)


def _csv(path, **kw):
    return np.genfromtxt(path, delimiter=",", skip_header=1, **kw)


# --------------------------------------------------------------------- #

@needs_ref
def test_stock_a(workdir):
    db = aq.connect()
    db.execute(_script("stock.a"))
    prices = np.array([15, 19, 16, 17, 15, 13, 5, 8, 7, 13, 11, 14, 10,
                       5, 2, 5])
    ts = np.arange(1, 17)
    r1 = db.execute("SELECT max(price-min(timestamp)) FROM stocks")
    assert r1.scalar() == int(prices.max() - ts.min())
    r2 = db.execute("SELECT max(price-mins(price)) FROM stocks")
    assert r2.scalar() == int(np.max(prices - np.minimum.accumulate(prices)))
    r4 = db.execute("SELECT max(price-mins(price)) FROM stocks "
                    "ASSUMING DESC timestamp")
    rev = prices[::-1]
    assert r4.scalar() == int(np.max(rev - np.minimum.accumulate(rev)))


@needs_ref
def test_moving_avg_a(workdir):
    db = aq.connect()
    db.execute(_script("moving_avg.a"))
    # INTO OUTFILE artifacts written relative to cwd
    assert os.path.exists("moving_avg_output.csv")
    assert os.path.exists("flatten.csv")
    raw = _csv("data/moving_avg.csv", dtype=np.int64)
    order = np.argsort(raw[:, 0], kind="stable")
    sales = raw[order, 1].astype(np.float64)
    want = [sales[max(0, i - 2): i + 1].mean() for i in range(len(sales))]
    got = np.genfromtxt("moving_avg_output.csv", delimiter=";")
    np.testing.assert_allclose(got[:, 1], want, rtol=1e-6)


@needs_ref
def test_gb_a(workdir):
    db = aq.connect()
    db.execute(_script("gb.a"))
    r = db.execute("select a, b from t")
    assert r.nrows == 12


@needs_ref
def test_joins_a(workdir):
    db = aq.connect()
    r = db.execute(_script("joins.a"))
    t = _csv("data/test.csv", dtype=np.int64)
    s = _csv("data/moving_avg.csv", dtype=np.int64)
    pairs = [(tuple(tr), tuple(sr)) for tr in t for sr in s
             if tr[0] == sr[0]]
    assert r.nrows == len(pairs)   # last stmt: select * from the join


@needs_ref
def test_q1_sql(workdir):
    db = aq.connect()
    r = db.execute(_script("q1.sql"))
    t = _csv("data/test.csv", dtype=np.int64)
    keys = {}
    for a, b, c, d in t:
        keys.setdefault((a, b, d), 0)
        keys[(a, b, d)] += c
    rows = r.rows()
    assert len(rows) == len(keys)
    # ORDER BY d DESC, b ASC
    ds = [row[2] for row in rows]
    assert ds == sorted(ds, reverse=True)
    assert sorted(row[0] for row in rows) == sorted(keys.values())


@needs_ref
def test_q4_a(workdir):
    db = aq.connect()
    r = db.execute(_script("q4.a"))
    # final statement: SELECT c1, c2 as twice_c2 FROM my_table (4 rows:
    # one insert + self-insert doubling)
    assert r is not None and r.nrows == 2
    assert r.column_names()[1].lower() == "twice_c2"
    # the best-profit query against the synthesized csv
    bp = db.execute("select max(endofdayprice - mins(endofdayprice)) "
                    "from ticks assuming asc date where ID = \"3001\"")
    raw2 = np.genfromtxt("data/ticks.csv", delimiter=",", skip_header=1,
                         dtype=None, encoding="utf-8")
    p = np.array([int(rec[2]) for rec in raw2 if str(rec[0]) == "3001"])
    assert bp.scalar() == int(np.max(p - np.minimum.accumulate(p)))


@needs_ref
def test_udf3_a(workdir):
    db = aq.connect()
    r = db.execute(_script("udf3.a"))
    # covariances2(a, b, 4) group by c over data/test2.csv
    t = _csv("data/test2.csv", dtype=np.int64)
    groups = {}
    for a, b, c, d in t:
        groups.setdefault(c, []).append((a, b))
    assert r.nrows == len(groups)

    def cov2(xs, ys, win):
        l = len(xs)
        ret = np.zeros(l)
        xm = ym = 0.0
        if l > 0:
            xm, ym = xs[0], ys[0]
            ret[0] = 0.0
        w = min(win, l)
        i = 1
        while i < w:
            xm += xs[i]
            ym += ys[i]
            ret[i] = np.mean((np.array(xs[0:i]) - xm / i)
                             * (np.array(ys[0:i]) - ym / i))
            i += 1
        xm /= w
        ym /= w
        for i in range(w, l):
            xm += (xs[i] - xs[i - w]) / w
            ym += (ys[i] - ys[i - w]) / w
            ret[i] = np.mean((np.array(xs[i - w:i]) - xm)
                             * (np.array(ys[i - w:i]) - ym))
        return ret
    rows = r.rows()
    # exact per-group parity
    out = {c: cov2([a for a, _ in g], [b for _, b in g], 4)
           for c, g in groups.items()}
    got_vecs = sorted((list(np.atleast_1d(v)) for v, _ in rows),
                      key=lambda x: (len(x), x))
    want_vecs = sorted((list(v) for v in out.values()),
                       key=lambda x: (len(x), x))
    for gv, wv in zip(got_vecs, want_vecs):
        np.testing.assert_allclose(gv, wv, rtol=1e-9, atol=1e-12)


@needs_ref
def test_funcs_a(workdir):
    db = aq.connect()
    r = db.execute(_script("funcs.a"))
    t = _csv("data/test.csv", dtype=np.int64)
    assert r.nrows == len(np.unique(t[:, 0]))


@needs_ref
def test_strings_a(workdir):
    db = aq.connect()
    r = db.execute(_script("strings.a"))
    rr = db.execute("select names, val * 10000 + id from types_test")
    got = {row[0]: row[1] for row in rr.rows()}
    assert got == {"alpha": pytest.approx(12501.0),
                   "beta": pytest.approx(25002.0),
                   "gamma": pytest.approx(7503.0)}
    # the date_time table was created
    assert "date_time" in db.catalog


@needs_ref
def test_sqlblock_a(workdir):
    db = aq.connect()
    r = db.execute(_script("sqlblock.a"))
    # final stmt: SELECT * FROM my_table WHERE c1 > 15 → rows 20 only
    # (14 inserted via the <sql> block is < 15)
    rows = r.rows()
    assert rows == [(20, 30, "example2")]
    inner = db.execute("SELECT c1 FROM my_table ORDER BY c1")
    assert [x for (x,) in inner.rows()] == [10, 14, 20]


@needs_ref
def test_complex_data_a(workdir):
    db = aq.connect()
    r = db.execute(_script("complex_data.a"))
    assert r.nrows == 5
    names = r.column_names()
    assert len(names) == 3
    rows = r.rows()
    # third row's vector cell: 5;6;7;8;9
    assert rows[2][1] == [5.0, 6.0, 7.0, 8.0, 9.0]
    assert rows[1][1] == [2.0]
    assert rows[0][2] == 7


@needs_ref
def test_network_a(workdir):
    db = aq.connect()
    r = db.execute(_script("network.a"))
    assert r.nrows >= 1
    assert len(r.column_names()) == 4


@needs_ref
def test_jose_gh_a(workdir):
    db = aq.connect()
    r = db.execute(_script("jose_gh.a"))
    # last stmt: select myCov(1,2) — scalar correlation of scalars → nan/0
    assert r.nrows == 1


@needs_ref
def test_modules_a(workdir, tmp_path):
    """modules.a verbatim, with the module .so built from the SDK example
    (reference ships test.so as a build artifact)."""
    import subprocess
    sdk = os.path.dirname(os.path.abspath(aq.__file__)) + "/sdk"
    so = tmp_path / "test.so"
    try:
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-O2", f"{sdk}/example_module.cpp",
             "-o", str(so)], check=True, capture_output=True, timeout=120)
    except Exception:
        pytest.skip("no C++ toolchain")
    script = _script("modules.a").replace('"./test.so"', f'"{so}"')
    db = aq.connect()
    r = db.execute(script)
    assert r.scalar() == pytest.approx(2 / 3)


@needs_ref
def test_udf_corpus_execution_tiers(workdir):
    """VERDICT r4 #8: every UDF the reference ships runs on a device
    tier — none may land on the per-group host interpreter.

    Measured table (stats.udf_paths after replaying each script):

      udf3.a    covariances2(x,y,w)    traced        (vmapped device body)
      funcs.a   covariance/sd/pairCorr scalar_device (inlined in evaluator)
      joins.a   covariance/sd/pairCorr scalar_device
      jose_gh.a myCov(1,2)             scalar_host   (constant args — O(1),
                                        no row workload; host by design)
    """
    expected = {
        "udf3.a": {"traced"},
        "funcs.a": {"scalar_device"},
        "joins.a": {"scalar_device"},
        "jose_gh.a": {"scalar_host"},
    }
    for script, want in expected.items():
        db = aq.connect()
        db.execute(_script(script))
        got = set(db.stats.udf_paths)
        assert "interpreted" not in got, (script, db.stats.udf_paths)
        assert got == want, (script, db.stats.udf_paths)
