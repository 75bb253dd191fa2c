"""Replay the reference's surviving in-tree test script end-to-end.

tests/best_profit.a is the only .a script still present in the reference
tree (SURVEY.md §4); it exercises DDL, CSV LOAD, ASSUMING-sorted window
aggregates (max(price - mins(price))), implicit joins with multi-table
ASSUMING + last(), DISTINCT ... INTO, NATURAL JOIN, and grouped
windowed avgs — reference tests/best_profit.a:1-40.
"""

import csv as csvmod
import os

import numpy as np
import pytest

import aquery2_tpu as aq
from aquery2_tpu.utils import datagen

REF_SCRIPT = "/root/reference/tests/best_profit.a"


@pytest.fixture()
def workdir(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    datagen.stock_csv(str(data / "stock.csv"), n_days=20, n_symbols=4)
    datagen.base_csv(str(data / "base.csv"), n_symbols=4)
    datagen.tick_hist_csv(str(data / "tick-price-file.csv"),
                          str(data / "hist-price-file.csv"),
                          n_symbols=3, n_days=15)
    old = os.getcwd()
    os.chdir(tmp_path)
    yield tmp_path
    os.chdir(old)


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference tree not mounted")
def test_best_profit_script_replays(workdir):
    session = aq.connect()
    with open(REF_SCRIPT) as fh:
        r = session.execute(fh.read())
    # the script's last statement: NATURAL JOIN + grouped avgs(10, Close)
    assert r is not None and r.nrows == 3

    # re-run the best-profit query and check against a numpy oracle
    rows = []
    with open("data/stock.csv") as f:
        for rec in csvmod.DictReader(f):
            if rec["ID"] == "S" and rec["tradeDate"] == "2003-01-10":
                rows.append((int(rec["timestamp"]), int(rec["price"])))
    rows.sort()
    prices = np.array([p for _, p in rows])
    best = int(np.max(prices - np.minimum.accumulate(prices)))

    bp = session.execute(
        "SELECT max(price-mins(price)) FROM ticks ASSUMING ASC timestamp "
        "WHERE ID=\"S\" AND tradeDate='2003-01-10'")
    assert bp.scalar() == best


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference tree not mounted")
def test_best_profit_grouped_avgs_parity(workdir):
    """Oracle check for the script's final query on one symbol."""
    session = aq.connect()
    session.execute("create table HistoricQuotes(ID varchar(15), TradeDate "
                    "date, HighPrice real, LowPrice real, ClosePrice real, "
                    "OpenPrice real, volume bigint)")
    session.execute('LOAD DATA INFILE "data/hist-price-file.csv" INTO TABLE '
                    'HistoricQuotes FIELDS TERMINATED BY "|"')
    r = session.execute(
        "SELECT ID, avgs(10, ClosePrice) FROM HistoricQuotes "
        "ASSUMING ASC TradeDate GROUP BY ID")
    assert r.nrows == 3

    closes = []
    with open("data/hist-price-file.csv") as f:
        for rec in csvmod.DictReader(f, delimiter="|"):
            closes.append((rec["TradeDate"], rec["ID"],
                           float(rec["ClosePrice"])))
    closes.sort(key=lambda x: x[0])
    sym0 = [c for _, sid, c in closes if sid == "SYM00"]
    w = 10
    expect = [float(np.mean(sym0[max(0, i - w + 1): i + 1]))
              for i in range(len(sym0))]

    got = {row[0]: row[1] for row in r.rows()}
    assert "SYM00" in got
    np.testing.assert_allclose(np.asarray(got["SYM00"], dtype=np.float64),
                               expect, rtol=1e-5)
