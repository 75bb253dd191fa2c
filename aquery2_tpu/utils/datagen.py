"""Synthetic data generators.

Counterpart of the reference's `datagen.cpp` (trades benchmark data) and
`tests/datagen_jose/` (tick/hist generators) — NumPy versions feeding
device tables directly or CSV files.
"""

from __future__ import annotations

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.storage.table import Column, StringDict, Table


def trades_table(name: str, n: int, n_symbols: int = 100, seed: int = 7,
                 session=None) -> Table:
    """trade tables: (stocksymbol STRING, time INT, quantity INT,
    price INT) — reference benchmark/quries/Aquery/load_data.a."""
    rng = np.random.default_rng(seed)
    d = StringDict([f"S{i:04d}" for i in range(n_symbols)])
    sym = rng.integers(0, n_symbols, n).astype(np.int32)
    t = np.sort(rng.integers(0, max(n // 10, 10), n)).astype(np.int32)
    qty = rng.integers(1, 1000, n).astype(np.int32)
    price = rng.integers(1, 500, n).astype(np.int32)
    tbl = Table(name, [
        Column("stocksymbol", T.StrT, sym, dictionary=d),
        Column("time", T.IntT, t),
        Column("quantity", T.IntT, qty),
        Column("price", T.IntT, price),
    ])
    if session is not None:
        session.catalog.create(tbl, replace=True)
    return tbl


def stock_csv(path: str, n_days: int = 100, n_symbols: int = 4,
              seed: int = 3) -> None:
    """data/stock.csv for tests/best_profit.a:
    (ID varchar, timestamp int, tradeDate date, price int)."""
    rng = np.random.default_rng(seed)
    syms = [chr(ord("S") + i) for i in range(n_symbols)]
    with open(path, "w") as f:
        f.write("ID,timestamp,tradeDate,price\n")
        ts = 0
        for day in range(n_days):
            date = f"2003-01-{(day % 28) + 1:02d}"
            for s in syms:
                for _ in range(rng.integers(1, 6)):
                    ts += 1
                    f.write(f"{s},{ts},{date},{rng.integers(1, 100)}\n")


def base_csv(path: str, n_symbols: int = 4, seed: int = 5) -> None:
    """data/base.csv for tests/best_profit.a: (ID varchar, name varchar);
    maps tick IDs to names, one of which is "x" (the script filters on it)."""
    rng = np.random.default_rng(seed)
    syms = [chr(ord("S") + i) for i in range(n_symbols)]
    names = ["x"] + [f"n{i}" for i in range(1, n_symbols)]
    rng.shuffle(names)
    names[0] = "x"
    with open(path, "w") as f:
        f.write("ID,name\n")
        for s, nm in zip(syms, names):
            f.write(f"{s},{nm}\n")


def tick_hist_csv(tick_path: str, hist_path: str, n_symbols: int = 6,
                  n_days: int = 40, seed: int = 9) -> None:
    """data/tick-price-file.csv + data/hist-price-file.csv for
    tests/best_profit.a (reference generators tests/datagen_jose/
    tickgen.cpp + histgen.cpp): '|'-separated,
    TradedStocks(ID,SeqNo,TradeDate,TimeStamp,Type) and
    HistoricQuotes(ID,TradeDate,High,Low,Close,Open,volume)."""
    rng = np.random.default_rng(seed)
    syms = [f"SYM{i:02d}" for i in range(n_symbols)]
    with open(tick_path, "w") as f:
        f.write("ID|SeqNo|TradeDate|TimeStamp|Type\n")
        seq = 0
        for day in range(n_days):
            date = f"2010-{(day // 28) + 1:02d}-{(day % 28) + 1:02d}"
            for s in syms:
                for _ in range(int(rng.integers(1, 4))):
                    seq += 1
                    hh, mm, ss = (int(rng.integers(9, 17)),
                                  int(rng.integers(0, 60)),
                                  int(rng.integers(0, 60)))
                    ty = "T" if rng.random() < 0.8 else "Q"
                    f.write(f"{s}|{seq}|{date}|{hh:02d}:{mm:02d}:{ss:02d}|{ty}\n")
    with open(hist_path, "w") as f:
        f.write("ID|TradeDate|HighPrice|LowPrice|ClosePrice|OpenPrice|volume\n")
        for day in range(n_days):
            date = f"2010-{(day // 28) + 1:02d}-{(day % 28) + 1:02d}"
            for s in syms:
                o = float(rng.uniform(10, 100))
                c = o * float(rng.uniform(0.95, 1.05))
                hi = max(o, c) * 1.01
                lo = min(o, c) * 0.99
                f.write(f"{s}|{date}|{hi:.2f}|{lo:.2f}|{c:.2f}|{o:.2f}"
                        f"|{int(rng.integers(1000, 100000))}\n")


def electricity_csv(path: str, n: int = 250, n_features: int = 7,
                    seed: int = 11) -> None:
    """LOAD COMPLEX DATA fixture like demo/ electricity batches:
    (x vecdouble, y int64) with ';'-separated vector cells."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n):
            y = int(rng.integers(0, 2))
            x = rng.normal(loc=3.0 * y, scale=1.0, size=n_features)
            f.write(";".join(f"{v:.5f}" for v in x) + f",{y}\n")
