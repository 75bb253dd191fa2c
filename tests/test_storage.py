"""Storage-layer tests: columns, string dictionaries, ragged vectors,
tables, appends, result formatting."""

import numpy as np

from aquery2_tpu import types as T
from aquery2_tpu.storage import Column, Result, StringDict, Table, VectorColumn


def test_string_dict_roundtrip():
    d = StringDict()
    codes = d.encode(["b", "a", "b", "c"])
    np.testing.assert_array_equal(codes, [0, 1, 0, 2])
    out = d.decode(np.array([1, 0, 2]))
    assert list(out) == ["a", "b", "c"]
    assert d.lookup("zzz") == -1
    # ranks: a<b<c → code0('b')→1, code1('a')→0, code2('c')→2
    np.testing.assert_array_equal(d.ranks, [1, 0, 2])


def test_column_padding_and_stats():
    c = Column.from_host("x", T.IntT, [5, 3, 9, 7])
    assert c.nrows == 4
    assert c.capacity >= 1024  # bucketed
    assert c.stats() == (3, 9)
    np.testing.assert_array_equal(c.to_numpy(), [5, 3, 9, 7])


def test_temporal_column():
    c = Column.from_host("d", T.DateT, ["2003-01-10", "1970-01-02"])
    np.testing.assert_array_equal(c.to_numpy(), [T.parse_date("2003-01-10"), 1])
    assert c.to_python() == ["2003-01-10", "1970-01-02"]


def test_table_append_rows():
    t = Table("t", [
        Column.from_host("a", T.IntT, [1, 2]),
        Column.from_host("s", T.StrT, ["x", "y"]),
    ])
    t.append_rows([(3, "z"), (4, "x")])
    assert t.nrows == 4
    assert t["a"].to_python() == [1, 2, 3, 4]
    assert t["s"].to_python() == ["x", "y", "z", "x"]


def test_table_append_table_dict_translation():
    t1 = Table("t1", [Column.from_host("s", T.StrT, ["a", "b"])])
    t2 = Table("t2", [Column.from_host("s", T.StrT, ["c", "a"])])
    t1.append_table(t2)
    assert t1["s"].to_python() == ["a", "b", "c", "a"]


def test_case_insensitive_columns():
    t = Table("t", [Column.from_host("tradeDate", T.IntT, [1])])
    assert "TRADEDATE" in t
    assert t["tradedate"].name == "tradeDate"


def test_vector_column():
    vc = VectorColumn.from_lists("v", T.VecDoubleT, [[1.0, 2.0], [], [3.0]])
    assert vc.nrows == 3
    assert vc.to_python() == [[1.0, 2.0], [], [3.0]]
    assert vc.total_values() == 3


def test_result_format_and_csv(tmp_path):
    t = Table("r", [
        Column.from_host("a", T.IntT, [1, 2]),
        Column.from_host("b", T.DoubleT, [1.5, 2.5]),
    ])
    r = Result(t)
    s = r.format()
    assert "a" in s and "1.5" in s
    p = tmp_path / "out.csv"
    r.to_csv(str(p), sep=";")
    content = p.read_text().strip().splitlines()
    assert content[0] == "a;b"
    assert content[1] == "1;1.5"


def test_result_vector_csv(tmp_path):
    t = Table("r", [VectorColumn.from_lists("v", T.VecIntT, [[1, 2], [3]])])
    p = tmp_path / "v.csv"
    Result(t).to_csv(str(p))
    lines = p.read_text().strip().splitlines()
    assert lines[1] == "1;2"
    assert lines[2] == "3"


def test_sqlite_attach(tmp_path):
    import sqlite3
    import aquery2_tpu as aq
    from aquery2_tpu.storage.external import attach_sqlite, from_dataframe

    dbfile = tmp_path / "ext.db"
    conn = sqlite3.connect(dbfile)
    conn.execute("CREATE TABLE trades(sym TEXT, px REAL, qty INTEGER)")
    conn.executemany("INSERT INTO trades VALUES (?,?,?)",
                     [("A", 1.5, 10), ("B", 2.5, 20), ("A", 3.5, 30)])
    conn.commit()
    conn.close()

    s = aq.connect(base_dir=str(tmp_path))
    names = attach_sqlite(s, "ext.db")
    assert names == ["trades"]
    r = s.execute("SELECT sym, sum(qty) FROM trades GROUP BY sym")
    got = dict(r.rows())
    assert got == {"A": 40, "B": 20}

    import pandas as pd
    df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    from_dataframe(s, "pdt", df)
    assert s.execute("SELECT count(*) FROM pdt").scalar() == 2
    s.close()
